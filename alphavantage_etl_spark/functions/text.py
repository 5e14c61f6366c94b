"""Text-analysis column functions for the training-data pipeline (X4).

All pure Catalyst expressions (split/regexp/aggregate/transform) — no Python
UDFs, so they stay inside whole-stage codegen and scale to a 100 TB document
corpus limited only by scan bandwidth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword core — enough for a ratio signal, cheap to inline.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization, empty-token-free.

    ``split`` on ``\\s+`` can emit a leading "" (text starting with space);
    filter keeps the count meaningful and cross-engine comparable.
    """
    return F.filter(F.split(_c(col), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stop = F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(stop) / F.size(toks))


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    n = F.length(c)
    no_punct = F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, (n - no_punct) / n)


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks))


def quality_score(col: Column | str) -> Column:
    """Heuristic [0,1] quality signal: long-enough, low punctuation noise,
    natural stopword density, plausible mean word length. The shape follows
    published LLM-data heuristics (C4/Gopher-style length+symbol filters);
    weights are fixed and documented, not learned.

    One-shot Column form — convenient but re-tokenizes per metric (no
    subexpression elimination across the combined tree). Hot paths should
    use :func:`quality_score_fast` on a DataFrame instead.
    """
    c = _c(col)
    len_ok = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(F.coalesce(punct_ratio(c), F.lit(1.0)) * 4, F.lit(1.0))
    stop_ok = F.least(F.coalesce(stopword_ratio(c), F.lit(0.0)) * 5, F.lit(1.0))
    wordlen = F.coalesce(mean_token_len(c), F.lit(0.0))
    wordlen_ok = F.when((wordlen >= 3) & (wordlen <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.bround(
        0.4 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wordlen_ok, 6
    )
    # NULL text -> NULL score (F.least would otherwise skip the nulls and
    # fabricate a score for missing documents)
    return F.when(c.isNotNull(), score)


def with_quality_score(df, text_col: str, out_col: str = "q"):
    """Same numbers as :func:`quality_score`, restructured as a two-stage
    projection so the token array and punctuation-stripped length are
    computed ONCE per row instead of once per metric (tokenization is the
    dominant cost; measured ~3x on the sf0.1 corpus)."""
    c = F.col(text_col)
    staged = df.select(
        "*",
        F.length(c).alias("__n"),
        F.length(F.regexp_replace(c, r"[^\w\s]", "")).alias("__n_nopunct"),
        tokens(c).alias("__toks"),
    )
    toks = F.col("__toks")
    n = F.col("__n")
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    tok_len_sum = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))

    len_ok = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_ratio_ = F.when(n > 0, (n - F.col("__n_nopunct")) / n)
    punct_ok = F.lit(1.0) - F.least(F.coalesce(punct_ratio_, F.lit(1.0)) * 4, F.lit(1.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok)
    stop_ok = F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 5, F.lit(1.0))
    wordlen = F.coalesce(F.when(n_tok > 0, tok_len_sum / n_tok), F.lit(0.0))
    wordlen_ok = F.when((wordlen >= 3) & (wordlen <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.bround(0.4 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wordlen_ok, 6)
    score = F.when(c.isNotNull(), score)  # NULL text -> NULL score
    return staged.withColumn(out_col, score).drop("__n", "__n_nopunct", "__toks")


# GPT-2-style pretokenizer shape, ASCII-restricted so Java regex (Spark) and
# RE2 (DuckDB) agree: contraction suffixes, space-prefixed letter runs, digit
# runs, punctuation runs. A real BPE vocab merges within these pieces, so the
# piece count is a stable upper-bound token estimate for budget accounting.
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token-piece count via the GPT-2 pretokenizer regex (ASCII
    form). Pure ``regexp_count`` — stays in codegen; at 100 TB this is the
    cheap first-pass "how many tokens is this corpus" scan."""
    return F.regexp_count(_c(col), F.lit(BPE_PIECE_RE))


# Per-language discriminator profiles for lang_id: top stopwords (latin
# scripts, token match) / top characters (zh, char match). Public frequency
# lists, truncated to 10 — enough signal for a ratio heuristic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "es": ["el", "la", "los", "las", "es", "y", "en", "que", "de", "un"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que", "dans", "pour"],
}
ZH_CHARS = "的是了在我有和就不人"


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language integer evidence scores: stopword hits for latin-script
    languages, profile-character hits for zh. Integer counts -> exactly
    reproducible in any engine (no float scoring)."""
    toks = F.transform(tokens(col), F.lower)

    def hits(words: list[str]) -> Column:
        # NB: a two-parameter lambda would be read by F.filter as
        # (element, index) — keep the closure single-parameter.
        return F.size(F.filter(toks, lambda t: t.isin(words)))

    scores: dict[str, Column] = {
        lang: hits(words) for lang, words in LANG_PROFILES.items()
    }
    scores["zh"] = F.regexp_count(_c(col), F.lit(f"[{ZH_CHARS}]"))
    return scores


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of lang_scores with a FIXED priority
    order on ties (en > de > es > fr > zh) so the prediction is deterministic
    and the exact CASE chain can be mirrored in oracle SQL."""
    s = lang_scores(col)
    order = ["en", "de", "es", "fr", "zh"]
    pred = F.lit(order[-1])
    for lang in reversed(order[:-1]):
        later = [s[o] for o in order[order.index(lang) + 1 :]]
        cond = F.lit(True)
        for o in later:
            cond = cond & (s[lang] >= o)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    # NULL text -> NULL prediction, not the fall-through default
    return F.when(_c(col).isNotNull(), pred)


def rolling_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling-hash document fingerprint: fold
    ``h = (h * 131 + codepoint) mod (2^31 - 1)`` over every character.

    Order-sensitive (unlike a bag-of-shingles hash) and incrementally
    updatable — the classic Rabin-Karp shape. Stays exact in 64-bit: the
    accumulator is < 2^31, so ``acc * 131 + cp`` is < 2^39.
    """
    c = _c(col)
    # split('') materializes the char array once; the per-char
    # substr(i, 1) form re-seeks from the string head on every access
    # (O(n^2) in UTF-8, measured 5.2x slower at sf0.1). The empty string
    # splits to [''] whose ascii is 0, so the fold still yields 0 for it,
    # and NULL text propagates to a NULL fingerprint through split.
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 131 + F.ascii(ch)) % F.lit(2147483647),
    )


def fingerprint_sha256(col: Column | str) -> Column:
    """Content fingerprint for exact dedup joins: hex sha256 of the raw text
    (same output as DuckDB ``sha256`` / Python hashlib — cross-checkable)."""
    return F.sha2(_c(col), 256)


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over whitespace tokens (near-dup signal, X2), returned
    as a 16-char hex fingerprint.

    Per bit i: sum +/-1 over token hashes' bit i; set bit i when positive.
    Entirely in array expressions (``getbit`` accepts a column position,
    unlike ``shiftright``); near-dup candidates are documents whose
    fingerprints differ in few bits.
    """
    # ONE fold over the hashed tokens with a 64-wide array accumulator
    # (r14): the previous shape folded the token array once PER BIT with
    # the tokenize+hash expression captured inside the outer lambda —
    # re-tokenizing and re-hashing the document 64 times per row (the
    # per-element re-evaluation trap; measured 5.1 s single-task at
    # sf0.1). Per bit the contribution order over tokens is unchanged
    # (left-to-right exact long addition), so every bit count — and the
    # fingerprint — is bit-identical.
    hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))
    poss = F.sequence(F.lit(63), F.lit(0), F.lit(-1))
    counts = F.aggregate(
        hashed,
        F.expr("array_repeat(CAST(0 AS BIGINT), 64)"),
        lambda acc, h: F.zip_with(
            acc, poss, lambda a, i: a + (F.getbit(h, i) * 2 - 1)
        ),
    )
    bits = F.transform(
        counts,
        lambda c: F.when(c > 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.lpad(F.conv(F.array_join(bits, ""), 2, 16), 16, "0")


# PII patterns written in the COMMON subset of Java regex (Spark) and RE2
# (DuckDB/Go tooling): character classes, bounded repetition, \b — no
# lookaround, no backreferences — so the exact same pattern string runs in
# the engine and in the SQL oracle. Conservative by design: a false
# positive destroys training text, a false negative leaks one string; the
# sweep order (email -> phone -> IPv4) means replacement tokens, which are
# digit-free, can never re-match a later pattern.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Replace emails, NANP-style phone numbers, and IPv4 addresses with
    typed placeholder tokens — the standard pre-training redaction pass
    (every public corpus pipeline ships one; the placeholders keep the
    text's shape so downstream quality/token statistics stay meaningful).

    Pure ``regexp_replace`` chain: JVM-side, codegen-friendly, no UDF.
    """
    out = _c(col)
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def rep_ngram_ratio(col: Column | str, n: int = 2) -> Column:
    """Fraction of DUPLICATE word n-grams within the document:
    ``1 - distinct/total`` over the token n-gram sequence (0.0 when fewer
    than ``n`` tokens). The Gopher-style within-document repetition signal
    — templated/spammy text repeats its own phrases long before it repeats
    another document's, so this gates what cross-corpus dedup cannot see.
    Pure array expressions; half-even-rounded to 6 places for
    cross-engine comparability.
    """
    # Build n-grams by zipping offset SLICES of the token array, not by
    # element_at inside a transform lambda: expressions inside a lambda
    # body are re-evaluated PER ELEMENT (the tokenization would run O(L)
    # times per doc -> O(L^2); measured 15.6s -> 0.5s at sf0.1), while
    # function ARGUMENTS evaluate once per row.
    toks = tokens(col)
    m = F.size(toks)
    grams = F.slice(toks, 1, m - (n - 1))
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + j, m - (n - 1)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(m >= n, grams).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    return F.when(
        total > 0,
        F.bround(
            F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6
        ),
    ).otherwise(F.lit(0.0))

def token_fertility(
    df, text_col: str, group_col: str
):
    """(group, n_docs, ws_tokens, bpe_tokens, fertility,
    chars_per_bpe_token): tokenizer fertility per group — how many
    BPE-ish subword tokens the corpus pays per whitespace word, the
    per-language cost profile a tokenizer/mix review reads (a language
    with fertility 3 burns 3x the context window of fertility-1 text;
    budgets in ws-words systematically underfeed it).

    All counts are exact integer sums; the two ratios are exact-int
    double divisions shipped unrounded (pure rational). Documents with
    zero whitespace tokens are excluded from the ratio (NULL-safe).

    Scale: one scan, one hash aggregation to |groups| rows.
    """
    return (
        df.select(
            F.col(group_col).alias("g"),
            token_count(F.col(text_col)).cast("long").alias("ws"),
            token_count_bpe(F.col(text_col)).cast("long").alias("bpe"),
            F.length(F.col(text_col)).cast("long").alias("ch"),
        )
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("ch").alias("__chars"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.when(
                F.col("ws_tokens") > 0,
                F.col("bpe_tokens").cast("double")
                / F.col("ws_tokens").cast("double"),
            ).alias("fertility"),
            F.when(
                F.col("bpe_tokens") > 0,
                F.col("__chars").cast("double")
                / F.col("bpe_tokens").cast("double"),
            ).alias("chars_per_bpe_token"),
        )
    )
