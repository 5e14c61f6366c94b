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
    weights are fixed and documented, not learned."""
    c = _c(col)
    len_ok = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(F.coalesce(punct_ratio(c), F.lit(1.0)) * 4, F.lit(1.0))
    stop_ok = F.least(F.coalesce(stopword_ratio(c), F.lit(0.0)) * 5, F.lit(1.0))
    wordlen = F.coalesce(mean_token_len(c), F.lit(0.0))
    wordlen_ok = F.when((wordlen >= 3) & (wordlen <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.bround(
        0.4 * len_ok + 0.2 * punct_ok + 0.2 * stop_ok + 0.2 * wordlen_ok, 6
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
    hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))
    bits = F.transform(
        F.sequence(F.lit(63), F.lit(0), F.lit(-1)),
        lambda i: F.when(
            F.aggregate(
                hashed,
                F.lit(0).cast("long"),
                lambda acc, h: acc + (F.getbit(h, i) * 2 - 1),
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.lpad(F.conv(F.array_join(bits, ""), 2, 16), 16, "0")
