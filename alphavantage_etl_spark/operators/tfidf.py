"""Corpus-statistics term weighting (X4 adjunct): document frequency,
TF-IDF, and top-k characteristic terms per document.

The standard corpus-analysis primitive a curation pipeline uses for topic
balance audits and keyword extraction. Shape at 100 TB:

- tokens explode ONCE into (doc, term) rows and immediately partial-
  aggregate into per-document term counts — the only corpus-sized shuffle
  is keyed on (doc, term);
- document frequency is a second aggregate over the (already reduced) term
  -count table, keyed on term (vocabulary-sized, orders of magnitude
  smaller than the corpus);
- the DF table joins back by term — left to AQE: broadcast when the
  vocabulary fits, shuffle join when it does not (a hint here would be
  wrong at web-corpus vocabulary sizes);
- top-k per document is a rank window partitioned by doc — per-group
  state O(1), no global sort.

TF-IDF scores are half-even-rounded to 6 decimals INSIDE the operator so
ordering and output are reproducible cross-engine (ln differs by ≤1 ulp
between libm implementations; ranking on the rounded value with a term
tie-break removes the ambiguity — same convention as the similarity
operators' round_even(sim, 6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf): per-document counts of lowercased whitespace terms."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def doc_frequency(tf: DataFrame, id_col: str) -> DataFrame:
    """(term, df): number of documents containing each term, from the
    term-count table (already one row per (doc, term))."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF
    (tf × ln(N/df), rounded half-even to 6), ties broken on the term.

    N is the corpus document count, computed as a 1-row aggregate
    cross-joined into the plan (broadcast nested-loop of a single row) —
    not a driver-side ``docs.count()`` action, which the r2 version paid
    as a separate job with its own corpus pass. The N branch counts rows
    without referencing the text column, so its scan reads parquet
    row-group metadata, not corpus bytes. (Deriving N from ``tf`` instead
    was measured WORSE: column pruning specializes the tf partial
    aggregate per consumer, so the tf exchange is not reused and the text
    column would be scanned a third time.)

    The tf⋈df join hash-partitions by term on both sides; a web-scale hot
    term (stopword) skews that key, which AQE's skew-join split absorbs —
    a window-over-term formulation would scan the corpus once but cannot
    split a hot term's partition, so the join form is the scale-safe one.
    """
    tf = term_counts(docs, text_col, id_col)
    df = doc_frequency(tf, id_col)
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("__n"))
    scored = tf.join(df, "term").crossJoin(n_docs).select(
        id_col,
        "term",
        "tf",
        F.bround(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def collocations(
    docs: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the phrase-
    mining pass that feeds tokenizer vocabularies and stop-phrase lists:
    ``pmi(a,b) = ln( (B/N2) / ((U_a/N1) * (U_b/N1)) )`` over adjacent
    lowercased token pairs, gated on ``B >= min_count`` (PMI's classic
    rare-pair pathology: a hapax pair maximizes PMI, so ungated output
    is noise).

    Determinism: counts are exact integers; each surviving bigram's PMI
    is ONE fixed-order double expression over count ratios, half-even-
    rounded to 1e-9 (one transcendental per DISTINCT bigram, the lm
    discipline); top-k ordered (pmi DESC, a, b) — total and stable.

    Scale design (100 TB): one corpus explode for unigrams, one for
    adjacent pairs (the pair Generate keeps the token array as a column
    attribute — `element_at` per index, never a lambda-captured
    re-evaluation); both collapse map-side into VOCABULARY-bounded
    tables; totals derive from those tables in-plan (no extra corpus
    scan); the unigram join onto the bigram table is vocabulary-sized
    (AQE broadcast); top-k is TakeOrderedAndProject.
    """
    low = docs.select(F.split(F.lower(F.col(text_col)), r"\s+").alias("__t"))
    uni = (
        low.select(F.explode("__t").alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("u"))
    )
    pairs = (
        # guard BEFORE sequence: Spark's sequence(1, 0) auto-steps -1 and
        # yields [1, 0] — index 0 would raise under ANSI element_at
        low.where(F.size("__t") >= 2)
        .select(
            "__t",
            F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        )
        .select(
            F.element_at("__t", F.col("__i")).alias("a"),
            F.element_at("__t", F.col("__i") + 1).alias("b"),
        )
        .where((F.col("a") != "") & (F.col("b") != ""))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    n1 = uni.agg(F.sum("u").alias("__n1"))
    n2 = pairs.agg(F.sum("n_pair").alias("__n2"))
    ua = uni.select(F.col("w").alias("a"), F.col("u").alias("__ua"))
    ub = uni.select(F.col("w").alias("b"), F.col("u").alias("__ub"))
    pmi = F.bround(
        F.log(
            (F.col("n_pair").cast("double") / F.col("__n2").cast("double"))
            / (
                (F.col("__ua").cast("double") / F.col("__n1").cast("double"))
                * (F.col("__ub").cast("double") / F.col("__n1").cast("double"))
            )
        ),
        9,
    )
    return (
        pairs.where(F.col("n_pair") >= min_count)
        .join(ua, on="a")
        .join(ub, on="b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select("a", "b", "n_pair", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(k)
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """One-row frame (n_terms, slope, intercept) — the log-log OLS fit of
    term frequency against frequency rank over the ``top_k`` head terms:
    natural language sits near slope -1 (Zipf's law), and a corpus that
    drifts far from it is telling you something (template spam flattens
    the head, OCR noise fattens the tail) — the corpus-health scalar
    next to the X27 perplexity profile.

    Determinism: ln(rank) and ln(freq) are half-even-quantized to 1e-9
    per term (one transcendental pair per HEAD term), the five OLS
    sufficient statistics are exact decimal(38,0) sums over the
    top_k-bounded table, and slope/intercept are one fixed-order double
    expression each (the X31 group_trend discipline).

    Scale design (100 TB): term counts are one vocabulary-bounded
    aggregation; the head extraction is TakeOrderedAndProject (per-
    partition heaps); ranking/fitting then run over top_k rows — BOUNDED
    MODEL STATE (the centroid-table class), so the single-partition
    window is over <= top_k rows by construction, never the vocabulary.
    """
    terms = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), "w")
        .limit(top_k)
    )
    from pyspark.sql import Window

    ranked = terms.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), "w")).cast("long")
    )
    q = F.lit(10.0**9)
    lx = F.round(F.bround(F.log(F.col("r").cast("double")), 9) * q).cast(
        "decimal(38,0)"
    )
    ly = F.round(F.bround(F.log(F.col("f").cast("double")), 9) * q).cast(
        "decimal(38,0)"
    )
    g = ranked.select(lx.alias("__x"), ly.alias("__y")).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    nf = F.col("n_terms").cast("double")
    sx = F.col("__sx").cast("double") / q
    sy = F.col("__sy").cast("double") / q
    sxy = F.col("__sxy").cast("double") / q / q
    sxx = F.col("__sxx").cast("double") / q / q
    slope = (sxy - sx * sy / nf) / (sxx - sx * sx / nf)
    return g.select(
        "n_terms",
        F.when(
            (F.col("n_terms") >= 2) & ((sxx - sx * sx / nf) > 0),
            F.bround(slope, 9),
        ).alias("slope"),
        F.when(
            (F.col("n_terms") >= 2) & ((sxx - sx * sx / nf) > 0),
            F.bround((sy - slope * sx) / nf, 9),
        ).alias("intercept"),
    )


def vocab_coverage(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    top_k: int = 1000,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(id, n_tokens, n_oov, oov_rate) per document: how much of each
    document falls outside a reference vocabulary — the pre-training
    tokenizer-fit check ("will this corpus explode the OOV/byte-fallback
    rate?") and a per-document quality signal (gibberish and non-target-
    language text score high OOV against a head vocabulary).

    ``vocab`` defaults to the corpus's own ``top_k`` most frequent terms
    (ties: lexicographically smaller term wins — deterministic across
    engines); pass an explicit one-column ``term`` frame to audit against
    a fixed tokenizer/another corpus's vocabulary.

    Scale design (100 TB): the vocabulary is top-k BOUNDED MODEL STATE
    (TakeOrderedAndProject over the term-count table, never a full sort),
    broadcast to the token stream; per-document counts collapse map-side
    (a document's tokens are contiguous in its input split, so the
    partial aggregation reduces each doc to one row before the
    exchange). Token multiplicity counts — OOV *occurrences*, not
    distinct types — matching what a tokenizer would actually emit.
    """
    from ..functions.text import tokens as _tokens

    toks = docs.select(
        F.col(id_col),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("__tok"),
    )
    if vocab is None:
        vocab = (
            toks.groupBy("__tok")
            .agg(F.count("*").alias("__cnt"))
            .orderBy(F.desc("__cnt"), F.col("__tok"))
            .limit(top_k)
            .select(F.col("__tok").alias("term"))
        )
    flagged = toks.join(
        F.broadcast(vocab.select(F.col("term").alias("__v"))),
        toks["__tok"] == F.col("__v"),
        "left",
    )
    n_tok = F.count(F.lit(1)).alias("n_tokens")
    n_oov = F.sum(F.col("__v").isNull().cast("long")).alias("n_oov")
    return (
        flagged.groupBy(id_col)
        .agg(n_tok, n_oov)
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
    )


def corpus_divergence(
    docs: DataFrame,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """(src_a, src_b, vocab_jaccard, js_divergence) for every unordered
    pair of corpus groups — the mixing-decision profile: which sources
    are near-duplicates of each other distribution-wise (candidates for
    merging/deduping a mix) and which are genuinely novel (candidates
    for upweighting). JS divergence is symmetric, bounded by ln 2, and
    zero iff the term distributions match exactly. Pairs sharing NO
    vocabulary — exactly the most-divergent pairs a mixing decision
    cares about — are emitted too, with ``vocab_jaccard = 0`` and
    ``js_divergence = ln 2`` (the pair grid comes from the bounded
    per-group totals table, so the intersection join can't drop them).

    Exactness: per-term JS contributions over the INTERSECTION
    vocabulary are half-even-quantized to 1e-12 and summed as exact
    decimal integers (the MI discipline); the exclusive-vocabulary mass
    enters through the closed form ``0.5*ln2*(2 - mass_a - mass_b)``
    computed from exact integer count ratios — so no outer join per
    pair is ever needed, only the intersection equi-join. Final value
    rounded half-even to 1e-9 (transcendental-output convention).

    Scale design (100 TB): ONE corpus scan builds the (group, term)
    count grid (map-side combine); everything downstream — totals,
    the grid self-join on term, the per-pair aggregation — is bounded
    by |vocab| x |groups|^2, independent of corpus size. For web-scale
    vocabularies feed a head-truncated grid (``term_counts`` + top-k)
    and the same arithmetic applies to the truncated distributions.
    """
    from ..functions.text import tokens as _tokens

    toks = docs.select(
        F.col(group_col).alias("__g"),
        F.explode(_tokens(F.lower(F.col(text_col)))).alias("__t"),
    )
    grid = toks.groupBy("__g", "__t").agg(F.count(F.lit(1)).alias("__c"))
    tot = grid.groupBy("__g").agg(
        F.sum("__c").alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    g = grid.join(tot, "__g")
    a = g.select(
        F.col("__g").alias("ga"), F.col("__t").alias("t"),
        F.col("__c").alias("ca"), F.col("__n").alias("na"),
        F.col("__v").alias("va"),
    )
    b = g.select(
        F.col("__g").alias("gb"), F.col("__t").alias("t"),
        F.col("__c").alias("cb"), F.col("__n").alias("nb"),
        F.col("__v").alias("vb"),
    )
    j = a.join(b, "t").where(F.col("ga") < F.col("gb"))
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    term = F.round(
        F.bround(
            p * F.log(F.lit(2.0) * p / (p + q))
            + q * F.log(F.lit(2.0) * q / (p + q)),
            12,
        )
        * F.lit(1e12)
    ).cast("decimal(38,0)")
    inter = j.groupBy("ga", "gb").agg(
        F.sum(term).alias("__qjs"),
        F.sum("ca").alias("__ma"),
        F.sum("cb").alias("__mb"),
        F.count(F.lit(1)).alias("__vi"),
    )
    # pair grid from the |groups|-bounded totals table: disjoint-vocab
    # pairs survive with zero intersection mass instead of vanishing
    # into the inner join (r5 ADVICE)
    ta = tot.select(
        F.col("__g").alias("ga"),
        F.col("__n").alias("na"),
        F.col("__v").alias("va"),
    )
    tb = tot.select(
        F.col("__g").alias("gb"),
        F.col("__n").alias("nb"),
        F.col("__v").alias("vb"),
    )
    pairs = ta.crossJoin(F.broadcast(tb)).where(F.col("ga") < F.col("gb"))
    full = pairs.join(inter, ["ga", "gb"], "left").select(
        "ga",
        "gb",
        "na",
        "nb",
        "va",
        "vb",
        F.coalesce(F.col("__qjs"), F.lit(0).cast("decimal(38,0)")).alias(
            "__qjs"
        ),
        F.coalesce(F.col("__ma"), F.lit(0)).alias("__ma"),
        F.coalesce(F.col("__mb"), F.lit(0)).alias("__mb"),
        F.coalesce(F.col("__vi"), F.lit(0)).alias("__vi"),
    )
    import math

    mass_a = F.col("__ma").cast("double") / F.col("na").cast("double")
    mass_b = F.col("__mb").cast("double") / F.col("nb").cast("double")
    js = (
        F.lit(0.5) * (F.col("__qjs").cast("double") / F.lit(1e12))
        + F.lit(0.5 * math.log(2.0))
        * (F.lit(2.0) - mass_a - mass_b)
    )
    return full.select(
        F.col("ga").alias("src_a"),
        F.col("gb").alias("src_b"),
        (
            F.col("__vi").cast("double")
            / (F.col("va") + F.col("vb") - F.col("__vi")).cast("double")
        ).alias("vocab_jaccard"),
        F.bround(js, 9).alias("js_divergence"),
    )


def doc_novelty(
    df: DataFrame, text_col: str, id_col: str, top_k: int = 20
) -> DataFrame:
    """(id, n_terms, novelty, rank): the ``top_k`` most novel documents
    — novelty = mean smoothed IDF of the document's DISTINCT terms,
    ``idf(t) = ln((N+1)/(df_t+1)) + 1``. High scores mark documents
    built from corpus-rare vocabulary: the upweighting candidates of a
    data-mixing decision, and the review queue for gibberish that
    quality heuristics scored well (rare terms are either signal or
    noise; either way a human wants the top of this list).

    Exactness: per-term IDF is half-even-quantized to 1e-12 and summed
    as exact decimal integers per document (merge-order-immune); the
    mean divides by the exact distinct-term count and rounds half-even
    to 1e-9 (transcendental-output convention). Ranks break novelty
    ties on the id.

    Scale design (100 TB): one scan builds per-doc distinct terms, one
    aggregation builds the document-frequency table (vocabulary-
    bounded), the IDF join is term-keyed (postings shape), and the
    top-k lowers to TakeOrderedAndProject. No corpus-wide window.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    from ..functions.text import tokens as _tokens

    dt = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(_tokens(F.lower(F.col(text_col))))
            ).alias("__t"),
        )
        .distinct()
    )
    tot = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("__nd")
    )
    dfreq = dt.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    # N rides in as a plan-side scalar (broadcast 1-row cross join) —
    # no driver action at plan-construction time
    idf_q = F.round(
        F.bround(
            F.log(
                (F.col("__nd") + 1).cast("double")
                / (F.col("__df") + 1).cast("double")
            )
            + F.lit(1.0),
            12,
        )
        * F.lit(1e12)
    ).cast("decimal(38,0)")
    scored = (
        dt.join(
            dfreq.crossJoin(F.broadcast(tot)).select(
                "__t", idf_q.alias("__qidf")
            ),
            "__t",
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__qidf").alias("__s"),
        )
        .select(
            "__id",
            "n_terms",
            F.bround(
                F.col("__s").cast("double")
                / F.lit(1e12)
                / F.col("n_terms").cast("double"),
                9,
            ).alias("novelty"),
        )
    )
    w = Window.orderBy(F.desc("novelty"), F.col("__id"))
    return (
        scored.orderBy(F.desc("novelty"), F.col("__id"))
        .limit(top_k)
        .select(
            F.col("__id").alias(id_col),
            "n_terms",
            "novelty",
            F.row_number().over(w).cast("long").alias("rank"),
        )
    )
