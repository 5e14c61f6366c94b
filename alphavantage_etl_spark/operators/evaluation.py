"""Classifier evaluation — exact AUC (Mann-Whitney rank statistic with
tie correction) and calibration bins (reliability diagram), closing the
in-engine train -> predict -> EVALUATE loop around
`operators.classify`.

Reference scope: none in the reference ETL; the evaluation counterpart
of X35's trainer.

Determinism: AUC here is PURE integer arithmetic — no ranks
materialized per row, no transcendentals: group by distinct score, one
ordered cumulative over the score GRID, and

    AUC = sum over scores s of pos_s * (2 * cum_neg_below(s) + neg_s)
          / (2 * n_pos * n_neg)

(the tie-corrected Mann-Whitney count: each positive beats every
lower-scored negative and half of the equal-scored ones). Numerator
terms multiply as decimal(38,0) (long products overflow at corpus
scale) and the final value is ONE exact integer division rendered as a
double — bit-identical everywhere, including tie-heavy score columns.

Scale design (100 TB): the per-score grid is one partial-aggregated
groupBy; the ordered cumulative runs over DISTINCT scores — for
quantized model outputs (the classify/lm discipline puts scores on a
1e-9 grid) that table is far smaller than the corpus, and the
single-partition window is over that bounded grid, never the subject
rows. Calibration is one nbins-bounded aggregation with exact
grid-quantized mean scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def auc_score(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """One-row frame (n_pos, n_neg, auc). ``label_col`` 0/1; rows with
    NULL label or score are excluded; AUC is NULL when either class is
    empty (undefined, not 0.5-by-fiat)."""
    y = F.col(label_col).cast("int")
    g = (
        df.where(F.col(score_col).isNotNull() & y.isNotNull())
        .select(F.col(score_col).alias("__s"), y.alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.sum("__y").alias("__pos"),
        )
        .withColumn("__neg", F.col("__c") - F.col("__pos"))
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    cum = g.withColumn(
        "__cumneg", F.coalesce(F.sum("__neg").over(w), F.lit(0))
    )
    term = F.col("__pos").cast("decimal(38,0)") * (
        F.lit(2) * F.col("__cumneg") + F.col("__neg")
    ).cast("decimal(38,0)")
    out = cum.agg(
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__neg").cast("long").alias("n_neg"),
        F.coalesce(
            F.sum(term), F.lit(0).cast("decimal(38,0)")
        ).alias("__num"),
    )
    return out.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("__num").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            ),
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    nbins: int = 10,
) -> DataFrame:
    """(bin, n, mean_score, frac_pos) — the reliability diagram: scores
    bucketed into [i/nbins, (i+1)/nbins) (score 1.0 clamps into the top
    bin), per-bin mean predicted probability vs empirical positive rate.
    A calibrated model tracks the diagonal. Mean scores sum exactly on
    the 1e-9 grid (the classify output grid); frac_pos is one exact
    integer division."""
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    y = F.col(label_col).cast("int")
    s = F.col(score_col)
    b = F.least(
        F.floor(s * nbins).cast("long"), F.lit(nbins - 1)
    )
    qs = F.round(s * F.lit(1e9)).cast("decimal(38,0)")
    return (
        df.where(s.isNotNull() & y.isNotNull())
        .select(b.alias("bin"), qs.alias("__qs"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__qs").alias("__sq"),
            F.sum("__y").alias("__pos"),
        )
        .select(
            "bin",
            F.col("__n").cast("long").alias("n"),
            (
                F.col("__sq").cast("double")
                / F.col("__n").cast("double")
                / F.lit(1e9)
            ).alias("mean_score"),
            (
                F.col("__pos").cast("double") / F.col("__n").cast("double")
            ).alias("frac_pos"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    rels: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """(query, n_ranked, ideal_n, dcg, idcg, ndcg): normalized
    discounted cumulative gain at k per query — THE graded ranking-
    quality metric for a retrieval stack (AUC scores a classifier's
    order over all pairs; NDCG scores the top-of-list order a user or
    a RAG context window actually consumes, with graded relevance).

    ``ranked``: (query, doc, rank) — the system's 1-based ranking.
    ``rels``: (query, doc, rel) — graded relevance labels (small ints);
    docs absent from ``rels`` gain 0. DCG = sum_{rank<=k}
    (2^rel - 1)/log2(rank+1); IDCG uses the label table's own ideal
    order (rel DESC, doc ASC — a PINNED total order, mirrored in the
    oracle). ndcg = dcg/idcg, NULL when idcg = 0 (no relevant docs).

    Exactness: each gain/discount term is half-even-quantized to 1e-12
    (O(1) magnitude — the chi2-term discipline) and summed as exact
    decimal integers, so dcg/idcg and their ratio are engine-identical;
    the ratio ships unrounded (exact-int double ratio).

    Scale: everything is top-k-bounded per query after one rank filter
    and one row_number window over the LABEL table partitioned by
    query — label tables are assessment-sized, not corpus-sized; the
    join to labels is (query, doc)-keyed.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gain = F.pow(F.lit(2.0), F.col("rel").cast("double")) - F.lit(1.0)

    def terms(rank_expr):
        return F.round(
            F.bround(
                gain / F.log2(rank_expr.cast("double") + F.lit(1.0)), 12
            )
            * F.lit(1e12)
        ).cast("decimal(38,0)")

    r = (
        ranked.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.col(rank_col).alias("rank"),
        )
        .where(F.col("rank") <= k)
        .join(
            rels.select(
                F.col(query_col).alias("q"),
                F.col(doc_col).alias("d"),
                F.col(rel_col).alias("rel"),
            ),
            ["q", "d"],
            "left",
        )
        .na.fill({"rel": 0})
    )
    dcg = r.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum(terms(F.col("rank"))).alias("__dcg"),
    )
    wi = Window.partitionBy("q").orderBy(F.desc("rel"), "d")
    ideal = (
        rels.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.col(rel_col).alias("rel"),
        )
        .where(F.col("rel") > 0)
        .withColumn("rank", F.row_number().over(wi))
        .where(F.col("rank") <= k)
    )
    idcg = ideal.groupBy("q").agg(
        F.count(F.lit(1)).alias("ideal_n"),
        F.sum(terms(F.col("rank"))).alias("__idcg"),
    )
    j = dcg.join(idcg, "q", "left")
    return j.select(
        F.col("q").alias(query_col),
        "n_ranked",
        F.coalesce("ideal_n", F.lit(0)).alias("ideal_n"),
        (F.col("__dcg").cast("double") / 1e12).alias("dcg"),
        (F.coalesce(F.col("__idcg"), F.lit(0).cast("decimal(38,0)"))
         .cast("double") / 1e12).alias("idcg"),
        F.when(
            F.coalesce("__idcg", F.lit(0).cast("decimal(38,0)")) > 0,
            F.col("__dcg").cast("double") / F.col("__idcg").cast("double"),
        ).alias("ndcg"),
    )


def average_precision(
    df: DataFrame, label_col: str, score_col: str, tiebreak_col: str
) -> DataFrame:
    """One-row (n_pos, n, avg_precision): exact average precision —
    the area under the precision-recall curve as a ranking metric:
    ``AP = (1/n_pos) * sum over positive rows of precision@rank``. The
    PR-side complement to :func:`auc_score`: ROC-AUC is insensitive to
    class imbalance (a 1:10^4 corpus filter can score 0.99 AUC while
    drowning every positive in false alarms); AP weights exactly the
    top-of-ranking region a curation pipeline consumes.

    Ranks are a PINNED total order (score DESC, tiebreak ASC —
    deterministic distinct ranks, the spearman convention, mirrored in
    the oracle; midrank tie-handling would trade exactness for a
    convention no consumer of a materialized ranking actually sees).
    Each precision@k = cum_pos(k)/k is half-even-quantized at 1e-12
    (O(1) magnitude — the chi2-term discipline) and summed in
    decimal(38,0); AP = sum/1e12/n_pos evaluates in that fixed op
    order. NULL label/score rows are excluded; n_pos = 0 yields NULL.

    Scale (100 TB): NO corpus-sized single-partition rank window. The
    global rank splits two-level: block offsets from ONE cumulative
    window over the distinct-score grid (bounded, the auc_score
    class), within-block row_number/cumulative-positives PARTITIONED
    BY score (distributed) — global rank = offset + within-rank,
    global cum_pos = block-prefix + within-prefix.
    """
    y = F.col(label_col).cast("int")
    base = df.where(
        F.col(score_col).isNotNull() & y.isNotNull()
    ).select(
        F.col(score_col).alias("__s"),
        F.col(tiebreak_col).alias("__tb"),
        y.alias("__y"),
    )
    blocks = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum("__y").alias("__p"),
    )
    wg = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = blocks.select(
        "__s",
        F.coalesce(F.sum("__c").over(wg), F.lit(0)).alias("__koff"),
        F.coalesce(F.sum("__p").over(wg), F.lit(0)).alias("__poff"),
    )
    win = Window.partitionBy("__s").orderBy("__tb")
    ranked = (
        base.join(off, "__s")
        .select(
            "__y",
            (F.col("__koff") + F.row_number().over(win)).alias("__k"),
            (
                F.col("__poff")
                + F.sum("__y").over(
                    win.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).alias("__cp"),
        )
    )
    term = F.round(
        F.bround(
            F.col("__cp").cast("double") / F.col("__k").cast("double"), 12
        )
        * F.lit(1e12)
    ).cast("decimal(38,0)")
    st = ranked.agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("__y") == 1, term)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__ap"),
    )
    return st.select(
        "n_pos",
        "n",
        F.when(
            F.col("n_pos") > 0,
            F.col("__ap").cast("double")
            / F.lit(1e12)
            / F.col("n_pos").cast("double"),
        ).alias("avg_precision"),
    )


def mrr_hits(
    ranked: DataFrame,
    rels: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    rel_col: str,
    ks: tuple[int, ...] = (1, 5, 10),
) -> DataFrame:
    """One-row (n_queries, mrr, hit_1, hit_5, hit_10, ...): mean
    reciprocal rank and hit@k over a materialized ranking — the
    binary-relevance siblings of :func:`ndcg_at_k` (NDCG grades the
    whole top-k order; MRR asks only "how deep is the FIRST useful
    result", the metric an agentic retrieve-then-read loop that stops
    at the first hit actually experiences).

    ``ranked``: (query, doc, rank); ``rels``: (query, doc, rel) with
    rel > 0 meaning relevant. Per query r_q = min rank of a relevant
    doc (infinite — contributing 0 — when no relevant doc is ranked:
    the standard convention, so unanswerable queries PENALIZE).
    n_queries counts DISTINCT queries in ``ranked``. Each 1/r_q is
    half-even-quantized at 1e-12 and summed in decimal(38,0)
    (mrr = sum/1e12/n_queries, fixed op order); hit@k are exact
    integer ratios.

    Scale: one (query, doc) equi-join, one min-aggregation per query,
    one final row — no windows at all.
    """
    firsts = (
        ranked.select(
            F.col(query_col).alias("q"),
            F.col(doc_col).alias("d"),
            F.col(rank_col).alias("rank"),
        )
        .join(
            rels.select(
                F.col(query_col).alias("q"),
                F.col(doc_col).alias("d"),
                F.col(rel_col).alias("rel"),
            ).where(F.col("rel") > 0),
            ["q", "d"],
            "left",
        )
        .groupBy("q")
        .agg(
            F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("__r1")
        )
    )
    rr = F.round(
        F.bround(F.lit(1.0) / F.col("__r1").cast("double"), 12)
        * F.lit(1e12)
    ).cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.coalesce(
            F.sum(F.when(F.col("__r1").isNotNull(), rr)),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("__mrr"),
    ]
    for k in ks:
        aggs.append(
            F.sum(
                F.when(F.col("__r1") <= k, 1).otherwise(0)
            ).alias(f"__h{k}")
        )
    st = firsts.agg(*aggs)
    sel = [
        F.col("n_queries").cast("long").alias("n_queries"),
        F.when(
            F.col("n_queries") > 0,
            F.col("__mrr").cast("double")
            / F.lit(1e12)
            / F.col("n_queries").cast("double"),
        ).alias("mrr"),
    ]
    for k in ks:
        sel.append(
            F.when(
                F.col("n_queries") > 0,
                F.col(f"__h{k}").cast("double")
                / F.col("n_queries").cast("double"),
            ).alias(f"hit_{k}")
        )
    return st.select(*sel)


def cohen_kappa(
    df: DataFrame, rater_a_col: str, rater_b_col: str
) -> DataFrame:
    """One-row (n, agree, po, pe, kappa): Cohen's kappa — chance-
    corrected inter-annotator agreement over two categorical label
    columns. THE label-QA gate for a training-data pipeline: raw
    percent agreement (po) flatters any pair of raters that both
    over-predict the majority class; kappa subtracts the agreement
    two INDEPENDENT raters with the same marginals would reach by
    luck (pe), so a kappa near 0 flags a labeling process that is
    noise even when po looks high.

    ``kappa = (po - pe) / (1 - pe)`` computed as ONE exact integer
    ratio: with confusion-cell counts c_ab, marginals ra_k / rb_k and
    n = sum(c),

        kappa = (n * agree - sum_k ra_k*rb_k)
              / (n * n     - sum_k ra_k*rb_k)

    — numerator and denominator multiply in decimal(38,0) (long
    products overflow at corpus scale), one double division at the
    end, shipped unrounded (bit-identical cross-engine). po and pe
    are exact-int double ratios in a pinned op order. kappa is NULL
    when pe = 1 (a single shared label — chance correction
    undefined). Rows with a NULL label on either side are excluded.

    Scale (100 TB): one map-side-combined groupBy onto the k x k
    confusion grid; marginals, the pe sum, and the diagonal all
    derive from that bounded grid (label vocabularies are small by
    construction), never from a second corpus pass.
    """
    pairs = df.where(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    ).select(
        F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
    )
    cell = pairs.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__c"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ra = cell.groupBy("__a").agg(F.sum("__c").alias("__ra"))
    rb = cell.groupBy("__b").agg(F.sum("__c").alias("__rb"))
    pe_num = (
        ra.join(rb, ra["__a"] == rb["__b"])
        .agg(
            F.coalesce(
                F.sum(dec(F.col("__ra")) * dec(F.col("__rb"))),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__pen")
        )
    )
    tot = cell.agg(
        F.sum("__c").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))),
            F.lit(0),
        ).alias("agree"),
    )
    j = tot.crossJoin(F.broadcast(pe_num))
    n_d = F.col("n").cast("double")
    den = dec(F.col("n")) * dec(F.col("n")) - F.col("__pen")
    num = dec(F.col("n")) * dec(F.col("agree")) - F.col("__pen")
    return j.select(
        "n",
        "agree",
        (F.col("agree").cast("double") / n_d).alias("po"),
        (F.col("__pen").cast("double") / n_d / n_d).alias("pe"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("kappa"),
    )


def rank_biased_overlap(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    rank_col: str,
    p: float = 0.9,
    depth: int = 50,
) -> DataFrame:
    """One-row (depth, n_common, agreement_at_depth, rbo): truncated
    rank-biased overlap (Webber et al.'s RBO) between two top-``depth``
    rankings of the same id space — the comparison metric for two
    RANKERS rather than one ranking against labels (ndcg_at_k's job):
    "did swapping the retriever / quality scorer actually change what
    the top of the list shows", with geometric top-weighting p^(i-1)
    so rank-1 disagreements dominate tail churn.

        rbo_d = (1 - p) * sum_{i=1..d} p^(i-1) * |A_1..i ∩ B_1..i| / i

    An item in both prefixes enters every depth i >= max(rank_a,
    rank_b), so the overlap curve X_i is one bounded count per depth.
    Each term is half-even-quantized at 1e-12 (O(1) magnitude — the
    ndcg gain/discount discipline: pow is the one transcendental) and
    summed in decimal(38,0); agreement_at_depth = X_d / d is an
    exact-int double ratio shipped unrounded.

    Scale (100 TB): both inputs must already be top-``depth``
    prefixes (build them with orderBy().limit(d) —
    TakeOrderedAndProject, never a corpus-wide row_number window); all
    joins here are depth-bounded (d x d at worst), executed as a
    broadcast nested loop over <= d rows per side.
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    ra = ranked_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    ).where(F.col("__ra") <= depth)
    rb = ranked_b.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__rb")
    ).where(F.col("__rb") <= depth)
    both = ra.join(rb, "__id").select(
        F.greatest("__ra", "__rb").alias("__m")
    )
    spark = ranked_a.sparkSession
    depths = spark.range(1, depth + 1).select(F.col("id").alias("__i"))
    x = (
        depths.join(
            F.broadcast(both), F.col("__m") <= F.col("__i"), "left"
        )
        .groupBy("__i")
        .agg(F.count("__m").alias("__x"))
    )
    term = F.round(
        F.bround(
            F.lit(1.0 - p)
            * F.pow(F.lit(p), F.col("__i").cast("double") - F.lit(1.0))
            * F.col("__x").cast("double")
            / F.col("__i").cast("double"),
            12,
        )
        * F.lit(1e12)
    ).cast("decimal(38,0)")
    return x.agg(
        F.max("__i").alias("depth"),
        F.coalesce(
            F.max(F.when(F.col("__i") == depth, F.col("__x"))), F.lit(0)
        ).alias("n_common"),
        (
            F.coalesce(
                F.max(F.when(F.col("__i") == depth, F.col("__x"))),
                F.lit(0),
            ).cast("double")
            / F.lit(float(depth))
        ).alias("agreement_at_depth"),
        (
            F.coalesce(
                F.sum(term), F.lit(0).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(1e12)
        ).alias("rbo"),
    )
