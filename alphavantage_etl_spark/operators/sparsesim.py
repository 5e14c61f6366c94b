"""Sparse TF-IDF cosine retrieval — term-partitioned top-k document
similarity, the inverted-index path to text similarity.

Reference scope: the dense ANN family (operators/similarity.py: brute /
LSH / IVF / PQ) assumes an embedding column; this is the complementary
retrieval mode when all you have is text — weight terms by TF-IDF, score
candidates through the shared-term join, rank by cosine. At web scale
this is how first-stage lexical retrieval actually runs (posting-list
intersection), and it reuses the TF-IDF machinery (operators/tfidf.py)
verbatim.

Scale design (100 TB):
- Weights build on `term_counts`/`doc_frequency`: the only corpus-sized
  shuffle keys on (doc, term); the DF join is AQE's choice (broadcast
  iff the vocabulary fits).
- The query vector is ONE document's terms (bounded by that document's
  vocabulary); joining it into the weight table by term touches only
  postings of terms the query contains — candidates materialize from the
  join, never from a corpus scan. Hot stopword terms are the same skew
  key as in TF-IDF (AQE skew split; a `max_df` stopword screen upstream
  bounds them structurally).
- Exactness discipline: weights are half-even-rounded to 1e-6 and
  quantized to integer units BEFORE any summation (the lm.py pattern),
  so dots and squared norms are exact integer sums; one final
  fixed-order double expression (`dot / sqrt(n2_doc * n2_query)`) and a
  1e-9 half-even round make the ranking cross-engine bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .tfidf import doc_frequency, term_counts

_WQ = 6  # weight quantization decimals


def tfidf_weights_quantized(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, term, wq): TF-IDF weights as exact 1e-6 integer units."""
    tf = term_counts(docs, text_col, id_col)
    dfreq = doc_frequency(tf, id_col)
    n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("__n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(
                F.bround(F.col("tf") * F.log(F.col("__n") / F.col("df")), _WQ)
                * F.lit(10.0**_WQ)
            )
            .cast("long")
            .alias("wq"),
        )
    )


def sparse_tfidf_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents by TF-IDF cosine similarity to ``query_id``
    (the query document itself is excluded). Ties break on the id.
    Returns (id, sim) with sim half-even-rounded to 1e-9.
    """
    w = tfidf_weights_quantized(docs, id_col, text_col)
    qvec = w.filter(F.col(id_col) == query_id).select(
        "term", F.col("wq").alias("__qwq")
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.col("wq") * F.col("wq")).alias("__n2")
    )
    qnorm = norms.filter(F.col(id_col) == query_id).select(
        F.col("__n2").alias("__qn2")
    )
    dots = (
        w.join(qvec, on="term")
        .filter(F.col(id_col) != query_id)
        .groupBy(id_col)
        .agg(F.sum(F.col("wq") * F.col("__qwq")).alias("__dot"))
    )
    sim = (
        dots.join(norms, on=id_col)
        .crossJoin(F.broadcast(qnorm))
        .select(
            id_col,
            F.bround(
                F.col("__dot").cast("double")
                / F.sqrt(
                    F.col("__n2").cast("double") * F.col("__qn2").cast("double")
                ),
                9,
            ).alias("sim"),
        )
    )
    return sim.orderBy(F.desc("sim"), F.col(id_col)).limit(k)


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score against the DISTINCT terms of
    document ``query_id`` (the query doc itself excluded; ties on id) —
    the production first-stage ranking function (Lucene/Elasticsearch
    default), complementing `sparse_tfidf_topk`'s cosine: BM25 saturates
    term frequency (k1) and normalizes by document length (b), which
    cosine's raw tf weighting does not.

    Scoring: ``sum over shared terms of idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*dl/avgdl))`` with the Robertson positive idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Determinism: tf/df/dl/N are exact integers; idf and the saturation
    part combine in ONE fixed-order double expression per (doc, shared
    term), half-even-quantized to 1e-12 and summed as exact
    decimal(38,0) (fold-order-immune); final score = sum/1e12, ranked
    under a total (score, id) order.

    Scale design: identical to `sparse_tfidf_topk` — candidates come
    from the query terms' postings via the shared-term join, never a
    corpus scan; doc lengths and (N, avgdl) are one aggregate each,
    vocabulary/corpus-bounded; hot stopword terms are the same AQE skew
    key, structurally bounded by an upstream `max_df` screen.
    """
    tf = term_counts(docs, text_col, id_col)
    dfreq = doc_frequency(tf, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sdl"),
    )
    qterms = tf.filter(F.col(id_col) == query_id).select("term").distinct()
    n_d = F.col("__n").cast("double")
    avgdl = F.col("__sdl").cast("double") / n_d
    idf = F.log(
        F.lit(1.0)
        + (n_d - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("__dl").cast("double")
    sat = (tf_d * F.lit(k1 + 1.0)) / (
        tf_d
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * (dl_d / avgdl))
    )
    qt = F.lit(10.0**12)
    term_score = F.round(F.bround(idf * sat, 12) * qt).cast("decimal(38,0)")
    scored = (
        tf.join(qterms, on="term")
        .filter(F.col(id_col) != query_id)
        .join(dfreq, on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(term_score).alias("__s"))
        .select(
            id_col,
            (F.col("__s").cast("double") / qt).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    id_col: str,
    k_rrf: int = 60,
    score_a: str | None = None,
    score_b: str | None = None,
) -> DataFrame:
    """(id, rrf_score, rank_a, rank_b): reciprocal-rank fusion of two
    ranked retrieval lists — THE standard hybrid-search combiner
    (Cormack et al., SIGIR 2009): ``sum over lists of 1/(k + rank)``,
    which needs no score calibration between rankers whose scales are
    incomparable (BM25 lexical vs dense cosine — exactly the two paths
    this engine ships). Items missing from a list contribute nothing
    for it; ranks break score ties on the id, so fusion is fully
    deterministic and the arithmetic is a fixed-order sum of exact
    int-ratio doubles — engine-identical unrounded.

    Both inputs must carry (id, score). Name the score columns via
    ``score_a`` / ``score_b``; when omitted, the input must have
    EXACTLY the two columns (id, score) — anything wider raises instead
    of silently ranking by whichever extra column happened to come
    first (r5 ADVICE). The global rank windows run over the TOP-K
    LISTS — bounded model-state-sized inputs by construction (the
    head-bounded window class), never the corpus.
    """
    from pyspark.sql import Window

    def ranked(df: DataFrame, name: str, score: str | None) -> DataFrame:
        if score is None:
            others = [c for c in df.columns if c != id_col]
            if id_col not in df.columns or len(others) != 1:
                raise ValueError(
                    f"rrf_fuse: cannot infer the score column for "
                    f"'{name}' from columns {df.columns}; expected "
                    f"exactly ('{id_col}', <score>) or an explicit "
                    f"score_a/score_b"
                )
            score = others[0]
        elif score not in df.columns:
            raise ValueError(
                f"rrf_fuse: score column '{score}' not in {df.columns}"
            )
        w = Window.orderBy(F.desc(score), F.col(id_col))
        return df.select(
            id_col, F.row_number().over(w).cast("long").alias(name)
        )

    ra = ranked(rank_a, "rank_a", score_a)
    rb = ranked(rank_b, "rank_b", score_b)
    kk = F.lit(float(k_rrf))

    def contrib(c: str):
        return F.when(
            F.col(c).isNotNull(), F.lit(1.0) / (kk + F.col(c))
        ).otherwise(F.lit(0.0))

    return (
        ra.join(rb, id_col, "full")
        .select(
            id_col,
            (contrib("rank_a") + contrib("rank_b")).alias("rrf_score"),
            "rank_a",
            "rank_b",
        )
    )
