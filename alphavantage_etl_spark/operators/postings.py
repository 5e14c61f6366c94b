"""Inverted-index build: term -> document-frequency + capped postings.

Reference scope: none in the reference; this is the retrieval-side
companion to the TF-IDF corpus stats (operators/tfidf.py) — the physical
artifact a term-lookup service reads.

Scale design (100 TB): one explode + per-doc distinct + one hash
aggregation — two Exchanges total (the distinct and the groupBy share the
(term, doc) vs (term) keys; AQE coalesces). The postings list per term is
CAPPED in-plan (`slice` after `sort_array`), so no term — however common —
materializes an unbounded array in an aggregation buffer beyond the
collected set; production corpora additionally route the Zipf head
through `remove_boilerplate` / stopword screens before indexing, and the
``min_df``/``max_df`` gates here bound both tails. Postings are sorted
ascending, making the artifact deterministic, mergeable, and delta-
friendly (new docs append monotonically increasing ids).

The cap-after-collect on a hot term is the same bounded-hot-key trade as
the LSH hot-bucket cap (operators/dedup.py); for an uncapped production
index, shard the postings by `doc_id % n_shards` into multiple rows per
term (noted, not needed for the contract shape).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, functions as F


def build_inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df: int | None = None,
    postings_cap: int = 10,
    delimiter: str = " ",
) -> DataFrame:
    """Return (term, df, postings) where ``df`` counts DISTINCT documents
    containing the term and ``postings`` is the first ``postings_cap``
    document ids in ascending order, comma-joined (a deterministic,
    engine-portable rendering of the capped posting list)."""
    pairs = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.col(text_col), _re.escape(delimiter))
            ).alias("term"),
        )
        .dropDuplicates(["doc_id", "term"])
    )
    agg = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.slice(F.sort_array(F.collect_set("doc_id")), 1, postings_cap),
            ",",
        ).alias("postings"),
    )
    out = agg.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out
