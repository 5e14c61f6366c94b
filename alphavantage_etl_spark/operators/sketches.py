"""Frequency sketches: exact heavy hitters and a count-min sketch.

Reference scope: no sketching in the 613-LoC reference; this extends the
engine's approximate-aggregation family (HLL distinct, GK quantiles —
queries.py q_distinct_sketch / q_quantile_sketch) with the frequency
dimension: "what are the most common terms, and how common", the corpus
statistic behind stopword lists, vocabulary builds, and boilerplate
candidate screens.

Scale design (100 TB):
- ``topk_terms`` is the exact form: one explode + one hash aggregation
  (partial map-side combine absorbs the Zipf head before the shuffle,
  so the exchange carries |vocabulary| rows, not |tokens|), then a
  TakeOrderedAndProject for the top k — no full sort.
- ``count_min_sketch`` is the mergeable-summary form for when even
  |vocabulary| is too wide to shuffle or the stat must be maintained
  incrementally: a (depth x width) grid of counters, built with ONE
  aggregation whose group count is bounded by depth*width — independent
  of corpus size — and union-mergeable across batches by summing cells
  (count-min sketches merge by cell-wise addition). Estimates are biased
  high by construction: est(t) = min_i grid[i][h_i(t)] satisfies
  true <= est <= true + (e/width)*N with probability 1 - e^-depth.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame, functions as F


def explode_terms(df: DataFrame, text_col: str, delimiter: str = " ") -> DataFrame:
    """One row per token occurrence (column ``term``); the delimiter is
    literal (escaped before the regex-taking split)."""
    return df.select(
        F.explode(
            F.split(F.col(text_col), _re.escape(delimiter))
        ).alias("term")
    )


def _positions(term: Column, depth: int, width: int) -> Column:
    """The sketch's cell addressing, shared by build (count_min_sketch)
    and probe (cm_estimate): both sides MUST hash identically or the
    no-undercount guarantee silently breaks — one definition makes that
    invariant structural."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), term), F.lit(width))
            for i in range(depth)
        ]
    )


def topk_terms(
    df: DataFrame, text_col: str, k: int = 20, delimiter: str = " "
) -> DataFrame:
    """Exact top-k most frequent terms; ties broken lexically (ascending)
    so the result is deterministic and oracle-replayable."""
    counts = (
        explode_terms(df, text_col, delimiter)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    return counts.orderBy(F.desc("occurrences"), F.asc("term")).limit(k)


def count_min_sketch(
    df: DataFrame,
    text_col: str,
    depth: int = 4,
    width: int = 2048,
    delimiter: str = " ",
) -> DataFrame:
    """Build the (depth x width) counter grid as a DataFrame of at most
    depth*width rows ``(row, bucket, cnt)`` — a mergeable partial
    aggregate (merge two sketches by unioning and summing cells)."""
    terms = explode_terms(df, text_col, delimiter)
    cells = terms.select(
        F.posexplode(_positions(F.col("term"), depth, width)).alias(
            "row", "bucket"
        )
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for each candidate term: min over the depth
    rows of the addressed cells. The join's left side is the candidate
    list (small — broadcast by AQE), the right side the bounded grid."""
    probes = candidates.select(
        term_col,
        F.posexplode(_positions(F.col(term_col), depth, width)).alias(
            "row", "bucket"
        ),
    )
    return (
        probes.join(sketch, on=["row", "bucket"], how="left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )
