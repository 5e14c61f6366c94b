"""Bloom-filter semi-join pruning — cut the big side of a selective join
BEFORE the shuffle.

Reference scope: the reference (av_etl.py:161-185) joins its two series
eagerly in pandas; at 100 TB the binding cost of any selective join is
shuffling the big side. This operator builds a compact Bloom bitmap from
the small side's keys (bounded model state, like the IVF centroids /
LSH hyperplanes elsewhere in this repo), applies it as an in-plan literal
predicate on the big side — map-side, before any exchange — and then runs
the real semi-join on the survivors, so the result is EXACT regardless of
the bitmap's false-positive rate. Spark's own runtime bloom pushdown
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) does this within one
query; the explicit operator form additionally covers the cross-job case
(build once, reuse across many queries / incremental batches).

Scale design: the bitmap is ``num_bits`` wide (default 2^17 bits = 16 KiB
= 2048 longs) — independent of the big side's size and broadcast as a
plan literal, so the filter evaluates inside whole-stage codegen with no
join, no shuffle, and no Python. Build cost is one aggregation over the
small side grouped by bitmap word (at most 2048 groups). False-positive
rate at capacity n is ~(1 - e^{-kn/m})^k; with the defaults (m=131072,
k=5) that is < 1% up to ~13k keys — callers size num_bits to the dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_WORD_BITS = 64


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions per key: xxhash64 seeded by the probe index.

    xxhash64 is the engine's production hash family (same choice as
    minhash/simhash); the final semi-join makes the result exact, so no
    oracle-portable mirror is needed for the bitmap itself.
    """
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_filter_build(
    dim: DataFrame,
    key_col: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> list[int]:
    """Aggregate the small side's keys into a dense bitmap.

    Returns the bitmap as ``num_bits / 64`` longs — bounded model state
    (16 KiB at the default), the same driver-side budget class as
    `train_ivf_cells` centroids. One aggregation, grouped by bitmap word
    (<= num_bits/64 groups), so partial aggregation absorbs duplicate
    keys map-side.
    """
    if num_bits % _WORD_BITS != 0:
        raise ValueError("num_bits must be a multiple of 64")
    num_words = num_bits // _WORD_BITS
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes)))
    words = (
        dim.select(pos.alias("p"))
        .select(
            (F.col("p") / _WORD_BITS).cast("long").alias("w"),
            F.expr(f"shiftleft(1L, cast(p % {_WORD_BITS} as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .collect()
    )
    bitmap = [0] * num_words
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    bitmap: list[int], key: Column, num_hashes: int = 5
) -> Column:
    """Literal-bitmap membership test, evaluated in whole-stage codegen."""
    from ..functions.vectors import sql_array_lit

    num_bits = len(bitmap) * _WORD_BITS
    # ONE-round-trip literal: the default bitmap is 2048 words, and the
    # element-wise F.lit form cost ~1.2 s of driver py4j time per plan
    # construction (sql_array_lit rationale, r14)
    arr = sql_array_lit([int(w) for w in bitmap])
    cond = None
    for p in _positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (p / _WORD_BITS).cast("int") + 1)
        hit = F.bit_get(word, (p % _WORD_BITS).cast("int")) == 1
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter on the big side.

    Equivalent to ``fact SEMI JOIN dim`` for every bitmap: the bloom pass
    only removes rows that provably cannot match (no false negatives),
    and the closing semi-join removes the false positives. What the bloom
    buys at scale is that the removed fraction never enters the join's
    exchange — for a selective dim, that is most of the fact's bytes.
    """
    bitmap = bloom_filter_build(dim, dim_key, num_bits, num_hashes)
    pruned = fact.filter(
        bloom_might_contain(bitmap, F.col(fact_key), num_hashes)
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates()
    return pruned.join(keys, on=fact_key, how="left_semi")
