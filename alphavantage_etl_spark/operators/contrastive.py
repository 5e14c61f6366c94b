"""Contrastive-training data preparation: deterministic global shuffle
POSITIONS (two-phase distributed ranking — no single-partition window)
and negative sampling over the resulting ring, with near-duplicate
exclusion — the step that turns a deduplicated corpus + its similarity
structure into (anchor, negative) training pairs.

Reference scope: none in the reference ETL; extends the X11 sampling
family (epoch_shuffle orders rows; this MATERIALIZES each row's ordinal
so other rows can address it) and consumes X37/X50's pair structure as
the exclusion set.

Scale design (100 TB):
- `content_ranked_positions` is the distributed global-ranking pattern:
  the md5 shuffle key's FIRST BYTE is uniform by construction, so rows
  bucket evenly into 256 ranges whose counts form an exclusive prefix
  sum (a 256-row broadcast — bounded model state); each row's global
  position = bucket offset + intra-bucket row_number, a PARTITIONED
  window. No SinglePartition exchange anywhere, yet positions are
  exactly the dense 0..N-1 ranks of the total (key, id) order —
  partition-invariance and denseness pinned by test.
- `sample_negatives` walks the ring: anchor at position p takes
  candidates at (p + step_i) mod N for k+m deterministic co-prime-ish
  strides, joins them back BY POSITION (equi-join, no scan), drops
  self/excluded pairs, keeps the first k by stride order. Every join is
  key-partitioned; the exclusion anti-join is pair-table-sized. With m
  oversamples an anchor only under-fills if > m of its k+m probes hit
  exclusions — for sparse near-dup sets this is vanishing, and the
  under-fill is visible (fewer rows), never silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def content_ranked_positions(
    df: DataFrame, id_col: str, salt: str = "ring0"
) -> DataFrame:
    """(id, pos) — dense 0-based positions under the content-addressed
    total order ``(md5(salt ':' id), id)`` (the epoch_shuffle order,
    materialized). Deterministic on any engine and any partitioning."""
    key = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), key.alias("__k")).withColumn(
        "__b", F.conv(F.substring("__k", 1, 2), 16, 10).cast("int")
    )
    sizes = keyed.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    # exclusive prefix sum over <= 256 rows: bounded model state; the
    # window here runs over the SIZE table, not the data
    off = sizes.withColumn(
        "__off",
        F.coalesce(
            F.sum("__c").over(
                Window.orderBy("__b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__b", "__off")
    w = Window.partitionBy("__b").orderBy("__k", id_col)
    return (
        keyed.join(F.broadcast(off), on="__b")
        .withColumn(
            "pos",
            (F.row_number().over(w) - 1 + F.col("__off")).cast("long"),
        )
        .select(id_col, "pos")
    )


def sample_negatives(
    ids: DataFrame,
    id_col: str,
    k: int,
    exclusions: DataFrame | None = None,
    excl_a: str = "id_a",
    excl_b: str = "id_b",
    oversample: int = 3,
    salt: str = "ring0",
) -> DataFrame:
    """(anchor_id, negative_id, slot) — up to ``k`` deterministic
    negatives per anchor (slot 1..k in probe order), never the anchor
    itself and never a pair listed in ``exclusions`` (checked in BOTH
    orientations — pass near-dup pairs or same-cluster pairs so
    semantic duplicates cannot become "negatives")."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pos = content_ranked_positions(ids, id_col, salt)
    n = pos.agg(F.count(F.lit(1)).alias("__n"))
    probes = k + oversample
    # fixed odd multiplier strides spread probes over the ring; all
    # arithmetic stays in-plan against the broadcast N
    cand = (
        pos.crossJoin(F.broadcast(n))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col("pos"),
            F.col("__n"),
            F.explode(
                F.array(*[F.lit(i) for i in range(1, probes + 1)])
            ).alias("__i"),
        )
        .select(
            "anchor_id",
            "__i",
            (
                (F.col("pos") + F.col("__i") * F.lit(2654435761))
                % F.col("__n")
            ).alias("pos"),
        )
    )
    tgt = pos.select(
        F.col(id_col).alias("negative_id"), F.col("pos")
    )
    paired = (
        cand.join(tgt, on="pos")
        .where(F.col("negative_id") != F.col("anchor_id"))
        # two strides can land on the same ring position for small N —
        # collapse duplicates to their earliest probe so no negative is
        # ever emitted twice for one anchor
        .groupBy("anchor_id", "negative_id")
        .agg(F.min("__i").alias("__i"))
    )
    if exclusions is not None:
        sym = exclusions.select(
            F.col(excl_a).alias("anchor_id"),
            F.col(excl_b).alias("negative_id"),
        ).unionByName(
            exclusions.select(
                F.col(excl_b).alias("anchor_id"),
                F.col(excl_a).alias("negative_id"),
            )
        )
        paired = paired.join(
            sym, on=["anchor_id", "negative_id"], how="anti"
        )
    w = Window.partitionBy("anchor_id").orderBy("__i")
    return (
        paired.withColumn("slot", F.row_number().over(w).cast("long"))
        .where(F.col("slot") <= k)
        .select("anchor_id", "negative_id", "slot")
    )
