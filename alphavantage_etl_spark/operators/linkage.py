"""Fuzzy record linkage across two tables — blocked candidate
generation + edit-distance scoring + best-match selection, the entity-
resolution counterpart of the WITHIN-corpus near-dup family: match a
dirty feed (scraped vendors, OCR'd invoices, user-typed merchants)
against a clean master table without an exact key.

Reference scope: none in the reference ETL; extends X2's blocked
edit-distance dedup (operators/dedup.py:edit_distance_near_dups) from
self-join dedup to a two-table join.

Scale design (100 TB):
- NEVER all-pairs: candidates come from equality joins on cheap
  blocking keys — the lowercase name PREFIX and SUFFIX (two keys, the
  dedup double-blocking pattern: an edit inside one key still matches
  on the other). Shuffles only on block keys.
- Hot blocks are CAPPED (``max_block`` per side): a degenerate key
  ("Customer#..." prefixes, empty strings, "LLC") would otherwise mint
  |L_b| x |R_b| candidates; capped blocks are dropped from THAT key
  (the other key usually still covers the pair) — the LSH hot-bucket /
  edit-distance block-skew trade, applied per side before the join so
  the quadratic never materializes.
- Scoring runs on candidates only: JVM `levenshtein`, normalized to
  ``1 - dist/max(len)``; best-match-per-left via one row_number window
  over the candidate set (candidate-sized, not corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def linkage_join(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    name_left: str,
    name_right: str,
    block: int = 4,
    max_block: int = 100,
    threshold: float = 0.8,
) -> DataFrame:
    """(id_left, id_right, name_sim) — at most ONE row per left record:
    its best right-side match with normalized edit similarity
    ``1 - levenshtein/max(len) >= threshold`` (ties broken on the right
    id, so the match is deterministic).

    Blocking: candidates share the first ``block`` chars OR the last
    ``block`` chars of the lowercased trimmed name; blocks with more
    than ``max_block`` members ON EITHER SIDE are dropped for that key.
    A pair edited in BOTH its prefix and suffix evades blocking — the
    documented recall trade (see edit_distance_near_dups' optional
    q-gram third key for the closing move).
    """
    ln = F.lower(F.trim(F.col(name_left)))
    rn = F.lower(F.trim(F.col(name_right)))
    lf = left.select(
        F.col(id_left).alias("__il"), ln.alias("__nl")
    )
    rf = right.select(
        F.col(id_right).alias("__ir"), rn.alias("__nr")
    )

    def _keys(df: DataFrame, name: str, ident: str) -> DataFrame:
        # left/right (not substring with negative start): identical
        # shorter-than-block semantics in Spark and DuckDB — the whole
        # string becomes the key
        n = F.col(name)
        pre = F.left(n, F.lit(block))
        suf = F.right(n, F.lit(block))
        keyed = df.select(
            ident, name, F.explode(F.array(
                F.concat(F.lit("p:"), pre), F.concat(F.lit("s:"), suf)
            )).alias("__k")
        ).distinct()  # prefix == suffix (short names) would double-pair
        sizes = keyed.groupBy("__k").agg(F.count(F.lit(1)).alias("__c"))
        hot = sizes.where(F.col("__c") > max_block).select("__k")
        return keyed.join(hot, on="__k", how="anti")

    lc = _keys(lf, "__nl", "__il")
    rc = _keys(rf, "__nr", "__ir")
    cand = (
        lc.join(rc, on="__k")
        .select("__il", "__nl", "__ir", "__nr")
        .distinct()  # a pair may share both keys; score it once
    )
    sim = (
        F.lit(1.0)
        - F.levenshtein("__nl", "__nr").cast("double")
        / F.greatest(F.length("__nl"), F.length("__nr")).cast("double")
    )
    scored = cand.select(
        "__il", "__ir", F.bround(sim, 6).alias("name_sim")
    ).where(F.col("name_sim") >= threshold)
    w = Window.partitionBy("__il").orderBy(
        F.desc("name_sim"), F.col("__ir")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(
            F.col("__il").alias(id_left),
            F.col("__ir").alias(id_right),
            "name_sim",
        )
    )
