"""Deduplication operators for the training-data pipeline (X1/X2).

Exact dedup is a keyed aggregation; near-dup is hand-rolled MinHash+LSH in
pure DataFrame ops (shingle -> minhash signature -> band -> bucket join) —
no MLlib vector types, no UDFs, so the whole pipeline stays in codegen and
shuffles only (band_hash) keys at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, on: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic representative (min id) per key group.

    ``dropDuplicates`` keeps an *arbitrary* row — fine for semantics, wrong
    for reproducible pipelines and oracle checks; ``min_by`` pins the winner.
    One shuffle on the dedup key; at 100 TB prefer deduping on a 256-bit
    content fingerprint (functions.text.fingerprint_sha256) so the shuffle
    key is 32 bytes instead of the document body.
    """
    others = [c for c in df.columns if c not in on and c != id_col]
    return df.groupBy(*on).agg(
        F.min(id_col).alias(id_col),
        *[F.min_by(c, F.col(id_col)).alias(c) for c in others],
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    k: int = 5,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact character-k-gram Jaccard near-dup pairs within blocks.

    Shingles are the distinct lowercased k-grams AS STRINGS (not hashed) so
    the arithmetic is exactly set intersection / union — the verifier-stage
    complement to MinHash (which estimates this quantity): at 100 TB, run
    ``minhash_near_dups`` to generate candidates, then this on the candidate
    pairs; standalone, ``block_cols`` (e.g. language + length bucket — near
    dups rarely differ much in length) bounds the quadratic self-join to
    within-block pairs, keeping the shuffle keyed on the block columns.

    Output: (id_a, id_b, jaccard), id_a < id_b, jaccard >= threshold.
    Single int/int division -> bit-exact across engines.
    """
    c = F.lower(F.col(text_col))
    n = F.length(c)
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )
    sh = df.select(
        F.col(id_col).alias("__id"), *block_cols, shingles.alias("__sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col("a.__id") < F.col("b.__id")
    for bc in block_cols:
        cond = cond & (F.col(f"a.{bc}") == F.col(f"b.{bc}"))
    inter = F.size(F.array_intersect(F.col("a.__sh"), F.col("b.__sh")))
    union = F.size(F.col("a.__sh")) + F.size(F.col("b.__sh")) - inter
    return (
        a.join(b, cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _shingles(col, k: int):
    """Character k-gram shingle hashes of lowercased text, distinct."""
    c = F.lower(col)
    n = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.xxhash64(c.substr(i, F.lit(k)))))


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Per document: distinct k-gram shingle hashes; minhash_i = min over
    shingles of xxhash64(shingle, seed_i) — implemented as
    ``xxhash64(concat(shingle, i))`` re-hash, i.e. num_hashes independent
    permutation approximations. Signature split into ``bands`` bands of
    ``num_hashes/bands`` rows; documents sharing any band hash are
    candidates; candidates' exact signature agreement estimates Jaccard.

    Output: (id_a, id_b, est_jaccard) with id_a < id_b, est >= threshold.

    Scale: the only shuffle is on (band_id, band_hash) — 16 bytes per doc
    per band; candidate verification re-joins signatures by id. The full
    |D|^2 comparison never materializes. For a 100 TB corpus raise bands
    for recall or shingle_k for precision; the plan shape is unchanged.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    # All num_hashes minhashes in ONE aggregate pass: the accumulator is the
    # signature array, each shingle updates every lane via zip_with. The
    # shingle array is evaluated once per row (the naive per-lane aggregate
    # form re-derives shingles num_hashes times — Catalyst does not CSE
    # across lambda aggregates; measured 26s -> ~2s on 500 docs).
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = df.select(
        F.col(id_col).alias("__id"),
        F.aggregate(
            _shingles(F.col(text_col), shingle_k),
            F.array_repeat(F.lit(2**63 - 1).cast("long"), num_hashes),
            lambda acc, s: F.zip_with(acc, seeds, lambda a, i: F.least(a, F.xxhash64(s, i))),
        ).alias("__sig"),
    )

    banded = sig.select(
        "__id",
        "__sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("__id", "__sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sig").alias("sig_a"),
            F.col("b.__sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    est = cand.select(
        "id_a",
        "id_b",
        (
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda eq: eq,
                )
            )
            / F.lit(float(num_hashes))
        ).alias("est_jaccard"),
    )
    return est.where(F.col("est_jaccard") >= jaccard_threshold)
