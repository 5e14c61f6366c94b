"""Training-shard export: the last mile of the curation pipeline.

A curated corpus ships to trainers as fixed-token-budget SHARDS plus a
MANIFEST the training job trusts without re-scanning data: per-shard row
and token counts and an order-independent content checksum. The reference
has no export layer (its consumer is a report); this is the 100 TB
counterpart of `report.save` — the artifact a downstream system loads.

Design:

- Shard assignment is `operators.sampling.pack_bins` — deterministic,
  content-ordered, partition-parallel (never a global window); shard ids
  are (source, bin) composite keys flattened to a string.
- The physical layout is `partitionBy(shard)` parquet: one directory per
  shard, so a trainer reads shard N with partition pruning, and a resume
  after preemption re-lists one directory, not the corpus.
- The manifest is computed in the SAME job graph (one extra aggregate over
  the exported frame, not a post-hoc rescan) and written as a single JSON
  file next to the shards. The checksum is `bit_xor(xxhash64(id, text))`
  per shard: order-independent (shuffle- and task-retry-stable), cheap,
  and verifiable by any engine with xxhash64.
- Row-group sizing is the writer's `maxRecordsPerFile` escape hatch;
  byte-exact file sizing belongs to `sources.layout.compact_parquet`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import pack_bins


def with_shards(
    df: DataFrame,
    id_col: str,
    source_col: str,
    size_col: str,
    shard_tokens: int,
) -> DataFrame:
    """Assign every document a deterministic shard id:
    ``<source>-<bin>`` where bin packs ``size_col`` into ``shard_tokens``
    budgets in ``id_col`` order within the source (pack_bins semantics —
    appending new documents never reassigns old ones within a source)."""
    packed = pack_bins(df, source_col, id_col, size_col, shard_tokens)
    return packed.withColumn(
        "shard", F.concat_ws("-", F.col(source_col), F.col("bin").cast("string"))
    ).drop("bin")


def write_training_shards(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    size_col: str = "n_chars",
    shard_tokens: int = 100_000,
    max_records_per_file: int = 1_000_000,
) -> dict:
    """Write shard-partitioned parquet + ``_manifest.json``; returns the
    manifest dict.

    Two actions total: the partitioned write and one small aggregate for
    the manifest (shard count rows, not corpus rows). The manifest
    checksum lets a loader verify a shard it just read without trusting
    file names: recompute ``xor(xxhash64(id, text))`` over the rows and
    compare.
    """
    sharded = with_shards(df, id_col, source_col, size_col, shard_tokens)
    (
        sharded.repartition("shard")  # one task writes one shard directory
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(size_col).cast("long").alias("tokens"),
            F.bit_xor(F.xxhash64(id_col, text_col)).alias("checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "shard_tokens": shard_tokens,
        "n_shards": len(stats),
        "total_rows": int(sum(r["rows"] for r in stats)),
        "total_tokens": int(sum(r["tokens"] for r in stats)),
        "shards": [
            {
                "shard": r["shard"],
                "rows": int(r["rows"]),
                "tokens": int(r["tokens"]),
                "checksum": int(r["checksum"]),
            }
            for r in stats
        ],
    }
    # driver-side file write: fine for posix paths; on an object store the
    # manifest goes through the same FS client as the shards
    with open(os.path.join(path, "_manifest.json"), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def verify_shard(
    spark,
    path: str,
    shard: str,
    manifest: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> bool:
    """Loader-side integrity check: re-read ONE shard directory (partition
    pruning — the scan touches no other shard) and compare rows + checksum
    against the manifest. Returns True when they match."""
    if manifest is None:
        with open(os.path.join(path, "_manifest.json"), encoding="utf-8") as f:
            manifest = json.load(f)
    want = next(s for s in manifest["shards"] if s["shard"] == shard)
    got = (
        spark.read.parquet(path)
        .where(F.col("shard") == shard)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(F.xxhash64(id_col, text_col)).alias("checksum"),
        )
        .collect()[0]
    )
    return int(got["rows"]) == want["rows"] and int(got["checksum"]) == want["checksum"]


def prepare_training_sequences(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    window: int = 64,
    stride: int = 48,
    shard_tokens: int = 100_000,
) -> dict:
    """Chunk-then-shard: the long-document path into training shards.

    ``write_training_shards`` packs WHOLE documents; documents longer
    than the training context must first split into overlapping windows
    (X20 ``chunk_documents``) or the trainer truncates their tails away.
    This composition chunks every document, carries the source through
    for shard assignment, derives per-sequence token counts from the
    chunker itself (no re-tokenization), and ships the sequences through
    the standard shard writer — so the manifest's token totals count
    exactly what the trainer will consume.

    Sequence ids are ``<doc_id>-<chunk_idx>`` — content-addressed and
    append-stable: new documents mint new ids, re-chunking an unchanged
    document reproduces identical ids (same property pack_bins relies
    on for within-source stability). One corpus-sized shuffle total: the
    chunker adds none, the source join keys on the doc id, pack_bins
    partitions by source.
    """
    from ..operators.chunking import chunk_documents

    chunks = chunk_documents(
        docs.select(id_col, text_col), text_col, id_col,
        window=window, stride=stride,
    )
    seqs = (
        chunks.join(docs.select(id_col, source_col), on=id_col)
        .select(
            F.concat_ws(
                "-", F.col(id_col).cast("string"),
                F.col("chunk_idx").cast("string"),
            ).alias("seq_id"),
            F.col(source_col),
            F.col("n_tokens"),
            F.col("chunk_text").alias("text"),
        )
    )
    return write_training_shards(
        seqs,
        path,
        text_col="text",
        id_col="seq_id",
        source_col=source_col,
        size_col="n_tokens",
        shard_tokens=shard_tokens,
    )
