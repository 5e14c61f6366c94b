"""Training-shard export: deterministic packing-based shard assignment,
partition-pruned shard reads, and a manifest whose counts/checksums let a
loader verify a shard without trusting file names."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from alphavantage_etl_spark.plans.export import (
    verify_shard,
    with_shards,
    write_training_shards,
)
from alphavantage_etl_spark.sources import load

from .conftest import SF_SMALL


def test_write_training_shards_manifest_and_verify(spark, tmp_path):
    docs = load(spark, SF_SMALL, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, shard_tokens=5_000)

    # manifest totals equal corpus totals
    assert manifest["total_rows"] == docs.count()
    assert manifest["total_tokens"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert manifest["n_shards"] == len(manifest["shards"]) > 1
    # every shard except possibly the last of each source is budget-bounded
    # only loosely (a doc larger than the budget owns its bin) — but no
    # shard may be EMPTY
    assert all(s["rows"] > 0 for s in manifest["shards"])

    # physical layout: one directory per shard + _manifest.json, and the
    # manifest on disk round-trips
    dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
    assert len(dirs) == manifest["n_shards"]
    with open(os.path.join(path, "_manifest.json"), encoding="utf-8") as f:
        assert json.load(f) == manifest

    # loader-side verification passes for every shard...
    for s in manifest["shards"][:3]:
        assert verify_shard(spark, path, s["shard"])
    # ...and the shard read is partition-pruned (scan lists one directory)
    one = spark.read.parquet(path).where(
        F.col("shard") == manifest["shards"][0]["shard"]
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    # a tampered manifest fails verification
    bad = json.loads(json.dumps(manifest))
    bad["shards"][0]["checksum"] ^= 1
    assert not verify_shard(spark, path, bad["shards"][0]["shard"], manifest=bad)


def test_shard_assignment_is_stable_under_append(spark):
    """pack_bins packs by id order within source: appending NEW (higher-id)
    documents must not move any existing document to a different shard."""
    docs = load(spark, SF_SMALL, "documents")
    head = docs.where(F.col("doc_id") < 100)
    before = {
        r["doc_id"]: r["shard"]
        for r in with_shards(head, "doc_id", "source", "n_chars", 5_000).collect()
    }
    after = {
        r["doc_id"]: r["shard"]
        for r in with_shards(docs, "doc_id", "source", "n_chars", 5_000).collect()
    }
    assert all(after[i] == s for i, s in before.items())


def test_prepare_training_sequences_chunks_then_shards(spark, tmp_path):
    """Chunk-then-shard composition: long docs split into overlapping
    windows, token totals in the manifest count the sequences the trainer
    reads, shards verify via the standard loader check, and re-running is
    byte-deterministic."""
    from alphavantage_etl_spark.plans.export import (
        prepare_training_sequences,
        verify_shard,
    )
    from alphavantage_etl_spark.sources import load

    docs = load(spark, SF_SMALL, "documents")
    out = str(tmp_path / "seq_shards")
    man = prepare_training_sequences(
        docs, out, window=32, stride=24, shard_tokens=2_000
    )
    assert man["n_shards"] >= 1 and man["total_rows"] > 0
    seq = spark.read.parquet(out)
    # every document is represented and long docs produced several chunks
    n_docs = docs.count()
    assert seq.select("seq_id").distinct().count() == man["total_rows"]
    assert man["total_rows"] > n_docs  # overlap + chunking fan-out
    # manifest token totals equal what a trainer would re-count
    recount = seq.agg(F.sum("n_tokens")).collect()[0][0]
    assert int(recount) == man["total_tokens"]
    # one shard passes the loader-side integrity check
    assert verify_shard(
        spark, out, man["shards"][0]["shard"], man, id_col="seq_id"
    )
    # deterministic re-run: identical manifest
    man2 = prepare_training_sequences(
        docs, str(tmp_path / "seq_shards2"),
        window=32, stride=24, shard_tokens=2_000,
    )
    assert man2 == man
