"""Curation pipeline: each gate provably does its job on a corpus with
planted defects (low quality, short, exact dup, near dup), and the real
fixture corpus survives end-to-end with sane stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alphavantage_etl_spark.plans.curation import curate, curation_report
from alphavantage_etl_spark.sources import load

from .conftest import SF_SMALL

GOOD = (
    "the quick brown fox jumps over the lazy dog and it was a good day "
    "for the animals in the field because the sun was out and the wind "
    "was calm over the wide green valley near the old stone bridge"
)


@pytest.fixture(scope="module")
def planted(spark):
    near = GOOD.replace("stone bridge", "stone tower")  # near-dup of 1
    rows = [
        (1, GOOD),
        (2, GOOD),              # exact dup of 1 -> dropped
        (3, near),              # near-dup of 1, same quality-ish
        (4, "short text"),      # length gate
        (5, "!!! ??? *** " * 30),  # punctuation garbage -> quality gate
        (6, "the house and the tree and the dog were all by the river "
            "watching the boats go past in the warm light of a long "
            "afternoon that seemed to never end for anyone there"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_gates_drop_planted_defects(spark, planted):
    # min_quality 0.65: punctuation garbage scores ~0.6 (len_ok +
    # wordlen_ok floor), real prose ~0.9+ — the gate sits between
    out = curate(planted, min_quality=0.65, min_chars=100, jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 exact-dups to 1; 3 near-dups to 1 (lower quality, higher id);
    # 4 too short; 5 too punctuation-heavy; 1 and 6 survive
    assert kept == [1, 6]


@pytest.mark.slow
def test_curation_is_deterministic(spark, planted):
    a = sorted(r["doc_id"] for r in curate(planted).collect())
    b = sorted(r["doc_id"] for r in curate(planted).collect())
    assert a == b


@pytest.mark.slow
def test_cluster_resolution_collapses_transitive_chains(spark):
    # chain: A ~ B ~ C with jaccard(A,C) below the 0.6 bar (measured:
    # A-B 0.76, B-C 0.64, A-C 0.55) and B the LOWEST-quality member (the
    # punctuation tail), so pairwise resolution drops B twice and keeps
    # both endpoints, while cluster resolution keeps one per component.
    a = GOOD
    b = (
        GOOD.replace("stone bridge", "stone tower").replace("lazy dog", "lazy cat")
        + " !!! ??? !!!"
    )
    c = (
        GOOD.replace("stone bridge", "stone tower")
        .replace("lazy dog", "lazy cat")
        .replace("quick brown fox", "slow brown bear")
        .replace("good day", "fine day")
    )
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    pairwise = sorted(
        r["doc_id"]
        for r in curate(
            docs, min_quality=0.0, min_chars=10, jaccard_threshold=0.6
        ).collect()
    )
    clustered = sorted(
        r["doc_id"]
        for r in curate(
            docs, min_quality=0.0, min_chars=10, jaccard_threshold=0.6,
            resolution="cluster",
        ).collect()
    )
    # the policies must differ exactly on the chain endpoints: pairwise
    # keeps both ends of the A-B-C chain, cluster keeps one per component
    assert len(clustered) == 1
    assert len(pairwise) == 2
    assert set(clustered) <= set(pairwise)


def test_unknown_resolution_raises(spark, planted):
    with pytest.raises(ValueError, match="resolution"):
        curate(planted, resolution="majority")


@pytest.mark.slow
def test_fixture_corpus_end_to_end(spark):
    docs = load(spark, SF_SMALL, "documents")
    curated = curate(docs, min_quality=0.3, min_chars=50, jaccard_threshold=0.6)
    n_in, n_out = docs.count(), curated.count()
    assert 0 < n_out <= n_in
    report = curation_report(curated).collect()
    assert report
    for r in report:
        assert r["n_docs"] > 0
        assert r["total_tokens_bpe"] >= r["total_tokens_ws"] > 0
        assert 0.0 <= r["avg_quality"] <= 1.0


def test_compact_corpus_collapses_near_dups(spark, tmp_path, planted):
    from alphavantage_etl_spark.plans.curation import compact_corpus

    sink = str(tmp_path / "corpus")
    out = str(tmp_path / "corpus_compacted")
    # sink holds docs that PASSED a streaming exact-dedup ingest: distinct
    # texts, but docs 1 and 3 are near-dups of each other
    planted.where(F.col("doc_id").isin(1, 3, 6)).write.parquet(sink)

    n = compact_corpus(spark, sink, out, jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert n == 2
    # 1 vs 3: same quality class, higher-quality (or lower-id) survivor
    assert kept == [1, 6]
    # schema round-trips unchanged
    assert set(spark.read.parquet(out).columns) == set(planted.columns)


def test_compact_corpus_rejects_in_place(spark, tmp_path, planted):
    sink = str(tmp_path / "corpus2")
    planted.limit(1).write.parquet(sink)
    from alphavantage_etl_spark.plans.curation import compact_corpus

    with pytest.raises(ValueError, match="in-place"):
        compact_corpus(spark, sink, sink)


@pytest.mark.slow
def test_front_stages_scrub_and_deboilerplate(spark):
    """PII scrub + boilerplate removal run BEFORE scoring/dedup, so a
    shared banner neither makes distinct pages near-dups nor pads their
    text, and redaction survives into the curated output."""
    banner = "SUBSCRIBE TO OUR NEWSLETTER TODAY"
    other = (
        "meanwhile the harbor town woke slowly as fishermen hauled their "
        "nets onto the quay and traders argued about the price of salt "
        "while gulls wheeled over the gray water near the long pier"
    )
    rows = [
        (1, GOOD + "\n" + banner + "\ncontact me at jane.doe@example.com ok"),
        (2, other + "\n" + banner),
        (3, banner + "\n" + other.replace("price of salt", "cost of salt")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate(
        docs,
        min_quality=0.5,
        min_chars=100,
        jaccard_threshold=0.5,
        scrub=True,
        boilerplate_min_doc_frac=1.0,  # banner is in all 3 docs
    ).collect()
    by_id = {r["doc_id"]: r["text"] for r in out}
    # the banner is gone everywhere; the email was redacted before scoring
    assert all(banner not in t for t in by_id.values())
    assert 1 in by_id and "<EMAIL>" in by_id[1]
    assert "jane.doe@example.com" not in by_id.get(1, "")
    # docs 2 and 3 differ only by one word once the banner is dropped ->
    # genuine near-dups; exactly one of them survives
    assert sum(i in by_id for i in (2, 3)) == 1
    # without the front stages, the banner keeps 2 vs 3 further apart AND
    # doc texts keep raw PII — pin the contrast
    raw = {
        r["doc_id"]: r["text"]
        for r in curate(
            docs, min_quality=0.5, min_chars=100, jaccard_threshold=0.5
        ).collect()
    }
    assert any("jane.doe@example.com" in t for t in raw.values())


@pytest.mark.slow
def test_cluster_resolution_star_algorithm_equivalent(spark, planted):
    """cc_algorithm='star' must select the same representatives as the
    default propagation — the swap is a cost choice, not a semantic one."""
    a = sorted(
        r["doc_id"]
        for r in curate(
            planted, min_quality=0.65, jaccard_threshold=0.5,
            resolution="cluster",
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in curate(
            planted, min_quality=0.65, jaccard_threshold=0.5,
            resolution="cluster", cc_algorithm="star",
        ).collect()
    )
    assert a == b


@pytest.mark.slow
def test_cluster_resolution_survives_120_doc_revision_chain(spark):
    """No corpus shape can abort curation: 120 successive 'revisions'
    (sliding word windows — adjacent docs share ~0.68 Jaccard, two-apart
    ~0.43) form a path graph of diameter 119. Min-propagation hits its
    sweep cap there; the star fallback must finish the run and collapse
    the whole revision family to ONE representative."""
    n_docs, win, step = 120, 40, 8
    words = [f"w{j:04d}" for j in range(step * (n_docs - 1) + win)]
    rows = [
        (i, " ".join(words[i * step : i * step + win]))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate(
        docs, min_quality=0.0, min_chars=10, jaccard_threshold=0.6,
        resolution="cluster",
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    assert len(kept) == 1, kept


# ---------------------------------------------- end-to-end to shards
@pytest.mark.slow
def test_curate_to_shards_manifest_matches_duckdb(spark, tmp_path):
    """VERDICT r5 #7: the full curate -> decontaminate -> chunk -> pack
    -> shard-export composition, with the manifest cross-checked by a
    SECOND engine: DuckDB re-scans the written shard-partitioned parquet
    and must reproduce every per-shard row/token count and the totals.
    The checksums are verified by Spark re-reads (verify_shard) since
    xxhash64 is not portable to DuckDB."""
    import json
    import os

    import duckdb

    from alphavantage_etl_spark.plans.curation import curate_to_shards
    from alphavantage_etl_spark.plans.export import verify_shard
    from alphavantage_etl_spark.sources import load

    from .conftest import SF_ORACLE

    d = load(spark, SF_ORACLE, "documents").select(
        "doc_id", "text", "source"
    )
    bench = d.where(F.col("doc_id") % 47 == 0)
    corp = d.where(F.col("doc_id") % 47 != 0)
    out = str(tmp_path / "shards")
    manifest = curate_to_shards(
        corp,
        bench,
        out,
        contamination_threshold=0.25,
        chunk_window=64,
        chunk_stride=48,
        shard_tokens=5_000,
    )
    assert manifest["n_shards"] >= 2 and manifest["total_rows"] > 0
    assert os.path.exists(os.path.join(out, "_manifest.json"))
    with open(os.path.join(out, "_manifest.json")) as f:
        assert json.load(f) == manifest

    # DuckDB re-derives the per-shard stats from the physical files
    con = duckdb.connect()
    got = con.execute(
        f"""
        SELECT shard, count(*) AS rows, sum(n_tokens) AS tokens
        FROM read_parquet('{out}/*/*.parquet', hive_partitioning=1)
        GROUP BY shard ORDER BY shard
        """
    ).fetchall()
    want = [(s["shard"], s["rows"], s["tokens"]) for s in manifest["shards"]]
    assert [(r[0], int(r[1]), int(r[2])) for r in got] == want
    assert sum(r[1] for r in got) == manifest["total_rows"]
    assert int(sum(r[2] for r in got)) == manifest["total_tokens"]

    # spark-side integrity: every shard's checksum verifies
    for s in manifest["shards"]:
        assert verify_shard(
            spark, out, s["shard"], manifest,
            text_col="chunk_text", id_col="chunk_id",
        )

    # decontamination is live in the composition: planted containments
    # exist at this SF (q_contamination finds them), and none of the
    # surviving chunks' parent docs are contaminated
    from alphavantage_etl_spark.operators.contamination import (
        ngram_contamination,
    )

    hits = ngram_contamination(
        corp, bench, "text", "doc_id", k=8, threshold=0.25
    )
    hit_ids = {r["doc_id"] for r in hits.collect()}
    assert hit_ids, "fixture must plant at least one containment"
    exported = spark.read.parquet(out).select("chunk_id").collect()
    parent_ids = {int(r["chunk_id"].split(":")[0]) for r in exported}
    assert not (parent_ids & hit_ids)
