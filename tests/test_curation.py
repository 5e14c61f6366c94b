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


def test_gates_drop_planted_defects(spark, planted):
    # min_quality 0.65: punctuation garbage scores ~0.6 (len_ok +
    # wordlen_ok floor), real prose ~0.9+ — the gate sits between
    out = curate(planted, min_quality=0.65, min_chars=100, jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in out.collect())
    # 2 exact-dups to 1; 3 near-dups to 1 (lower quality, higher id);
    # 4 too short; 5 too punctuation-heavy; 1 and 6 survive
    assert kept == [1, 6]


def test_curation_is_deterministic(spark, planted):
    a = sorted(r["doc_id"] for r in curate(planted).collect())
    b = sorted(r["doc_id"] for r in curate(planted).collect())
    assert a == b


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
