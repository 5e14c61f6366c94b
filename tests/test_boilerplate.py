"""Boilerplate segment removal + PII scrubbing semantics pins (X14/X15).

The contract sweep (test_contract_queries) oracle-checks both against
DuckDB on the fixture; here the SEMANTICS are pinned on literal frames —
planted repeated lines, normalization of the count key only, the
empty-document contract, and each PII pattern's hit/miss boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from alphavantage_etl_spark.functions.text import scrub_pii
from alphavantage_etl_spark.operators.boilerplate import remove_boilerplate


def _docs(spark):
    rows = [
        (1, "unique opening\nCOOKIE NOTICE\nreal content one\nfooter (c) corp"),
        (2, "cookie notice\nreal content two\nfooter (c) corp"),
        (3, "Cookie Notice\nanother thought\nfooter (c) corp"),
        (4, "footer (c) corp\nfooter (c) corp"),  # repeated within ONE doc
        (5, ""),  # empty document
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_boilerplate_drops_recurring_lines_keeps_order(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            _docs(spark), "text", "doc_id", delim="\n", min_docs=3,
            normalize=True,
        ).collect()
    }
    # 'cookie notice' (normalized) in docs 1,2,3 and 'footer (c) corp' in
    # 1,2,3,4 -> both boilerplate at min_docs=3; original order kept
    assert out[1]["text"] == "unique opening\nreal content one"
    assert out[2]["text"] == "real content two"
    assert out[3]["text"] == "another thought"
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (2, 2)
    # within-doc repetition counts ONE distinct doc: both copies removed
    # only because other docs repeat the line too
    assert out[4]["text"] == "" and out[4]["n_removed"] == 2
    # empty doc survives with zero counts (dropping is caller policy)
    assert (out[5]["text"], out[5]["n_kept"], out[5]["n_removed"]) == ("", 0, 0)
    # row parity: one output row per input document, always
    assert len(out) == 5


def test_remove_boilerplate_normalization_affects_key_not_text(spark):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate(
            _docs(spark), "text", "doc_id", delim="\n", min_docs=3,
            normalize=False,
        ).collect()
    }
    # without normalization the three cookie-notice spellings differ ->
    # not boilerplate; the byte-identical footer still is
    assert out[1] == "unique opening\nCOOKIE NOTICE\nreal content one"
    assert out[3] == "Cookie Notice\nanother thought"


def test_remove_boilerplate_fractional_threshold(spark):
    # frac 0.5 over 5 docs -> ceil(2.5) = 3, same as min_docs=3
    a = remove_boilerplate(
        _docs(spark), "text", "doc_id", delim="\n", min_docs=3, normalize=True
    )
    b = remove_boilerplate(
        _docs(spark), "text", "doc_id", delim="\n", min_doc_frac=0.5,
        normalize=True,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_scrub_pii_patterns(spark):
    cases = [
        # (input, expected)
        ("mail a.b%x+1@foo.bar.co end", "mail <EMAIL> end"),
        ("call 415-555-0123 or 415 555 0123 now", "call <PHONE> or <PHONE> now"),
        ("host 10.0.255.1 up", "host <IP> up"),
        # version strings are NOT IPs (\b guards both ends)
        ("pkg v1.2.3.4 ok", "pkg v1.2.3.4 ok"),
        # short digit runs are not phones
        ("room 555-01 floor 12-34-5678x", "room 555-01 floor 12-34-5678x"),
        # placeholders are digit-free: later patterns cannot re-match
        ("a@b.io 415-555-0123 10.1.1.1", "<EMAIL> <PHONE> <IP>"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, s, want) for i, (s, want) in enumerate(cases)],
        "i long, s string, want string",
    )
    got = df.select("i", scrub_pii("s").alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"], f"case {r['i']}: {r['got']!r}"


def test_rep_ngram_ratio_known_values(spark):
    from alphavantage_etl_spark.functions.text import rep_ngram_ratio

    cases = [
        (0, "a b a b a", 0.5),          # grams: ab ba ab ba -> 2/4 dupes
        (1, "all words differ here", 0.0),
        (2, "x x x x", 2 / 3),          # xx xx xx -> 1 distinct of 3
        (3, "one", 0.0),                # fewer than n tokens
        (4, "", 0.0),
        (5, None, 0.0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "i long, t string"
    )
    got = {
        r["i"]: r["rep"]
        for r in df.select("i", rep_ngram_ratio("t", 2).alias("rep")).collect()
    }
    for i, _t, want in cases:
        assert got[i] == round(want, 6), (i, got[i], want)


def test_edit_distance_near_dups_blocking(spark):
    from alphavantage_etl_spark.operators.dedup import edit_distance_near_dups

    rows = [
        (1, "customer data report 2024"),
        (2, "customer data report 2025"),   # suffix edit -> prefix block
        (3, "Xustomer data report 2024"),   # prefix edit -> suffix block
        (4, "completely different title"),
        (5, "CUSTOMER DATA REPORT 2024"),   # case-only: dist 0 after lower
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_near_dups(
            df, "title", "doc_id", max_dist=2, block_prefix=8
        ).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 5)] == 0
    assert got[(2, 5)] == 1 and got[(3, 5)] == 1
    # 2 vs 3: edits at BOTH ends, combined dist 2 — caught? prefix keys
    # differ AND suffix keys differ -> blocked out (the documented miss
    # requires edits at both ends; assert the behavior is stable)
    assert (2, 3) not in got
    assert all(4 not in pair for pair in got)

    # the optional positional middle-q-gram key closes exactly that miss:
    # the both-ends pair's middle is untouched, so a centered-gram offset
    # pair collides and the pair reaches exact verification
    with_mid = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_near_dups(
            df, "title", "doc_id", max_dist=2, block_prefix=8, qgram_block=6
        ).collect()
    }
    assert with_mid[(2, 3)] == 2
    # supersets the default keys' pairs; still no false positives
    assert set(got) <= set(with_mid)
    assert all(4 not in pair for pair in with_mid)


def test_edit_distance_qgram_key_survives_length_shift(spark):
    """Indel at the front shifts the middle alignment; the ±max_dist
    offset fan-out must still collide for a both-ends pair whose lengths
    differ (delete in prefix + substitute in suffix)."""
    from alphavantage_etl_spark.operators.dedup import edit_distance_near_dups

    rows = [
        (1, "abcdefgh 0123456789 stuvwxyz"),
        # drop 'a' (prefix delete) and substitute the last char (suffix
        # sub): dist 2, edits at both ends, lengths differ by 1
        (2, "bcdefgh 0123456789 stuvwxyq"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    base = edit_distance_near_dups(df, "title", "doc_id", max_dist=2).collect()
    assert base == []  # both default keys miss
    got = edit_distance_near_dups(
        df, "title", "doc_id", max_dist=2, qgram_block=6
    ).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(1, 2, 2)]


def _cdc_embed_fixture(spark):
    """Doc 2 embeds doc 1's FULL text inside ~3x unrelated prose: the
    canonical partial-overlap case — whole-doc Jaccard ~0.25, far under
    any near-dup bar, while every interior chunk of doc 1 recurs in 2."""
    import random

    rng = random.Random(7)
    words = lambda n, tag: " ".join(  # noqa: E731
        f"{tag}{rng.randint(0, 9999):04d}" for _ in range(n)
    )
    short = words(120, "core")
    long_host = f"{words(200, 'pre')} {short} {words(200, 'post')}"
    other = words(320, "noise")
    return spark.createDataFrame(
        [(1, short), (2, long_host), (3, other)], "doc_id long, text string"
    )


def test_cdc_overlap_catches_embedded_document(spark):
    from alphavantage_etl_spark.operators.dedup import (
        cdc_overlap_pairs,
        minhash_verified_near_dups,
    )

    docs = _cdc_embed_fixture(spark)
    # whole-document near-dup machinery misses the containment pair
    nd = minhash_verified_near_dups(
        docs, "text", "doc_id", shingle_k=9, bands=16,
        candidate_threshold=0.2, jaccard_threshold=0.4,
    ).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in nd)
    # CDC chunk overlap finds it, in both hash modes, and never pairs the
    # unrelated doc
    for portable in (False, True):
        got = cdc_overlap_pairs(
            docs, "text", "doc_id", portable_hash=portable
        ).collect()
        pairs = {(r["id_a"], r["id_b"]): r["shared_chunks"] for r in got}
        assert (1, 2) in pairs and pairs[(1, 2)] >= 2, (portable, pairs)
        assert all(3 not in p for p in pairs)


def test_cdc_chunks_are_position_independent(spark):
    """The CDC property itself: shifting a block's position changes none
    of its interior chunk hashes (fixed-stride chunking breaks here)."""
    from alphavantage_etl_spark.operators.dedup import cdc_chunk_hashes

    import random

    rng = random.Random(11)
    block = " ".join(f"blk{rng.randint(0, 9999):04d}" for _ in range(150))
    pre_a = " ".join(f"a{rng.randint(0, 9999):04d}" for _ in range(37))
    pre_b = " ".join(f"b{rng.randint(0, 9999):04d}" for _ in range(113))
    docs = spark.createDataFrame(
        [(1, f"{pre_a} {block}"), (2, f"{pre_b} {block}")],
        "doc_id long, text string",
    )
    ch = cdc_chunk_hashes(docs, "text", "doc_id").collect()
    by_doc: dict[int, set] = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], set()).add(r["chunk_hash"])
    shared = by_doc[1] & by_doc[2]
    # the block is ~150 words ≈ 1300 chars ≈ ~20 chunks at density 64;
    # all interior chunks must coincide despite different offsets
    assert len(shared) >= 5, (len(by_doc[1]), len(by_doc[2]), len(shared))


# ------------------------------------------------- repeated-block dedup
def test_block_dedup_drops_later_repetition_keeps_first(spark):
    from alphavantage_etl_spark.operators.dedup import dedup_repeated_blocks

    para = " ".join(f"w{i}" for i in range(8))  # exactly one block
    docs = spark.createDataFrame(
        [
            (1, para + " " + " ".join(f"a{i}" for i in range(8))),
            (2, " ".join(f"b{i}" for i in range(8)) + " " + para),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_repeated_blocks(
        docs, "doc_id", "text", block=8).collect()}
    assert out[1]["n_blocks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_blocks"] == 2 and out[2]["n_kept"] == 1
    assert para in out[1]["text_dedup"]
    assert para not in out[2]["text_dedup"]
    assert out[2]["text_dedup"] == " ".join(f"b{i}" for i in range(8))


def test_block_dedup_fully_duplicated_doc_keeps_empty_row(spark):
    from alphavantage_etl_spark.operators.dedup import dedup_repeated_blocks

    text = " ".join(f"t{i}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_repeated_blocks(
        docs, "doc_id", "text", block=8).collect()}
    assert out[1]["text_dedup"] == text
    assert out[2]["text_dedup"] == "" and out[2]["n_kept"] == 0
    assert out[2]["n_blocks"] == 2  # provenance:original size still reported


def test_block_dedup_no_duplicates_is_identity(spark):
    from alphavantage_etl_spark.operators.dedup import dedup_repeated_blocks

    docs = spark.createDataFrame(
        [(i, " ".join(f"u{i}x{j}" for j in range(13))) for i in range(5)],
        "doc_id long, text string",
    )
    out = dedup_repeated_blocks(docs, "doc_id", "text", block=8).collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert r["text_dedup"] == orig[r["doc_id"]]  # disjoint blocks rejoin losslessly
        assert r["n_kept"] == r["n_blocks"]


def test_block_dedup_partitioning_invariant(spark):
    from alphavantage_etl_spark.operators.dedup import dedup_repeated_blocks

    rows = [(i, " ".join(f"w{(i * 5 + j) % 40}" for j in range(20)))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(dedup_repeated_blocks(docs, "doc_id", "text").collect())
    b = sorted(dedup_repeated_blocks(
        docs.repartition(7, "doc_id"), "doc_id", "text").collect())
    assert a == b
