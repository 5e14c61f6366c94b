"""Web-corpus provenance + privacy operators (X119-X124, X126): URL
canonicalization, domain caps (doc-count and token-budget), license/
robots gate, URL dedup, k-anonymity audit.

The contract queries pin the oracle-level hashes; these tests pin the
operator-level semantics on hand-built rows (every canonicalization rule
individually) and the scale properties of domain_caps (candidate pruning
actually prunes; the exactness guard raises on an engineered shortfall).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from alphavantage_etl_spark.operators.provenance import (
    canonicalize_urls,
    domain_caps,
    license_gate,
    token_budget_per_domain,
)


def _canon(spark, url: str) -> Row:
    df = spark.createDataFrame([Row(url=url)])
    return canonicalize_urls(df, "url").select(
        "canon_url", "host", "domain", "scheme"
    ).first()


def test_canon_lowercases_scheme_and_host(spark):
    r = _canon(spark, "HTTPS://WWW.News.Example.COM/Path")
    assert r.scheme == "https"
    assert r.host == "news.example.com"
    assert r.canon_url == "https://news.example.com/Path"  # path case kept


def test_canon_strips_default_ports_and_www(spark):
    assert _canon(spark, "http://www.a.example.com:80/x").host == "a.example.com"
    assert _canon(spark, "https://a.example.com:443/x").host == "a.example.com"
    # non-default port is kept
    assert _canon(spark, "https://a.example.com:8443/x").host == "a.example.com:8443"
    # only the scheme's OWN default port is a default: http://h:443 and
    # https://h:80 are different resources from the portless forms
    assert _canon(spark, "http://a.example.com:443/x").host == "a.example.com:443"
    assert _canon(spark, "https://a.example.com:80/x").host == "a.example.com:80"


def test_canon_strips_fragment_and_trailing_slash(spark):
    r = _canon(spark, "https://a.example.com/p/q/#sec2")
    assert r.canon_url == "https://a.example.com/p/q"
    # root path collapses to bare authority
    assert _canon(spark, "https://a.example.com/").canon_url == "https://a.example.com"


def test_canon_drops_utm_params_only(spark):
    assert (
        _canon(spark, "https://a.example.com/p?utm_source=f&ref=en").canon_url
        == "https://a.example.com/p?ref=en"
    )
    assert (
        _canon(spark, "https://a.example.com/p?id=5&utm_campaign=x").canon_url
        == "https://a.example.com/p?id=5"
    )
    assert (
        _canon(spark, "https://a.example.com/p?utm_a=1&utm_b=2").canon_url
        == "https://a.example.com/p"
    )
    # anchored to a parameter boundary: a param CONTAINING 'utm_' is not
    # a tracking param and must survive untouched
    assert (
        _canon(spark, "https://a.example.com/p?xutm_a=1&b=2").canon_url
        == "https://a.example.com/p?xutm_a=1&b=2"
    )
    # a consecutive run of utm params collapses in one pass, and a
    # non-utm param between runs survives
    assert (
        _canon(
            spark, "https://a.example.com/p?utm_a=1&utm_b=2&c=3&utm_d=4"
        ).canon_url
        == "https://a.example.com/p?c=3"
    )


def test_canon_registrable_domain(spark):
    assert _canon(spark, "https://deep.sub.example.co/x").domain == "example.co"
    assert _canon(spark, "https://example.org/x").domain == "example.org"


def test_domain_caps_exact_and_stable(spark):
    # 3 domains: big (30 rows, over cap), edge (exactly cap), small
    rows = (
        [Row(doc_id=i, domain="big.com") for i in range(30)]
        + [Row(doc_id=100 + i, domain="edge.com") for i in range(5)]
        + [Row(doc_id=200, domain="small.com")]
    )
    df = spark.createDataFrame(rows)
    out = domain_caps(df, "domain", "doc_id", cap=5, slack=8.0)
    got = {r.domain: r for r in out.groupBy("domain").agg(
        F.count(F.lit(1)).alias("k"), F.max("n_total").alias("n")
    ).collect()}
    assert got["big.com"].k == 5 and got["big.com"].n == 30
    assert got["edge.com"].k == 5 and got["edge.com"].n == 5
    assert got["small.com"].k == 1 and got["small.com"].n == 1
    # content-addressed: kept set for the big domain is unchanged when
    # unrelated rows are added (growth stability) — md5 rank is per-row
    kept1 = {r.doc_id for r in out.where(F.col("domain") == "big.com").collect()}
    grown = spark.createDataFrame(
        rows + [Row(doc_id=300 + i, domain="other.com") for i in range(10)]
    )
    out2 = domain_caps(grown, "domain", "doc_id", cap=5, slack=8.0)
    kept2 = {r.doc_id for r in out2.where(F.col("domain") == "big.com").collect()}
    assert kept1 == kept2


def test_domain_caps_prunes_candidates(spark):
    """The hash threshold must actually bound the window input: with a
    4096-row domain and cap=8, candidates reaching the window should be
    ~slack*cap, not the whole domain."""
    df = spark.createDataFrame([Row(doc_id=i, domain="hot.com") for i in range(4096)])
    capped = domain_caps(df, "domain", "doc_id", cap=8, slack=4.0)
    assert capped.count() == 8
    # re-derive the threshold's candidate count independently: the plan
    # filters __k < ceil(slack*cap/n * 16^15) before the window
    from alphavantage_etl_spark.operators.provenance import _KEY_SPACE

    thr = int(-(-4.0 * 8 / 4096 * _KEY_SPACE // 1))
    h = F.md5(F.concat_ws(":", F.lit("dcap"), F.col("domain"), F.col("doc_id").cast("string")))
    k = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    n_cand = df.where(k < thr).count()
    assert n_cand < 4096 // 8  # pruned far below the domain size
    assert n_cand >= 8  # but enough for exactness


def test_domain_caps_guard_raises_on_shortfall(spark):
    """Engineered partial pruning shortfall must raise via the in-plan
    assert, never silently return fewer rows. The md5 rank key is
    engine-portable, so the test precomputes keys in Python and builds a
    domain whose ids are almost all ABOVE the prune threshold — only 3
    candidates survive against cap=10 — making the shortfall
    deterministic instead of a 2^-something lottery."""
    import hashlib

    from alphavantage_etl_spark.operators.provenance import _KEY_SPACE

    def key(i: int) -> int:
        h = hashlib.md5(f"dcap:hot.com:{i}".encode()).hexdigest()
        return int(h[:15], 16)

    # threshold for n=2000, cap=10, slack=2.0 -> 1% of the key space;
    # select with a wide margin so float-rounding of the in-plan ceil()
    # cannot flip a row across the boundary
    thr = int(2.0 * 10 / 2000 * _KEY_SPACE)
    margin = 10**9
    high, low = [], []
    i = 0
    while len(high) < 1997 or len(low) < 3:
        k = key(i)
        if k >= thr + margin and len(high) < 1997:
            high.append(i)
        elif k < thr - margin and len(low) < 3:
            low.append(i)
        i += 1
    df = spark.createDataFrame(
        [Row(doc_id=i, domain="hot.com") for i in high + low]
    )
    bad = domain_caps(df, "domain", "doc_id", cap=10, slack=2.0)
    with pytest.raises(Exception) as ei:
        bad.count()
    assert "shortfall" in str(ei.value)


def test_domain_caps_rejects_bad_params(spark):
    df = spark.createDataFrame([Row(doc_id=1, domain="a.com")])
    with pytest.raises(ValueError):
        domain_caps(df, "domain", "doc_id", cap=0)
    with pytest.raises(ValueError):
        # slack below the zero-candidate guard floor
        domain_caps(df, "domain", "doc_id", cap=5, slack=0.5)


def _budget_oracle(rows, budget, salt="tbudget"):
    """Reference implementation: full hash-order cumsum per domain."""
    import hashlib
    from collections import defaultdict

    by_dom = defaultdict(list)
    for r in rows:
        h = hashlib.md5(f"{salt}:{r.domain}:{r.doc_id}".encode()).hexdigest()
        by_dom[r.domain].append((h, r.doc_id, r.tokens))
    kept = set()
    for dom, items in by_dom.items():
        items.sort()
        cum = 0
        for h, doc_id, tok in items:
            if cum < budget:
                kept.add(doc_id)
            cum += tok
    return kept


def test_token_budget_matches_reference(spark):
    rows = [
        Row(doc_id=i, domain=("big.com" if i % 3 else "small.org"), tokens=50 + 37 * (i % 11))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows)
    out = token_budget_per_domain(
        df, "domain", "doc_id", "tokens", budget=800, slack=8.0
    )
    got = {r.doc_id for r in out.collect()}
    assert got == _budget_oracle(rows, 800)
    # every non-empty domain contributes at least one row (soft cap)
    assert {r.domain for r in out.select("domain").distinct().collect()} == {
        "big.com",
        "small.org",
    }


def test_token_budget_under_budget_domain_keeps_all(spark):
    rows = [Row(doc_id=i, domain="tiny.org", tokens=10) for i in range(5)]
    out = token_budget_per_domain(
        spark.createDataFrame(rows), "domain", "doc_id", "tokens", budget=10_000
    )
    assert out.count() == 5
    r = out.first()
    assert r.n_total == 5 and r.tok_total == 50


def test_token_budget_guard_raises_on_shortfall(spark):
    """Deterministic engineered shortfall, same construction as the
    domain_caps test: nearly all ids hash ABOVE the prune threshold, and
    the few below it carry too few tokens to reach the budget — the
    in-plan sufficiency assert must raise."""
    import hashlib

    from alphavantage_etl_spark.operators.provenance import _KEY_SPACE

    def key(i: int) -> int:
        h = hashlib.md5(f"tbudget:hot.com:{i}".encode()).hexdigest()
        return int(h[:15], 16)

    budget = 1000
    tokens = 10  # per doc; 2000 docs -> tok_total = 20000
    # mirror the operator's capped-token prefix-row estimate:
    # est_rows = ceil(n * budget / sum(min(tokens, budget)));
    # thr = ceil(slack * (est_rows + 4) / n * KEY_SPACE)
    n_docs = 2000
    est_rows = -(-n_docs * budget // (n_docs * tokens))
    thr = int(2.0 * (est_rows + 4) / n_docs * _KEY_SPACE)
    margin = 10**9
    high, low = [], []
    i = 0
    while len(high) < 1998 or len(low) < 2:
        k = key(i)
        if k >= thr + margin and len(high) < 1998:
            high.append(i)
        elif k < thr - margin and len(low) < 2:
            low.append(i)
        i += 1
    df = spark.createDataFrame(
        [Row(doc_id=i, domain="hot.com", tokens=tokens) for i in high + low]
    )
    bad = token_budget_per_domain(
        df, "domain", "doc_id", "tokens", budget=budget, slack=2.0
    )
    with pytest.raises(Exception) as ei:
        bad.count()
    assert "shortfall" in str(ei.value)


def test_token_budget_rejects_bad_params(spark):
    df = spark.createDataFrame([Row(doc_id=1, domain="a.com", tokens=5)])
    with pytest.raises(ValueError):
        token_budget_per_domain(df, "domain", "doc_id", "tokens", budget=0)
    with pytest.raises(ValueError):
        token_budget_per_domain(
            df, "domain", "doc_id", "tokens", budget=10, slack=1.0
        )


def test_license_gate_filters(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, license="cc-by", robots_noai=False),
            Row(doc_id=2, license="cc-by", robots_noai=True),
            Row(doc_id=3, license="all-rights-reserved", robots_noai=False),
            Row(doc_id=4, license="cc0", robots_noai=False),
        ]
    )
    kept = {
        r.doc_id
        for r in license_gate(
            df, "license", ["cc-by", "cc0"], robots_col="robots_noai"
        ).collect()
    }
    assert kept == {1, 4}
    # without a robots column, only the license list gates
    kept2 = {r.doc_id for r in license_gate(df, "license", ["cc-by"]).collect()}
    assert kept2 == {1, 2}


def test_url_dedup_keeps_best_variant(spark):
    rows = [
        # three variants of one page: scheme case, www, port, fragment
        Row(doc_id=1, url="https://www.a.example.com/p", n_chars=100),
        Row(doc_id=2, url="HTTPS://a.example.com:443/p#x", n_chars=300),
        Row(doc_id=3, url="https://a.example.com/p/", n_chars=300),
        # a different page on the same host
        Row(doc_id=4, url="https://a.example.com/q", n_chars=50),
    ]
    from alphavantage_etl_spark.operators.provenance import url_dedup

    out = {
        r.canon_url: r
        for r in url_dedup(
            spark.createDataFrame(rows), "url", "n_chars", "doc_id"
        ).collect()
    }
    assert set(out) == {"https://a.example.com/p", "https://a.example.com/q"}
    kept = out["https://a.example.com/p"]
    # longest wins; tie (2 vs 3, both 300 chars) broken by smaller doc_id
    assert kept.doc_id == 2 and kept.n_chars == 300 and kept.n_variants == 3
    assert out["https://a.example.com/q"].doc_id == 4


def test_over_cap_domains(spark):
    from alphavantage_etl_spark.operators.provenance import over_cap_domains

    rows = (
        [Row(domain="big.com", tokens=10)] * 30
        + [Row(domain="fat.org", tokens=5000)] * 2
        + [Row(domain="ok.net", tokens=10)] * 3
    )
    df = spark.createDataFrame(
        [Row(doc_id=i, **r.asDict()) for i, r in enumerate(rows)]
    )
    got = {
        r.domain: (r.n_docs, r.tokens)
        for r in over_cap_domains(df, "domain", "tokens", 20, 8000).collect()
    }
    assert got == {"big.com": (30, 300), "fat.org": (2, 10000)}


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    from alphavantage_etl_spark.sources import load

    return load(spark, "/root/testdata/sf0.001", "documents")


def test_canonicalize_plan_no_shuffle_no_python(spark):
    """X119 is a pure projection: it must add NO Exchange and stay
    JVM-side (regex expressions, not Python UDFs)."""
    d = _docs(spark).select(
        "doc_id", F.concat(F.lit("https://www.a.example.com/p/"), F.col("doc_id").cast("string")).alias("url")
    )
    plan = _plan(canonicalize_urls(d, "url"))
    assert "Exchange" not in plan, plan[:2000]
    assert "Python" not in plan, plan[:2000]


def test_domain_caps_plan_shape(spark):
    """X120's scale contract in the physical plan: the corpus-side work
    shuffles ONLY on the domain key (counts agg + candidate window; AQE
    may reuse one exchange), the counts join is PLANNER-CHOSEN broadcast
    at this size (no forced hint — at web-scale |domains| AQE degrades
    it to a shuffle join instead of OOMing), and nothing funnels through
    a single partition."""
    d = _docs(spark).select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.org")).alias("domain"),
    )
    plan = _plan(domain_caps(d, "domain", "doc_id", cap=5))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "Exchange SinglePartition" not in plan, plan[:3000]
    assert "Python" not in plan, plan[:3000]


def test_token_budget_plan_shape(spark):
    d = _docs(spark).select(
        "doc_id",
        F.col("n_chars").alias("tokens"),
        F.concat(F.col("source"), F.lit(".example.org")).alias("domain"),
    )
    plan = _plan(
        token_budget_per_domain(d, "domain", "doc_id", "tokens", budget=5000)
    )
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "Exchange SinglePartition" not in plan, plan[:3000]
    assert "Python" not in plan, plan[:3000]


def test_url_dedup_plan_single_key_shuffle_no_window(spark):
    """X123 must be ONE hash shuffle on the canonical key with map-side
    partial aggregation — no window, no sort, no join."""
    from alphavantage_etl_spark.operators.provenance import url_dedup

    d = _docs(spark).select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("https://a.example.com/p/"),
            (F.col("doc_id") % 10).cast("string"),
        ).alias("url"),
    )
    plan = _plan(url_dedup(d, "url", "n_chars", "doc_id"))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    # map-side partial aggregation below the exchange (struct max_by is
    # not hash-aggregable, so Spark plans a SortAggregate pair)
    assert "partial_max_by" in plan, plan


def test_license_gate_filter_pushes_to_scan(spark):
    """X121 on a real column must reach the parquet scan as a pushed
    filter (predicate pushdown — the 100 TB contract)."""
    d = _docs(spark).select("doc_id", "lang", "source")
    gated = license_gate(d, "lang", ["en", "de"])
    plan = _plan(gated)
    assert "Exchange" not in plan, plan[:2000]
    assert "PushedFilters: [" in plan and "In(lang" in plan, plan[:2000]


def test_k_anonymity_audit(spark):
    from alphavantage_etl_spark.operators.privacy import k_anonymity_audit

    rows = (
        [Row(lang="en", src="a")] * 5
        + [Row(lang="en", src="b")] * 2
        + [Row(lang=None, src="a")] * 1
    )
    df = spark.createDataFrame(
        [Row(doc_id=i, **r.asDict()) for i, r in enumerate(rows)]
    )
    got = {
        (r.lang, r.src): (r.class_size, r.deficit)
        for r in k_anonymity_audit(df, ["lang", "src"], k=3).collect()
    }
    # the k-sized class is absent; small classes report their deficit;
    # the NULL-lang row forms its own audited class
    assert got == {("en", "b"): (2, 1), (None, "a"): (1, 2)}
    with pytest.raises(ValueError):
        k_anonymity_audit(df, ["lang"], k=1)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=3)


def test_k_anonymity_plan_single_key_shuffle(spark):
    from alphavantage_etl_spark.operators.privacy import k_anonymity_audit

    d = _docs(spark).select("lang", "source")
    plan = _plan(k_anonymity_audit(d, ["lang", "source"], k=5))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.index("partial_count") > plan.index("Exchange"), plan


def test_domain_caps_null_domains_capped_not_dropped(spark):
    """NULL domains must flow through (sentinel-keyed) and be capped as
    one unattributed bucket — a plain inner join on the domain key would
    silently drop them (the r8 cusum NULL-ts class)."""
    rows = [Row(doc_id=i, domain=None) for i in range(20)] + [
        Row(doc_id=100 + i, domain="a.com") for i in range(3)
    ]
    out = domain_caps(
        spark.createDataFrame(
            rows, "doc_id long, domain string"
        ),
        "domain",
        "doc_id",
        cap=5,
        slack=8.0,
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    assert len(by_dom[None]) == 5  # capped, not dropped
    assert all(r.n_total == 20 for r in by_dom[None])
    assert len(by_dom["a.com"]) == 3


def test_token_budget_null_domains_budgeted_not_dropped(spark):
    out = token_budget_per_domain(
        spark.createDataFrame(
            [Row(doc_id=i, domain=None, tokens=40) for i in range(10)],
            "doc_id long, domain string, tokens long",
        ),
        "domain",
        "doc_id",
        "tokens",
        budget=100,
        slack=8.0,
    ).collect()
    # 40+40 < 100 <= 40*3: the crossing (3rd) doc is included, then stop
    assert len(out) == 3
    assert all(r.domain is None and r.tok_total == 400 for r in out)


def test_url_dedup_unparseable_urls_pass_through(spark):
    """NULL and garbage URLs are not address-dedupable: each passes
    through alone with canon_url NULL — never collapsed into one
    survivor via the shared '://' husk."""
    from alphavantage_etl_spark.operators.provenance import url_dedup

    rows = [
        Row(doc_id=1, url=None, n_chars=10),
        Row(doc_id=2, url="not a url", n_chars=20),
        Row(doc_id=3, url="also-garbage", n_chars=30),
        Row(doc_id=4, url="https://a.example.com/p", n_chars=40),
        Row(doc_id=5, url="HTTPS://a.example.com:443/p", n_chars=50),
    ]
    out = url_dedup(
        spark.createDataFrame(rows, "doc_id long, url string, n_chars long"),
        "url",
        "n_chars",
        "doc_id",
    ).collect()
    null_rows = sorted(r.doc_id for r in out if r.canon_url is None)
    assert null_rows == [1, 2, 3]  # all pass through, one row each
    assert all(r.n_variants == 1 for r in out if r.canon_url is None)
    real = [r for r in out if r.canon_url == "https://a.example.com/p"]
    assert len(real) == 1 and real[0].doc_id == 5 and real[0].n_variants == 2


def test_license_gate_null_is_fail_closed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, license="cc-by", robots_noai=False),
            Row(doc_id=2, license=None, robots_noai=False),
            Row(doc_id=3, license="cc-by", robots_noai=None),
        ],
        "doc_id long, license string, robots_noai boolean",
    )
    kept = {
        r.doc_id
        for r in license_gate(
            df, "license", ["cc-by"], robots_col="robots_noai"
        ).collect()
    }
    assert kept == {1}  # unknown license / unknown robots -> dropped


def test_latest_snapshots_semantics(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.provenance import latest_snapshots

    d = dt.date
    rows = [
        # page A: four captures, two share the newest date
        Row(doc_id=1, page="A", snap=d(2025, 1, 1)),
        Row(doc_id=2, page="A", snap=d(2025, 1, 5)),
        Row(doc_id=3, page="A", snap=d(2025, 1, 5)),
        Row(doc_id=4, page="A", snap=d(2025, 1, 3)),
        # page B: one capture, undated
        Row(doc_id=5, page="B", snap=None),
        # page C: dated + undated — the undated one must not displace
        Row(doc_id=6, page="C", snap=d(2025, 1, 2)),
        Row(doc_id=7, page="C", snap=None),
        # NULL key: sentinel-grouped, not dropped
        Row(doc_id=8, page=None, snap=d(2025, 1, 4)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, page string, snap date")
    out = latest_snapshots(df, "page", "snap", "doc_id", k=2)
    got = {
        (r.page, r.doc_id): r.n_snapshots for r in out.collect()
    }
    # A: the two 01-05 captures win; same-date tie -> larger id first,
    # but BOTH fit within k=2
    assert {k for k in got if k[0] == "A"} == {("A", 2), ("A", 3)}
    assert got[("A", 2)] == 4
    assert ("B", 5) in got and got[("B", 5)] == 1
    # C: dated capture ranks before the undated one; both fit k=2
    assert {k for k in got if k[0] == "C"} == {("C", 6), ("C", 7)}
    assert ("None_key", 0) not in got and (None, 8) in got
    with pytest.raises(ValueError):
        latest_snapshots(df, "page", "snap", "doc_id", k=0)


def test_latest_snapshots_k1_prefers_dated_then_later_id(spark):
    import datetime as dt

    from alphavantage_etl_spark.operators.provenance import latest_snapshots

    d = dt.date
    df = spark.createDataFrame(
        [
            Row(doc_id=1, page="C", snap=d(2025, 1, 2)),
            Row(doc_id=9, page="C", snap=None),
            Row(doc_id=3, page="D", snap=d(2025, 1, 2)),
            Row(doc_id=4, page="D", snap=d(2025, 1, 2)),
        ],
        "doc_id long, page string, snap date",
    )
    got = {
        r.page: r.doc_id
        for r in latest_snapshots(df, "page", "snap", "doc_id", k=1).collect()
    }
    assert got == {"C": 1, "D": 4}  # dated beats undated; later id on tie
