"""Web-corpus provenance operators (X119-X125, X127): URL
canonicalization, registrable-domain caps (doc-count and token-budget
forms), URL-level dedup, recrawl snapshot retention, over-cap
governance view, and license/robots gating.

The standard curation rules a web-scale training corpus applies before
mixing: normalize each document's URL so duplicates-by-address collapse,
keep one best doc per address and only the freshest captures per page,
cap how much any single registrable domain may contribute — by document
count or by token budget (the rules that stop SEO farms from dominating
a mix), and drop documents whose license tag or robots directive forbids
training use.

No reference analogue (the reference is a market-data ETL with no
provenance surface); these follow the repo-wide discipline: built-in
Catalyst expressions only (no UDFs), bounded-key shuffles, broadcast
joins on provably small sides, and content-addressed determinism so
every operator is oracle-checkable in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 16^15: exclusive upper bound of the 15-hex-digit numeric rank-key space
# (fits in a signed 64-bit long; 16^16 would not).
_KEY_SPACE = 16**15

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$"


def canonical_url(url: Column):
    """Canonical form of ``url`` as (canon_url, host, domain, scheme)
    columns, computed with Catalyst regex/string expressions only.

    Rules (each one a plain regex both Java and RE2 accept — no
    lookbehind — so the same algorithm is expressible verbatim in the
    DuckDB oracle):
      1. strip the fragment (``#...``);
      2. lowercase the scheme and the host;
      3. drop the scheme's OWN default port (``:80`` for http, ``:443``
         for https — ``http://h:443/`` is a different resource from
         ``http://h/`` and keeps its port) and a leading ``www.``;
      4. drop tracking query params (``utm_*``), tidying separators;
         the match is anchored to a parameter boundary (a run of
         ``utm_*&`` params immediately after ``?``/``&``, plus a tail
         rule), so a param that merely CONTAINS ``utm_`` (e.g.
         ``xutm_a=1``) is never mangled;
      5. strip trailing ``/`` from the end of the URL (so ``/path/`` and
         ``/path`` collapse; a trailing slash *before* a query string is
         part of the path and kept);
      6. registrable domain = last two host labels (a public-suffix list
         is a deployment-time swap; two labels is the fixture-safe rule).

    Pure projection: no shuffle, survives any partitioning, and at 100 TB
    runs fused into the scan stage.
    """
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME, 1))
    hostport = F.lower(F.regexp_extract(nofrag, _HOSTPORT, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(nofrag, _REST, 1)
    rest = F.regexp_replace(rest, r"([?&])(utm_[^&?#]*&)+", "$1")
    rest = F.regexp_replace(rest, r"[?&]utm_[^&?#]*$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    canon = F.concat(scheme, F.lit("://"), host, rest)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return canon, host, domain, scheme


def canonicalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Add ``canon_url``, ``host``, ``domain``, ``scheme`` derived from
    ``url_col`` (see :func:`canonical_url` for the rules)."""
    canon, host, domain, scheme = canonical_url(F.col(url_col))
    return (
        df.withColumn("canon_url", canon)
        .withColumn("host", host)
        .withColumn("domain", domain)
        .withColumn("scheme", scheme)
    )


def domain_caps(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt: str = "dcap",
    slack: float = 4.0,
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, selected deterministically by
    content-addressed hash rank — the "no more than N docs per registrable
    domain" curation rule. Adds ``n_total`` (the domain's pre-cap count).

    Which rows survive is content-addressed (``md5(salt:domain:id)``
    ascending, id tiebreak), so the selection is stable under corpus
    growth for rows already present, reproducible by any engine, and
    oracle-checkable as a plain ``row_number()`` in SQL.

    Scale design — exact top-``cap`` per domain WITHOUT sorting whole
    domains: a hot domain at 100 TB can hold 10^9 rows, and a naive
    ``row_number() OVER (PARTITION BY domain)`` sorts all of them in one
    task. Instead:
      1. one domain-key agg -> per-domain counts (output bounded at
         |domains|; joined back with NO broadcast hint — |domains| grows
         with the corpus, so the planner/AQE picks broadcast while it
         fits and degrades to a shuffle join at web scale);
      2. candidate pruning: the rank key is uniform on [0, 16^15), so the
         true ``cap`` smallest keys of an n-row domain all lie below the
         ``slack*cap/n`` quantile with overwhelming probability — filter
         to that threshold first, leaving ~``slack*cap`` expected
         candidates per over-cap domain (under-cap domains pass a
         threshold of 1.0, i.e. unfiltered);
      3. the row_number window then sorts only candidates: per-domain
         window input is O(slack*cap), independent of domain size.

    Exactness guard: a same-window candidate count is asserted
    ``>= least(cap, n_total)`` in-plan (``assert_true`` raises at action
    time), so a pruning shortfall fails loudly instead of silently
    returning fewer rows. A per-row assert cannot fire on an EMPTY
    candidate set, so every domain keeps a structural survivor: the
    domain's minimum rank key is computed in the same totals agg and
    OR-ed into the candidate filter (``__k == __min_k``). The min-key
    row is the first row of the hash order, so the candidate set stays
    downward-closed (selection stays exact), every non-empty domain
    carries at least one row for the assert to ride on, and a prune
    that removes needed rows always RAISES instead of silently
    returning fewer. ``slack`` stays floored at 2 so the loud-failure
    event itself is exponentially rare (< e^{-2*cap}).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if slack < 2.0:
        raise ValueError(
            f"slack must be >= 2 (prune-shortfall rarity floor), got {slack}"
        )
    # NULL domains: a plain inner join on the domain key would DROP them
    # silently (NULL never equals NULL). Group them under a NUL sentinel
    # instead — hostnames cannot contain "\x00" — so the unattributed
    # bucket is capped like any other domain; the output keeps the
    # original NULL in the domain column.
    base = df.withColumn(
        "__dk", F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00"))
    )
    rid = F.col(id_col)
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col("__dk"), rid.cast("string")))
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    base = base.withColumn("__h", h).withColumn("__k", key)

    counts = base.groupBy("__dk").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.min("__k").alias("__min_k"),
    )
    thr = F.when(F.col("n_total") <= cap, F.lit(_KEY_SPACE)).otherwise(
        F.ceil(F.lit(float(slack * cap)) / F.col("n_total") * _KEY_SPACE).cast(
            "long"
        )
    )
    counts = counts.withColumn("__thr", thr)

    # No broadcast hint: |domains| is bounded but not fixed-size (a
    # web-scale corpus holds 10^7-10^8 registrable domains), so the
    # planner/AQE picks the strategy — broadcast while the totals fit,
    # graceful shuffle join when they outgrow it (the X7 rule).
    cand = base.join(counts, "__dk").where(
        (F.col("__k") < F.col("__thr")) | (F.col("__k") == F.col("__min_k"))
    )
    w = Window.partitionBy("__dk")
    ordered = w.orderBy("__h", id_col)
    cand = cand.withColumn("__rn", F.row_number().over(ordered)).withColumn(
        "__cand_n", F.count(F.lit(1)).over(w)
    )
    guarded = cand.where(
        F.assert_true(
            F.col("__cand_n") >= F.least(F.lit(cap), F.col("n_total")),
            F.lit(
                f"domain_caps: hash-prune shortfall (slack={slack}); "
                "raise slack for this cap"
            ),
        ).isNull()
        & (F.col("__rn") <= cap)
    )
    return guarded.drop(
        "__dk", "__h", "__k", "__thr", "__min_k", "__rn", "__cand_n"
    )


def token_budget_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "tbudget",
    slack: float = 4.0,
) -> DataFrame:
    """Keep each domain's rows in content-addressed hash order until the
    domain's token ``budget`` is reached — the token-denominated sibling
    of :func:`domain_caps` (a mix is budgeted in tokens, and doc-count
    caps under-constrain domains full of long documents). A row is kept
    iff the token sum of the rows BEFORE it (hash order, id tiebreak) is
    still under budget, so the crossing row is included (soft cap: every
    non-empty domain contributes at least one row; guarantees progress
    and is the rule a greedy packer applies). Adds ``n_total`` and
    ``tok_total`` (the domain's pre-cap totals).

    Scale design mirrors :func:`domain_caps` — no whole-domain sorts:
      1. one domain-key agg -> (count, token sum, BUDGET-CAPPED token
         sum) per domain, joined back (no broadcast hint — planner/AQE
         chooses);
      2. candidate pruning at the ``slack * (est_prefix_rows + 4) / n``
         key-space quantile, where ``est_prefix_rows = ceil(n * budget
         / sum(min(tokens, budget)))``. The CAP matters: a raw-average
         estimate (``budget/avg_tokens`` rows) collapses under
         heavy-tailed tokens — one giant document inflates the average
         while the true kept prefix is made of small-token rows (a
         Hypothesis-found r10 falsifier: docs of 1 and 18 tokens,
         budget 2 — the 1-token doc is half the true prefix but the
         average said 0.2 rows). Capping each doc's contribution at
         ``budget`` bounds the distortion any single document can
         cause, so the capped average UNDER-states per-row progress
         and the row estimate over-states the prefix — conservative in
         the direction that matters. Expected candidates stay
         ``O(slack * budget/typical_tokens)``, independent of domain
         size; under-budget domains pass a threshold of 1.0;
      3. the per-domain cumulative-sum window then runs over candidates
         only. The candidate set is downward-closed in the rank order
         (numeric key is monotone in the hex prefix the order uses), so
         the candidates' cumulative sums equal the full domain's for
         every candidate row — the selection is EXACT, not approximate.

    Exactness guard (in-plan ``assert_true``): a domain's candidate set
    is sufficient iff the candidates' token total reaches ``budget`` or
    the candidates are the whole domain; anything else means needed rows
    were pruned and the plan raises at action time. A per-row assert
    cannot fire on an EMPTY candidate set (when ``budget <
    avg_tokens/slack`` the expected candidate count drops below 1 and
    the prune can remove a whole domain — a silent contract violation
    found by ``tests/test_properties.py``), so every domain keeps a
    structural survivor: the domain's minimum rank key is computed in
    the same totals agg and OR-ed into the candidate filter. The
    min-key row is the first row of the hash order, so the candidate
    set stays downward-closed (cumulative sums stay exact), the ">= 1
    row per non-empty domain" soft-cap contract holds by construction,
    and a prune that removes needed rows always RAISES. ``slack`` stays
    floored at 2 so the loud-failure event is rare.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if slack < 2.0:
        raise ValueError(
            f"slack must be >= 2 (prune-shortfall rarity floor), got {slack}"
        )
    # NULL domains: sentinel-keyed like domain_caps (a plain inner join
    # on the domain key would silently drop them)
    base = df.withColumn(
        "__dk", F.coalesce(F.col(domain_col).cast("string"), F.lit("\x00"))
    )
    rid = F.col(id_col)
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col("__dk"), rid.cast("string")))
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    base = base.withColumn("__h", h).withColumn("__k", key)

    totals = base.groupBy("__dk").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col(tokens_col).cast("long")).alias("tok_total"),
        # budget-capped sum: the prefix-row estimator's denominator
        # (non-positive tokens clamp to 0 so they cannot inflate it —
        # they also never advance the cumulative sum, and the estimate
        # then degrades toward "no pruning", the safe direction)
        F.sum(
            F.greatest(
                F.least(F.col(tokens_col).cast("long"), F.lit(budget)),
                F.lit(0),
            )
        ).alias("__tokb"),
        F.min("__k").alias("__min_k"),
    )
    est_rows = F.ceil(
        F.col("n_total").cast("double")
        * F.lit(float(budget))
        / F.greatest(F.col("__tokb"), F.lit(1)).cast("double")
    )
    thr = F.when(F.col("tok_total") <= budget, F.lit(_KEY_SPACE)).otherwise(
        F.least(
            F.lit(_KEY_SPACE),
            F.ceil(
                F.lit(float(slack))
                * (est_rows + F.lit(4)).cast("double")
                / F.col("n_total").cast("double")
                * _KEY_SPACE
            ),
        ).cast("long")
    )
    totals = totals.withColumn("__thr", thr)

    # No broadcast hint — same X7 rationale as domain_caps: |domains|
    # grows with the corpus, so the planner/AQE chooses (broadcast
    # while small, shuffle join at web scale).
    cand = base.join(totals, "__dk").where(
        (F.col("__k") < F.col("__thr")) | (F.col("__k") == F.col("__min_k"))
    )
    cand = cand.drop("__tokb")
    w = Window.partitionBy("__dk")
    ordered = w.orderBy("__h", id_col)
    cand = (
        cand.withColumn(
            "__cum_before",
            F.coalesce(
                F.sum(F.col(tokens_col).cast("long")).over(
                    ordered.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__cand_tok", F.sum(F.col(tokens_col).cast("long")).over(w)
        )
        .withColumn("__cand_n", F.count(F.lit(1)).over(w))
    )
    guarded = cand.where(
        F.assert_true(
            (F.col("__cand_tok") >= budget)
            | (F.col("__cand_n") == F.col("n_total")),
            F.lit(
                f"token_budget_per_domain: hash-prune shortfall "
                f"(slack={slack}); raise slack for this budget"
            ),
        ).isNull()
        & (F.col("__cum_before") < budget)
    )
    return guarded.drop(
        "__dk",
        "__h",
        "__k",
        "__thr",
        "__min_k",
        "__cum_before",
        "__cand_tok",
        "__cand_n",
    )


def url_dedup(
    df: DataFrame,
    url_col: str,
    prefer_col: str,
    id_col: str,
) -> DataFrame:
    """URL-level dedup: canonicalize ``url_col`` (see
    :func:`canonical_url`) and keep ONE row per canonical URL — the one
    with the largest ``prefer_col`` (e.g. doc length or quality score),
    smallest ``id_col`` on ties. The standard pre-content-dedup pass of a
    web pipeline: recrawls and tracking-param/scheme/www variants of the
    same page collapse by address before any text is compared.

    Scale: one hash shuffle on the canonical URL (bounded-key: keys are
    page addresses, cardinality ~= corpus), map-side-combinable
    ``max_by`` over an orderable struct — no window, no sort, no join.
    Deterministic: (prefer DESC, id ASC) is a total order per key, so the
    survivor is engine-reproducible (oracle: row_number = 1).

    NULL/unparseable URLs: rows whose URL is NULL or yields no host
    (every unparseable string canonicalizes to the same ``"://"``
    husk, so grouping on it would silently keep ONE row out of ALL
    garbage-URL docs) are NOT address-dedupable — they pass through
    untouched, self-keyed by id, with ``canon_url`` NULL and
    ``n_variants`` 1. Dropping or collapsing them is the caller's
    policy, never this operator's side effect.
    """
    canon, host, _domain, _scheme = canonical_url(F.col(url_col))
    key = F.when(
        F.col(url_col).isNull() | (host == ""),
        F.concat(F.lit("\x00"), F.col(id_col).cast("string")),
    ).otherwise(canon)
    pref = F.struct(
        F.col(prefer_col).cast("long").alias("p"),
        (-F.col(id_col).cast("long")).alias("negid"),
    )
    out = (
        df.withColumn("__ck", key)
        .groupBy("__ck")
        .agg(
            F.max_by(F.col(id_col), pref).alias(id_col),
            F.max_by(F.col(prefer_col), pref).alias(prefer_col),
            F.count(F.lit(1)).cast("long").alias("n_variants"),
        )
    )
    return out.select(
        F.when(F.col("__ck").startswith("\x00"), F.lit(None))
        .otherwise(F.col("__ck"))
        .alias("canon_url"),
        id_col,
        prefer_col,
        "n_variants",
    )


def latest_snapshots(
    df: DataFrame,
    key_col: str,
    snap_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Keep the ``k`` most recent captures per key (canonical URL) — the
    recrawl retention policy a multi-snapshot crawl applies before
    content dedup: the newest capture is the page's current text, one or
    two older ones preserve edit history, everything staler is noise.
    Ordering is (``snap_col`` DESC, ``id_col`` DESC) — same-timestamp
    re-captures resolve to the later ingest id — so the survivor set is
    deterministic and oracle-checkable as a plain ``row_number()``.
    Adds ``n_snapshots`` (the key's total capture count).

    Scale: one hash shuffle on the key; per-key window input is the
    key's CAPTURE COUNT, which is bounded by crawl cadence x retention
    horizon BY CONSTRUCTION (a few dozen), never by corpus size — so
    unlike :func:`domain_caps` (whose per-key group is a whole domain)
    no candidate pruning is needed; the naive window IS the scale path.
    NULL keys pass through sentinel-grouped (one unattributed bucket,
    same rule as :func:`domain_caps`); NULL snapshot timestamps sort
    LAST (a capture with no timestamp never displaces a dated one).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.withColumn(
        "__sk", F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    )
    w = Window.partitionBy("__sk")
    ordered = w.orderBy(
        F.col(snap_col).desc_nulls_last(), F.col(id_col).desc()
    )
    out = (
        base.withColumn("__rn", F.row_number().over(ordered))
        .withColumn("n_snapshots", F.count(F.lit(1)).over(w).cast("long"))
        .where(F.col("__rn") <= k)
    )
    return out.drop("__sk", "__rn")


def over_cap_domains(
    df: DataFrame,
    domain_col: str,
    tokens_col: str,
    doc_cap: int,
    token_budget: int,
) -> DataFrame:
    """Domains currently past either contribution cap: per-domain doc and
    token totals, filtered to ``n_docs > doc_cap OR tokens > budget``.
    The governance view an ingest gate consults (and the batch twin the
    streaming monitor's restart test asserts parity against). One
    map-side-combinable agg on the domain key; output bounded at
    |over-cap domains|.
    """
    return (
        df.groupBy(domain_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(tokens_col).cast("long")).alias("tokens"),
        )
        .where((F.col("n_docs") > doc_cap) | (F.col("tokens") > token_budget))
    )


def license_gate(
    df: DataFrame,
    license_col: str,
    allowed: list[str],
    robots_col: str | None = None,
) -> DataFrame:
    """Keep rows whose license tag is in ``allowed`` and (when
    ``robots_col`` is given) whose robots/no-AI directive is false.

    Pure projection filter — no shuffle, pushes to the scan at 100 TB.
    ``allowed`` is inlined as an IN-list literal (license vocabularies
    are small, fixed sets), never a join.

    NULL semantics (deliberate, fail-closed): a NULL license tag or a
    NULL robots flag makes the predicate NULL and the row is DROPPED —
    unknown licensing is not permission. Callers wanting to audit the
    unknowns should select them separately (``license IS NULL``), not
    loosen the gate.
    """
    cond = F.col(license_col).isin(list(allowed))
    if robots_col is not None:
        cond = cond & ~F.col(robots_col)
    return df.where(cond)
