"""A/B experiment analysis with CUPED variance reduction (X68).

The experimentation read-out is a first-class analytics-engine workload:
assign users to variants (content-addressed, engine-portable —
``sampling.split_bucket``), aggregate a post-period metric per user, and
estimate the treatment lift. CUPED (Deng et al., WSDM 2013: "Improving
the Sensitivity of Online Controlled Experiments by Utilizing
Pre-Experiment Data") regresses out each user's PRE-period covariate —
``y' = y - theta * (x - mean_x)`` with ``theta = cov(x, y) / var(x)`` —
which leaves the expected lift unchanged (assignment is independent of
pre-period behavior) while shrinking its variance by the squared
pre/post correlation. The standard big win for metric sensitivity.

Scale design (100 TB): one shuffle on the user key builds the per-user
(pre, post) frame; everything after is ONE aggregation producing SIX
sufficient statistics per variant (n, Σx, Σy, Σx², Σy², Σxy — map-side
partial, 2 output rows) and O(1) driver-side-free arithmetic. No second
pass over the data for the adjusted metric: Var(y − θx) expands to
Var(y) − 2θCov(x,y) + θ²Var(x), all from the same six sums.

Cross-engine exactness: metrics are quantized to integer cents at the
per-user stage, so every sufficient statistic is an EXACT decimal
integer sum (immune to partial-agg merge order); each output is one
fixed-order double expression over those integers (single IEEE rounding
path — including sqrt, which is correctly-rounded), mirrored verbatim
in the DuckDB oracle. Pure rational outputs ship unrounded (the
target_encode rule); only documentation, not rounding, differs from
the quantized-transcendental convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ab_assign(
    df: DataFrame, id_col: str, salt: str = "experiment", buckets: int = 10_000
) -> "F.Column":
    """'A'/'B' variant from the content-addressed split bucket — stable
    under corpus growth, reproducible outside Spark (md5, not hash)."""
    from .sampling import split_bucket

    b = split_bucket(id_col, salt, buckets)
    return F.when(b < buckets // 2, F.lit("A")).otherwise(F.lit("B"))


def ab_test_cuped(
    users: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """One-row experiment read-out from a per-user frame with variant,
    pre-period covariate and post-period metric columns:

    (n_a, n_b, mean_a, mean_b, lift_raw, theta, lift_cuped,
    var_reduction, se_cuped, z_cuped)

    - ``theta`` is pooled over both variants (the standard CUPED
      estimator — assignment independence makes the pooled regression
      unbiased for the lift);
    - ``var_reduction`` = 1 − Var(y′)/Var(y), the sensitivity gain;
    - ``z_cuped`` = lift_cuped / sqrt(Var_A(y′)/n_A + Var_B(y′)/n_B)
      (Welch form); NULL when both arms are constant (zero SE). An
      experiment with an EMPTY arm produces an empty result (the
      cross join has no row) — there is nothing to compare.

    Missing pre/post values are treated as 0 cents (a user with no
    pre-period activity has a zero covariate — the CUPED convention),
    so every assigned user counts toward n.
    """
    cents = lambda c: F.coalesce(  # noqa: E731
        F.round(F.col(c).cast("double") * 100).cast("long"), F.lit(0)
    )
    x, y = cents(pre_col), cents(post_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_variant = (
        users.select(F.col(variant_col).alias("v"), x.alias("x"), y.alias("y"))
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("x"))).alias("sx"),
            F.sum(dec(F.col("y"))).alias("sy"),
            F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
            F.sum(dec(F.col("y") * F.col("y"))).alias("syy"),
            F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
        )
    )
    a = per_variant.where(F.col("v") == "A").alias("a")
    b = per_variant.where(F.col("v") == "B").alias("b")
    j = a.crossJoin(b)

    def d(side: str, col: str):
        return F.col(f"{side}.{col}").cast("double")

    na, nb = d("a", "n"), d("b", "n")
    n = na + nb
    sx = d("a", "sx") + d("b", "sx")
    sy = d("a", "sy") + d("b", "sy")
    sxx = d("a", "sxx") + d("b", "sxx")
    syy = d("a", "syy") + d("b", "syy")
    sxy = d("a", "sxy") + d("b", "sxy")
    # pooled population moments in cents
    mx, my = sx / n, sy / n
    var_x = sxx / n - mx * mx
    var_y = syy / n - my * my
    cov_xy = sxy / n - mx * my
    theta = F.when(var_x > 0, cov_xy / var_x).otherwise(F.lit(0.0))
    # per-arm adjusted means/variances from the same sums:
    #   mean(y') = mean(y) - theta * (mean(x) - mx)
    #   var(y')  = var(y) - 2 theta cov(x,y) + theta^2 var(x)   (per arm)
    mean_a_adj = d("a", "sy") / na - theta * (d("a", "sx") / na - mx)
    mean_b_adj = d("b", "sy") / nb - theta * (d("b", "sx") / nb - mx)
    def var_arm(s: str):
        # explicit m*m, never pow(): Math.pow and DuckDB power() can
        # differ in the last ulp; multiplication cannot
        ns = d(s, "n")
        mxs, mys = d(s, "sx") / ns, d(s, "sy") / ns
        return (
            (d(s, "syy") / ns - mys * mys)
            - 2 * theta * (d(s, "sxy") / ns - mxs * mys)
            + theta * theta * (d(s, "sxx") / ns - mxs * mxs)
        )

    var_a_adj, var_b_adj = var_arm("a"), var_arm("b")
    var_y_adj = var_y - 2 * theta * cov_xy + theta * theta * var_x
    lift_raw = d("b", "sy") / nb - d("a", "sy") / na
    lift_cuped = mean_b_adj - mean_a_adj
    se = F.sqrt(var_a_adj / na + var_b_adj / nb)
    c100 = F.lit(100.0)  # cents -> metric units
    return j.select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        (d("a", "sy") / na / c100).alias("mean_a"),
        (d("b", "sy") / nb / c100).alias("mean_b"),
        (lift_raw / c100).alias("lift_raw"),
        theta.alias("theta"),
        (lift_cuped / c100).alias("lift_cuped"),
        F.when(var_y > 0, F.lit(1.0) - var_y_adj / var_y).alias(
            "var_reduction"
        ),
        (se / c100).alias("se_cuped"),
        F.when(se > 0, lift_cuped / se).alias("z_cuped"),
    )


def ipw_effect(
    df: DataFrame,
    treat_col: str,
    outcome_col: str,
    propensity_col: str,
    clip: tuple = (0.05, 0.95),
) -> DataFrame:
    """One row (n, n_treat, mean_treat, mean_ctrl, ate): the Hajek
    (self-normalized) inverse-propensity-weighted treatment-effect
    estimate from an OBSERVATIONAL frame — the causal companion to
    ab_test_cuped: CUPED reads a randomized experiment; IPW de-biases a
    natural split (treated = docs that got the property by
    circumstance) using a propensity model's scores — e.g. the X35
    logreg's p doubles as the propensity when the "treatment" is its
    label.

    ``mean_treat = sum(T*y/p) / sum(T/p)`` and symmetrically for
    control with 1-p; propensities clip into ``clip`` first (the
    standard overlap guard — an unclipped p near 0 hands one row the
    whole estimate). Each weighted term is half-even-quantized to
    1e-12 and summed as exact decimal integers (merge-order-immune);
    the two means and the ATE are fixed-order double expressions over
    those sums, half-even-rounded to 1e-9: the means' inputs are
    already 1e-12-quantized (not pure rationals), and the ATE is a
    CANCELLATION output — a last-ulp disagreement in a 0.82-magnitude
    mean becomes 1e-13 RELATIVE error in a 1e-3 difference, so the
    difference must be quantized even though the means look stable.
    NULL outcome/propensity rows are excluded; an empty arm yields
    NULL means/ATE.

    Scale: one scan, one global aggregation (map-side combine) — no
    window, no join.
    """
    lo, hi = clip
    if not (0 < lo < hi < 1):
        raise ValueError(f"clip must satisfy 0 < lo < hi < 1, got {clip}")
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("double")
    p = F.least(F.greatest(F.col(propensity_col).cast("double"), F.lit(lo)), F.lit(hi))
    qd = lambda c: F.round(F.bround(c, 12) * F.lit(1e12)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    w1 = t.cast("double") / p
    w0 = (1 - t).cast("double") / (F.lit(1.0) - p)
    agg = (
        df.where(y.isNotNull() & F.col(propensity_col).isNotNull())
        .select(
            t.alias("t"),
            qd(w1 * y).alias("q1y"),
            qd(w1).alias("q1"),
            qd(w0 * y).alias("q0y"),
            qd(w0).alias("q0"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").cast("long").alias("n_treat"),
            F.sum("q1y").alias("s1y"),
            F.sum("q1").alias("s1"),
            F.sum("q0y").alias("s0y"),
            F.sum("q0").alias("s0"),
        )
    )
    mt = F.when(
        F.col("s1") != 0,
        F.col("s1y").cast("double") / F.col("s1").cast("double"),
    )
    mc = F.when(
        F.col("s0") != 0,
        F.col("s0y").cast("double") / F.col("s0").cast("double"),
    )
    return agg.select(
        "n",
        "n_treat",
        F.bround(mt, 9).alias("mean_treat"),
        F.bround(mc, 9).alias("mean_ctrl"),
        F.bround(mt - mc, 9).alias("ate"),
    )


def conformal_coverage(
    df: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    alpha: float = 0.1,
    salt: str = "conformal",
) -> DataFrame:
    """One-row (n_train, n_calib, n_test, k, q_hat, coverage, target):
    split-conformal prediction-interval calibration for the per-group
    mean model — "how wide must the error band be so 90% of unseen
    rows land inside, with a finite-sample guarantee and no
    distributional assumptions" (Vovk et al.; the Papadopoulos split
    form). The model is deliberately the simplest honest one — the
    TRAIN-split per-group mean — because the interesting output is the
    calibration machinery itself: swap any scorer in, the guarantee
    survives.

    Splits are content-addressed (``sampling.split_bucket``, md5
    engine-portable): buckets [0,5000) train, [5000,7500) calibration,
    the rest test. Scores are QUANTIZED absolute residuals in
    micro-dollars: with per-group train sums (n_g, S_g) and row cents
    c, ``r = round(|n_g*c - S_g| / n_g * 1e4)`` — an exact-int double
    ratio rounded once (conformal's guarantee holds for ANY measurable
    score function, so quantizing the score keeps the finite-sample
    property EXACT while making the quantile grid value-range-bounded).
    q_hat is the k-th smallest calibration score with
    ``k = ceil((n_calib + 1) * (1 - alpha))`` — the finite-sample
    correction — found as the smallest grid value whose cumulative
    count reaches k; coverage is the exact fraction of test scores
    <= q_hat. Rows whose group never appears in train have no
    prediction and are EXCLUDED from calibration/test (pinned). If
    k > n_calib the interval is the whole line: q_hat NULL,
    coverage 1.0 by convention.

    Scale: model = one train aggregation broadcast as a |groups|-row
    table; the quantile runs over the DISTINCT-quantized-score grid
    (the weighted_median head-bounded window class), never the corpus;
    coverage is one broadcast-join + aggregation.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    from .sampling import split_bucket

    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    base = df.where(
        F.col(id_col).isNotNull()
        & F.col(group_col).isNotNull()
        & cents.isNotNull()
    ).select(
        split_bucket(id_col, salt=salt, buckets=10_000),
        F.col(group_col).alias("__g"),
        cents.alias("__c"),
    )
    train = base.where(F.col("bucket") < 5000)
    calib = base.where((F.col("bucket") >= 5000) & (F.col("bucket") < 7500))
    test = base.where(F.col("bucket") >= 7500)

    model = train.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__ng"),
        F.sum(F.col("__c").cast("decimal(38,0)")).alias("__sg"),
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))

    def score(side: DataFrame) -> DataFrame:
        r = F.round(
            F.abs(
                F.col("__ng").cast("decimal(38,0)")
                * F.col("__c").cast("decimal(38,0)")
                - F.col("__sg")
            ).cast("double")
            / F.col("__ng").cast("double")
            * F.lit(1e4)
        ).cast("long")
        return side.join(F.broadcast(model), "__g").select(r.alias("__r"))

    grid = score(calib).groupBy("__r").agg(F.count(F.lit(1)).alias("__cnt"))
    wcum = Window.orderBy("__r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.orderBy("__r").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g2 = grid.select(
        "__r",
        F.sum("__cnt").over(wcum).alias("__cum"),
        F.sum("__cnt").over(wfull).alias("__ncal"),
    )
    k = F.ceil(
        (F.col("__ncal") + F.lit(1)).cast("double") * F.lit(1.0 - alpha)
    ).cast("long")
    qrow = g2.agg(
        F.max("__ncal").alias("n_calib"),
        F.max(k).alias("k"),
        F.min(F.when(F.col("__cum") >= k, F.col("__r"))).alias("__qu"),
    )
    tst = (
        score(test)
        .join(F.broadcast(qrow))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.max("n_calib").alias("n_calib"),
            F.max("k").alias("k"),
            F.max("__qu").alias("__qu"),
            F.sum(
                F.when(F.col("__r") <= F.col("__qu"), 1).otherwise(0)
            ).alias("__cov"),
        )
    )
    return tst.join(F.broadcast(n_train)).select(
        F.col("n_train").cast("long").alias("n_train"),
        F.coalesce(F.col("n_calib"), F.lit(0)).cast("long").alias("n_calib"),
        F.col("n_test").cast("long").alias("n_test"),
        F.col("k").cast("long").alias("k"),
        (F.col("__qu").cast("double") / F.lit(1e6)).alias("q_hat"),
        F.when(F.col("__qu").isNotNull(),
               F.col("__cov").cast("double") / F.col("n_test").cast("double"))
        .when(F.col("k").isNotNull() & (F.col("n_test") > 0), F.lit(1.0))
        .alias("coverage"),
        F.lit(1.0 - alpha).alias("target"),
    )


def two_prop_scan(
    df: DataFrame, key_col: str, flag_col: str
) -> DataFrame:
    """Per-key (key, n, pos, stat, p_proxy): one-vs-rest two-proportion
    screen over a binary flag — for every key k, the 1-df chi-squared
    statistic of the 2x2 table (k vs all other keys) x (flag vs not):

        stat = N * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d))

    The slice-scan that feeds :func:`bh_reject`: "which segments'
    conversion/label share actually deviates", computed for EVERY key
    in one pass so the multiple-testing correction downstream is
    honest about how many looks were taken.

    Exactness: cell counts are exact integers from one grouped
    aggregation; ``a*d - b*c`` multiplies in decimal(38,0) (long
    products overflow at corpus scale) and ``stat`` is ONE pinned-order
    double expression over exact integers (the squared numerator can
    exceed decimal(38,0) at 100 TB, so the division runs in doubles —
    identical IEEE path both engines). Degenerate margins (an empty
    class either way) pin ``stat = 0`` (no evidence, not NULL — the
    row still enters the BH ranking). ``p_proxy = 1 / (1 + stat)``: a
    PINNED monotone surrogate for the 1-df upper-tail p-value (both
    strictly decreasing in stat), chosen because the true survival
    function needs erf — a transcendental with no cross-engine-exact
    form. BH only consumes p-values through their ORDER and a
    threshold; the order under the surrogate is the true order.

    Scale: one map-side-combined groupBy on the key, totals from the
    bounded key grid (broadcast back), zero corpus-sized joins.
    """
    g = df.where(
        F.col(key_col).isNotNull() & F.col(flag_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(flag_col).cast("long").alias("__f"),
    )
    cells = g.groupBy("__k").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__f").alias("__p")
    )
    return two_prop_from_counts(cells, "__k", "__n", "__p", out_key=key_col)


def two_prop_from_counts(
    cells: DataFrame,
    key_col: str,
    n_col: str,
    pos_col: str,
    out_key: str | None = None,
) -> DataFrame:
    """:func:`two_prop_scan` over PRE-AGGREGATED per-key counts
    (key, n, pos) — the entry point for callers that maintain the
    counts themselves, e.g. a streaming monitor merging mergeable
    count state across micro-batches (the aggregate_state discipline:
    exact integer counts merge associatively, so the scan over merged
    state equals the scan over the full data by construction). Same
    output contract and arithmetic as two_prop_scan.
    """
    cells = cells.select(
        F.col(key_col).alias("__k"),
        F.col(n_col).cast("long").alias("__n"),
        F.col(pos_col).cast("long").alias("__p"),
    )
    if out_key is None:
        out_key = key_col
    key_col = out_key
    tot = cells.agg(
        F.sum("__n").alias("__tn"), F.sum("__p").alias("__tp")
    )
    j = cells.crossJoin(F.broadcast(tot))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = F.col("__p")
    b = F.col("__n") - F.col("__p")
    c = F.col("__tp") - F.col("__p")
    d = (F.col("__tn") - F.col("__tp")) - b
    adbc = dec(a) * dec(d) - dec(b) * dec(c)
    m1 = F.col("__n")  # a + b
    m2 = F.col("__tn") - F.col("__n")  # c + d
    m3 = F.col("__tp")  # a + c
    m4 = F.col("__tn") - F.col("__tp")  # b + d
    dd = lambda x: x.cast("double")  # noqa: E731
    stat = F.when(
        (m1 > 0) & (m2 > 0) & (m3 > 0) & (m4 > 0),
        dd(F.col("__tn"))
        * dd(adbc)
        * dd(adbc)
        / dd(m1)
        / dd(m2)
        / dd(m3)
        / dd(m4),
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("__k").alias(key_col),
        F.col("__n").alias("n"),
        F.col("__p").alias("pos"),
        stat.alias("stat"),
        (F.lit(1.0) / (F.lit(1.0) + stat)).alias("p_proxy"),
    )


def bh_reject(
    scored: DataFrame, key_col: str, p_col: str, q: float = 0.1
) -> DataFrame:
    """Per-key (key, p, rank, m, rejected): Benjamini-Hochberg step-up
    FDR control over a bounded family of per-key p-values — the
    multiple-testing correction every slice-scan needs: run a chi2 /
    MWU screen across hundreds of segments and ~5% of null segments
    "fire" at p < .05 by construction; BH keeps the expected FALSE
    DISCOVERY share of what you act on below ``q`` instead.

    Procedure (exact, rank-based): sort p ascending (tie-break key
    ascending — a pinned total order), find the largest rank i with
    ``p_i * m <= q * i`` (the multiplied form — no division, so the
    comparison is two IEEE products over identical doubles in both
    engines), reject ranks 1..i. No rejections when no rank passes.
    ``rejected`` ships as 0/1 BIGINT.

    Scale: the family is the KEY grid, already aggregated and bounded
    (segments, not rows) — the rank window and the step-up max run
    single-partition over m rows by design; m at 100 TB is the number
    of slices scanned, thousands at most.
    """
    base = scored.where(F.col(p_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.col(p_col).cast("double").alias("__p"),
    )
    m = base.agg(F.count(F.lit(1)).alias("__m"))
    wr = Window.orderBy("__p", "__k")
    ranked = (
        base.crossJoin(F.broadcast(m))
        .withColumn("__i", F.row_number().over(wr).cast("long"))
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    passes = F.when(
        F.col("__p") * F.col("__m").cast("double")
        <= F.lit(q) * F.col("__i").cast("double"),
        F.col("__i"),
    )
    out = ranked.withColumn("__istar", F.max(passes).over(wall))
    return out.select(
        F.col("__k").alias(key_col),
        F.col("__p").alias("p"),
        F.col("__i").alias("rank"),
        F.col("__m").cast("long").alias("m"),
        F.when(
            F.col("__istar").isNotNull()
            & (F.col("__i") <= F.col("__istar")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rejected"),
    )


def perm_test_means(
    df: DataFrame,
    id_col: str,
    flag_col: str,
    value_col: str,
    n_perms: int = 99,
    salt: str = "perm",
) -> DataFrame:
    """One-row (n, n1, n0, obs_diff, n_perms, n_ge, p_value): a
    permutation test for the difference in group means — the
    SIGNIFICANCE sibling of the Poisson bootstrap (X-bootstrap gives a
    CI around the estimate; this asks "could a difference this large
    arise with labels assigned at random", the exact-under-the-null
    test that needs no variance formula, normality, or equal-n
    assumption).

    Permutations are PSEUDO-permutations by content-addressed hashing
    (the split_bucket discipline): permutation p reassigns each row to
    side ``md5(salt ':' p ':' id) mod 2`` — a deterministic function
    of (salt, p, id), so the null distribution is reproducible by any
    engine, any partitioning, any run (true random shuffles are
    neither cross-engine nor restart stable). Hash sides are Bernoulli
    (1/2) rather than exactly-n1 draws — the standard large-sample
    randomization-test variant; at corpus n the binomial n1 jitter is
    O(sqrt(n)) and immaterial, and determinism is the contract here.

    Exactness: values quantize to cents; per-(perm, side) sums are
    exact decimal(38,0) integers (immune to partial-agg merge order);
    each diff is two exact-int double ratios subtracted in pinned
    order; the >= comparison is on identical doubles both engines.
    p_value = (1 + #{p : |diff_p| >= |obs|}) / (n_perms + 1) — the
    add-one form, so p is never 0 and the observed assignment counts
    as its own permutation.

    Scale (100 TB): the perm fan-out multiplies CPU, not shuffle —
    the bootstrap_ci class: rows explode x n_perms but collapse
    map-side into per-partition (perm, side) partials, so the
    exchange carries O(partitions * n_perms * 2) rows; the final
    p-value fold is one aggregation over 2 * n_perms cells. NULL
    id/flag/value rows are excluded.
    """
    if n_perms < 1:
        raise ValueError(f"n_perms must be >= 1, got {n_perms}")
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    base = df.where(
        F.col(id_col).isNotNull()
        & F.col(flag_col).isNotNull()
        & cents.isNotNull()
    ).select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(flag_col).cast("int").alias("__f"),
        cents.alias("__c"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dd = lambda c: c.cast("double")  # noqa: E731

    def diff(s1, n1, s0, n0):
        return dd(s1) / 100.0 / dd(n1) - dd(s0) / 100.0 / dd(n0)

    obs = base.groupBy("__f").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(dec(F.col("__c"))).alias("__s")
    )
    obs_row = (
        obs.agg(
            F.sum("__n").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("__f") == 1, F.col("__n"))), F.lit(0)
            ).alias("n1"),
            F.coalesce(
                F.sum(F.when(F.col("__f") == 0, F.col("__n"))), F.lit(0)
            ).alias("n0"),
            F.sum(F.when(F.col("__f") == 1, F.col("__s"))).alias("__s1"),
            F.sum(F.when(F.col("__f") == 0, F.col("__s"))).alias("__s0"),
        )
        .withColumn(
            "obs_diff",
            F.when(
                (F.col("n1") > 0) & (F.col("n0") > 0),
                diff(F.col("__s1"), F.col("n1"), F.col("__s0"), F.col("n0")),
            ),
        )
        .drop("__s1", "__s0")
    )
    side = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(salt), F.col("__p").cast("string"), F.col("__id")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    # the x n_perms hash fan-out runs inside the stage carrying `base`
    from ..functions.parallelism import spread_scan

    base = spread_scan(base)
    perms = (
        base.select(
            "__id",
            "__c",
            F.explode(F.sequence(F.lit(1), F.lit(n_perms))).alias("__p"),
        )
        .select("__c", "__p", side.alias("__side"))
        .groupBy("__p", "__side")
        .agg(
            F.count(F.lit(1)).alias("__n"), F.sum(dec(F.col("__c"))).alias("__s")
        )
    )
    pd_ = perms.groupBy("__p").agg(
        F.coalesce(
            F.sum(F.when(F.col("__side") == 1, F.col("__n"))), F.lit(0)
        ).alias("__n1"),
        F.coalesce(
            F.sum(F.when(F.col("__side") == 0, F.col("__n"))), F.lit(0)
        ).alias("__n0"),
        F.sum(F.when(F.col("__side") == 1, F.col("__s"))).alias("__s1"),
        F.sum(F.when(F.col("__side") == 0, F.col("__s"))).alias("__s0"),
    )
    pdiff = pd_.select(
        "__p",
        F.when(
            (F.col("__n1") > 0) & (F.col("__n0") > 0),
            diff(F.col("__s1"), F.col("__n1"), F.col("__s0"), F.col("__n0")),
        ).alias("__d"),
    )
    tail = pdiff.crossJoin(F.broadcast(obs_row)).agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.abs(F.col("__d")) >= F.abs(F.col("obs_diff")), 1
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_ge")
    )
    return obs_row.crossJoin(F.broadcast(tail)).select(
        "n",
        "n1",
        "n0",
        "obs_diff",
        F.lit(n_perms).cast("long").alias("n_perms"),
        F.col("n_ge").cast("long").alias("n_ge"),
        F.when(
            F.col("obs_diff").isNotNull(),
            (F.lit(1.0) + dd(F.col("n_ge")))
            / (F.lit(float(n_perms)) + F.lit(1.0)),
        ).alias("p_value"),
    )
