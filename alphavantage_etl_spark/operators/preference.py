"""Pairwise-preference analytics (X133-X134, X143): Bradley-Terry
strength fitting, intransitivity QC, and Wilson-interval win-rate
significance over comparison data.

The RLHF/reward-model data operations: preference datasets arrive as
pairwise comparisons (response A beat response B for this prompt;
annotator chose left over right), and the pipeline needs (a) a global
strength score per item — the Bradley-Terry model every arena-style
leaderboard fits — to rank items, weight training examples, and detect
annotator-vs-model disagreement, and (b) a consistency audit: the
fraction of item triads whose majority preferences form a CYCLE
(A beats B beats C beats A) — the signal that the comparison data is
noisy or multi-dimensional and a scalar reward cannot represent it.

Determinism discipline (engine-wide rule): win counts are exact
integers; each MM iteration's per-opponent terms are ONE fixed-form
double expression from exactly-reproduced integers, quantized to 1e-6
and summed as decimal(38,0); the per-item state is collected and
max-normalized driver-side with away-from-zero rounding — the approved
O(model)-state collect class (power-method precedent,
operators/spectral.py) — so the whole fit is bit-identical across
engines and oracle-checkable as a DuckDB recursive CTE.

Scale: the corpus is touched ONCE to build the (a, b, wins) grid —
one map-side-combinable aggregation on the canonical pair key; every
iteration then runs on the |items|^2-bounded grid with the |items|-row
state inlined as a literal map. Items are models/policies/annotator
pools — bounded at thousands by construction, never corpus-sized; the
grid is localCheckpointed and replayed per iteration.

No reference analogue (the reference has no preference surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10**9  # strength quantization (1e-9 resolution, max-normalized)
_TERM_Q = 10**6  # per-term quantization before the exact decimal sum


def pairwise_win_grid(
    df: DataFrame, a_col: str, b_col: str, a_wins_col: str
) -> DataFrame:
    """Aggregate raw comparisons to the canonical pair grid: one row per
    unordered item pair (``item_a < item_b``) with exact integer
    ``wins_a`` / ``wins_b``. One map-side-combinable aggregation on the
    pair key; output bounded at |items|^2. Item ids keep their source
    type (numeric ids and string model/annotator names both work — no
    silent cast). Dropped, each deliberately: self-comparisons, NULL
    outcomes (an unjudged comparison is not evidence for either side),
    and NULL item ids (an unattributable side cannot be ranked)."""
    a = F.col(a_col)
    b = F.col(b_col)
    win_a = F.col(a_wins_col).cast("boolean")
    lo, hi = F.least(a, b), F.greatest(a, b)
    lo_wins = F.when(a < b, win_a).otherwise(~win_a)
    return (
        df.where(a.isNotNull() & b.isNotNull())
        .where(a != b)
        .where(win_a.isNotNull())
        .select(
            lo.alias("item_a"),
            hi.alias("item_b"),
            lo_wins.alias("__lo_wins"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum(F.when(F.col("__lo_wins"), 1).otherwise(0))
            .cast("long")
            .alias("wins_a"),
            F.sum(F.when(F.col("__lo_wins"), 0).otherwise(1))
            .cast("long")
            .alias("wins_b"),
        )
    )


def bradley_terry_strengths(
    grid: DataFrame, iters: int = 10, max_items: int = 1024
) -> DataFrame:
    """Bradley-Terry strengths from a :func:`pairwise_win_grid` via
    ``iters`` fixed MM iterations (Hunter 2004: ``p_i <- W_i / sum_j
    n_ij / (p_i + p_j)``), one row per item: ``item``, ``strength``
    (integer, max-abs-normalized to ``(0, 1e9]``), ``n_wins``,
    ``n_comparisons``.

    A half-win is added to BOTH directions of every observed pair
    (the standard pseudo-count regularization): every compared item
    then has positive win mass, so the iteration is defined even for
    never-winning items, and the fit shrinks gently toward equality on
    thin data instead of diverging to 0/infinity.

    Fixed iteration count, not convergence-tested (deterministic
    output, the pipeline-gate requirement); 10 iterations resolve a
    16-item arena to quantization precision. Each iteration is ONE
    distributed aggregation over the localCheckpointed grid with the
    current strengths inlined as literals; the only collect is the
    |items|-row state (the approved O(model) class).

    CARDINALITY CEILING: the per-iteration strength map is inlined as
    a literal expression, so the PLAN grows with |items| x iters —
    fine for the arena-scale item sets the operator targets (models,
    annotators, prompt variants), wrong beyond. ``max_items``
    (default 1024) raises past that bound; for larger item spaces
    replace the map literal with a broadcast equi-join of the
    |items|-row strength frame onto the grid (two broadcast joins per
    iteration — constant plan size, same arithmetic) before raising
    the ceiling.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from pyspark.sql import types as T

    from ..functions.rounding import away_round

    item_type = grid.schema["item_a"].dataType
    out_schema = T.StructType(
        [
            T.StructField("item", item_type),
            T.StructField("strength", T.LongType()),
            T.StructField("n_wins", T.LongType()),
            T.StructField("n_comparisons", T.LongType()),
        ]
    )
    g = (
        grid.select(
            "item_a",
            "item_b",
            # doubled counts keep the +0.5 pseudo-win exact in integers
            (F.col("wins_a").cast("long") * 2 + 1).alias("w2a"),
            (F.col("wins_b").cast("long") * 2 + 1).alias("w2b"),
        )
        .localCheckpoint()
    )
    # exact doubled win totals, pair counts, and comparison counts per
    # item via ONE distributed agg — the collect is |items| rows (the
    # O(model) class), never the |items|^2 grid
    ncmp_row = ((F.col("w2a") + F.col("w2b")) / 2 - 1).cast("long")
    side = F.explode(
        F.array(
            F.struct(
                F.col("item_a").alias("item"),
                F.col("w2a").alias("w2"),
                ncmp_row.alias("nc"),
            ),
            F.struct(
                F.col("item_b").alias("item"),
                F.col("w2b").alias("w2"),
                ncmp_row.alias("nc"),
            ),
        )
    )
    totals = (
        g.select(side.alias("e"))
        .select("e.item", "e.w2", "e.nc")
        .groupBy("item")
        .agg(
            F.sum("w2").alias("w2"),
            F.count(F.lit(1)).alias("pairs"),
            F.sum("nc").alias("ncmp"),
        )
        .collect()
    )
    if not totals:
        return grid.sparkSession.createDataFrame([], out_schema)
    w2 = {r["item"]: int(r["w2"]) for r in totals}
    ncmp = {r["item"]: int(r["ncmp"]) for r in totals}
    pairs_of = {r["item"]: int(r["pairs"]) for r in totals}
    items = sorted(w2)
    if len(items) > max_items:
        raise ValueError(
            f"bradley_terry_strengths: {len(items)} items exceeds "
            f"max_items={max_items} — the inlined strength-map literal "
            "grows the plan with |items| x iters; for larger item "
            "spaces swap the map literal for a broadcast join of the "
            "strength frame onto the grid (see docstring) and raise "
            "max_items"
        )
    p = {i: _SCALE for i in items}

    n2 = (F.col("w2a") + F.col("w2b")).cast("double")  # 2*(n_ij + 1)
    # the key array never changes across iterations — build its literal
    # ONCE (each element-wise F.lit is a py4j round trip); the per-
    # iteration strengths are ints and emit as one-round-trip SQL (r14)
    from ..functions.vectors import inline_rows_df, sql_array_lit

    keys_arr = F.array(*[F.lit(i) for i in items])
    for _ in range(iters):
        arr = F.map_from_arrays(
            keys_arr,
            sql_array_lit([int(p[i]) for i in items]),
        )
        pa = F.element_at(arr, F.col("item_a")).cast("double")
        pb = F.element_at(arr, F.col("item_b")).cast("double")
        # n_ij / (p_i + p_j) in strength units: n2/2 * SCALE / (pa + pb),
        # one fixed-form double expression from exact integers,
        # quantized 1e-6 and summed exactly
        term = F.round(
            n2 / F.lit(2.0) * F.lit(float(_SCALE)) / (pa + pb)
            * F.lit(float(_TERM_Q))
        ).cast("decimal(38,0)")
        contrib = F.explode(
            F.array(
                F.struct(F.col("item_a").alias("item"), term.alias("t")),
                F.struct(F.col("item_b").alias("item"), term.alias("t")),
            )
        )
        denoms = {
            r["item"]: int(r["d"])
            for r in g.select(contrib.alias("e"))
            .select("e.item", "e.t")
            .groupBy("item")
            .agg(F.sum("t").alias("d"))
            .collect()
        }
        # ratio_i = W_i / denom_i, both exact; then max-normalize (order
        # independent, unlike a sum) and re-quantize
        ratio = {
            i: (float(w2[i]) / 2.0) / (float(denoms[i]) / float(_TERM_Q))
            for i in items
        }
        m = max(ratio.values())
        p = {i: away_round(ratio[i] / m * _SCALE) for i in items}

    # n_wins = (w2 - #pairs_with_i) / 2 : remove the pseudo half-wins
    out = [
        (i, int(p[i]), (w2[i] - pairs_of[i]) // 2, ncmp[i]) for i in items
    ]
    # JVM inline table when the item type allows it (r14): the pickled-
    # RDD result frame pays a Python worker per downstream action.
    # Arbitrary item types/strings keep the general createDataFrame.
    from pyspark.sql import types as T2

    sql_t = {T.StringType(): "STRING", T.LongType(): "BIGINT",
             T.IntegerType(): "INT"}.get(item_type)
    if sql_t is not None:
        try:
            return inline_rows_df(
                grid.sparkSession,
                out,
                [("item", sql_t), ("strength", "BIGINT"),
                 ("n_wins", "BIGINT"), ("n_comparisons", "BIGINT")],
            )
        except ValueError:
            pass
    return grid.sparkSession.createDataFrame(out, out_schema)


def winrate_wilson(
    grid: DataFrame, z: float = 1.96, round_to: int = 6
) -> DataFrame:
    """Head-to-head win-rate matrix with Wilson score intervals over a
    :func:`pairwise_win_grid`: one row per unordered pair with the exact
    integer counts (``wins_a``, ``wins_b``, ``n_games``), ``item_a``'s
    empirical ``win_rate_a``, the Wilson score interval
    [``wilson_lb_a``, ``wilson_ub_a``] at confidence ``z`` (default 1.96
    — 95%), and ``decided`` — true when the interval excludes 0.5, the
    "is A genuinely better than B or is this sample noise" gate an
    arena leaderboard applies before trusting a head-to-head cell.

    Wilson (not normal-approx) because preference cells are routinely
    thin and lopsided: the interval stays inside [0, 1], never collapses
    to a point at p_hat in {0, 1}, and its center shrinks toward 0.5
    exactly as a pseudo-count prior would — the same reason X133 adds
    half-wins.

    Determinism: counts are exact integers; rate and bounds are ONE
    fixed-form double expression each (identical operator association
    replayed in the oracle — IEEE doubles make that bit-identical
    cross-engine), quantized half-even at ``round_to``; ``decided``
    compares the QUANTIZED bounds so the flag can never straddle an
    engine's last ulp.

    Scale: pure projection over the |items|^2-bounded grid — zero
    shuffle beyond the grid build itself.
    """
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    # a pair with zero games carries no evidence — drop rather than
    # emit an all-NULL stats row a downstream `decided` filter would
    # silently swallow (a pairwise_win_grid can never produce one, but
    # the operator accepts any grid-shaped frame)
    grid = grid.where((F.col("wins_a") + F.col("wins_b")) > 0)
    wa = F.col("wins_a").cast("double")
    n = (F.col("wins_a") + F.col("wins_b")).cast("double")
    p = wa / n
    zl = F.lit(float(z))
    zz = zl * zl
    half = zz / (F.lit(2.0) * n)
    rad = F.sqrt(p * (F.lit(1.0) - p) / n + zz / (F.lit(4.0) * n * n))
    den = F.lit(1.0) + zz / n
    lb = F.bround((p + half - zl * rad) / den, round_to)
    ub = F.bround((p + half + zl * rad) / den, round_to)
    return grid.select(
        "item_a",
        "item_b",
        "wins_a",
        "wins_b",
        (F.col("wins_a") + F.col("wins_b")).cast("long").alias("n_games"),
        F.bround(p, round_to).alias("win_rate_a"),
        lb.alias("wilson_lb_a"),
        ub.alias("wilson_ub_a"),
        ((lb > F.lit(0.5)) | (ub < F.lit(0.5))).alias("decided"),
    )


def intransitive_triads(grid: DataFrame) -> DataFrame:
    """Preference-consistency audit over the majority directions of a
    :func:`pairwise_win_grid`: one row with ``n_triads`` (item triples
    whose three pairwise majorities all exist and are strict),
    ``n_cyclic`` (those forming a cycle — A beats B beats C beats A),
    and ``cyclic_pct`` (NULL when no complete triad exists). A high
    cyclic share means the comparisons are noisy or genuinely
    multi-dimensional — no scalar Bradley-Terry strength can fit them.

    Tied pairs carry no majority and drop out (their triads are
    incomplete, not cyclic). Two self-joins over the |items|^2-bounded
    majority-edge table — triad work is |items|^3-bounded, never
    corpus-sized."""
    e = (
        grid.where(F.col("wins_a") != F.col("wins_b"))
        .select(
            F.col("item_a").alias("lo"),
            F.col("item_b").alias("hi"),
            # +1: lo beats hi; -1: hi beats lo
            F.when(F.col("wins_a") > F.col("wins_b"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("dir"),
        )
    )
    e1 = e.select(
        F.col("lo").alias("i"), F.col("hi").alias("j"), F.col("dir").alias("dij")
    )
    e2 = e.select(
        F.col("lo").alias("j2"), F.col("hi").alias("k"), F.col("dir").alias("djk")
    )
    e3 = e.select(
        F.col("lo").alias("i3"), F.col("hi").alias("k3"), F.col("dir").alias("dik")
    )
    tri = (
        e1.join(e2, F.col("j") == F.col("j2"))
        .join(e3, (F.col("i") == F.col("i3")) & (F.col("k") == F.col("k3")))
    )
    # with i < j < k by construction, the triad is transitive iff the
    # relation i->j->k->i does NOT cycle; in +-1 direction terms the
    # cyclic patterns are (i>j, j>k, k>i) = (+1, +1, -1)... expressed
    # uniformly: cycle iff dij == djk and dik != dij
    is_cyc = (F.col("dij") == F.col("djk")) & (F.col("dik") != F.col("dij"))
    return tri.agg(
        F.count(F.lit(1)).cast("long").alias("n_triads"),
        # sum over ZERO rows is NULL, not 0 — coalesce so the empty
        # audit reads (0, 0, NULL)
        F.coalesce(F.sum(F.when(is_cyc, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_cyclic"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(F.when(is_cyc, 1).otherwise(0))
                / F.count(F.lit(1))
                * 100,
                6,
            ),
        ).alias("cyclic_pct"),
    )
