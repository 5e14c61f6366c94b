"""Spectral embedding diagnostics (X128): dominant principal direction
of an embedding corpus by fixed-iteration power method over the exact
quantized Gram matrix.

The curation uses: detect a degenerate/anisotropic embedding space (one
direction swallowing the variance ruins cosine-based dedup and ANN
recall), supply the top direction for whitening or for bias-direction
removal, and rank dimensions by loading. A full eigensolver is
deployment-shape; the dominant direction via power iteration is the
distributed-friendly 95% answer.

Determinism discipline (the engine-wide rule): embedding values are
quantized once to integers (``round(v * scale)``, the
``embedding_diagnostics`` precedent), the Gram matrix is EXACT integer
sums on a d^2-bounded grid, and every power-iteration step is exact
integer arithmetic followed by ONE double division + round per entry
(max-abs normalization — no sqrt) — pure rational IEEE ops over
exactly-reproduced integers, bit-identical across engines, so the whole
iteration is oracle-checkable in DuckDB as a recursive CTE (the
pagerank/logreg pattern).

No reference analogue (the reference has no vector surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def principal_direction(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    scale: int = 1_000_000,
    iters: int = 8,
) -> DataFrame:
    """Dominant principal direction of the (uncentered) quantized Gram
    ``G = Q^T Q`` after ``iters`` power-method steps from the all-ones
    seed. Returns one row per dimension: ``dim`` (1-based), ``component``
    (integer, max-abs-normalized to ``[-scale, scale]``) and ``rayleigh``
    (the direction's unnormalized Rayleigh quotient ``v^T G v / v^T v`` —
    a dominance diagnostic, comparable across runs at fixed scale).

    Fixed iteration count, not convergence-tested: the output is a
    deterministic function of the input (restart-safe, engine-exact),
    which is what a pipeline gate needs; 8 steps resolve the dominant
    direction to quantization precision for any spectral gap a gate
    would act on.

    Scale: the corpus is touched ONCE — a scan-fused per-row d^2 product
    fan-out (``spread_scan`` applied: pure CPU amplification) into one
    map-side-combined aggregation onto the d^2-bounded grid
    (localCheckpoint-ed: it is replayed per iteration). Each iteration
    is then ONE distributed aggregation over the d^2 grid with the
    current vector inlined as an array literal (no join, no shuffle);
    the d-row state vector itself is collected and normalized
    driver-side — the approved O(model)-state collect class (logreg
    weights, convergence rows), bounded at d forever. The driver
    normalization replicates the engines' arithmetic exactly: Decimal
    sums come back exact, one float division + away-from-zero round per
    entry (Python ``round()`` is half-EVEN — NOT used). No
    eigen-library, no collect of anything unbounded.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    from ..functions.parallelism import spread_scan

    vec = F.col(vec_col)
    base = spread_scan(df.select(F.col(id_col), vec.alias("__v")))
    # quantize ONCE into a projected column so the pair lambda reads an
    # attribute (the CDC bounds-hoist rule: an array expression captured
    # by a lambda re-evaluates wholesale per element)
    q = base.select(
        F.transform(
            F.col("__v"), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("__q")
    )
    # r14 optimization (guide §4.2): the d^2 pair fan-out as two chained
    # posexplode Generates — GenerateExec runs inside whole-stage
    # codegen, where the previous explode(flatten(transform(transform)))
    # pushed every pair through the interpreted HOF evaluator
    # (CodegenFallback). Identical rows and products: gi/gj stay
    # 1-based, the product stays decimal(38,0) * long, and the exact
    # decimal aggregation is summation-order-immune by construction.
    e1 = q.select(F.posexplode("__q").alias("__i0", "__qi"), F.col("__q"))
    e2 = e1.select(
        (F.col("__i0") + 1).alias("gi"),
        F.col("__qi"),
        F.posexplode("__q").alias("__j0", "__qj"),
    )
    grid = (
        e2.select(
            "gi",
            (F.col("__j0") + 1).alias("gj"),
            (F.col("__qi").cast("decimal(38,0)") * F.col("__qj")).alias("p"),
        )
        .groupBy("gi", "gj")
        .agg(F.sum("p").alias("g"))
    ).localCheckpoint()

    from ..functions.rounding import away_round

    # dims are 1..d by construction (sequence(1, size)); the d-row dim
    # list and the per-iteration d-row state are O(model) collects
    dims = [
        r["gi"]
        for r in grid.select("gi").distinct().orderBy("gi").collect()
    ]
    # Overflow guard (one extra d^2-bounded agg on the checkpointed
    # grid): the iteration products are decimal(38,0), and under
    # non-ANSI Spark an overflowed sum comes back NULL — int(None)
    # would then raise an unactionable TypeError (or worse, terms
    # could drop silently). Bound the worst case up front: matvec
    # terms sum to <= d*|G|max*scale and the Rayleigh numerator to
    # <= d^2*|G|max*scale^2 (|v| <= scale by normalization); if either
    # can exceed the 38-digit space, fail loudly with the remedy.
    # A NULL grid cell means the Gram sum itself already overflowed.
    _dec38_max = 10**38 - 1
    gstats = grid.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.count("g").alias("n_nonnull"),
        F.max(F.abs(F.col("g"))).alias("gmax"),
    ).first()
    if gstats["n_cells"] != gstats["n_nonnull"]:
        raise ValueError(
            "principal_direction: a Gram cell overflowed decimal(38,0) "
            f"— lower `scale` (currently {scale})"
        )
    gmax = int(gstats["gmax"]) if gstats["gmax"] is not None else 0
    d = len(dims)
    if gmax and (
        d * gmax * scale > _dec38_max
        or d * d * gmax * scale * scale > _dec38_max
    ):
        raise ValueError(
            "principal_direction: power-iteration products can exceed "
            f"decimal(38,0) at this corpus size (d={d}, max |Gram| cell "
            f"= {gmax}) — lower `scale` (currently {scale})"
        )
    v = {i: scale for i in dims}

    def matvec_literal(mult_gi: bool = False):
        # ONE-round-trip literal (the sql_array_lit rationale): this
        # d-element array is rebuilt once per power iteration, and the
        # element-wise F.lit+cast form costs ~1 ms of driver py4j time
        # per element. String-cast literals parse exactly at any
        # magnitude decimal(38,0) holds.
        arr = F.expr(
            "array("
            + ",".join(f"CAST('{int(v[i])}' AS DECIMAL(38,0))" for i in dims)
            + ")"
        )
        term = F.col("g") * F.element_at(arr, F.col("gj").cast("int"))
        if mult_gi:
            term = term * F.element_at(arr, F.col("gi").cast("int"))
        return term

    for _ in range(iters):
        s_rows = (
            grid.groupBy("gi")
            .agg(F.sum(matvec_literal()).alias("s"))
            .collect()
        )
        s = {r["gi"]: int(r["s"]) for r in s_rows}
        m = max(abs(x) for x in s.values())
        # one float division + round per entry — the identical IEEE ops
        # the oracle's recursive CTE performs (CAST AS DOUBLE, /, *, round)
        v = {
            i: (away_round(float(s[i]) / float(m) * scale) if m else 0)
            for i in dims
        }

    num_row = grid.agg(F.sum(matvec_literal(mult_gi=True)).alias("num")).first()
    num = int(num_row["num"])
    den = sum(x * x for x in v.values())
    # all-zero corpus: the direction is undefined — NULL, not a crash
    rayleigh = float(num) / float(den) if den else None
    from ..functions.vectors import inline_rows_df

    out = inline_rows_df(
        df.sparkSession,
        [(int(i), int(v[i]), rayleigh) for i in dims],
        [("dim", "BIGINT"), ("component", "BIGINT"), ("rayleigh", "DOUBLE")],
    )
    return out
