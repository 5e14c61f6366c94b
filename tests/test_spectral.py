"""Dominant principal direction (X128): exact-integer power iteration.

The contract query pins the DuckDB recursive-CTE oracle hash; these
tests pin the operator against an independent pure-Python reference of
the same arithmetic (exact integer Gram/matvec, float division,
away-from-zero rounding), the recovery of a PLANTED dominant direction,
and the rounding-rule edge (Python round() half-even would diverge).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from alphavantage_etl_spark.operators.spectral import principal_direction


def _reference(vectors, scale=1_000_000, iters=8):
    Q = [[round(float(x) * scale) for x in v] for v in vectors]
    d = len(Q[0])
    G = [[sum(q[i] * q[j] for q in Q) for j in range(d)] for i in range(d)]
    v = [scale] * d

    def away(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    for _ in range(iters):
        s = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in s)
        v = [away(float(x) / float(m) * scale) if m else 0 for x in s]
    num = sum(
        G[i][j] * v[i] * v[j] for i in range(d) for j in range(d)
    )
    den = sum(x * x for x in v)
    return v, float(num) / float(den)


def test_matches_python_reference_on_fixture(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        r.dim: (r.component, r.rayleigh)
        for r in principal_direction(emb, "embedding", "vec_id").collect()
    }
    vectors = [r.embedding for r in emb.select("embedding").collect()]
    want_v, want_ray = _reference(vectors)
    assert len(got) == len(want_v)
    for i, w in enumerate(want_v, start=1):
        assert got[i][0] == w, (i, got[i][0], w)
    assert got[1][1] == pytest.approx(want_ray, rel=1e-12)


def test_recovers_planted_direction(spark):
    """Vectors drawn (deterministically) along one axis direction plus a
    weak orthogonal one: the dominant component must align with the
    strong axis (|component| = scale there) and be weak elsewhere."""
    rows = []
    for i in range(50):
        a = 1.0 if i % 2 == 0 else -1.0  # strong axis 0, alternating sign
        b = 0.05 * ((i % 5) - 2)  # weak axis 1
        rows.append(Row(vec_id=i, embedding=[a, b, 0.0, 0.0]))
    df = spark.createDataFrame(rows)
    got = {
        r.dim: r.component
        for r in principal_direction(df, "embedding", "vec_id").collect()
    }
    assert abs(got[1]) == 1_000_000  # the planted axis dominates
    assert abs(got[2]) < 200_000
    assert got[3] == 0 and got[4] == 0


def test_zero_corpus_yields_zero_vector(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[0.0, 0.0, 0.0]) for i in range(4)]
    )
    out = principal_direction(df, "embedding", "vec_id").collect()
    assert sorted(r.component for r in out) == [0, 0, 0]
    assert all(r.rayleigh is None for r in out)


def test_rejects_bad_iters(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[1.0])])
    with pytest.raises(ValueError):
        principal_direction(df, "embedding", "vec_id", iters=0)


def test_overflow_guard_raises_with_remedy(spark):
    """Huge-magnitude vectors at the default scale would overflow the
    decimal(38,0) iteration products — under non-ANSI Spark that comes
    back as NULL and used to surface as an unactionable int(None)
    TypeError (r9 advice). The guard must raise a ValueError naming
    `scale` as the remedy BEFORE any overflow can corrupt a sum."""
    rows = [(i, [1.0e6, -1.0e6]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="scale"):
        principal_direction(df, "embedding", "vec_id")


def test_overflow_guard_passes_unit_vectors(spark):
    """Ordinary unit-magnitude embeddings are far inside the bound — the
    guard must not fire (and costs one d^2-bounded agg)."""
    rows = [(i, [0.6, 0.8]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = principal_direction(df, "embedding", "vec_id").collect()
    assert len(out) == 2
