"""Vector similarity over ``array<float>`` columns — UDF-free.

North-star extension (SURVEY.md section 2.11 X3): similarity math stays in
native Catalyst expressions (``aggregate``/``zip_with``/``transform``) so it
runs JVM-side inside whole-stage codegen — no Python round trip, no Arrow
batching, scales linearly with executor count.

Precision contract: each float*float product is exact in double (24-bit
mantissas -> 48-bit product < 53), so cross-engine differences are confined
to summation order; callers that hash-compare against another engine should
round the final similarity (6 dp leaves ~1e-10 headroom over the ~1e-15
noise for unit-normalized 64-dim embeddings).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays, computed in double."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a.b / (|a| |b|); NULL-safe on zero vectors (returns NULL)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb))
