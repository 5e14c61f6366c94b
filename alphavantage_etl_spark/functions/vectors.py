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


def random_projection(
    df,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_dims: int = 8,
    salt: str = "rp0",
    ticks: int = 1_000_000,
):
    """Johnson-Lindenstrauss sign random projection: reduce each vector
    to ``out_dims`` components ``p_j = sum_i s(j,i) * x_i`` with
    content-addressed signs ``s(j,i) = ±1`` from ``md5(salt:j:i)`` — the
    Achlioptas database-friendly projection (±1 entries preserve pairwise
    distances in expectation like Gaussian ones). The cheap dimension
    squeeze before ANN indexing, clustering, or sketching when the full
    embedding is too wide to shuffle.

    Output columns: (id, p0..p{out_dims-1}). Scalar per-dimension columns
    (not an array) so the result is driver-canonicalizer-hashable and
    directly usable as join/sort keys.

    Determinism: components quantize to integer ``ticks`` units BEFORE
    the signed sum — each p_j is an EXACT integer sum (fold-order- and
    engine-immune; no floating accumulation anywhere), divided once at
    the end. The conventional 1/sqrt(k) scale is omitted (a constant
    factor — distances scale uniformly; apply downstream if magnitudes
    matter).

    Scale design (100 TB): pure projection — one pass, no shuffle, no
    UDF; the sign for (j, i) derives in-plan from md5 of two literals
    and the element index, so there is no weight matrix to broadcast at
    ANY dimensionality (the matrix is the hash function).
    """
    from pyspark.sql import functions as F

    if out_dims < 1:
        raise ValueError(f"out_dims must be >= 1, got {out_dims}")
    v = F.col(vec_col)
    idx = F.sequence(F.lit(1), F.size(v))
    cols = [F.col(id_col)]
    for j in range(out_dims):
        # sign = +1 iff the first hex nibble of md5('salt:j:i') is even.
        # aggregate() folds EXACT LONGS: x_i quantizes to ticks first.
        term = F.aggregate(
            idx,
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.when(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(salt),
                                F.lit(str(j)),
                                i.cast("string"),
                            )
                        ),
                        1,
                        1,
                    ),
                    16,
                    10,
                ).cast("int")
                % 2
                == 0,
                F.lit(1),
            ).otherwise(F.lit(-1))
            * F.round(F.element_at(v, i).cast("double") * ticks).cast("long"),
        )
        cols.append(
            (term.cast("double") / F.lit(float(ticks))).alias(f"p{j}")
        )
    return df.select(*cols)


def embedding_diagnostics(
    df,
    vec_col: str = "embedding",
    ticks: int = 1_000_000,
):
    """Per-DIMENSION health profile of an embedding column: (dim, n,
    mean, variance, min, max) — the "is this embedding space alive"
    check before indexing or training on it: a dimension with ~zero
    variance is collapsed (wasted capacity, and a degenerate axis for
    any quantizer trained on it); wildly uneven variances (anisotropy)
    degrade cosine retrieval.

    Determinism: components quantize to integer ``ticks`` units; mean
    and variance derive from exact decimal(38,0) sums of q and q*q
    (population variance, the sufficient-statistics discipline) with
    one fixed-order double expression each.

    Scale design (100 TB): one `posexplode` Generate over the scan into
    a partial-aggregated groupBy(dim) — output bounded by the embedding
    WIDTH regardless of corpus size; no shuffle beyond the dim-keyed
    exchange of per-task partials.
    """
    from pyspark.sql import functions as F

    v = F.col(vec_col)
    q = F.round(F.col("__x").cast("double") * ticks).cast("long")
    qt = F.lit(float(ticks))
    exploded = df.select(
        F.posexplode(v).alias("__d", "__x")
    ).select(
        (F.col("__d") + 1).cast("long").alias("dim"), q.alias("__q")
    )
    g = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__q").cast("decimal(38,0)")).alias("__s"),
        F.sum(
            F.col("__q").cast("decimal(38,0)") * F.col("__q")
        ).alias("__ss"),
        F.min("__q").alias("__mn"),
        F.max("__q").alias("__mx"),
    )
    nf = F.col("n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    return g.select(
        "dim",
        "n",
        (s / qt / nf).alias("mean"),
        ((ss - s * s / nf) / nf / qt / qt).alias("variance"),
        (F.col("__mn").cast("double") / qt).alias("min"),
        (F.col("__mx").cast("double") / qt).alias("max"),
    )
