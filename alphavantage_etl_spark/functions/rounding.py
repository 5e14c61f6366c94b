"""Money rounding with the reference's exact semantics.

The reference computes ``round(closePriceUsd * closeRate, 2)`` on a pandas
Series (av_etl.py:192-193), which dispatches to numpy: **scale by 10^2,
rint (ties-to-even on the scaled binary double), scale back**. That is
half-even — ``round(2.665, 2) == 2.66``, ``round(0.125, 2) == 0.12`` — but
NOT the same as Spark's ``bround(x, 2)``: bround rounds the shortest
*decimal representation* (BigDecimal.valueOf), so on 2.675 (binary
2.67499999...) bround says 2.68 while numpy/pandas say 2.67. Composing
``bround(x * 100, 0) / 100`` reproduces the numpy algorithm: the scaled
value's shortest repr coincides with its binary tie structure, verified
against Python/numpy on tie cases (tests/test_semantics.py).

DuckDB's ``round_even`` uses the same scaled-multiply algorithm, so the
oracle side matches this formulation (SURVEY.md section 2.2 P6, 7.3.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_round(col: Column | str, scale: int = 2) -> Column:
    """Half-even rounding with numpy/pandas ``round(x, scale)`` parity."""
    c = F.col(col) if isinstance(col, str) else col
    f = float(10**scale)
    return F.bround(c * f, 0) / f


def away_round(x: float) -> int:
    """Driver-side integer rounding with Spark/DuckDB ``round(double)``
    parity: HALF_UP means away from zero on exact .5 ties, where
    Python's built-in ``round`` is half-even and would diverge. Used by
    every operator that re-quantizes collected O(model) state between
    distributed steps (Bradley-Terry strengths, exact k-means means,
    the spectral power method) so the driver-side step replays
    identically in a SQL oracle."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))
