"""Money rounding with the reference's exact semantics.

The reference computes ``round(closePriceUsd * closeRate, 2)`` with Python's
builtin ``round`` (av_etl.py:192-193), which is **banker's rounding**
(half-to-even): ``round(2.665, 2) == 2.66``, ``round(0.125, 2) == 0.12``.
Spark's ``F.round`` is half-up and diverges on exact ties; ``F.bround`` is
half-even and matches (SURVEY.md section 2.2 P6, section 7.3.3). The DuckDB
oracle side must use ``round_even`` for the same reason.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_round(col: Column | str, scale: int = 2) -> Column:
    """Half-even rounding — drop-in for the reference's ``round(x, 2)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.bround(c, scale)
