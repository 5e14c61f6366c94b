"""Privacy-compliance audit operators (X126).

Before a curated corpus (or its metadata manifest) is released, the
standard re-identification check is k-anonymity over the quasi-identifier
columns: any combination of quasi-identifiers shared by fewer than ``k``
rows singles those rows out. ``scrub_pii`` (functions/text.py) removes
direct identifiers from text; this operator audits the METADATA columns
that survive scrubbing.

No reference analogue (the reference is a market-data ETL); follows the
repo-wide discipline: one map-side-combinable aggregation on the
composite quasi-identifier key, no UDFs, oracle-checkable in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Equivalence classes of the quasi-identifier tuple with fewer than
    ``k`` members — the rows a release would expose to re-identification.
    Returns one row per violating class: the quasi columns, ``class_size``,
    and ``deficit`` (how many more rows the class would need).

    NULL quasi values form their own classes (SQL GROUP BY semantics):
    a NULL in a quasi column is still an observable attribute of the
    released row, so it must be audited like any other value, not
    dropped.

    Scale: ONE hash shuffle on the composite key with map-side partial
    counts; output is bounded by the number of *violating* classes (at a
    healthy k the rare tail), never the corpus. Suppression/
    generalization is the caller's policy — an audit must report, not
    mutate.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
        .withColumn("deficit", F.lit(k) - F.col("class_size"))
    )
