"""The t2 gate, run locally: every oracle-backed contract query must match
its DuckDB oracle exactly at sf0.01; rows-only queries must run and return
plausible rows."""

from __future__ import annotations

import pytest

from alphavantage_etl_spark.queries import ORACLES, QUERIES

from .conftest import SF_ORACLE
from .oracle import assert_matches_oracle

ORACLE_BACKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_match(spark, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    assert_matches_oracle(sdf, SF_ORACLE, ORACLES[name], name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    n = sdf.count()
    assert n >= 0
    sdf.limit(5).collect()
