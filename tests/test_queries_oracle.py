"""Every declared query (relational + text + vector + ml) vs the
DuckDB oracle at sf0.001 — the local version of the driver's t2 gate.
Queries without an oracle get a rows-only smoke check."""

from __future__ import annotations

import pytest

from dislib_spark.queries import all_oracles, all_queries
from tests.conftest import SF_SMOKE, assert_df_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()

WITH_ORACLE = sorted(k for k in QUERIES if k in ORACLES)
ROWS_ONLY = sorted(k for k in QUERIES if k not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert_df_matches_oracle(df, oracle, ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_query_runs(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    rows = df.collect()
    assert rows is not None
    assert df.columns  # stable schema


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert len(df.collect()) > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
