"""Shared fixtures: one SparkSession per test session, DuckDB oracle
harness mirroring the driver's compare (row count + schema-insensitive
sorted-value compare with float tolerance)."""

from __future__ import annotations

import math

import duckdb
import pytest

from dislib_spark.session import get_spark
from dislib_spark.tables import TABLES

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dislib-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                norm.append(round(v, 6))
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


def assert_df_matches_oracle(df, con, sql, approx=1e-6):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB
    result (column order normalized by sorted name, like the driver)."""
    cols = sorted(df.columns)
    spark_rows = [tuple(r[c] for c in cols) for r in df.collect()]
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    order = [duck_cols.index(c) for c in sorted(duck_cols)]
    duck_rows = [tuple(r[i] for i in order) for r in duck.fetchall()]
    assert sorted(duck_cols) == cols, f"schema mismatch: {sorted(duck_cols)} vs {cols}"
    a, b = _normalize(spark_rows), _normalize(duck_rows)
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=approx, abs_tol=approx), (
                    f"{va} != {vb} in rows {ra} vs {rb}"
                )
            else:
                assert va == vb, f"{va!r} != {vb!r} in rows {ra} vs {rb}"
