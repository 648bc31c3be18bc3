"""Oracle output-type sweep: no oracle may emit HUGEINT or DECIMAL
columns. DuckDB SUM(BIGINT) returns HUGEINT and decimal stays
decimal — both serialize differently from Spark's long/double under
the driver's pandas-based value hash (910.0 vs 910), so every oracle
must cast aggregates to BIGINT / DOUBLE explicitly. Pure-DuckDB test
(no Spark session), runs every registered oracle at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from dislib_spark.queries import all_oracles
from tests.conftest import SF_SMOKE

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED = ("HUGEINT", "DECIMAL", "INT128")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_output_types(con, name):
    res = con.execute(all_oracles()[name])
    # description: (name, type_code, ...) — DuckDB reports type names
    bad = [
        (col[0], str(col[1]))
        for col in res.description
        if any(b in str(col[1]).upper() for b in BANNED)
    ]
    assert not bad, f"{name}: oracle emits banned column types {bad}"
