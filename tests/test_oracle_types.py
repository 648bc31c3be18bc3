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
    # DESCRIBE reports real column types; cursor.description maps
    # HUGEINT to the generic 'NUMBER' type_code and would miss it
    # (caught round 7: five SUM(int) oracles sailed through the old
    # check but hashed as floats under the pandas path).
    cols = con.execute(f"DESCRIBE {all_oracles()[name]}").fetchall()
    bad = [
        (c[0], c[1])
        for c in cols
        if any(b in str(c[1]).upper() for b in BANNED)
    ]
    assert not bad, f"{name}: oracle emits banned column types {bad}"
