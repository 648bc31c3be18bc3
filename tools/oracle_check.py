"""Replicate the driver's per-query oracle compare for named queries.

Usage: python tools/oracle_check.py q18_asof_join s05_interval_join
(no args = every query that has an oracle). Mirrors the driver:
sf0.01 views in DuckDB, column sort by NAME, float round(6), md5.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")  # self-bootstrap like driver_check.py

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def h(df):
    df2 = df.copy()
    for c in df2.columns:
        if df2[c].dtype.kind == "f":
            df2[c] = df2[c].round(6)
    return hashlib.md5(df2.to_csv(index=False).encode()).hexdigest()


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from dislib_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    qs, osql = mod.queries(), mod.oracle_sql()
    names = sys.argv[1:] or [k for k in qs if k in osql]
    bad = 0
    for k in names:
        if k not in osql:
            n = qs[k](spark, SF).count()
            print(f"{k}: rows-only ({n} rows)")
            continue
        try:
            a = canon(qs[k](spark, SF).toPandas())
            b = canon(con.execute(osql[k]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ERROR {e}")
            bad += 1
            continue
        ok_rows = len(a) == len(b)
        ok_schema = list(a.columns) == list(b.columns)
        ok_hash = ok_rows and ok_schema and h(a) == h(b)
        status = "OK" if ok_hash else "FAIL"
        print(
            f"{k}: {status} rows={len(a)}/{len(b)} "
            f"schema={ok_schema} hash={ok_hash}"
        )
        if not ok_hash:
            bad += 1
            if ok_schema and ok_rows:
                import pandas as pd  # noqa: F401

                for c in a.columns:
                    if not a[c].equals(b[c]):
                        print(f"  col {c}: spark={a[c].head(3).tolist()} "
                              f"oracle={b[c].head(3).tolist()}")
            else:
                print(f"  spark cols={list(a.columns)} oracle cols={list(b.columns)}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
