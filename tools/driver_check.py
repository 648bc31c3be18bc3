"""Local mimic of the driver's correctness gate.

Differences from tests/test_queries_oracle.py (which is a tolerant
dev-loop check):

* uses a VANILLA SparkSession (no dislib_spark.session configs) — the
  driver builds its own session, so every query must work without our
  factory's conf workarounds;
* EXACT value compare (no float tolerance) after sorting columns by
  name and rows by repr — the driver hashes values, so 1e-6 drift is a
  fail, not a pass.

Usage: python tools/driver_check.py [sf_dir] [query ...]
       python tools/driver_check.py [sf_dir] --since <git-ref>

``--since`` reruns only the queries whose DEFINING module changed
since the ref (fast dev loop as the registry grows); engine-module
changes outside dislib_spark/queries/ print a warning because they
can affect queries in unchanged modules — the full sweep stays the
round-close gate.
"""

from __future__ import annotations

import datetime
import decimal
import json
import subprocess
import sys

import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
_rest = sys.argv[2:]
SINCE = None
if "--since" in _rest:
    i = _rest.index("--since")
    SINCE = _rest[i + 1]
    _rest = _rest[:i] + _rest[i + 2 :]
ONLY = set(_rest)


def _changed_query_filter() -> set[str] | None:
    """Names of declared queries whose defining module changed since
    SINCE (None = no --since given → run everything requested)."""
    if SINCE is None:
        return None
    out = subprocess.run(
        ["git", "diff", "--name-only", SINCE, "--", "."],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    changed = set(out)
    non_query_engine = [
        f
        for f in changed
        if f.startswith("dislib_spark/")
        and not f.startswith("dislib_spark/queries/")
    ]
    if non_query_engine:
        # Engine modules feed query results through imports the
        # file→query map can't see — a warn-and-skip here would let
        # an affected query read as green without running. Fall back
        # to the full sweep instead (ADVICE r4).
        print(
            f"--since: {len(non_query_engine)} engine files outside "
            f"dislib_spark/queries/ changed ({non_query_engine[:5]}) "
            "— falling back to the FULL sweep",
            file=sys.stderr,
        )
        return None
    import importlib
    import inspect
    import os

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    keep = set()
    for name, fn in entry.queries().items():
        try:
            src = inspect.getsourcefile(inspect.unwrap(fn))
            rel = os.path.relpath(src, "/root/repo")
        except TypeError:
            rel = None
        if rel in changed:
            keep.add(name)
    return keep

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    since_keep = _changed_query_filter()
    if since_keep is not None:
        print(
            f"--since {SINCE}: {len(since_keep)} queries from changed "
            "modules",
            file=sys.stderr,
        )
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if since_keep is not None and name not in since_keep:
            continue
        rec = {}
        try:
            df = fn(spark, SF)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(srows)
            if name in oracles:
                duck = con.execute(oracles[name])
                dcols = [d[0] for d in duck.description]
                drows = duck.fetchall()
                rec["oracle_rows"] = len(drows)
                sc, sr = canon(scols, srows)
                dc, dr = canon(dcols, drows)
                rec["rows_match"] = len(sr) == len(dr)
                rec["schema_match"] = sc == dc
                rec["hash_match"] = sr == dr
                if not rec["hash_match"] and rec["rows_match"] and rec["schema_match"]:
                    diffs = [
                        (a, b) for a, b in zip(sr, dr) if a != b
                    ][:3]
                    rec["first_diffs"] = diffs
            else:
                rec["oracle"] = "rows_only"
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:400]
        results[name] = rec
        ok = rec.get("hash_match", "err" not in rec)
        print(("PASS " if ok else "FAIL ") + name + (" " + json.dumps(rec, default=str)[:300] if not ok else ""))
    n_bad = sum(
        1
        for r in results.values()
        if not r.get("hash_match", "err" not in r)
    )
    print(f"\n{len(results) - n_bad}/{len(results)} green")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
