"""Per-job/stage profile of declared queries (guide §1: measure first).

Runs each named query in a warm session (one warm-up pass, one timed
pass through the noop sink) with the Spark UI enabled, then reads the
UI REST API for the timed run's jobs and stages so the wall-clock can
be attributed to scan / exchange / python-eval stages instead of
guessed at.

Usage: python tools/profile_query.py <query> [query ...]
       python tools/profile_query.py --top N     # N slowest ledger items
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> None:
    args = sys.argv[1:]
    from pyspark.sql import SparkSession

    from dislib_spark.queries import all_queries
    from dislib_spark.session import get_spark

    # same factory confs, but with the UI on for the REST API
    import dislib_spark.session as sess_mod

    orig_builder = SparkSession.builder

    names: list[str] = []
    queries = all_queries()
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 10
        ledger = json.load(open("/root/repo/.benchmarks/last_full_sf0.1.json"))
        q = ledger.get("queries", ledger)
        names = [
            k
            for k, _ in sorted(q.items(), key=lambda kv: -kv[1])
            if k in queries
        ][:n]
    else:
        names = args

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4055/api/v1/applications/{app_id}"

    for name in names:
        fn = queries[name]
        # warm-up
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()

        jobs = [
            j for j in _get(f"{base}/jobs") if j["jobId"] not in jobs_before
        ]
        stage_ids = sorted(
            {s for j in jobs for s in j.get("stageIds", [])}
        )
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                st = _get(f"{base}/stages/{sid}")
            except Exception:
                continue
            for s in st:
                if s["status"] == "SKIPPED":
                    continue
                dur = 0.0
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f"
                    t1 = datetime.strptime(
                        s["firstTaskLaunchedTime"].replace("GMT", ""), fmt
                    )
                    t2 = datetime.strptime(
                        s["completionTime"].replace("GMT", ""), fmt
                    )
                    dur = (t2 - t1).total_seconds()
                rows.append(
                    (
                        dur,
                        sid,
                        s["numCompleteTasks"],
                        s.get("executorRunTime", 0) / 1000.0,
                        s.get("shuffleReadBytes", 0) / 1e6,
                        s.get("shuffleWriteBytes", 0) / 1e6,
                        s["name"].split("\n")[0][:70],
                    )
                )
        rows.sort(reverse=True)
        tot_stage = sum(r[0] for r in rows)
        print(f"  stage wall sum {tot_stage:.3f}s "
              f"(gaps/driver = {wall - tot_stage:.3f}s)")
        for dur, sid, ntask, run, srd, swr, nm in rows:
            print(
                f"  {dur:7.3f}s  stage {sid:>4} tasks={ntask:<3} "
                f"exec={run:6.2f}s shR={srd:7.2f}MB shW={swr:7.2f}MB  {nm}"
            )


if __name__ == "__main__":
    main()
