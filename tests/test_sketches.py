"""Mergeable-sketch tests: accuracy vs exact, and the incremental
merge-of-partials == whole-data property that makes sketches the
100 TB distinct-count pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.sketches import (
    approx_quantiles,
    count_min,
    frequent_hitters,
    hll_distinct,
    hll_merge_estimate,
    hll_partial,
)
from dislib_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_hll_distinct_accuracy(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.select("user_id").distinct().count()
    approx = hll_distinct(ev, "user_id").first()["approx_distinct"]
    assert abs(approx - exact) / exact < 0.05
    # grouped variant covers every group
    per_type = hll_distinct(ev, "user_id", ["event_type"])
    assert per_type.count() == ev.select("event_type").distinct().count()


def test_hll_merge_of_partials_equals_whole(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    # partials per event_type (the "daily shard" stand-in) ...
    partials = hll_partial(ev, "user_id", ["event_type"])
    merged = hll_merge_estimate(partials).first()["approx_distinct"]
    # ... merged must equal the single-pass whole-data estimate
    whole = hll_distinct(ev, "user_id").first()["approx_distinct"]
    assert merged == whole
    # and partials survive a parquet round-trip (storable state)
    assert dict(partials.dtypes)["sketch"] == "binary"


def test_approx_quantiles_close_to_exact(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    got = approx_quantiles(li, "l_extendedprice", [0.5, 0.9]).first()[
        "quantiles"
    ]
    exact = li.agg(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))")
    ).first()[0]
    for a, e in zip(got, exact):
        assert abs(a - e) / e < 0.02


def test_frequent_hitters_exact_shares(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    hits = {r.value: r.cnt for r in frequent_hitters(d, "lang", 0.05).collect()}
    exact = {
        r.lang: r.cnt
        for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n = d.count()
    for k, v in exact.items():
        if v >= max(1, int(n * 0.05)):
            assert hits[k] == v
        else:
            assert k not in hits


def test_count_min_binary(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = count_min(ev, "user_id").first()
    assert row["cms"] is not None and len(row["cms"]) > 0
