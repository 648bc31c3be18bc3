"""Cross-query integrity invariants.

Each declared query is oracle-checked in isolation; these tests
assert relationships BETWEEN queries/operators and the base tables —
the class of bug a per-query value hash can't see (an operator that
drops rows consistently on both engines still reconciles here).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.queries import all_queries
from dislib_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _q(spark, name):
    return all_queries()[name](spark, SF_SMOKE)


def test_exact_dedup_partitions_the_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = _q(spark, "t03_dedup_exact").agg(F.sum("n_copies")).first()[0]
    assert got == docs.count()


def test_histogram_reconciles_with_orders(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    hist = _q(spark, "x41_histogram").agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    ).first()
    assert hist["n"] == o.count()
    exact = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).first()[0]
    assert abs(hist["total"] - exact) < 1e-6


def test_latest_per_key_covers_every_user(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = _q(spark, "x43_latest_per_key")
    assert got.count() == ev.select("user_id").distinct().count()
    # survivor really is that user's max timestamp
    mx = ev.groupBy("user_id").agg(F.max("ts").alias("mts"))
    joined = got.join(ev.select("user_id", "event_id", "ts"), ["user_id", "event_id"])
    bad = joined.join(mx, "user_id").where(F.col("ts") != F.col("mts")).count()
    assert bad == 0


def test_tpch_q1_counts_reconcile(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    q1 = _q(spark, "x25_tpch_q1")
    assert (
        q1.agg(F.sum("count_order")).first()[0]
        == li.where(F.col("l_shipdate") <= "2001-09-01").count()
    )


def test_tumbling_windows_cover_all_events(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    assert (
        _q(spark, "s01_tumbling").agg(F.sum("n")).first()[0] == ev.count()
    )


def test_span_stats_bounded_by_doc_length(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    spans = _q(spark, "t29_dup_spans")
    bad = (
        spans.join(docs, "doc_id")
        .where(
            (F.col("dup_tokens") > F.col("n_tok"))
            | (F.col("max_span") > F.col("n_tok"))
            | (F.col("n_spans") < 1)
        )
        .count()
    )
    assert bad == 0
