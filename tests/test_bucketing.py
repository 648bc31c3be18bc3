"""Storage-layout shuffle avoidance: bucketed join without Exchange,
partition pruning, and co-partitioned join reuse — plan-asserted."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from dislib_spark.sources.bucketing import (
    cluster_for_join,
    load_table_bucketed,
    save_bucketed,
    save_partitioned,
)
from dislib_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@contextlib.contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_bucketed_join_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    save_bucketed(
        orders, "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(tmp_path / "bo"),
    )
    save_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(tmp_path / "bl"),
    )
    try:
        bo = load_table_bucketed(spark, "b_orders")
        bl = load_table_bucketed(spark, "b_lineitem")
        # force a non-broadcast join so bucketing is what kills the
        # shuffle, not a broadcast
        with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            j = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"]).select(
                "o_orderkey", "l_quantity"
            )
            plan = _plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            # correctness: same row count as the un-bucketed join
            expect = orders.join(
                lineitem,
                orders["o_orderkey"] == lineitem["l_orderkey"],
            ).count()
            assert j.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_by_lang")
    save_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    q = back.where(F.col("lang") == "en").select("doc_id")
    plan = _plan(q)
    # pruning happens at the scan: the lang filter is a partition
    # filter, and only the en directory is listed
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert q.count() == docs.where(F.col("lang") == "en").count()


def test_cluster_for_join_reuses_partitioning(spark):
    orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
        "o_orderkey", "k"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "k"
    )
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        lo, li = cluster_for_join(orders, lineitem, ["k"], 8)
        j = lo.join(li, "k").select("k", "l_quantity")
        plan = _plan(j)
        # exactly the two explicit repartition exchanges; the join
        # itself adds none (formatted plans print each node twice:
        # once in the tree, once as a "(n) Exchange" detail header)
        assert plan.count(") Exchange") == 2, plan


@pytest.mark.parametrize("bad", [[], None])
def test_save_bucketed_requires_cols(spark, tmp_path, bad):
    docs = load_table(spark, SF_SMOKE, "documents")
    with pytest.raises(Exception):
        save_bucketed(docs, "b_bad", bad, 4, path=str(tmp_path / "x"))
