"""Jaro-Winkler kernel: literature values, DuckDB-builtin parity,
and the blocked-pair cap."""

import duckdb
import pytest
from pyspark.sql import functions as F

from dislib_spark.text.similarity import jaro_winkler, jaro_winkler_pairs


def test_jw_literature_values():
    assert abs(jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler("dwayne", "duane") - 0.84) < 1e-12
    assert abs(jaro_winkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-12
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("xy", "yx") == 0.0  # window 0: no matches


def test_jw_matches_duckdb_builtin():
    """The oracle relies on bit-parity with DuckDB's implementation
    on ASCII (bytes == codepoints there)."""
    con = duckdb.connect()
    pairs = [
        ("spark table scan", "spark table scans"),
        ("hello world", "help word"),
        ("key agg row", "key row agg"),
        ("the quick brown fox", "the quick brown fax"),
        ("aaa bbb ccc", "aaa ccc bbb"),
        ("short", "a much longer string here"),
    ]
    for a, b in pairs:
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler(a, b) - d) < 1e-12, (a, b)


def test_jw_bytes_vs_codepoints_divergence():
    """Documented divergence: DuckDB walks BYTES — on multi-byte
    input the two implementations legitimately differ, which is why
    query keys are ASCII-stripped."""
    con = duckdb.connect()
    a, b = "中文文本测试", "中文本文测试"
    d = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert abs(jaro_winkler(a, b) - d) > 1e-6


def test_blocked_pairs_cap_and_threshold(spark):
    rows = [
        (1, "g", "spark table scan"),
        (2, "g", "spark table scans"),
        (3, "g", "completely different text"),
        (4, "h", "spark table scan"),  # other block: never paired with 1
        (5, "g", "spark table scan"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, g string, k string")
    got = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in jaro_winkler_pairs(
            df, "k", "doc_id", ["g"], threshold=0.9, max_block=10
        ).collect()
    }
    assert (1, 2) in got and (1, 5) in got and got[(1, 5)] == 1.0
    assert all(a != 4 and b != 4 for a, b in got)
    # cap: max_block=2 keeps ids 1,2 only in block g
    capped = jaro_winkler_pairs(
        df, "k", "doc_id", ["g"], threshold=0.0, max_block=2
    ).collect()
    assert {(r["a_id"], r["b_id"]) for r in capped} == {(1, 2)}
