"""Custom Python DataSource: svmlight format with per-file partitions
and stateless scan-side label skipping (and a regression pin on the
pushFilters leak that motivated the option-based design)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_files(tmp_path):
    d = tmp_path / "svm"
    d.mkdir()
    (d / "part0.txt").write_text(
        "1 0:1.5 3:2.0\n0 1:0.5\n# comment line\n\n1 2:3.0 # trailing\n"
    )
    (d / "part1.txt").write_text("0 0:4.0 4:5.0\n1 3:6.5\n")
    return str(d)


def test_svmlight_source_reads_directory(spark, tmp_path):
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    path = _write_files(tmp_path)
    df = spark.read.format("svmlight").load(path)
    rows = sorted(
        (r.label, tuple(r.indices), tuple(r.values)) for r in df.collect()
    )
    assert rows == [
        (0.0, (0, 4), (4.0, 5.0)),
        (0.0, (1,), (0.5,)),
        (1.0, (0, 3), (1.5, 2.0)),
        (1.0, (2,), (3.0,)),
        (1.0, (3,), (6.5,)),
    ]
    # one partition per file → the scan parallelizes across shards
    assert df.rdd.getNumPartitions() == 2


def test_svmlight_source_label_skipping_option(spark, tmp_path):
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    path = _write_files(tmp_path)
    pos = (
        spark.read.format("svmlight")
        .option("min_label", "0.5")
        .load(path)
    )
    assert sorted(tuple(r.indices) for r in pos.collect()) == [
        (0, 3),
        (2,),
        (3,),
    ]
    neg = (
        spark.read.format("svmlight")
        .option("max_label", "0.5")
        .load(path)
    )
    assert neg.count() == 2


def test_svmlight_source_no_cross_query_leak(spark, tmp_path):
    """The reason pushFilters is NOT implemented: the reader is
    cached in the scan relation, so query-pushed state would leak.
    With option-based skipping, repeated mixed queries on ONE
    DataFrame stay independent."""
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    path = _write_files(tmp_path)
    df = spark.read.format("svmlight").load(path)
    assert df.where(F.col("label") == 1.0).count() == 3
    assert df.count() == 5  # unfiltered re-query unaffected
    assert df.where(F.size("indices") == 2).count() == 2
    assert df.count() == 5


def test_svmlight_source_write_read_roundtrip(spark, tmp_path):
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    src = _write_files(tmp_path)
    df = spark.read.format("svmlight").load(src)
    out = str(tmp_path / "out_svm")
    df.repartition(3).write.format("svmlight").mode("append").save(out)
    back = spark.read.format("svmlight").load(out)
    a = sorted(
        (r.label, tuple(r.indices), tuple(r.values)) for r in df.collect()
    )
    b = sorted(
        (r.label, tuple(r.indices), tuple(r.values)) for r in back.collect()
    )
    assert a == b
    import os

    assert len(os.listdir(out)) == 3  # one shard per partition


def test_svmlight_source_overwrite_replaces(spark, tmp_path):
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    src = _write_files(tmp_path)
    df = spark.read.format("svmlight").load(src)
    out = str(tmp_path / "ow_svm")
    df.write.format("svmlight").mode("overwrite").save(out)
    df.write.format("svmlight").mode("overwrite").save(out)
    back = spark.read.format("svmlight").load(out)
    assert back.count() == 5  # NOT doubled — overwrite replaced shards
    import os

    # no in-progress leftovers after commit
    assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]


def test_svmlight_write_preserves_full_double_precision(spark, tmp_path):
    """Writer emits %.17g so write→read round-trips exact IEEE doubles
    (a %g writer silently truncates to 6 significant digits)."""
    from dislib_spark.sources.svmlight_source import register

    register(spark)
    vals = [0.1234567890123, 1.0 / 3.0, 6.02214076e23, -2.2250738585072014e-308]
    df = spark.createDataFrame(
        [(0.1234567890123, list(range(len(vals))), vals)],
        "label double, indices array<int>, values array<double>",
    )
    out = str(tmp_path / "prec_svm")
    df.write.format("svmlight").mode("append").save(out)
    back = spark.read.format("svmlight").load(out).collect()[0]
    assert back.label == 0.1234567890123
    assert list(back.values) == vals
