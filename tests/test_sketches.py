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


def test_bloom_semi_join_exact_and_selective(spark):
    """Bloom prefilter: (a) result identical to a plain semi join
    (no false negatives by construction), (b) the prefilter alone
    keeps all true matches and drops most non-matches."""
    from pyspark.sql import functions as F

    from dislib_spark.sketches import (
        bloom_build,
        bloom_prefilter,
        bloom_semi_join,
    )

    probe = spark.range(0, 20_000).select(F.col("id").alias("k"))
    build = spark.range(0, 20_000, 97).select(F.col("id").alias("bk"))

    got = sorted(
        r.k for r in bloom_semi_join(probe, build, "k", "bk").collect()
    )
    expect = sorted(
        r.k
        for r in probe.join(
            build.select(F.col("bk").alias("k")), "k", "left_semi"
        ).collect()
    )
    assert got == expect

    bloom = bloom_build(build, "bk", n_bits=1 << 16)
    pre = bloom_prefilter(probe, "k", bloom)
    n_pre = pre.count()
    # every true key survives the prefilter...
    assert set(expect) <= {r.k for r in pre.collect()}
    # ...and the false-positive rate is low (5 hashes, 2^16 bits,
    # ~207 keys -> fpp well under 1%)
    assert n_pre < len(expect) + 0.01 * 20_000


def test_bloom_partials_merge(spark):
    """Bit arrays from shards OR together == whole-corpus build
    (mergeability, the sketch contract)."""
    from pyspark.sql import functions as F

    from dislib_spark.sketches import bloom_build

    df = spark.range(0, 5_000).select(F.col("id").alias("k"))
    whole = bloom_build(df, "k", n_bits=1 << 14)
    a = bloom_build(df.where(F.col("k") < 2_500), "k", n_bits=1 << 14)
    b = bloom_build(df.where(F.col("k") >= 2_500), "k", n_bits=1 << 14)
    assert [x | y for x, y in zip(a, b)] == whole


def test_sampled_quantiles_mergeable_and_bounded_error(spark):
    """(a) Mergeability: the hash sample of a union equals the union
    of per-shard hash samples — quantiles over either are identical.
    (b) Accuracy: at 20% rate on 5k uniform values the p50/p90
    estimates land within a few rank-percent of exact."""
    from pyspark.sql import functions as F

    from dislib_spark.sketches import sampled_quantiles

    rows = [(i, float((i * 37) % 5000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)

    def q(frame):
        return sampled_quantiles(
            frame, "v", F.col("id"), rate=0.2, qs=(0.5, 0.9)
        ).collect()[0]

    whole = q(df)
    merged = q(a.unionAll(b))
    assert whole == merged  # per-row decision ⇒ sketch merges by union

    # independent shard samples union to the whole-corpus sample
    from dislib_spark.sampling import hash_bucket

    kept_whole = {
        r["id"]
        for r in df.where(hash_bucket(F.col("id"), 10000) < 2000)
        .select("id")
        .collect()
    }
    kept_shards = set()
    for shard in (a, b):
        kept_shards |= {
            r["id"]
            for r in shard.where(
                hash_bucket(F.col("id"), 10000) < 2000
            )
            .select("id")
            .collect()
        }
    assert kept_whole == kept_shards

    assert abs(whole["p50"] - 2499.5) < 250  # exact p50 of 0..4999
    assert abs(whole["p90"] - 4499.0) < 250


def test_stride_quantiles_rank_error_contract(spark):
    """The worst-case contract: for target t = ceil(q·n), the
    estimate must have FEWER than t elements strictly below it and at
    least t − rank_err_bound elements ≤ it — on an adversarial
    heavy-tie + clustered distribution, not just uniform data."""
    from pyspark.sql import functions as F

    from dislib_spark.sketches import stride_quantiles

    # adversarial: 40% one tied value, clustered runs, a sparse tail
    rows = []
    for i in range(8000):
        if i % 5 < 2:
            v = 42.0
        elif i % 5 < 4:
            v = float(i % 13)
        else:
            v = float(1000 + i)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, v double").repartition(9)
    out = {
        r["q"]: r
        for r in stride_quantiles(
            df, "v", F.col("id"), qs=(0.1, 0.5, 0.9), k=64, shards=8
        ).collect()
    }
    vals = sorted(v for _, v in rows)
    n = len(vals)
    import math

    for q, r in out.items():
        assert r["n"] == n
        t = math.ceil(q * n)
        est, bound = r["est"], r["rank_err_bound"]
        lt = sum(1 for v in vals if v < est)
        le = sum(1 for v in vals if v <= est)
        assert lt < t, (q, lt, t)
        assert le >= t - bound, (q, le, t, bound)
    # summary stays bounded at shards·k (+ partial-block slack)
    assert all(r["summary_rows"] <= 8 * (64 + 1) for r in out.values())


def test_stride_quantiles_merge_law(spark):
    """Mergeability: shards partition the key space, so building the
    summary per shard-subset independently and unioning the kept rows
    reproduces the whole-frame summary exactly — sketch(A ∪ B) =
    sketch(A) ∪ sketch(B) for shard-aligned splits."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dislib_spark.sampling import hash_bucket
    from dislib_spark.sketches import stride_quantiles

    rows = [(i, float((i * 31) % 503)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v double")

    def kept_rows(frame):
        k, shards = 64, 8
        src = frame.select(
            F.col("v").alias("val"),
            F.col("id").cast("string").alias("kstr"),
        ).withColumn("shard", hash_bucket(F.col("kstr"), shards))
        wsh = Window.partitionBy("shard").orderBy("val", "kstr")
        csh = Window.partitionBy("shard")
        staged = src.select(
            "shard",
            "val",
            "kstr",
            F.row_number().over(wsh).alias("rn"),
            F.count(F.lit(1)).over(csh).alias("m"),
        ).withColumn("stride", F.expr("(m + 63) div 64"))
        return {
            (r["shard"], r["val"], r["kstr"], r["wt"])
            for r in staged.where(
                (F.col("rn") - 1) % F.col("stride") == 0
            )
            .select(
                "shard",
                "val",
                "kstr",
                F.least(
                    F.col("stride"), F.col("m") - (F.col("rn") - 1)
                ).alias("wt"),
            )
            .collect()
        }

    shard = hash_bucket(F.col("id").cast("string"), 8)
    half_a = df.where(shard < 4)
    half_b = df.where(shard >= 4)
    assert kept_rows(half_a) | kept_rows(half_b) == kept_rows(df)
    # and the final estimates agree with the one-shot operator
    one = stride_quantiles(df, "v", F.col("id"), k=64, shards=8)
    assert one.count() == 3


def test_grouped_stride_quantiles_contract(spark):
    """The per-group form must (a) match single-group
    stride_quantiles exactly when there is one group, and (b) honor
    the rank-error contract independently PER group on skewed group
    sizes."""
    import math

    from pyspark.sql import functions as F

    from dislib_spark.sketches import (
        grouped_stride_quantiles,
        stride_quantiles,
    )

    rows = [(i, "g1" if i % 10 else "g2", float((i * 17) % 251))
            for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")

    # (a) single group ≡ ungrouped
    one = df.where(F.col("grp") == "g2")
    a = {
        r["q"]: (r["est"], r["n"], r["rank_err_bound"])
        for r in stride_quantiles(
            one, "v", F.col("id"), k=32, shards=4
        ).collect()
    }
    b = {
        r["q"]: (r["est"], r["n"], r["rank_err_bound"])
        for r in grouped_stride_quantiles(
            one, "v", F.col("id"), "grp", k=32, shards=4
        ).collect()
    }
    assert a == b

    # (b) contract per group on the skewed frame
    got = grouped_stride_quantiles(
        df, "v", F.col("id"), "grp", k=32, shards=4
    ).collect()
    by_grp = {}
    for i, g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for r in got:
        vals = sorted(by_grp[r["grp"]])
        assert r["n"] == len(vals)
        t = math.ceil(r["q"] * r["n"])
        lt = sum(1 for v in vals if v < r["est"])
        le = sum(1 for v in vals if v <= r["est"])
        assert lt < t
        assert le >= t - r["rank_err_bound"]


def test_sketch_table_append_currency(tmp_path, spark):
    """Persistent sketch table (the x88 shape): write partials for
    months 1-2, APPEND month 3's partition later, and merge-on-read
    must equal building the partials over the full frame in one shot
    — plus the merged estimates respect the reported rank-error
    bound against exact quantiles."""
    import numpy as np
    from pyspark.sql import functions as F

    from dislib_spark.sketches import (
        merged_stride_quantiles,
        stride_partials,
    )

    rows = [
        (i, f"m{(i % 3) + 1}", float((i * 131) % 977))
        for i in range(6000)
    ]
    df = spark.createDataFrame(rows, "id long, part string, v double")
    path = str(tmp_path / "sketch_table")
    old = df.where(F.col("part") != "m3")
    new = df.where(F.col("part") == "m3")
    stride_partials(
        old, "v", F.col("id"), F.col("part"), k=32, shards=4
    ).write.partitionBy("part").mode("overwrite").parquet(path)
    stride_partials(
        new, "v", F.col("id"), F.col("part"), k=32, shards=4
    ).write.partitionBy("part").mode("append").parquet(path)
    stored = spark.read.parquet(path)
    got = {
        r["q"]: r
        for r in merged_stride_quantiles(stored).collect()
    }
    # one-shot partials over the whole frame -> identical estimates
    one = {
        r["q"]: r
        for r in merged_stride_quantiles(
            stride_partials(
                df, "v", F.col("id"), F.col("part"), k=32, shards=4
            )
        ).collect()
    }
    for q in (0.5, 0.9, 0.99):
        assert got[q]["est"] == one[q]["est"]
        assert got[q]["n"] == one[q]["n"] == 6000
        assert got[q]["summary_rows"] == one[q]["summary_rows"]
        assert got[q]["rank_err_bound"] == one[q]["rank_err_bound"]
    # error contract vs exact quantiles: the estimate's true rank is
    # within bound of the target
    vals = np.sort(np.array([r[2] for r in rows]))
    for q in (0.5, 0.9, 0.99):
        t = int(np.ceil(q * 6000))
        bound = got[q]["rank_err_bound"]
        lo_rank = int(np.searchsorted(vals, got[q]["est"], "left"))
        hi_rank = int(np.searchsorted(vals, got[q]["est"], "right"))
        assert lo_rank < t  # fewer than t strictly below
        assert hi_rank >= t - bound  # at least t-bound are <= est


def test_md5_hll_merge_law_and_accuracy(spark):
    """Engine-replayable HLL (x101's kernel): (a) the register-MAX
    merge of per-group partials equals the one-shot global sketch
    state exactly (the HLL merge law on exact integer registers);
    (b) estimates land within the m=256 error envelope; (c) partials
    survive a parquet round-trip bit-exactly."""
    import tempfile

    from dislib_spark.sketches import md5_hll_estimate, md5_hll_partials

    df = spark.range(20000).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS g"
    )
    parts = md5_hll_partials(df, "id", ["g"])
    path = tempfile.mkdtemp(prefix="md5_hll_") + "/regs"
    parts.write.partitionBy("g").parquet(path)
    stored = spark.read.parquet(path)

    # (a) merge law: max-per-register over stored partials == the
    # one-shot sketch of the whole frame
    merged_regs = {
        (r["reg"], r["max_rho"])
        for r in stored.groupBy("reg")
        .agg(F.max("max_rho").alias("max_rho"))
        .collect()
    }
    whole_regs = {
        (r["reg"], r["max_rho"])
        for r in md5_hll_partials(df, "id").collect()
    }
    assert merged_regs == whole_regs

    # (b) estimate accuracy: ~1.04/sqrt(256) = 6.5% typical; allow 4x
    est = md5_hll_estimate(stored).first()["hll_estimate"]
    assert abs(est - 20000) / 20000 < 0.26
    per = {
        r["g"]: r["hll_estimate"]
        for r in md5_hll_estimate(stored, ["g"]).collect()
    }
    for g, e in per.items():
        assert abs(e - 5000) / 5000 < 0.26, (g, e)

    # (c) estimate from stored partials == estimate from live ones
    # (partition-column type inference may read "0".."3" back as
    # ints — normalize the key; the sketch values must be identical)
    live = {
        str(r["g"]): tuple(r)[1:]
        for r in md5_hll_estimate(parts, ["g"]).collect()
    }
    back = {
        str(r["g"]): tuple(r)[1:]
        for r in md5_hll_estimate(stored, ["g"]).collect()
    }
    assert live == back


def test_md5_hll_small_range_correction(spark):
    """Tiny cardinalities route through the linear-counting branch
    and come out near-exact (empty registers dominate)."""
    from dislib_spark.sketches import md5_hll_estimate, md5_hll_partials

    df = spark.range(30).selectExpr("id")
    est = md5_hll_estimate(md5_hll_partials(df, "id")).first()
    assert est["n_nonzero_regs"] <= 30
    assert abs(est["hll_estimate"] - 30) < 5


def test_md5_hll_rho_is_64_bit(spark):
    """The rank source is the 64 md5 bits after the register byte
    (16 hex chars): the Spark kernel's (reg, rho) must equal a
    hashlib-computed reference for a sample of values, and the
    max observable rho is 65 (all-zero word), not 33. A 32-bit
    rank saturates above ~10⁹ distincts — too small for the
    100 TB stored-sketch path x101 advertises."""
    import hashlib

    from dislib_spark.sketches import md5_hll_partials

    def ref(v: str) -> tuple[int, int]:
        h = hashlib.md5(v.encode()).hexdigest()
        reg = int(h[:2], 16)
        word = int(h[2:18], 16)
        rho = 65 if word == 0 else 64 - word.bit_length() + 1
        return reg, rho

    vals = [str(i) for i in range(500)]
    expect = {}
    for v in vals:
        r, p = ref(v)
        expect[r] = max(expect.get(r, 0), p)
    df = spark.createDataFrame([(v,) for v in vals], ["id"])
    got = {
        r["reg"]: r["max_rho"]
        for r in md5_hll_partials(df, "id").collect()
    }
    assert got == expect
    # 500 uniform values land some rho > 33's 32-bit range rarely;
    # at minimum the kernel must never exceed 65 and the reference
    # agreement above pins the 64-bit derivation exactly.
    assert max(got.values()) <= 65


def test_md5_hll_format_marker_guard(spark):
    """Stored partials carry rho_bits=64; the estimator refuses (a)
    marker-less legacy partials with an up-front ValueError and (b)
    mixed-width unions with an execution-time error — MAX-merging
    32-bit-rank registers (rho ≤ 33) into 64-bit ones silently
    understates deep ranks, the exact hazard the marker exists for."""
    import pytest

    from dislib_spark.sketches import md5_hll_estimate, md5_hll_partials

    df = spark.range(1000).selectExpr("id")
    parts = md5_hll_partials(df, "id")
    assert parts.columns == ["reg", "max_rho", "rho_bits"]
    assert parts.select(F.min("rho_bits"), F.max("rho_bits")).first() \
        == (64, 64)

    # (a) legacy partials: no marker column at all
    with pytest.raises(ValueError, match="rho_bits"):
        md5_hll_estimate(parts.drop("rho_bits"))

    # (b) a union of current partials with ones marked rho_bits=32
    legacy = parts.withColumn("rho_bits", F.lit(32))
    mixed = parts.unionByName(legacy)
    with pytest.raises(Exception, match="format mismatch"):
        md5_hll_estimate(mixed).collect()

    # homogeneous current-format partials still estimate normally
    est = md5_hll_estimate(parts).first()["hll_estimate"]
    assert abs(est - 1000) / 1000 < 0.26


def test_md5_hll_large_cardinality_band(spark):
    """>10⁶ distincts: rel_err stays inside the m=256 HLL band
    (1.04/sqrt(256) = 6.5% typical std; assert < 4 sigma). This is
    the regime the 64-bit rank exists for — with enough distincts
    that deep rho values matter, the estimate must not saturate."""
    from dislib_spark.sketches import md5_hll_estimate, md5_hll_partials

    n = 1_500_000
    df = spark.range(n).selectExpr("id")
    est = md5_hll_estimate(md5_hll_partials(df, "id")).first()
    assert est["n_nonzero_regs"] == 256
    assert abs(est["hll_estimate"] - n) / n < 0.26
