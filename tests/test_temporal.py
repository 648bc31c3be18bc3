"""Temporal join tests: asof_join semantics vs pandas.merge_asof,
interval_join batch + real stream-stream path, and plan shape (the
as-of join must be a single-shuffle window pass, never a range join).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from dislib_spark.temporal import asof_join, interval_join
from dislib_spark.streaming import await_drain


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts(10)),
            (2, "a", _ts(20)),
            (3, "b", _ts(5)),
            (4, "b", _ts(30)),
            (5, "c", _ts(15)),  # key with no right rows
        ],
        "lid long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(8), 100, 1.0),
            ("a", _ts(20), 101, 2.0),  # exact tie with lid=2 (inclusive)
            ("a", _ts(25), 102, 3.0),
            ("b", _ts(6), 103, 4.0),
            ("b", _ts(6), 104, 5.0),  # same-ts tie → max rid wins
        ],
        "k string, t timestamp, rid long, v double",
    )
    return left, right


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _frames(spark)
    got = (
        asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_cols=["rid", "v"], tiebreak="rid", how="left",
        )
        .orderBy("lid")
        .toPandas()
    )
    lp = left.toPandas().sort_values("t")
    # merge_asof needs sorted inputs; tiebreak: keep max rid per (k, t)
    rp = (
        right.toPandas()
        .sort_values(["k", "t", "rid"])
        .groupby(["k", "t"], as_index=False)
        .last()
        .sort_values("t")
    )
    exp = (
        pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert got["lid"].tolist() == exp["lid"].tolist()
    assert (
        got["asof_rid"].fillna(-1).astype(int).tolist()
        == exp["rid"].fillna(-1).astype(int).tolist()
    )
    # lid=2 matched the equal-timestamp right row (inclusive)
    assert got.loc[got.lid == 2, "asof_rid"].iloc[0] == 101
    # lid=3 (t=5): key b's earliest right row is t=6 → no match
    assert pd.isna(got.loc[got.lid == 3, "asof_rid"].iloc[0])
    # lid=4 (t=30): same-ts b@6 tie resolved to max rid
    assert got.loc[got.lid == 4, "asof_rid"].iloc[0] == 104
    # lid=5: no right rows for key c
    assert pd.isna(got.loc[got.lid == 5, "asof_rid"].iloc[0])


def test_asof_inner_and_tolerance(spark):
    left, right = _frames(spark)
    inner = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["rid"], tiebreak="rid", how="inner",
    )
    assert sorted(r.lid for r in inner.collect()) == [1, 2, 4]
    tol = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["rid"], tiebreak="rid", tolerance="5 minutes",
        how="left",
    ).toPandas()
    # lid=4 (t=30) matches b@6, but 24 min > 5 min → nulled
    assert pd.isna(tol.loc[tol.lid == 4, "asof_rid"].iloc[0])
    # lid=1 (t=10, match t=8) within 5 min → kept
    assert tol.loc[tol.lid == 1, "asof_rid"].iloc[0] == 100


def test_asof_plan_single_shuffle_no_range_join(spark):
    left, right = _frames(spark)
    j = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["rid"], tiebreak="rid",
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_batch(spark):
    left, right = _frames(spark)
    j = interval_join(
        left, right, on="k", left_time="t", right_time="t",
        lower="0 seconds", upper="10 minutes",
    )
    pairs = sorted((r.lid, r.rid) for r in j.collect())
    # lid=1 t=10: right a@20 within (10,20] → (1,101); lid=2 t=20:
    # a@20,a@25 → (2,101),(2,102); lid=3 t=5: b@6 ×2; lid=4 t=30: none
    assert pairs == [(1, 101), (2, 101), (2, 102), (3, 103), (3, 104)]


def test_interval_join_stream_stream(spark, tmp_path):
    """Real stream-stream interval join through readStream →
    availableNow — proves the watermarked state-bounded join plan."""
    left, right = _frames(spark)
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ldir)
    right.write.parquet(rdir)
    ls = spark.readStream.schema(left.schema).parquet(ldir)
    rs = spark.readStream.schema(right.schema).parquet(rdir)
    rs = rs.withColumnRenamed("t", "rt")
    j = interval_join(
        ls, rs, on="k", left_time="t", right_time="rt",
        lower="0 seconds", upper="10 minutes", watermark="1 hour",
    )
    q = (
        j.writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, 120)
    rows = spark.sql("SELECT lid, rid FROM t_ssjoin").collect()
    assert sorted((r.lid, r.rid) for r in rows) == [
        (1, 101), (2, 101), (2, 102), (3, 103), (3, 104),
    ]


def test_sessionize_islands(spark):
    from dislib_spark.temporal import sessionize

    ev = spark.createDataFrame(
        [
            (1, "u", dt.datetime(2024, 1, 1, 0, 0)),
            (2, "u", dt.datetime(2024, 1, 1, 0, 20)),   # within 30m
            (3, "u", dt.datetime(2024, 1, 1, 1, 0)),    # 40m gap → new
            (4, "u", dt.datetime(2024, 1, 1, 1, 30, 1)),  # 30m1s → new
            (5, "w", dt.datetime(2024, 1, 1, 0, 0)),    # own key
        ],
        "eid long, k string, t timestamp",
    )
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(ev, "k", "t", "30 minutes", tiebreak="eid")
        .collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 1}


def test_sessionize_gap_boundary_inclusive(spark):
    """A gap of EXACTLY the threshold stays in the same session (the
    test is strictly-greater, matching the x61 oracle's ``> 1800``)."""
    from dislib_spark.temporal import sessionize

    ev = spark.createDataFrame(
        [
            (1, "u", dt.datetime(2024, 1, 1, 0, 0)),
            (2, "u", dt.datetime(2024, 1, 1, 0, 30)),  # exactly 1800s
        ],
        "eid long, k string, t timestamp",
    )
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(ev, "k", "t", "30 minutes").collect()
    }
    assert got == {1: 1, 2: 1}


def test_recency_weighted_sum_closed_form(spark):
    """Each term is value · 2^(-age/half_life); check against the
    python closed form, including that batch ≡ per-event incremental
    (order independence)."""
    import math

    from dislib_spark.temporal import recency_weighted_sum

    t_ref = int(dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp())
    rows = [
        ("u", dt.datetime(2024, 1, 1, 0, 0), 10.0),
        ("u", dt.datetime(2024, 1, 1, 12, 0), 4.0),
        ("w", dt.datetime(2024, 1, 1, 23, 0), 1.5),
    ]
    ev = spark.createDataFrame(rows, "k string, t timestamp, v double")
    out = {
        r["k"]: (r["decayed_sum"], r["n_events"])
        for r in recency_weighted_sum(
            ev, "k", "t", "v", half_life=43200.0, t_ref_epoch=t_ref
        ).collect()
    }

    def expect(key):
        return sum(
            v * 2.0 ** (-(t_ref - int(t.replace(
                tzinfo=dt.timezone.utc).timestamp())) / 43200.0)
            for k, t, v in rows if k == key
        )

    assert math.isclose(out["u"][0], expect("u"), rel_tol=1e-9)
    assert out["u"][1] == 2
    assert math.isclose(out["w"][0], expect("w"), rel_tol=1e-9)


def test_twap_hand_computed(spark):
    """Irregular ticks: value 10 held 60 s then 20 held 180 s in one
    day-bucket → TWAP (10*60+20*180)/240 = 17.5; the final tick
    carries no duration; a single-tick bucket emits nothing."""
    from dislib_spark.temporal import twap

    ev = spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
            (2, 7, dt.datetime(2024, 1, 1, 0, 1, 0), 20.0),
            (3, 7, dt.datetime(2024, 1, 1, 0, 4, 0), 99.0),  # last: no dt
            (4, 8, dt.datetime(2024, 1, 1, 5, 0, 0), 42.0),  # lone tick
        ],
        "eid long, k long, t timestamp, v double",
    )
    rows = twap(ev, "k", "t", "v", bucket="day", tiebreak="eid").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["k"], r["twap"], r["span_s"], r["n_obs"]) == (7, 17.5, 240, 2)


def test_ohlc_bars_hand_computed(spark):
    """Open/close follow (second, tiebreak) order including a
    same-second tie; high/low/volume are plain aggregates."""
    from dislib_spark.temporal import ohlc_bars

    ev = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2024, 1, 1, 9, 0, 5), 3.0),
            (2, "a", dt.datetime(2024, 1, 1, 9, 0, 5), 9.0),  # same sec, eid 2
            (3, "a", dt.datetime(2024, 1, 1, 9, 59, 0), 1.0),
            (4, "a", dt.datetime(2024, 1, 1, 10, 1, 0), 7.0),  # next hour
        ],
        "eid long, k string, t timestamp, v double",
    )
    bars = {
        r["bucket"]: r
        for r in ohlc_bars(
            ev, "k", "t", "v", bucket="hour", tiebreak="eid"
        ).collect()
    }
    b9 = bars[dt.datetime(2024, 1, 1, 9, 0)]
    assert (b9["open"], b9["close"], b9["high"], b9["low"]) == (
        3.0, 1.0, 9.0, 1.0,
    )
    assert (b9["n_obs"], b9["volume"]) == (3, 13.0)
    b10 = bars[dt.datetime(2024, 1, 1, 10, 0)]
    assert (b10["open"], b10["close"], b10["n_obs"]) == (7.0, 7.0, 1)


def test_scd2_query_shape(spark):
    """SCD2 probes: every user active before a probe instant yields
    exactly one version per probe, the version numbering is gapless,
    and the active version's interval brackets the probe."""
    from dislib_spark.queries.extended import x65_scd2

    rows = x65_scd2(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no SCD2 probe hits at sf0.001"
    per_probe = {}
    for r in rows:
        key = (r["probe_s"], r["user_id"])
        assert key not in per_probe, f"duplicate active version {key}"
        per_probe[key] = r
        assert 1 <= r["version"] <= r["n_versions"]


def test_markov_transitions_hand_computed(spark):
    """Two-user toy journey: transition counts and row-normalized
    probabilities match the hand enumeration; last event of each key
    emits no pair."""
    from dislib_spark.temporal import markov_transitions

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"),
        (2, 1, "a"), (2, 2, "a"), (2, 3, "c"),
    ]
    df = spark.createDataFrame(rows, "u int, seq int, s string")
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["prob"])
        for r in markov_transitions(df, "u", "s", ["seq"]).collect()
    }
    # user1: a->b, b->a, a->b ; user2: a->a, a->c
    assert got[("a", "b")] == (2, 0.5)
    assert got[("a", "a")] == (1, 0.25)
    assert got[("a", "c")] == (1, 0.25)
    assert got[("b", "a")] == (1, 1.0)
    assert len(got) == 4  # no pair from terminal events


def test_gini_closed_form(spark):
    """x69's rank-formula Gini on a 1-region toy matches the closed
    form: equal values -> 0; [1,0,0,0] concentration -> (n-1)/n - ...
    (hand value 0.75 - 0.25... = use direct formula)."""
    import numpy as np

    from dislib_spark.tables import load_table  # noqa: F401

    def gini_np(vals):
        x = np.sort(np.asarray(vals, dtype=float))
        n = len(x)
        i = np.arange(1, n + 1)
        return 2 * (i * x).sum() / (n * x.sum()) - (n + 1) / n

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    for vals in ([5.0, 5.0, 5.0, 5.0], [10.0, 0.01, 0.01, 0.01],
                 [1.0, 2.0, 3.0, 4.0]):
        df = spark.createDataFrame(
            [("r", i, v) for i, v in enumerate(vals)],
            "r_name string, c_custkey int, rev_d double",
        ).select(
            "r_name", "c_custkey",
            F.col("rev_d").cast("decimal(18,2)").alias("rev"),
        )
        w = Window.partitionBy("r_name").orderBy("rev", "c_custkey")
        ranked = df.select(
            "r_name", "rev",
            F.row_number().over(w).cast("decimal(20,0)").alias("i"),
        )
        row = (
            ranked.groupBy("r_name")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("rev").alias("tot"),
                F.sum(
                    (F.col("i") * F.col("rev")).cast("decimal(38,2)")
                ).alias("s1"),
            )
            .select(
                (
                    F.lit(2.0) * F.col("s1").cast("double")
                    / (F.col("n") * F.col("tot").cast("double"))
                    - (F.col("n") + 1) / F.col("n").cast("double")
                ).alias("g")
            )
            .collect()[0]
        )
        assert abs(row["g"] - gini_np(vals)) < 1e-9


def test_acf_numpy_parity(spark):
    """temporal.acf vs the direct numpy definition on a seasonal
    series (period 6), including the n_pairs bookkeeping."""
    import numpy as np
    from decimal import Decimal

    from dislib_spark.temporal import acf

    n = 48
    x = (
        10000
        + 3000 * np.sin(np.arange(n) * (2 * np.pi / 6))
        + np.linspace(0, 500, n)
    ).round(2)
    rows = [(i, Decimal(f"{v:.2f}")) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "i long, v decimal(18,2)")
    got = {
        r["k"]: (r["n_pairs"], r["acf_k"])
        for r in acf(df, "i", "v", 8).collect()
    }

    mu = x.mean()
    d = np.round(x - mu, 4)
    den = (d * d).sum()
    for k in range(1, 9):
        exp = (d[:-k] * d[k:]).sum() / den
        assert got[k][0] == n - k
        assert abs(got[k][1] - exp) < 1e-6
    # period-6 seasonality must dominate
    assert got[6][1] > got[3][1]


def test_cusum_numpy_parity(spark):
    """temporal.cusum vs direct numpy prefix sums on a series with a
    deliberate level shift at t=20 (the |S_t| peak must sit there)."""
    import numpy as np
    from decimal import Decimal

    from dislib_spark.temporal import cusum

    x = np.concatenate(
        [np.full(20, 100.0), np.full(20, 140.0)]
    ) + np.arange(40) * 0.25
    x = x.round(2)
    rows = [(i, Decimal(f"{v:.2f}")) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "i long, v decimal(18,2)")
    got = cusum(df, "i", "v").collect()

    mu = x.sum() / len(x)
    s = np.cumsum(x) - (np.arange(len(x)) + 1) * mu
    for row in got:
        assert abs(row["s_t"] - s[row["t"]]) < 1e-6
    peak = max(got, key=lambda r: abs(r["s_t"]))
    assert peak["t"] == 19  # last pre-shift index


def test_rsi_numpy_parity(spark):
    """temporal.rsi (Cutler SMA form) vs a direct numpy computation,
    including the all-gain RSI=100 pin."""
    import numpy as np
    from decimal import Decimal

    from dislib_spark.temporal import rsi

    rng = np.random.default_rng(3)
    x = (100 + np.cumsum(rng.normal(0, 2, size=60))).round(2)
    x[5:15] = np.linspace(100, 120, 10).round(2)  # monotone stretch
    rows = [(i, Decimal(f"{v:.2f}")) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "i long, v decimal(18,2)")
    period = 7
    got = {r["t"]: r["rsi"] for r in rsi(df, "i", "v", period).collect()}

    d = np.diff(x)
    for t in range(period, len(x)):
        window = d[t - period : t]
        g = window[window > 0].sum()
        loss = -window[window < 0].sum()
        exp = 100.0 if loss == 0 else 100 - 100 / (1 + g / loss)
        assert abs(got[t] - exp) < 1e-6, t


def test_sessionize_rejects_unparseable_gap(spark):
    """The gap parser accepts exactly 'N second|minute|hour|day(s)';
    anything else must raise a clear ValueError, not a KeyError."""
    import datetime as dt

    import pytest

    from dislib_spark.temporal import sessionize

    ev = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1, 9, 0, 0))],
        "eid long, k string, t timestamp",
    )
    for bad in ("30 min", "1 week", "2 days 4 hours", "hour", "-5 hours"):
        with pytest.raises(ValueError, match="unsupported gap"):
            sessionize(ev, "k", "t", bad, tiebreak="eid")
    # the documented forms still parse
    sessionize(ev, "k", "t", "30 minutes", tiebreak="eid").collect()
    sessionize(ev, "k", "t", "1 day", tiebreak="eid").collect()


def test_ohlc_requires_tiebreak_and_wide_volume(spark):
    """ohlc_bars without a tiebreak would bias same-second bursts
    toward open<=close (value becomes the struct sort key) — it must
    refuse; volume accumulates at 6-decimal grain, not 2."""
    import datetime as dt

    import pytest

    from dislib_spark.temporal import ohlc_bars

    ev = spark.createDataFrame(
        [
            (1, "a", dt.datetime(2024, 1, 1, 9, 0, 0), 0.123456),
            (2, "a", dt.datetime(2024, 1, 1, 9, 0, 0), 0.111111),
        ],
        "eid long, k string, t timestamp, v double",
    )
    with pytest.raises(ValueError, match="tiebreak"):
        ohlc_bars(ev, "k", "t", "v", bucket="hour")
    row = ohlc_bars(ev, "k", "t", "v", bucket="hour", tiebreak="eid").collect()[0]
    # 2dp accumulation would give 0.23; 6dp keeps the true cents
    assert row["volume"] == pytest.approx(0.234567, abs=1e-9)
    assert (row["open"], row["close"]) == (0.123456, 0.111111)
