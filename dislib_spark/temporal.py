"""Temporal joins: as-of (point-in-time) and interval joins.

N/A in the reference (dislib has no relational/temporal layer); part
of the engine's extended query surface. Both operators are built to
survive 100 TB:

- ``asof_join`` NEVER materializes the O(|L|·|R|) range join a naive
  ``l.ts >= r.ts`` theta-join would produce. It unions both sides and
  takes one window pass per key — a single hash-partition shuffle on
  the join key, sort-merge within partitions, linear output.
- ``interval_join`` expresses the time band as an equi-join on the
  key with a residual range predicate, so Catalyst plans a shuffled
  hash/sort-merge join on the key (never a BroadcastNestedLoopJoin),
  and the SAME code path works for two streaming inputs (Spark's
  stream-stream join with watermarks).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dislib_spark.streaming.windows import _watermarked


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the single
    right row with the greatest ``right_time`` <= ``left_time`` for
    the same ``on`` key (inclusive, like DuckDB/pandas ``ASOF``).

    Matched right columns come back prefixed ``asof_``; an extra
    ``asof_<right_time>`` column carries the matched timestamp.
    ``tiebreak`` names a right column that breaks equal-timestamp
    ties (max wins) deterministically. ``tolerance`` (an INTERVAL
    string, e.g. ``"2 hours"``) nulls out matches older than
    ``left_time - tolerance``. ``how`` is ``inner`` (drop unmatched
    left rows) or ``left``.

    Scale: one shuffle (hash on ``on``), one sort, one window pass —
    the union trick turns the range join into a linear merge. Key
    skew behaves like any windowed op (AQE cannot split a single hot
    key); salt upstream if one key dominates.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_time)
    ]
    payload = [right_time, *[c for c in rcols if c != right_time]]
    if tiebreak is not None and tiebreak not in payload:
        payload.append(tiebreak)

    r_sel = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__rp"),
    )
    rp_type = r_sel.schema["__rp"].dataType
    l_sel = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rp_type).alias("__rp"),
        *[F.col(c) for c in left.columns],
    )
    r_full = r_sel.select(
        "__k", "__t", "__side", "__rp",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    u = l_sel.unionByName(r_full)

    # Right rows sort BEFORE the left row at the same timestamp
    # (__side 0 < 1) so the match is inclusive; among equal-time
    # right rows the max tiebreak sorts last and wins.
    order: list[Column] = [F.col("__t").asc(), F.col("__side").asc()]
    if tiebreak is not None:
        order.append(F.col("__rp")[tiebreak].asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__rp", ignorenulls=True).over(w)
    if tolerance is not None:
        matched = F.when(
            matched[right_time]
            >= F.col("__t") - F.expr(f"INTERVAL {tolerance}"),
            matched,
        )
    res = (
        u.withColumn("__m", matched)
        .where(F.col("__side") == 1)
        .select(
            *left.columns,
            F.col("__m")[right_time].alias(f"asof_{right_time}"),
            *[
                F.col("__m")[c].alias(f"asof_{c}")
                for c in payload
                if c != right_time
            ],
        )
    )
    if how == "inner":
        res = res.where(F.col(f"asof_{right_time}").isNotNull())
    return res


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower: str = "0 seconds",
    upper: str = "30 minutes",
    how: str = "inner",
    watermark: str | None = None,
) -> DataFrame:
    """Join right rows whose ``right_time`` falls within
    ``[left_time + lower, left_time + upper]`` for the same key.

    Works identically for batch and streaming inputs. With two
    streaming inputs, pass ``watermark`` (e.g. ``"1 hour"``): both
    sides are watermarked and the range condition lets Spark bound
    the join state (classic stream-stream interval join).

    Scale: equi-join on ``on`` with a residual band predicate —
    shuffled hash / sort-merge join, linear state, never a nested
    loop. The band width bounds per-key state in streaming.
    """
    if left.isStreaming and watermark is not None:
        left = _watermarked(left, left_time, watermark)
    if right.isStreaming and watermark is not None:
        right = _watermarked(right, right_time, watermark)
    lhs = left.alias("l")
    rhs = right.alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_time}")
            <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return lhs.join(rhs, cond, how)


def _epoch_seconds(df: DataFrame, time_col: str) -> Column:
    """Whole seconds since 1970-01-01 for ``time_col``, floor-
    truncated, TIMEZONE-FREE for both timestamp flavors: TIMESTAMP
    (instant) casts straight to long; TIMESTAMP_NTZ subtracts the
    epoch wall-clock and casts the day-time interval to long
    (``unix_timestamp``/string parsing would re-interpret the wall
    clock in the session timezone and shift results between
    deployments)."""
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        return (
            F.col(time_col)
            - F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).cast("long")
    return F.col(time_col).cast("long")



def _epoch_micros(df: DataFrame, time_col: str) -> Column:
    """Exact integer microseconds since 1970-01-01 for ``time_col``,
    TIMEZONE-FREE for both timestamp flavors (the microsecond sibling
    of :func:`_epoch_seconds`): TIMESTAMP_NTZ subtracts the epoch
    wall-clock and scales the exact DECIMAL(28,6)-seconds interval;
    TIMESTAMP uses ``unix_micros`` directly."""
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        iv = F.col(time_col) - F.lit("1970-01-01 00:00:00").cast(
            "timestamp_ntz"
        )
        return (iv.cast("decimal(28,6)") * 1000000).cast("long")
    return F.unix_micros(F.col(time_col))

def sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap: str = "30 minutes",
    tiebreak: str | None = None,
) -> DataFrame:
    """Batch gaps-and-islands sessionization: adds a ``session_id``
    column (1-based island number per ``key``) — a new session starts
    whenever the gap since the previous event for the same key
    exceeds ``gap`` (an INTERVAL string).

    The batch complement of ``streaming.windows.session_windows``
    (Spark's ``session_window`` needs a streaming-style aggregation
    and only yields window bounds); this keeps every event row, so
    per-session detail queries (duration, n-th event, funnel position)
    stay expressible.

    Scale: one hash shuffle on ``key`` + per-key sort — the window is
    always ``partitionBy(key)``, never global, so partitions stay
    ~n/P at any corpus size. Key skew (one bot user with 10^8 events)
    is the same lever as any windowed op: pre-split hot keys upstream.

    Extension surface (no reference counterpart — dislib has no
    relational/temporal layer).
    """
    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    parts = gap.split()
    if (
        len(parts) != 2
        or not parts[0].isdigit()
        or int(parts[0]) <= 0
        or parts[1].rstrip("s") not in units
    ):
        raise ValueError(
            f"unsupported gap {gap!r}: expected a single positive "
            "'N second(s)', 'N minute(s)', 'N hour(s)' or 'N day(s)' "
            "term (compound or abbreviated intervals like '30 min' or "
            "'2 days 4 hours' are not parsed)"
        )
    gap_seconds = int(parts[0]) * units[parts[1].rstrip("s")]
    sec = _epoch_seconds(df, time_col)
    order = [time_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_passed = (sec - F.lag(sec).over(w)) > F.lit(gap_seconds)
    new_session = F.when(
        gap_passed | F.lag(time_col).over(w).isNull(), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_id", F.sum(new_session).over(run))


def recency_weighted_sum(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    half_life: float,
    t_ref_epoch: int,
) -> DataFrame:
    """Per-key exponentially time-decayed value sum:
    ``score = Σ value · 2^(-(t_ref - t) / half_life)`` with ``t`` in
    epoch seconds and ``half_life`` in seconds — the standard recency
    weight for training-data sampling and feature freshness, as a
    single ORDER-INDEPENDENT aggregation (each term is computed
    map-side, then summed; no sequential EWMA recursion, so it
    parallelizes and its batch form equals its incremental form).

    ``t_ref_epoch`` is the "now" anchor in EPOCH SECONDS (an int, not
    a timestamp string: a string literal would parse in the session
    timezone and silently shift the weights between deployments);
    pinning it keeps the query deterministic and replayable.

    Determinism: each double term is cast to DECIMAL(28,12) before
    SUM so the aggregate is summation-order-exact, then the result
    surfaces as DOUBLE. Scale: partial aggregation map-side; one
    shuffle on ``key``.
    """
    age = F.lit(int(t_ref_epoch)) - _epoch_seconds(df, time_col)
    term = F.col(value_col) * F.exp(
        age.cast("double") / F.lit(-float(half_life)) * float(math.log(2))
    )
    return df.groupBy(key).agg(
        F.sum(term.cast("decimal(28,12)"))
        .cast("double")
        .alias("decayed_sum"),
        F.count(F.lit(1)).alias("n_events"),
    )


def twap(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    bucket: str = "day",
    tiebreak: str | None = None,
) -> DataFrame:
    """Time-weighted average value per (``key``, ``bucket``): each
    observation is weighted by how long it was "current" — the
    seconds until the next observation of the same key inside the
    same bucket (tick-database TWAP). Only observations with a
    POSITIVE duration carry weight: the bucket's last observation has
    none, and same-second bursts collapse onto whichever tick the
    ``tiebreak`` order puts last in the second — so buckets whose
    ticks all share one second (span 0) yield no row rather than an
    ANSI divide-by-zero (property-tested). Weights are exact
    integers; the weighted sum goes through DECIMAL(28,6) so it is
    summation-order exact.

    Scale: ONE per-(key, bucket) window (hash shuffle + sort) for the
    lead, then a map-side-combined aggregation on the same key — the
    window partitioning is never global."""
    sec = _epoch_seconds(df, time_col)
    bkt = F.date_trunc(bucket, F.col(time_col))
    order = [sec.asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else [F.col(time_col).asc()]
    )
    w = Window.partitionBy(F.col(key), bkt).orderBy(*order)
    staged = df.select(
        F.col(key),
        bkt.alias("bucket"),
        sec.alias("_sec"),
        F.col(value_col).alias("_v"),
        (F.lead(sec).over(w) - sec).alias("_dt"),
    ).where(F.col("_dt") > 0)
    return (
        staged.groupBy(key, "bucket")
        .agg(
            F.round(
                F.sum((F.col("_v") * F.col("_dt")).cast("decimal(28,6)"))
                .cast("double")
                / F.sum("_dt"),
                6,
            ).alias("twap"),
            F.sum("_dt").alias("span_s"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    bucket: str = "hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Open/high/low/close bars per (``key``, time ``bucket``) — the
    canonical hypertable rollup. Open/close are the first/last
    observation by (whole second, ``tiebreak``): a lexicographic
    struct MIN/MAX, so the whole bar is ONE map-side-combined
    aggregation — no window, no sort, no second scan. Volume-style
    sum accumulates as DECIMAL(28,6) (order-exact; inputs with more
    than 6 decimal places are rounded at that grain).

    ``tiebreak`` is REQUIRED: without one, ties within a second would
    fall through to the value itself as the struct's last sort key,
    making 'open' the MIN and 'close' the MAX of the tied burst — a
    systematic open<=close bias, not an arbitrary-but-unbiased pick."""
    if tiebreak is None:
        raise ValueError(
            "ohlc_bars needs a tiebreak column: same-second ties would "
            "otherwise resolve open/close by VALUE (open=min, "
            "close=max), biasing every tied burst toward open<=close"
        )
    sec = _epoch_seconds(df, time_col)
    tagged = F.struct(sec, F.col(tiebreak), F.col(value_col).alias("_v"))
    return (
        df.groupBy(
            F.col(key), F.date_trunc(bucket, F.col(time_col)).alias("bucket")
        )
        .agg(
            F.min(tagged).getField("_v").alias("open"),
            F.max(tagged).getField("_v").alias("close"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n_obs"),
            F.sum(F.col(value_col).cast("decimal(28,6)"))
            .cast("double")
            .alias("volume"),
        )
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    state_col: str,
    order_by: list[str],
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: P(next_state | prev_state) estimated from adjacent
    pairs — the user-journey / clickstream model behind funnel (x15)
    and sessionization (x61) analyses.

    Scale shape: ``lead`` runs in a ``partitionBy(key)`` window (one
    sort per key's events, never a global sort), pairs collapse via
    ONE map-side-combined count to a |states|² table, and the
    row-normalizing total is a window over that tiny table. Counts
    are exact integers; each probability is a single IEEE-exact
    division.

    Returns (prev_state, next_state, n, prob), prob rounded 6.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(*order_by)
    nxt = F.lead(state_col).over(w)
    pairs = (
        df.select(
            F.col(state_col).alias("prev_state"), nxt.alias("next_state")
        )
        .where(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("prev_state"))
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / tot, 6).alias("prob"),
    )


def acf(
    series: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Autocorrelation function of an ALREADY-AGGREGATED series:
    ``acf(k) = Σ_t (x_t−μ)(x_{t+k}−μ) / Σ_t (x_t−μ)²`` for
    k = 1..``max_lag`` — the seasonality / memory diagnostic read off
    before picking rollup grains or forecast features.

    The input is the grouped rollup (one row per period), so every
    window/join here runs over |periods| rows — bounded by the
    calendar span, never the fact-table size; the fact scan happened
    upstream in the caller's groupBy. Lags come from ONE explode +
    equi-join on the shifted index (no per-k passes).

    Numerics: pass ``value_col`` as an exact DECIMAL sum so
    μ = Σx/n is one IEEE-exact division; deviations are rounded to
    4 dp and cast ``DECIMAL(18,4)`` so every cross-product and both
    Σ accumulate EXACTLY (order-proof across engines) — the only
    float ops are the final num/den divisions. Deviations must fit
    14 integer digits (1e14); pre-scale the series otherwise.

    Returns (k, n_pairs, acf_k), k = 1..max_lag.
    """
    w = Window.orderBy(order_col)
    x = F.col(value_col).cast("double")
    idx = series.select(x.alias("x"), F.row_number().over(w).alias("i"))
    st = series.agg(
        (
            F.sum(F.col(value_col)).cast("double") / F.count(F.lit(1))
        ).alias("mu")
    )
    dev = idx.crossJoin(F.broadcast(st)).select(
        "i",
        F.round(F.col("x") - F.col("mu"), 4)
        .cast("decimal(18,4)")
        .alias("d"),
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("dd"))
    lagged = dev.select(
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("k0"),
        "i",
        "d",
    ).select(F.col("k0").cast("bigint").alias("k"), "i", "d")
    num = (
        lagged.alias("a")
        .join(
            dev.select(F.col("i").alias("i2"), F.col("d").alias("d2")),
            F.col("a.i") + F.col("a.k") == F.col("i2"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.d") * F.col("d2")).alias("num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "k",
            "n_pairs",
            F.round(
                F.col("num").cast("double") / F.col("dd").cast("double"),
                6,
            ).alias("acf_k"),
        )
        .orderBy("k")
    )


def cusum(
    series: DataFrame,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """CUSUM (cumulative-sum control chart) over an ALREADY-AGGREGATED
    series: ``S_t = Σ_{i≤t} (x_i − μ)`` — the classic level-shift /
    changepoint screen (Page); a drifting mean makes |S_t| ramp
    instead of hovering near 0, and the argmax of |S_t| locates the
    most likely change point.

    Same scale contract as :func:`acf`: the caller's groupBy collapsed
    the fact table, so the one ordered prefix-sum window here runs
    over |periods| rows. Pass ``value_col`` as an exact DECIMAL sum:
    ``S_t = prefix(x) − t·μ`` is then computed from an EXACT decimal
    prefix sum with one IEEE product/subtraction per row — no float
    accumulation at all.

    Returns (t, x, s_t) ordered by period, s_t rounded to 6.
    """
    w = Window.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    st = series.agg(
        (
            F.sum(F.col(value_col)).cast("double") / F.count(F.lit(1))
        ).alias("mu")
    )
    r = series.crossJoin(F.broadcast(st)).select(
        F.col(order_col).alias("t"),
        F.col(value_col).cast("double").alias("x"),
        (
            F.sum(F.col(value_col)).over(w).cast("double")
            - F.row_number().over(Window.orderBy(order_col))
            * F.col("mu")
        ).alias("s"),
    )
    return r.select(
        "t", "x", F.round("s", 6).alias("s_t")
    ).orderBy("t")


def rsi(
    series: DataFrame,
    order_col: str,
    value_col: str,
    period: int = 14,
) -> DataFrame:
    """Relative Strength Index (Cutler's SMA form, which is
    window-expressible — Wilder's EWMA form is recursive) over an
    ALREADY-AGGREGATED series: RSI = 100 − 100/(1 + avg_gain/avg_loss)
    over the trailing ``period`` deltas. The momentum/overbought
    telemetry next to x63's TWAP and x64's OHLC bars.

    Numerics: with ``value_col`` an exact DECIMAL sum, deltas and
    both trailing sums stay EXACT decimals (gain/loss split is
    sign-exact); the single float op is the final ratio. All-gain
    windows pin RSI to exactly 100.0 rather than dividing by zero.

    Returns (t, x, rsi) for rows with a full ``period`` of deltas.
    """
    wl = Window.orderBy(order_col)
    ws = Window.orderBy("t").rowsBetween(
        -(int(period) - 1), Window.currentRow
    )
    x = F.col(value_col)
    d = x - F.lag(x).over(wl)
    zero = F.lit(0).cast(
        "decimal(38,6)"
    )
    r = series.select(
        F.col(order_col).alias("t"),
        x.cast("double").alias("x"),
        F.when(d > 0, d.cast("decimal(38,6)")).otherwise(zero).alias(
            "g"
        ),
        F.when(d < 0, (-d).cast("decimal(38,6)")).otherwise(zero).alias(
            "l"
        ),
        F.row_number().over(wl).alias("i"),
    )
    agg = r.select(
        "t",
        "x",
        "i",
        F.sum("g").over(ws).alias("gs"),
        F.sum("l").over(ws).alias("ls"),
    ).where(F.col("i") > int(period))
    val = F.when(F.col("ls") == 0, F.lit(100.0)).otherwise(
        F.lit(100.0)
        - F.lit(100.0)
        / (
            F.lit(1.0)
            + F.col("gs").cast("double") / F.col("ls").cast("double")
        )
    )
    return agg.select(
        "t", "x", F.round(val, 6).alias("rsi")
    ).orderBy("t")


def funnel_attribution(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    window_s: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Windowed last-touch attribution: for every ``to_type`` event,
    find the latest ``from_type`` event by the same user that is
    strictly earlier and at most ``window_s`` seconds before it — the
    "which click gets credit for this purchase" kernel behind
    conversion reporting (the windowed complement of x15's
    whole-history staged funnel).

    Scale shape: candidates come from an equi-join on
    ``(user, floor(sec/window_s))`` hour-style buckets with the
    from-side exploded to {b, b+1} (a qualifying pair always shares
    one bucket key — the x07/snm adjacent-block pattern), so the join
    never degenerates to per-user cross products on heavy users; the
    per-target argmax is one map-side-combined MAX.

    Returns one row per ``to_type`` event:
    (to_id, u, to_sec, day, from_sec nullable, lag_s nullable).
    """
    sec = _epoch_seconds(df, time_col)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(user_col).alias("u"),
        F.col(type_col).alias("_t"),
        sec.alias("_sec"),
        F.to_date(time_col).alias("day"),
    )
    b = F.floor(F.col("_sec") / F.lit(window_s))
    tgt = base.where(F.col("_t") == to_type).select(
        F.col("_id").alias("to_id"),
        "u",
        F.col("_sec").alias("to_sec"),
        "day",
        b.alias("_b"),
    )
    src = base.where(F.col("_t") == from_type).select(
        "u",
        F.col("_sec").alias("_fsec"),
        F.explode(F.array(b, b + 1)).alias("_b"),
    )
    qual = F.when(
        (F.col("_fsec") < F.col("to_sec"))
        & (F.col("to_sec") - F.col("_fsec") <= window_s),
        F.col("_fsec"),
    )
    per = (
        tgt.join(src, ["u", "_b"], "left")
        .select("to_id", "u", "to_sec", "day", qual.alias("_q"))
        .groupBy("to_id", "u", "to_sec", "day")
        .agg(F.max("_q").alias("from_sec"))
    )
    return per.withColumn("lag_s", F.col("to_sec") - F.col("from_sec"))
