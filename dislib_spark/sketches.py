"""Mergeable sketches for approximate analytics at 100 TB: HLL
distinct counting (Apache DataSketches via Spark built-ins),
count-min frequency, and approximate quantiles.

The scale story is MERGEABILITY, not just approximation: a partial
sketch per day/shard is a few KB of binary state that can be stored
in a parquet column and unioned later — distinct-users-over-any-
date-range becomes a metadata-sized merge instead of a re-scan of
raw events. ``sketch(union(partials)) == sketch(whole)`` exactly, so
incremental pipelines lose nothing vs a full recompute.

All operators are single-pass JVM aggregations (DataSketches runs
inside the JVM, no Python). N/A in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group (±~1.6% at
    lg_k=12) in one pass with fixed memory per group — the exact
    version's hash set is O(cardinality) per group and OOMs on
    high-cardinality keys at scale."""
    agg = F.hll_sketch_estimate(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k))
    ).alias("approx_distinct")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_partial(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Binary HLL sketch per group — store this in a parquet column
    as incremental state (a few KB per group regardless of input
    size)."""
    agg = F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def hll_merge_estimate(
    partials: DataFrame,
    sketch_col: str = "sketch",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union previously-stored partial sketches and estimate — the
    re-aggregation step of an incremental distinct-count pipeline
    (e.g. daily partials → monthly distinct users)."""
    agg = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias("approx_distinct")
    if group_cols:
        return partials.groupBy(*group_cols).agg(agg)
    return partials.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    group_cols: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate percentiles with bounded memory (KLL-style
    summary) — the scale path for ``x05``-type exact percentiles,
    whose per-group full sort is memory-proportional to group size."""
    agg = F.approx_percentile(
        F.col(col),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    ).alias("quantiles")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def frequent_hitters(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Heavy hitters above ``min_share`` of rows via a two-pass
    filter: a count-min sketch pass would give one-pass estimates,
    but for exact shares the partial-agg groupBy below is already
    map-side combined, so the shuffle carries one row per DISTINCT
    value — acceptable whenever the value domain is bounded. Returns
    (value, cnt, share)."""
    total = df.count()
    floor = int(total * min_share)
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.greatest(F.lit(1), F.lit(floor)))
        .withColumn("share", F.round(F.col("cnt") / total, 6))
    )


def count_min(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 1,
) -> Column:
    """One-pass count-min sketch of a column (binary, mergeable) —
    point-frequency estimates without a groupBy shuffle. Returned as
    an aggregated binary column; pair with Spark's CountMinSketch
    reader on the consumer side."""
    return df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )


# --- bloom-filter semi-join prefilter --------------------------------
#
# The classic 100 TB shuffle reducer: build a small bit-array from the
# build side's join keys, broadcast it, and drop probe-side rows that
# cannot match BEFORE the join shuffle. False positives only (they are
# removed by the exact join that follows); never false negatives.
# Spark's own runtime row-level filtering covers equi-joins when AQE
# chooses to inject it — this is the explicit, composable operator
# form (usable for semi-join reductions across stages/pipelines, and
# a mergeable sketch: bit-arrays OR together like the HLL partials).


def _bloom_positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """Bit positions for a key: double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher), all JVM. n_bits must be a power of two."""
    # reduce both hashes mod n_bits BEFORE combining: keeps
    # h1 + i*h2 far below 2^63 (ANSI overflow-safe, like minhash)
    h1 = F.pmod(F.xxhash64(key), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(n_bits))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(h1 + i * h2, F.lit(n_bits)),
    )


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int = 1 << 20, n_hashes: int = 5
) -> list[int]:
    """Aggregate the build side's keys into a bit array (list of
    n_bits/64 longs). One pass, map-side partial aggregation: each
    partition ORs its local words, the driver merge is
    bytes-per-partition sized. Partial arrays from different
    shards/days OR together losslessly (mergeable)."""
    n_words = n_bits // 64
    words = (
        df.select(F.explode(_bloom_positions(F.col(key_col), n_bits, n_hashes)).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("p"), F.lit(64)).cast("int"),
            ).alias("bit"),
        )
        # bit_or never overflows; the sign bit is just bit 63
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    arr = [0] * n_words
    for r in words:
        arr[r["w"]] = r["word"]
    return arr


def bloom_might_contain(
    key: Column, words: Column, n_bits: int, n_hashes: int = 5
) -> Column:
    """Membership predicate against a bit-array COLUMN (attach the
    driver-held list with ``bloom_attach`` — a 1-row broadcast join.
    Expression literals don't work here: both ``F.array(*16k lits)``
    and ``F.lit(list)`` build a 16k-node CreateArray that codegen
    compiles for ~50 s and re-evaluates per row).

    The k probes are UNROLLED into a flat AND of scalar bit tests —
    no higher-order functions, so whole-stage codegen shares h1/h2
    across probes instead of re-evaluating them per lambda element."""
    h1 = F.pmod(F.xxhash64(key), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(n_bits))
    cond = None
    for i in range(n_hashes):
        p = F.pmod(h1 + i * h2, F.lit(n_bits))
        test = (
            F.element_at(words, (p / 64).cast("int") + 1).bitwiseAND(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.pmod(p, F.lit(64)).cast("int"),
                )
            )
            != 0
        )
        cond = test if cond is None else (cond & test)
    return cond


_BLOOM_COL = "__bloom_words"


def bloom_attach(df: DataFrame, bloom: list[int]) -> DataFrame:
    """Attach a bit array as a broadcast 1-row column (read per row
    from the broadcast, never rebuilt per row like a literal)."""
    words_df = df.sparkSession.createDataFrame(
        [(bloom,)], f"{_BLOOM_COL} array<long>"
    )
    return df.crossJoin(F.broadcast(words_df))


def bloom_prefilter(
    df: DataFrame, key_col: str, bloom: list[int], n_hashes: int = 5
) -> DataFrame:
    """Keep rows whose key might be in the filter (false positives
    possible, false negatives impossible)."""
    return (
        bloom_attach(df, bloom)
        .where(
            bloom_might_contain(
                F.col(key_col), F.col(_BLOOM_COL), len(bloom) * 64, n_hashes
            )
        )
        .drop(_BLOOM_COL)
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Exact left-semi join with a bloom prefilter on the probe side:
    rows that cannot match are dropped before the join shuffle (the
    filter composes with scan pushdown of other predicates). The
    false-positive survivors are removed by the exact semi join."""
    bloom = bloom_build(build, build_key, n_bits, n_hashes)
    pre = bloom_prefilter(probe, probe_key, bloom, n_hashes)
    return pre.join(
        build.select(F.col(build_key).alias(probe_key)).dropDuplicates(),
        probe_key,
        "left_semi",
    )


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    n_bins: int = 128,
    by: str | None = None,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Mergeable equi-width histogram sketch: (bin, cnt) rows
    (plus the ``by`` key). With FIXED ``(lo, hi)`` bounds, sketches
    built on disjoint corpora are merged by simply adding counts per
    bin — union the sketch frames and re-aggregate (pinned by
    tests/test_sketches.py) — the storable/streamable summary behind
    :func:`quantiles_from_histogram`. When bounds are omitted they
    are probed with one min/max aggregate over THIS frame (such a
    sketch only merges with others probed on the same bounds).

    Scale: one scan, one map-side-combined groupBy on (by, bin) —
    reduce state is |groups|·n_bins longs regardless of row count.
    """
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        lo = float(row["lo"])
        hi = float(row["hi"])
    width = (hi - lo) / float(n_bins)
    bin_col = (
        F.lit(0)
        if hi == lo
        else F.least(
            F.lit(n_bins - 1), F.floor((v - F.lit(lo)) / F.lit(width))
        )
    ).cast("int")
    keys = ([F.col(by)] if by else []) + [bin_col.alias("bin")]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def quantiles_from_histogram(
    hist: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    qs: tuple = (0.5, 0.9, 0.99),
    by: str | None = None,
) -> DataFrame:
    """Quantile estimates from an equi-width histogram sketch via
    within-bin linear interpolation: for target rank r = ceil(q·n),
    the estimate is ``lo + (bin + (r - cum_prev)/cnt) · width``. The
    deterministic, ANSI-replayable sketch-quantile path (vs the
    rank-error-bounded ``approx_quantiles``): error ≤ one bin width,
    counts are exact integers, so the estimate is bit-stable on any
    engine/partitioning. The cumulative window is ordered per group
    over ≤ ``n_bins`` rows by construction — never data-sized.

    Returns (by?, q, est) with q as a double and est rounded 6dp.
    """
    from pyspark.sql import Window

    width = (hi - lo) / float(n_bins)
    part = [by] if by else []
    w = Window.partitionBy(*part).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*part)
    c = hist.select(
        *part,
        "bin",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    out = None
    for q in qs:
        r = F.ceil(F.lit(float(q)) * F.col("n"))
        hit = c.where((F.col("cum") >= r) & (F.col("cum_prev") < r))
        est = F.lit(lo) + (
            F.col("bin")
            + (r - F.col("cum_prev")).cast("double")
            / F.col("cnt").cast("double")
        ) * F.lit(width)
        sel = hit.select(
            *part,
            F.lit(float(q)).alias("q"),
            F.round(est, 6).alias("est"),
        )
        out = sel if out is None else out.unionAll(sel)
    return out


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    n_bins: int = 128,
    qs: tuple = (0.5, 0.9, 0.99),
    by: str | None = None,
) -> DataFrame:
    """One LAZY job composing :func:`histogram_sketch` +
    :func:`quantiles_from_histogram`: the global (lo, hi) bounds stay
    a broadcast 1-row frame instead of a driver ``.first()`` probe,
    so the whole estimate is a single composable plan (no synchronous
    driver action inside the query function). All q targets are
    resolved in ONE pass by exploding the q literals over the ≤
    ``n_bins``-row cumulative table — no per-q union re-walk.

    Bin and interpolation math is the same IEEE double arithmetic as
    the eager pair, so estimates are bit-identical to them (and to
    the DuckDB replay).

    Returns (by?, q, est) with q double and est rounded 6dp.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    lohi = df.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    src = df.crossJoin(F.broadcast(lohi))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    bin_col = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((v - F.col("_lo")) / width),
            )
        )
        .cast("int")
    )
    part = [by] if by else []
    keys = [F.col(c) for c in part] + [
        bin_col.alias("bin"),
        F.col("_lo"),
        F.col("_hi"),
    ]
    hist = src.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))

    w = Window.partitionBy(*part).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*part)
    c = hist.select(
        *part,
        "bin",
        "cnt",
        "_lo",
        "_hi",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_prev"),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    r = F.ceil(F.col("q") * F.col("n"))
    est = F.col("_lo") + (
        F.col("bin")
        + (r - F.col("cum_prev")).cast("double")
        / F.col("cnt").cast("double")
    ) * ((F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)))
    return (
        c.select(
            *part,
            "bin",
            "cnt",
            "_lo",
            "_hi",
            "cum_prev",
            "cum",
            "n",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
        )
        .where((F.col("cum") >= r) & (F.col("cum_prev") < r))
        .select(*part, "q", F.round(est, 6).alias("est"))
    )


def sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key: Column,
    rate: float = 0.05,
    qs: tuple = (0.5, 0.9, 0.99),
    by: str | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Quantile estimates from a DETERMINISTIC hash-Bernoulli sample:
    a row survives iff ``hash_bucket(key) < rate·buckets`` (md5 —
    engine-replayable, seedless), then exact interpolated percentiles
    run on the survivors. The sample IS the mergeable sketch: the
    keep-decision is per-row, so sample(A ∪ B) = sample(A) ∪
    sample(B) exactly (pinned in tests/test_sketches.py) — shards can
    be sampled independently and their samples unioned, unlike
    rank-error sketches there is no merge algebra to get wrong.
    Standard error ~ O(1/√(rate·n)) on quantile ranks.

    Scale: the keep-filter is a computed expression, so it runs
    scan-side (one pass, no shuffle) but does NOT prune parquet I/O —
    the scan still reads the key+value columns of every row; the win
    is that everything downstream (sort buffers, percentile state)
    holds only the ~rate fraction. Returns (by?, n_sample, one column
    per q)."""
    from dislib_spark.sampling import hash_bucket

    kept = df.where(
        hash_bucket(key, buckets) < int(round(rate * buckets))
    )
    part = [by] if by else []
    # Column-arg builtin (not an F.expr SQL string): keeps arbitrary
    # column names (backtick-worthy ones included) out of a parsed
    # SQL fragment (ADVICE r5).
    arr = F.percentile(
        F.col(value_col),
        F.array(*[F.lit(float(q)) for q in qs]),
    )
    g = kept.groupBy(*part).agg(
        F.count(F.lit(1)).alias("n_sample"), arr.alias("_p")
    )
    cols = [
        F.round(F.element_at("_p", i + 1), 6).alias(
            f"p{int(round(q * 100))}"
        )
        for i, q in enumerate(qs)
    ]
    return g.select(*part, "n_sample", *cols)


def stride_quantiles(
    df: DataFrame,
    value_col: str,
    key: Column,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = 256,
    shards: int = 32,
) -> DataFrame:
    """Deterministic mergeable quantile summary with a WORST-CASE
    rank-error contract (the MRL/KLL-style companion of
    :func:`sampled_quantiles`, whose hash-Bernoulli error is only
    probabilistic): rows hash into ``shards`` md5 shards; each shard
    sorts and keeps every ``stride``-th element (stride = ⌈m/k⌉, the
    block MINIMUM, weighted by its block size), so the summary holds
    ≤ shards·k weighted rows no matter the corpus.

    Contract (proved in tests/test_sketches.py): the weighted ECDF
    only OVERcounts, by at most ``bound = Σ_s (stride_s − 1)`` (one
    straddling block per shard) — so the reported estimate for rank
    target t has true rank in ``[t − bound, t)``-adjacent positions:
    fewer than t elements are strictly below it and at least
    t − bound are ≤ it. With stride_s = ⌈m_s/k⌉ the bound is
    ≤ n/k + shards, i.e. ε ≈ 1/k relative rank error, deterministic
    — no sampling variance, no failure probability.

    Mergeable by construction: shards are a hash PARTITION of the
    key space, so each shard's summary is built from its rows alone
    and summaries of disjoint shard sets union exactly (the merge is
    set union; pinned in tests). At 100 TB, grow ``shards`` with the
    corpus so per-shard sort partitions stay bounded; every value is
    replayable (md5 shard, integer stride/weight arithmetic, IEEE
    ceil on the rank target).

    Returns one row per q: (q, est, n, summary_rows, rank_err_bound).
    """
    from pyspark.sql import Window

    from dislib_spark.sampling import hash_bucket

    src = df.select(
        F.col(value_col).cast("double").alias("val"),
        key.cast("string").alias("kstr"),
    ).withColumn("shard", hash_bucket(F.col("kstr"), shards))
    wsh = Window.partitionBy("shard").orderBy("val", "kstr")
    csh = Window.partitionBy("shard")
    staged = src.select(
        "shard",
        "val",
        "kstr",
        F.row_number().over(wsh).alias("rn"),
        F.count(F.lit(1)).over(csh).alias("m"),
    ).withColumn("stride", F.expr(f"(m + {int(k) - 1}) div {int(k)}"))
    # kept feeds THREE consumers (totals, bound, the rank walk) — pin
    # the ≤ shards·(k+1)-row summary once so the corpus-sized shard
    # sort/window runs ONE pass, not one per consumer.
    kept = (
        staged.where((F.col("rn") - 1) % F.col("stride") == 0)
        .select(
            "shard",
            "val",
            "kstr",
            "stride",
            F.least(
                F.col("stride"), F.col("m") - (F.col("rn") - 1)
            ).alias("wt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = F.broadcast(
        kept.agg(
            F.sum("wt").cast("bigint").alias("n"),
            F.count(F.lit(1)).alias("summary_rows"),
        )
    )
    bnd = F.broadcast(
        kept.groupBy("shard")
        .agg(F.max("stride").alias("stride"))
        .agg(
            F.sum(F.col("stride") - 1)
            .cast("bigint")
            .alias("rank_err_bound")
        )
    )
    wall = Window.orderBy("val", "kstr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = kept.select("val", F.sum("wt").over(wall).alias("cumw"))
    e = (
        cum.select(
            "val",
            "cumw",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
        )
        .crossJoin(tot)
        .crossJoin(bnd)
    )
    return (
        e.where(F.col("cumw") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.round(F.min("val"), 6).alias("est"),
            F.first("n").alias("n"),
            F.first("summary_rows").alias("summary_rows"),
            F.first("rank_err_bound").alias("rank_err_bound"),
        )
        .orderBy("q")
    )


def grouped_stride_quantiles(
    df: DataFrame,
    value_col: str,
    key: Column,
    by: str,
    qs: tuple = (0.5, 0.9, 0.99),
    k: int = 256,
    shards: int = 32,
) -> DataFrame:
    """Per-GROUP :func:`stride_quantiles`: the same deterministic
    MRL-style summary, sharded and bounded WITHIN each ``by`` group —
    per-group rank error ≤ the group's reported ``rank_err_bound``
    (Σ over that group's shards of stride−1), summaries ≤ shards·k
    rows per group. The grouped form is what a per-source /
    per-tenant length-profile report runs at 100 TB: every window
    below is (group, shard)- or group-grained, never global.

    Returns one row per (by, q): (by, q, est, n, summary_rows,
    rank_err_bound).
    """
    from pyspark.sql import Window

    from dislib_spark.sampling import hash_bucket

    src = df.select(
        F.col(by).alias("grp"),
        F.col(value_col).cast("double").alias("val"),
        key.cast("string").alias("kstr"),
    ).withColumn("shard", hash_bucket(F.col("kstr"), shards))
    wsh = Window.partitionBy("grp", "shard").orderBy("val", "kstr")
    csh = Window.partitionBy("grp", "shard")
    staged = src.select(
        "grp",
        "shard",
        "val",
        "kstr",
        F.row_number().over(wsh).alias("rn"),
        F.count(F.lit(1)).over(csh).alias("m"),
    ).withColumn("stride", F.expr(f"(m + {int(k) - 1}) div {int(k)}"))
    kept = (
        staged.where((F.col("rn") - 1) % F.col("stride") == 0)
        .select(
            "grp",
            "shard",
            "val",
            "kstr",
            "stride",
            F.least(
                F.col("stride"), F.col("m") - (F.col("rn") - 1)
            ).alias("wt"),
        )
        .localCheckpoint(eager=False)
    )
    tot = kept.groupBy("grp").agg(
        F.sum("wt").cast("bigint").alias("n"),
        F.count(F.lit(1)).alias("summary_rows"),
    )
    bnd = (
        kept.groupBy("grp", "shard")
        .agg(F.max("stride").alias("stride"))
        .groupBy("grp")
        .agg(
            F.sum(F.col("stride") - 1)
            .cast("bigint")
            .alias("rank_err_bound")
        )
    )
    wall = Window.partitionBy("grp").orderBy("val", "kstr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = kept.select("grp", "val", F.sum("wt").over(wall).alias("cumw"))
    e = (
        cum.select(
            "grp",
            "val",
            "cumw",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
        )
        .join(tot, "grp")
        .join(bnd, "grp")
    )
    return (
        e.where(F.col("cumw") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("grp", "q")
        .agg(
            F.round(F.min("val"), 6).alias("est"),
            F.first("n").alias("n"),
            F.first("summary_rows").alias("summary_rows"),
            F.first("rank_err_bound").alias("rank_err_bound"),
        )
        .withColumnRenamed("grp", by)
        .orderBy(by, "q")
    )


def stride_partials(
    df: DataFrame,
    value_col: str,
    key: Column,
    part: Column,
    k: int = 64,
    shards: int = 4,
) -> DataFrame:
    """The PERSISTABLE form of :func:`stride_quantiles`: per-
    (``part``, md5-shard) sorted stride summaries as plain rows
    (part, shard, val, kstr, stride, wt) — what a continuous-
    profiling job writes ``partitionBy("part")`` to its sketch table
    each day/month instead of keeping raw rows. Each partition's
    summary is built from its rows alone, so partials for disjoint
    partition sets union exactly (set-union merge, the
    stride_quantiles contract) and the merged worst-case rank error
    is Σ over stored (part, shard) blocks of (stride − 1) —
    :func:`merged_stride_quantiles` reports it."""
    from pyspark.sql import Window

    from dislib_spark.sampling import hash_bucket

    src = df.select(
        part.cast("string").alias("part"),
        F.col(value_col).cast("double").alias("val"),
        key.cast("string").alias("kstr"),
    ).withColumn("shard", hash_bucket(F.col("kstr"), shards))
    wsh = Window.partitionBy("part", "shard").orderBy("val", "kstr")
    csh = Window.partitionBy("part", "shard")
    staged = src.select(
        "part",
        "shard",
        "val",
        "kstr",
        F.row_number().over(wsh).alias("rn"),
        F.count(F.lit(1)).over(csh).alias("m"),
    ).withColumn("stride", F.expr(f"(m + {int(k) - 1}) div {int(k)}"))
    return staged.where(
        (F.col("rn") - 1) % F.col("stride") == 0
    ).select(
        "part",
        "shard",
        "val",
        "kstr",
        "stride",
        F.least(F.col("stride"), F.col("m") - (F.col("rn") - 1)).alias(
            "wt"
        ),
    )


def merged_stride_quantiles(
    kept: DataFrame, qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Merge-on-read over a stored :func:`stride_partials` table:
    global quantile estimates from the summary rows ALONE — the
    corpus is never rescanned (the t37/v10 stored-state pattern
    applied to sketches). Cost is summary-proportional: one ordered
    cumulative-weight walk over ≤ parts·shards·(k+1) rows; the
    reported ``rank_err_bound`` is Σ over stored (part, shard)
    blocks of (stride − 1), exactly the stride_quantiles law applied
    to the finer partition.

    Returns one row per q: (q, est, n, summary_rows,
    rank_err_bound)."""
    from pyspark.sql import Window

    tot = F.broadcast(
        kept.agg(
            F.sum("wt").cast("bigint").alias("n"),
            F.count(F.lit(1)).alias("summary_rows"),
        )
    )
    bnd = F.broadcast(
        kept.groupBy("part", "shard")
        .agg(F.max("stride").alias("stride"))
        .agg(
            F.sum(F.col("stride") - 1)
            .cast("bigint")
            .alias("rank_err_bound")
        )
    )
    wall = Window.orderBy("val", "kstr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = kept.select("val", F.sum("wt").over(wall).alias("cumw"))
    e = (
        cum.select(
            "val",
            "cumw",
            F.explode(
                F.array(*[F.lit(float(q)) for q in qs])
            ).alias("q"),
        )
        .crossJoin(tot)
        .crossJoin(bnd)
    )
    return (
        e.where(F.col("cumw") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(
            F.round(F.min("val"), 6).alias("est"),
            F.first("n").alias("n"),
            F.first("summary_rows").alias("summary_rows"),
            F.first("rank_err_bound").alias("rank_err_bound"),
        )
        .orderBy("q")
    )


# rank-source width of the current md5-HLL partial format; stamped on
# every stored partial row and enforced on merge (see md5_hll_estimate)
_MD5_HLL_RHO_BITS = 64


def _md5_hll_rho(word_hex: Column) -> Column:
    """Position of the first set bit (1-based) of the 64-bit value
    written as 16 hex chars — 65 when zero. Exact string/CASE
    arithmetic (no float log2), so the register state replays
    bit-identically in any engine with md5 + regexp. 64 rank bits
    keep the sketch unbiased past ~2³² distincts (a 32-bit rank
    saturates around 10⁸–10⁹, too small for 100 TB user/url
    cardinalities); the register stays the first md5 byte and the
    MAX merge law is unchanged, so stored 64-bit partials merge
    exactly like the 32-bit ones did."""
    lz_hex = F.length(F.regexp_extract(word_hex, "^0*", 0))
    nib = F.conv(F.substring(word_hex, lz_hex + 1, 1), 16, 10).cast(
        "int"
    )
    nib_clz = (
        F.when(nib >= 8, 0)
        .when(nib >= 4, 1)
        .when(nib >= 2, 2)
        .otherwise(3)
    )
    return F.when(lz_hex == 16, F.lit(65)).otherwise(
        lz_hex * 4 + nib_clz + 1
    )


def md5_hll_partials(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
    m: int = 256,
) -> DataFrame:
    """ENGINE-REPLAYABLE HyperLogLog register partials — the stored-
    sketch companion to :func:`hll_partial` for pipelines that need
    the sketch state itself value-auditable (DataSketches binaries
    aren't ANSI-replayable; these registers are): register index =
    first byte of md5(value), rank = leading-zero count of the next
    64 md5 bits + 1 (64-bit rank source, so the estimate holds past
    2³² distincts — the 100 TB stored-sketch regime). Output is one
    (group…, reg, max_rho) row per
    NON-ZERO register — ≤ ``m`` rows per group regardless of input
    size, mergeable downstream by plain MAX (union of sketches ≡
    max per register, the HLL merge law). Store partitionBy(group)
    and re-aggregate forever without rescanning the corpus."""
    if m != 256:
        raise ValueError(
            "md5_hll registers are derived from the first md5 byte; "
            "only m=256 is supported"
        )
    h = F.md5(F.col(col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("reg")
    rho = _md5_hll_rho(F.substring(h, 3, 16))
    keys = [F.col(c) for c in (group_cols or [])] + [reg]
    return (
        df.groupBy(*keys)
        .agg(F.max(rho).alias("max_rho"))
        # format marker: the rank-source width is part of the stored
        # partial's FORMAT (ranks from a 32-bit source cap at 33, from
        # the current 64-bit source at 65 — MAX-merging the two widths
        # silently understates ranks and biases the estimate), so every
        # stored row carries it and the estimator refuses mixed widths
        .withColumn("rho_bits", F.lit(_MD5_HLL_RHO_BITS))
    )


def md5_hll_estimate(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    m: int = 256,
) -> DataFrame:
    """Cardinality estimate from stored :func:`md5_hll_partials`
    registers (merging duplicate (group, reg) rows by MAX first, so
    unioned partials from many shards/sources are valid input):
    Flajolet's E = α·m²/Σ2^(−M_j) with empty registers contributing
    2⁰, and the linear-counting small-range correction
    E = m·ln(m/V) when E ≤ 2.5m and V > 0 empty registers remain.
    With the 64-bit rank source there is no large-range correction
    branch (that was a 32-bit-hash artifact); linear counting stays
    because it fixes register-collision bias at LOW cardinality,
    which is independent of rank width.
    Returns (group…, hll_estimate, n_nonzero_regs); the scalar
    algebra is plain IEEE, replayable to the rounding digit.

    Format guard: stored partials carry a ``rho_bits`` marker (the
    rank-source width — see :func:`md5_hll_partials`). Partials
    WITHOUT the column predate the 64-bit widening and must be rebuilt
    (a ValueError says so up front); rows whose marker differs from
    the current width raise at execution time instead of MAX-merging
    two incompatible register encodings into a silently biased
    estimate."""
    gcols = list(group_cols or [])
    if "rho_bits" not in partials.columns:
        raise ValueError(
            "md5_hll partials have no rho_bits format marker: they "
            "were stored by the pre-64-bit-rank format and cannot be "
            "merged with current partials — rebuild them with "
            "md5_hll_partials()"
        )
    partials = partials.withColumn(
        "max_rho",
        F.when(
            F.col("rho_bits") == _MD5_HLL_RHO_BITS, F.col("max_rho")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "md5_hll partials format mismatch: stored "
                        "rho_bits="
                    ),
                    F.col("rho_bits").cast("string"),
                    F.lit(
                        f", estimator expects {_MD5_HLL_RHO_BITS} — "
                        "mixed-width register merges are biased; "
                        "rebuild the older sketches"
                    ),
                )
            ).cast("int")
        ),
    ).drop("rho_bits")
    merged = partials.groupBy(
        *[F.col(c) for c in gcols], F.col("reg")
    ).agg(F.max("max_rho").alias("max_rho"))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = merged.groupBy(*gcols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
        F.count(F.lit(1)).alias("n_nonzero_regs"),
    )
    v = F.lit(m) - F.col("n_nonzero_regs")
    raw = F.lit(alpha * m * m) / (
        F.col("_s") + v.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *gcols,
        F.round(est, 6).alias("hll_estimate"),
        F.col("n_nonzero_regs").cast("bigint").alias("n_nonzero_regs"),
    )
