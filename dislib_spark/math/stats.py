"""One-pass distributed summary statistics.

Extension surface (the reference's statistics live inside individual
estimators — e.g. the Gramian pass of regression/linear/base.py and
the scatter pass of decomposition/pca — this module exposes the same
sufficient-statistics pattern as standalone operators).

Scale design: every function here reads the fact table EXACTLY once,
reduces to O(d²) scalars with map-side-combined aggregates, and does
the remaining algebra on that single packed row inside the plan — no
driver collect, no second scan, no shuffle beyond the one final
aggregation. That is the shape that survives 100 TB: d=100 columns is
10k floats of reduce state per partition regardless of row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# n_bins="auto" policy for the ECDF-family kernels (roc_auc /
# ks_statistic): probe the distinct-value cardinality with ONE cheap
# approx_count_distinct aggregate; below the threshold the exact
# per-distinct-value collapse is already scale-safe (the ordered
# window sees |distinct| rows), above it switch to fixed-width
# binning so the window input is bounded at AUTO_BINS rows no matter
# the corpus — the declared queries stay oracle-exact at test scales
# while defaulting to the plan that survives 100 TB.
AUTO_DISTINCT_THRESHOLD = 100_000
AUTO_BINS = 10_000


def _resolve_auto_bins(
    src: DataFrame,
    value: Column,
    n_bins,
    auto_threshold: int,
    auto_bins: int,
):
    """Resolve ``n_bins="auto"`` → None (exact) or ``auto_bins``.

    The cheap HLL probe carries ~±2% error, but the DuckDB oracles
    replay this branch on the EXACT distinct count — so when the
    estimate lands inside a ±5% band around the threshold, one exact
    ``count_distinct`` re-probe decides (rare: only corpora sitting
    right at the boundary pay it). The branch choice is therefore
    deterministic and engine-replayable at every scale, not just when
    the corpus is far from the threshold."""
    if n_bins != "auto":
        return n_bins
    est = src.agg(F.approx_count_distinct(value).alias("_d")).first()["_d"]
    if 0.95 * auto_threshold <= est <= 1.05 * auto_threshold:
        est = src.agg(F.count_distinct(value).alias("_d")).first()["_d"]
    return auto_bins if est > auto_threshold else None


def _with_bin_key(src: DataFrame, v: Column, n_bins: int):
    """Fixed-width bucket ``v`` into ``[0, n_bins)``: broadcast the
    1-row (lo, hi) frame and substitute the (double-typed) bin index
    for the value — the shared binning step of the ECDF/rank-family
    kernels (ks_statistic / roc_auc / mann_whitney_u /
    kruskal_wallis). Bounds every downstream per-distinct-value
    window at ``n_bins`` rows regardless of corpus size.

    The broadcast bounds land under collision-proof internal names
    (``__bk_lo``/``__bk_hi``) so a caller frame that already carries
    a ``lo`` or ``hi`` column can't trip an ambiguous-reference
    error or silently mis-bin."""
    lohi = src.agg(F.min(v).alias("__bk_lo"), F.max(v).alias("__bk_hi"))
    lo, hi = F.col("__bk_lo"), F.col("__bk_hi")
    width = (hi - lo) / F.lit(float(n_bins))
    key = (
        F.when(hi == lo, F.lit(0.0))
        .otherwise(
            F.least(
                F.lit(float(n_bins - 1)),
                F.floor((v - lo) / width).cast("double"),
            )
        )
    )
    return src.crossJoin(F.broadcast(lohi)), key


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation of every column pair in ONE scan.

    Collects the packed sufficient statistics (n, Σxᵢ, Σxᵢ², Σxᵢxⱼ)
    as a single aggregate row, then unpivots the d(d-1)/2 upper
    triangle with ``stack`` — so the data is read once for ALL pairs,
    not once per pair, and the reduce state is O(d²) scalars.

    Returns (col_a, col_b, corr) with col_a < col_b lexically and
    corr = population Pearson r rounded to 6 places (rounding makes
    the value hash partition-order independent).
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs at least 2 columns")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    pairs = [
        (a, b)
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    stats = df.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("n")
        cov = F.col(f"sp_{a}_{b}") / n - (F.col(f"s_{a}") / n) * (
            F.col(f"s_{b}") / n
        )
        var_a = F.col(f"ss_{a}") / n - (F.col(f"s_{a}") / n) ** 2
        var_b = F.col(f"ss_{b}") / n - (F.col(f"s_{b}") / n) ** 2
        return F.round(cov / F.sqrt(var_a * var_b), 6)

    # Unpivot the single stats row into (col_a, col_b, corr) rows:
    # project each triple to named columns, then one stack().
    n_pairs = len(pairs)
    projected = []
    for i, (a, b) in enumerate(pairs):
        projected.append(F.lit(a).alias(f"col_a_{i}"))
        projected.append(F.lit(b).alias(f"col_b_{i}"))
        projected.append(corr_expr(a, b).alias(f"corr_{i}"))
    return stats.select(*projected).selectExpr(
        f"stack({n_pairs}, "
        + ", ".join(
            f"col_a_{i}, col_b_{i}, corr_{i}" for i in range(n_pairs)
        )
        + ") AS (col_a, col_b, corr)"
    )


def robust_stats(
    df: DataFrame, cols: list[str], percentiles=(0.25, 0.5, 0.75)
) -> DataFrame:
    """Per-column exact median / quartiles / IQR in ONE aggregate.

    The robust-scaler fit statistics (sklearn RobustScaler contract:
    center = median, scale = IQR). Exact ``percentile`` keeps the
    result oracle-checkable; the documented 100 TB path swaps in
    ``approx_percentile`` (mergeable GK sketch) behind the same
    column names — see ``sketches.quantile_sketch``.

    Returns one row per column: (col_name, q25, median, q75, iqr).
    """
    q25, q50, q75 = percentiles
    # ONE array-percentile aggregate per column (a single sort/buffer
    # per column, not one per requested quantile — 3× less agg work).
    aggs = [
        F.expr(f"percentile({c}, array({q25}, {q50}, {q75}))").alias(f"p_{c}")
        for c in cols
    ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.round(F.element_at(f"p_{c}", 1), 6).alias("q25"),
            F.round(F.element_at(f"p_{c}", 2), 6).alias("median"),
            F.round(F.element_at(f"p_{c}", 3), 6).alias("q75"),
            F.round(
                F.element_at(f"p_{c}", 3) - F.element_at(f"p_{c}", 1), 6
            ).alias("iqr"),
        ).alias(f"st_{c}")
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("s")
    ).select("s.*")


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between ``group_a`` and
    ``group_b`` rows of ``value_col``.

    ``n_bins=None`` is exact: rows collapse to per-distinct-value
    (count_a, count_b) pairs and ONE ordered window walks the merged
    ECDFs (the m23 kernel). With ``n_bins`` set, values are
    fixed-width-bucketed first, bounding the window input at
    ``n_bins`` rows regardless of corpus size — the 100 TB path for
    continuous columns whose distinct count is unbounded. Binning
    only coarsens D downward by at most the largest per-bin mass
    (ECDFs agree at every bin boundary), so the estimate is a lower
    bound that converges as bins shrink.

    ``n_bins="auto"`` probes ``approx_count_distinct`` once and picks
    exact below ``auto_threshold`` distinct values, ``auto_bins``
    buckets above — the declared-query default that stays exact at
    oracle scales and bounded at 100 TB.

    Returns one row (n_a, n_b, ks_stat).
    """
    from pyspark.sql import Window

    src = df.where(F.col(group_col).isin(group_a, group_b))
    v = F.col(value_col).cast("double")
    n_bins = _resolve_auto_bins(src, v, n_bins, auto_threshold, auto_bins)
    if n_bins is not None:
        src, key = _with_bin_key(src, v, n_bins)
        key = key.alias("v")
    else:
        key = v.alias("v")
    g = src.groupBy(key).agg(
        F.sum((F.col(group_col) == group_a).cast("long")).alias("ca"),
        F.sum((F.col(group_col) == group_b).cast("long")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    ecdf = g.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a").cast("double") / F.col("n_a").cast("double")
        - F.col("cum_b").cast("double") / F.col("n_b").cast("double")
    )
    return ecdf.agg(
        F.max("n_a").cast("bigint").alias("n_a"),
        F.max("n_b").cast("bigint").alias("n_b"),
        F.max(gap).alias("ks_stat"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Mann-Whitney ROC AUC with tie-averaged ranks.

    ``n_bins=None`` is exact: rows collapse to per-distinct-score
    (count, positives) pairs first, then ONE ordered running-sum
    window walks the grouped rows — the window input is the DISTINCT
    score cardinality, not the corpus (the m11 kernel). With
    ``n_bins`` set, scores are fixed-width-bucketed before grouping,
    bounding the window input at ``n_bins`` rows regardless of corpus
    size — the 100 TB path for continuous scores whose distinct count
    is unbounded (mirrors ``ks_statistic(n_bins=...)``). Binning
    treats every score inside a bin as tied, which moves the AUC by
    at most the tied mass fraction; the estimate converges to exact
    as bins shrink (pinned by tests/test_stats_ops.py's
    exact-vs-binned convergence test). ``n_bins="auto"`` probes
    ``approx_count_distinct`` once and picks exact below
    ``auto_threshold`` distinct scores, ``auto_bins`` buckets above.

    Returns one row (auc, n_pos, n_neg); auc rounded to 6 places.
    """
    from pyspark.sql import Window

    v = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    n_bins = _resolve_auto_bins(df, v, n_bins, auto_threshold, auto_bins)
    src = df
    if n_bins is not None:
        src, key = _with_bin_key(df, v, n_bins)
        key = key.alias("score")
    else:
        key = v.alias("score")
    grp = src.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos_g"),
    )
    cum = F.coalesce(
        F.sum("n").over(
            Window.orderBy("score").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0),
    )
    ranked = grp.withColumn("arank", cum + (F.col("n") + 1) / 2.0)
    return ranked.agg(
        F.round(
            (
                F.sum(F.col("n_pos_g") * F.col("arank"))
                - F.sum("n_pos_g") * (F.sum("n_pos_g") + 1) / 2.0
            )
            / (F.sum("n_pos_g") * (F.sum("n") - F.sum("n_pos_g"))),
            6,
        ).alias("auc"),
        F.sum("n_pos_g").cast("bigint").alias("n_pos"),
        (F.sum("n") - F.sum("n_pos_g")).cast("bigint").alias("n_neg"),
    )


def woe_iv(
    df: DataFrame,
    bucket: Column,
    label: Column,
) -> DataFrame:
    """Weight-of-Evidence binning for a binary label: per feature
    bucket, ``woe = ln((pos_b/P) / (neg_b/N))`` and its Information-
    Value term ``(pos_b/P - neg_b/N)·woe`` — the classic
    credit-scoring / feature-selection report (IV = Σ iv_term ranks
    the feature's predictive power). ONE map-side-combined
    aggregation: (bucket → pos/neg counts), class totals re-
    aggregated from the tiny bucket table via a 1-row broadcast.

    Buckets where either class is absent are dropped (their WOE is
    ±∞; standard practice is a coarser binning or a smoothing prior —
    both expressible upstream in ``bucket``). Counts are exact
    integers, so the only float op is one LN per bucket — replayable
    to 6 dp on any engine.
    """
    per = df.groupBy(bucket.alias("bucket")).agg(
        F.sum(label.cast("long")).alias("pos_n"),
        F.sum((~label).cast("long")).alias("neg_n"),
    )
    tot = F.broadcast(
        per.agg(
            F.sum("pos_n").alias("P"),
            F.sum("neg_n").alias("N"),
        )
    )
    pr = F.col("pos_n") / F.col("P")
    nr = F.col("neg_n") / F.col("N")
    woe = F.log(pr / nr)
    return (
        per.crossJoin(tot)
        .where((F.col("pos_n") > 0) & (F.col("neg_n") > 0))
        .select(
            "bucket",
            "pos_n",
            "neg_n",
            F.round(woe, 6).alias("woe"),
            F.round((pr - nr) * woe, 6).alias("iv_term"),
        )
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Average precision (step-interpolated PR-AUC): with rows ranked
    by score descending, ``AP = Σ_t (pos_t / P) · precision@t`` over
    the distinct score thresholds t — the ranking-quality twin of
    :func:`roc_auc` that weights the head of the ranking (retrieval /
    hard-negative mining care about this one, not ROC).

    Same scale shape as ``roc_auc``: rows collapse to per-distinct-
    score (count, positives) pairs FIRST, then ONE descending
    running-sum window walks the grouped rows — window input is the
    distinct-score cardinality, never the corpus. ``n_bins`` bounds
    that cardinality for continuous scores (the 100 TB path,
    convergence pinned in tests/test_stats_ops.py); ``n_bins="auto"``
    probes ``approx_count_distinct`` once and picks exact below
    ``auto_threshold`` distinct scores, ``auto_bins`` buckets above —
    same policy as :func:`roc_auc` / :func:`ks_statistic`. Ties share
    one threshold (the whole tied block enters precision at once),
    which is the standard tie treatment.

    Returns one row (ap, n_pos, n_neg); ap rounded to 6 places.
    """
    from pyspark.sql import Window

    v = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    n_bins = _resolve_auto_bins(df, v, n_bins, auto_threshold, auto_bins)
    src = df
    if n_bins is not None:
        src, key = _with_bin_key(df, v, n_bins)
        key = key.alias("score")
    else:
        key = v.alias("score")
    grp = src.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("pos"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = grp.select(
        "n",
        "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    )
    return r.agg(
        F.round(
            F.sum(F.col("pos") * F.col("cp") / F.col("cn"))
            / F.sum("pos"),
            6,
        ).alias("ap"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        (F.sum("n") - F.sum("pos")).cast("bigint").alias("n_neg"),
    )


def km_curve(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan-Meier survival estimator: ``S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ)``
    over event times tᵢ, with right-censoring (``event=0`` rows leave
    the risk set without contributing a failure) — churn / reliability
    / time-to-conversion analysis on event logs.

    Scale shape: the corpus collapses to per-distinct-duration
    (events, leavers) pairs in ONE map-side-combined aggregate; the
    at-risk count is a suffix running sum and the survival product an
    ``exp(Σ ln)`` prefix sum, both windows over the distinct-duration
    table (days, not rows — bounded by the observation span at any
    corpus size). No driver collect, no self-join, no per-row state.

    A zero factor (everyone at risk fails at t) would make ``ln``
    engine-dependent, so it is excluded from the log sum and the
    survival pinned to exactly 0.0 from that time on via a windowed
    min guard.

    Returns (t, n_risk, n_event, survival) for event times only,
    survival rounded to 6 places.
    """
    from pyspark.sql import Window

    g = df.groupBy(
        F.col(duration_col).cast("long").alias("t")
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("d"),
        F.count(F.lit(1)).alias("m"),
    )
    suffix = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.select(
        "t", "d", F.sum("m").over(suffix).alias("n_risk")
    )
    f = F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")
    surv = F.when(F.min(f).over(cum) == 0, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.when(F.col("d") < F.col("n_risk"), F.log(f)).otherwise(
                    F.lit(0.0)
                )
            ).over(cum)
        )
    )
    return (
        r.select(
            "t",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("n_event"),
            F.round(surv, 6).alias("survival"),
        )
        .where(F.col("n_event") > 0)
        .orderBy("t")
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test with tie correction:
    the rank-based two-sample location test that needs no normality
    assumption — the non-parametric sibling of :func:`welch_ttest`
    (m18) next to the distribution-shape KS test (m23).

    Scale shape (the m11/m27 recipe): rows collapse FIRST to
    per-distinct-value (count-in-A, total) pairs in one map-side-
    combined aggregate, then ONE ordered running-sum window over the
    distinct-value table assigns midranks (tied blocks share the
    average rank). ``n_bins`` bounds that window input for continuous
    columns: values are fixed-width-bucketed first, so every value in
    a bin ties at the bin's midrank — U converges to the exact
    statistic as bins shrink (same contract as ``ks_statistic``).
    ``n_bins="auto"`` probes ``approx_count_distinct`` once and picks
    exact below ``auto_threshold`` distinct values, ``auto_bins``
    buckets above — exact at oracle scales, bounded at 100 TB.

    Numerics: midranks are half-integers, so the rank sum is carried
    DOUBLED as an exact ``DECIMAL(38,0)`` cross-moment (a double sum
    overflows 2^53 at ~1e9 rows); the tie term Σ(t³−t) likewise. The
    z statistic (normal approximation, no continuity correction) and
    the rank-biserial effect size are pure IEEE algebra on those
    exact integers — replayable to the last ulp.

    Returns one row: (n_a, n_b, u_a, z, rank_biserial).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    src = df.where(g.isin([group_a, group_b]))
    n_bins = _resolve_auto_bins(src, v, n_bins, auto_threshold, auto_bins)
    if n_bins is not None:
        src, v = _with_bin_key(src, v, n_bins)
    per = src.groupBy(v.alias("val")).agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("na_v"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # doubled midrank of a tied block = 2·(rows before it) + t + 1
    r = per.select(
        "na_v",
        "t",
        (F.lit(2) * F.sum("t").over(w) - F.col("t") + 1).alias("rank2"),
    )
    s = r.agg(
        F.sum(
            F.col("na_v").cast("decimal(38,0)") * F.col("rank2")
        ).alias("r2a"),
        F.sum("na_v").cast("decimal(38,0)").alias("na"),
        F.sum("t").cast("decimal(38,0)").alias("nn"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("ties"),
    )
    na = F.col("na").cast("double")
    nb = (F.col("nn") - F.col("na")).cast("double")
    n = F.col("nn").cast("double")
    ua = (F.col("r2a").cast("double") - na * (na + 1)) / 2.0
    mu = na * nb / 2.0
    sig2 = (
        na * nb / 12.0
        * ((n + 1) - F.col("ties").cast("double") / (n * (n - 1)))
    )
    return s.select(
        F.col("na").cast("bigint").alias("n_a"),
        (F.col("nn") - F.col("na")).cast("bigint").alias("n_b"),
        F.round(ua, 6).alias("u_a"),
        F.round((ua - mu) / F.sqrt(sig2), 6).alias("z"),
        F.round(1.0 - 2.0 * ua / (na * nb), 6).alias("rank_biserial"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Kruskal-Wallis H — the k-group extension of the Mann-Whitney
    rank test (one-way ANOVA on ranks, no normality assumption):
    ``H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)`` with midrank ties and
    the standard tie correction ``C = 1 − Σ(t³−t)/(N³−N)``.

    Scale shape = the m11 rank kernel: rows collapse to per-distinct-
    value (total, per-group) counts FIRST; ONE ordered running-sum
    window walks the distinct-value table (|distinct| rows, never the
    corpus). ``n_bins`` fixed-width-buckets continuous columns first
    so that table is bounded at ``n_bins`` rows (every value in a bin
    ties at the bin midrank; H converges as bins shrink);
    ``n_bins="auto"`` picks exact below ``auto_threshold`` distinct
    values, ``auto_bins`` buckets above — the 100 TB default.
    Degenerate inputs: with one distinct value (or N ≤ 1) the tie
    correction C = 1 − Σ(t³−t)/(N³−N) is 0 (or 0/0), so
    ``h_tie_corrected`` is returned as NULL rather than a NaN/∞.
    Exactness: midranks are carried DOUBLED (integers), the
    per-group rank sums accumulate as DECIMAL(38,0) (their squares
    overflow 2^53 — the documented cross-moment rule), and every
    division is IEEE on exact operands, so H replays to the rounding
    grain.

    Returns one row (n, k, h, h_tie_corrected), 6-dp rounded.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    src = df
    n_bins = _resolve_auto_bins(src, v, n_bins, auto_threshold, auto_bins)
    if n_bins is not None:
        src, v = _with_bin_key(src, v, n_bins)
    per = src.groupBy(
        v.alias("val"), F.col(group_col).alias("g")
    ).agg(F.count(F.lit(1)).alias("c"))
    pv = per.groupBy("val").agg(F.sum("c").alias("t"))
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pv2 = pv.select(
        "val",
        "t",
        (F.sum("t").over(w) - F.col("t")).alias("cumprev"),
    )
    r2 = 2 * F.col("cumprev") + F.col("t") + 1  # doubled midrank
    grp = (
        per.join(pv2, "val")
        .groupBy("g")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum((F.col("c") * r2).cast("decimal(38,0)")).alias(
                "r2g"
            ),
        )
    )
    nt = F.broadcast(grp.agg(F.sum("n_g").alias("n")))
    ties = F.broadcast(
        pv.agg(
            F.sum(
                (
                    F.col("t").cast("decimal(38,0)")
                    * F.col("t")
                    * F.col("t")
                    - F.col("t")
                )
            ).alias("tie")
        )
    )
    term = (
        F.col("r2g").cast("double") * F.col("r2g").cast("double")
    ) / F.col("n_g")
    out = (
        grp.crossJoin(nt)
        .crossJoin(ties)
        .groupBy()
        .agg(
            F.sum(term).alias("s"),
            F.count(F.lit(1)).alias("k"),
            F.first("n").alias("n"),
            F.first("tie").alias("tie"),
        )
    )
    nd = F.col("n").cast("double")
    h = 3.0 / (nd * (nd + 1.0)) * F.col("s") - 3.0 * (nd + 1.0)
    tie_den = nd * nd * nd - nd
    c = 1.0 - F.col("tie").cast("double") / tie_den
    # C = 0 when every value is identical (Σ(t³−t) = N³−N) and the
    # denominator itself is 0 at N ≤ 1 — both make H/C meaningless,
    # so emit NULL instead of NaN/∞ (ADVICE r5).
    h_tc = F.when(
        (tie_den == 0) | (c == 0), F.lit(None).cast("double")
    ).otherwise(F.round(h / c, 6))
    return out.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("int").alias("k"),
        F.round(h, 6).alias("h"),
        h_tc.alias("h_tie_corrected"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int | None | str = None,
    auto_threshold: int = AUTO_DISTINCT_THRESHOLD,
    auto_bins: int = AUTO_BINS,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Levene's test with
    the group MEDIAN center): one-way ANOVA on the absolute
    deviations ``z = |y − median_g|`` — the robust precondition check
    for the m39 Kruskal / m18 Welch family (reference analogue: the
    model-validation statistics around ``dislib/model_selection``).
    Median-centering (not mean) is what makes the statistic exactly
    replayable: the median is a closed-form function of the
    per-distinct-value count table.

    Scale shape: rows collapse FIRST to per-(group, distinct-value)
    counts in one map-side-combined aggregate; the per-group exact
    median comes from ONE running-sum window over that table
    (1-indexed positions ``(n+1)//2`` and ``(n+2)//2``, averaged —
    the textbook even/odd rule), and every downstream sum is over
    the distinct-value table, never the corpus. ``n_bins`` bounds
    the table for continuous columns (same contract as
    ``kruskal_wallis``).

    Exactness: counts are exact longs; ``c·z`` and ``c·z²`` per-term
    cast to DECIMAL(38,6) so the sums are order-exact; the final
    W = ((N−k)/(k−1)) · Σ n_g(z̄_g−z̄)² / Σ(Σcz² − (Σcz)²/n_g) is
    IEEE algebra on those exact operands. Degenerate inputs (k ≤ 1
    or a zero within-group denominator) return NULL for ``w``.

    Returns one row (n, k, w, df1, df2).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    src = df
    n_bins = _resolve_auto_bins(src, v, n_bins, auto_threshold, auto_bins)
    if n_bins is not None:
        src, v = _with_bin_key(src, v, n_bins)
    per = src.groupBy(
        F.col(group_col).alias("g"), v.alias("val")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("g")
    pv = per.select(
        "g",
        "val",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n_g"),
    ).withColumn("prev", F.col("cum") - F.col("c"))
    # exact median: avg of the values at 1-indexed positions
    # (n+1)//2 and (n+2)//2 of the sorted sample
    p1 = F.floor((F.col("n_g") + 1) / 2)
    p2 = F.floor((F.col("n_g") + 2) / 2)
    med = F.broadcast(
        pv.groupBy("g")
        .agg(
            (
                (
                    F.max(
                        F.when(
                            (F.col("prev") < p1) & (p1 <= F.col("cum")),
                            F.col("val"),
                        )
                    )
                    + F.max(
                        F.when(
                            (F.col("prev") < p2) & (p2 <= F.col("cum")),
                            F.col("val"),
                        )
                    )
                )
                / 2.0
            ).alias("med")
        )
    )
    z = F.abs(F.col("val") - F.col("med"))
    grp = (
        per.join(med, "g")
        .groupBy("g")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum((F.col("c") * z).cast("decimal(38,6)")).alias("sz"),
            F.sum((F.col("c") * z * z).cast("decimal(38,6)")).alias(
                "szz"
            ),
        )
    )
    szd = F.col("sz").cast("double")
    szzd = F.col("szz").cast("double")
    ngd = F.col("n_g").cast("double")
    agg = grp.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(szd).alias("sz_all"),
        F.sum(szd * szd / ngd).alias("sq_over_n"),
        F.sum(szzd - szd * szd / ngd).alias("den"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    zbar = F.col("sz_all") / nd
    num = F.col("sq_over_n") - nd * zbar * zbar
    w_stat = (nd - kd) / (kd - 1.0) * F.col("num") / F.col("den")
    return (
        agg.withColumn("num", num)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("k").cast("int").alias("k"),
            F.when(
                (F.col("k") <= 1) | (F.col("den") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(F.round(w_stat, 6))
            .alias("w"),
            (F.col("k") - 1).cast("int").alias("df1"),
            (F.col("n") - F.col("k")).cast("bigint").alias("df2"),
        )
    )


def welch_anova(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA (Welch 1951): the
    k-group test of equal MEANS that does not assume equal variances
    — the parametric completion of the k-group family (m39
    Kruskal-Wallis tests location by rank, :func:`brown_forsythe`
    tests the variances themselves, this one tests the means under
    the variance heterogeneity the other two detect). W follows
    F(k−1, 1/Λ) under H0 with Λ = 3·Σ[(1−w_g/Σw)²/(n_g−1)]/(k²−1)
    and precision weights w_g = n_g/s_g².

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to per-group (n, Σx, Σx²) with exact DECIMAL sums (the m44
    recipe); the k-row weight/statistic algebra is pure IEEE on those
    exact operands, every operation mirrored by the oracle.
    Degenerate inputs (any group with n ≤ 1 or zero variance, or
    k ≤ 1) return NULL for ``w`` rather than NaN/∞.

    Returns one row: (n, k, w, df1, df2).
    """
    x = F.col(value_col).cast("decimal(18,6)")
    grp = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    ng = F.col("n_g").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean = sx / ng
    # ANSI mode throws on ANY zero divisor — keep the degenerate
    # divisions (n_g = 1, zero variance) behind lazy CASE branches;
    # the NULLed groups force the final statistic to NULL via w_ok
    var = F.when(ng > 1.0, (sxx - sx * sx / ng) / (ng - 1.0))
    staged = grp.select(
        "n_g",
        mean.alias("m"),
        var.alias("v"),
        F.when(var > 0, ng / var).alias("w"),
    )
    agg = staged.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("m")).alias("swm"),
        F.min(F.col("n_g")).alias("min_n"),
        # a zero/negative sample variance makes w infinite, not NaN —
        # guard on the variance itself
        F.min(
            F.when(F.col("v") > 0, 1.0).otherwise(0.0)
        ).alias("w_ok"),
    )
    # second k-row pass for the centered terms (needs the weighted
    # grand mean); both passes run over the tiny per-group frame
    xw = F.col("swm") / F.col("sw")
    a2 = (
        staged.crossJoin(
            F.broadcast(agg.select("n", "k", "sw", xw.alias("xw")))
        )
        .agg(
            F.first("n").alias("n"),
            F.first("k").alias("k"),
            F.sum(
                F.col("w")
                * (F.col("m") - F.col("xw"))
                * (F.col("m") - F.col("xw"))
            ).alias("num"),
            F.sum(
                F.when(
                    F.col("n_g") > 1,
                    (1.0 - F.col("w") / F.col("sw"))
                    * (1.0 - F.col("w") / F.col("sw"))
                    / (F.col("n_g").cast("double") - 1.0),
                )
            ).alias("t"),
        )
    )
    kd = F.col("k").cast("double")
    lam = 3.0 * F.col("t") / (kd * kd - 1.0)
    w_stat = (F.col("num") / (kd - 1.0)) / (
        1.0 + 2.0 * lam * (kd - 2.0) / 3.0
    )
    guard = F.broadcast(
        agg.select(
            F.col("min_n").alias("min_n"), F.col("w_ok").alias("w_ok")
        )
    )
    return a2.crossJoin(guard).select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("int").alias("k"),
        F.when(
            (F.col("k") <= 1)
            | (F.col("min_n") <= 1)
            | (F.col("w_ok") < 1.0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(w_stat, 6))
        .alias("w"),
        (F.col("k") - 1).cast("int").alias("df1"),
        F.when(
            (F.col("k") <= 1)
            | (F.col("min_n") <= 1)
            | (F.col("w_ok") < 1.0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(1.0 / lam, 6))
        .alias("df2"),
    )


def bartlett(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Bartlett's test of variance homogeneity (Bartlett 1937): the
    likelihood-ratio k-group variance test that is most powerful
    under normality, complementing :func:`brown_forsythe` (which
    trades power for robustness to heavy tails). T = [(N−k)·ln s_p²
    − Σ(n_g−1)·ln s_g²] / C with the Bartlett correction
    C = 1 + (Σ 1/(n_g−1) − 1/(N−k)) / (3(k−1)); T ~ χ²(k−1) under
    H0.

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to per-group (n, Σx, Σx²) with exact DECIMAL sums; the k-row
    log/pool algebra is IEEE on those exact operands, every operation
    mirrored by the oracle. Degenerate inputs (k ≤ 1, any group with
    n ≤ 1 or zero variance) return NULL rather than NaN/∞.

    Returns one row: (n, k, t_stat, df).
    """
    x = F.col(value_col).cast("decimal(18,6)")
    grp = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    ng = F.col("n_g").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    var = F.when(ng > 1.0, (sxx - sx * sx / ng) / (ng - 1.0))
    staged = grp.select("n_g", var.alias("v"))
    agg = staged.agg(
        F.sum("n_g").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("n_g").cast("double") - 1.0) * F.col("v")).alias(
            "ssw"
        ),
        F.sum(
            F.when(
                F.col("v") > 0,
                (F.col("n_g").cast("double") - 1.0)
                * F.log(F.col("v")),
            )
        ).alias("slnv"),
        F.sum(
            F.when(
                F.col("n_g") > 1,
                1.0 / (F.col("n_g").cast("double") - 1.0),
            )
        ).alias("sinv"),
        F.min("n_g").alias("min_n"),
        F.min(F.when(F.col("v") > 0, 1.0).otherwise(0.0)).alias(
            "v_ok"
        ),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    bad = (
        (F.col("k") <= 1) | (F.col("min_n") <= 1) | (F.col("v_ok") < 1.0)
    )
    pooled = F.col("ssw") / (nd - kd)
    t_stat = ((nd - kd) * F.log(pooled) - F.col("slnv")) / (
        1.0
        + (F.col("sinv") - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("int").alias("k"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(F.round(t_stat, 6))
        .alias("t_stat"),
        (F.col("k") - 1).cast("int").alias("df"),
    )


def friedman(
    df: DataFrame,
    value_col: str,
    block_col: Column,
    treatment_col: str,
) -> DataFrame:
    """Friedman rank test for k matched treatments over b blocks
    (Friedman 1937): the nonparametric repeated-measures ANOVA —
    within every block the k treatment scores are replaced by their
    (average-tie) ranks, and the tie-robust statistic
    χ²_F = (k−1)·Σ_j (R_j − b(k+1)/2)² / (A − C) with
    A = ΣΣ R_ij² and C = b·k·(k+1)²/4 is referred to χ²(k−1).
    Only COMPLETE blocks (all k treatments present) enter.

    Scale shape: ONE map-side-combined aggregate collapses the corpus
    to the (block × treatment) cell grid — exact DECIMAL(18,6) sums
    so the ranked cell means are deterministic IEEE doubles (exact
    operands, one correctly-rounded division) — then every window
    and fold runs on that bounded grid, not the corpus. The rank,
    completeness filter and χ² algebra replay operation-for-
    operation in the oracle; A = C (all blocks internally tied)
    returns NULL.

    Returns one row: (b, k, chi2_f, df).
    """
    from pyspark.sql import Window

    x = F.col(value_col).cast("decimal(18,6)")
    cells = df.groupBy(
        block_col.alias("blk"), F.col(treatment_col).alias("trt")
    ).agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum(x).alias("sx"),
    )
    m = F.col("sx").cast("double") / F.col("n_c").cast("double")
    cells = cells.select("blk", "trt", m.alias("m"))
    k_total = cells.select(
        F.countDistinct("trt").alias("k")
    )
    w_cnt = Window.partitionBy("blk")
    complete = (
        cells.withColumn(
            "k_blk", F.count(F.lit(1)).over(w_cnt)
        )
        .crossJoin(F.broadcast(k_total))
        .where(F.col("k_blk") == F.col("k"))
    )
    w_rank = Window.partitionBy("blk").orderBy("m")
    w_tie = Window.partitionBy("blk", "m")
    ranked = complete.select(
        "blk",
        "trt",
        "k",
        (
            F.rank().over(w_rank).cast("double")
            + (F.count(F.lit(1)).over(w_tie).cast("double") - 1.0)
            / 2.0
        ).alias("r"),
    )
    per_trt = ranked.groupBy("trt").agg(
        F.first("k").alias("k"),
        F.countDistinct("blk").alias("b"),
        F.sum("r").alias("rj"),
        F.sum(F.col("r") * F.col("r")).alias("rj2"),
    )
    agg = per_trt.agg(
        F.max("b").alias("b"),
        F.max("k").alias("k"),
        F.sum("rj2").alias("a"),
        F.sum(
            (
                F.col("rj")
                - F.col("b").cast("double")
                * (F.col("k").cast("double") + 1.0)
                / 2.0
            )
            * (
                F.col("rj")
                - F.col("b").cast("double")
                * (F.col("k").cast("double") + 1.0)
                / 2.0
            )
        ).alias("ssq"),
    )
    bd = F.col("b").cast("double")
    kd = F.col("k").cast("double")
    c = bd * kd * (kd + 1.0) * (kd + 1.0) / 4.0
    chi2 = (kd - 1.0) * F.col("ssq") / (F.col("a") - c)
    return agg.select(
        F.col("b").cast("bigint").alias("b"),
        F.col("k").cast("int").alias("k"),
        F.when(F.col("a") - c > 0, F.round(chi2, 6)).alias("chi2_f"),
        (F.col("k") - 1).cast("int").alias("df"),
    )
