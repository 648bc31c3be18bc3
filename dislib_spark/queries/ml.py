"""SQL-checkable ML kernel queries.

Each runs a REAL engine code path (normal-equation OLS, scaler fit,
Lloyd assignment, exact kNN vote) whose result is replayable in ANSI
SQL — so the driver's DuckDB harness checks the estimator math
itself, not just relational plumbing. Iterative/seeded estimators
(full KMeans fit, GMM, RF, ALS) are checked against sklearn oracles
in tests/ instead (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dislib_spark.cluster.kmeans import assign_to_centers
from dislib_spark.neighbors.knn import knn_classify
from dislib_spark.preprocessing.scalers import column_stats
from dislib_spark.regression.linear import ols_fit
from dislib_spark.tables import load_table

# Fixed centers for the SQL-checkable Lloyd assignment step
# (l_quantity, l_discount space).
_M03_CENTERS = [[10.0, 0.02], [30.0, 0.05], [45.0, 0.08]]


def m01_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS on lineitem (quantity → extendedprice) via the engine's
    distributed normal equations (reference
    regression/linear/base.py:274-337)."""
    li = load_table(spark, sf_dir, "lineitem")
    coef, intercept = ols_fit(li, ["l_quantity"], "l_extendedprice")
    return spark.createDataFrame(
        [(round(float(coef[0]), 6), round(float(intercept), 6))],
        "slope double, intercept double",
    )


def m02_scaler_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler/MinMaxScaler fit statistics (reference
    preprocessing/standard_scaler.py:38-60, minmax_scaler.py:36-51)."""
    li = load_table(spark, sf_dir, "lineitem")
    return column_stats(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    ).orderBy("col_name")


def m03_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step with fixed centers (reference
    _partial_sum kmeans/base.py:385-399) — per-cluster counts and
    feature sums, the exact partial the reference tree-merges."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_discount").cast("double"),
        ).alias("feat")
    )
    assigned = assign_to_centers(li, "feat", _M03_CENTERS)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.element_at("feat", 1)), 6).alias("sum_qty"),
            F.round(F.sum(F.element_at("feat", 2)), 6).alias("sum_disc"),
        )
        .orderBy("cluster")
    )


def m04_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-NN majority vote: embeddings vec_id<20 as queries,
    the rest as labelled corpus (reference
    classification/knn/base.py:77-150)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 20)
    c = e.where(F.col("vec_id") >= 20)
    return knn_classify(q, c, k=5).orderBy("q_id")


def m05_pca_total_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA on embeddings: the eigenvalue sum must equal the total
    per-column variance (trace identity) — checks the distributed
    Gramian + eigh pipeline against a pure-SQL oracle."""
    from dislib_spark.array.core import DsArray
    from dislib_spark.decomposition import PCA

    e = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"),
        F.col("embedding").cast("array<double>").alias("features"),
    )
    n = e.count()
    pca = PCA().fit(DsArray(e, (n, 64)))
    total = float(pca.explained_variance_.sum())
    return spark.createDataFrame(
        [(round(total, 6),)], "total_variance double"
    )


def m06_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS via the engine's normal equations vs a Cramer-
    rule SQL oracle (multi-regressor REGR_* doesn't exist in SQL)."""
    li = load_table(spark, sf_dir, "lineitem")
    coef, intercept = ols_fit(
        li, ["l_quantity", "l_discount"], "l_extendedprice"
    )
    return spark.createDataFrame(
        [
            (
                round(float(coef[0]), 6),
                round(float(coef[1]), 6),
                round(float(intercept), 6),
            )
        ],
        "w_qty double, w_disc double, intercept double",
    )


# Fixed GMM parameters for the SQL-checkable E-step (diag covariance
# over (l_quantity, l_discount); distinct variances per component so
# the log-det term matters).
_M07_W = [0.3, 0.4, 0.3]
_M07_MU = [[10.0, 0.02], [25.0, 0.05], [40.0, 0.08]]
_M07_VAR = [[16.0, 0.0004], [64.0, 0.0009], [25.0, 0.0016]]


def m07_gmm_estep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One GMM E-step (hard assignment counts) with FIXED diag params
    through the engine's native Arrow E-step (gmm._log_resp /
    predict; reference cluster/gmm/base.py responsibilities) — the
    oracle replays argmax_k [ln w_k - ½·ln|Σ_k| - ½·mahalanobis²]
    in SQL."""
    import numpy as np

    from dislib_spark.array.core import DsArray
    from dislib_spark.cluster import GaussianMixture

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("row_id"),
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_discount").cast("double"),
        ).alias("features"),
    )
    n = li.count()
    gm = GaussianMixture(n_components=3, covariance_type="diag", reg_covar=0.0)
    gm.weights_ = np.array(_M07_W)
    gm.means_ = np.array(_M07_MU)
    gm.covariances_ = np.array(_M07_VAR)
    pred = gm.predict(DsArray(li, (n, 2)))
    return (
        pred.df.select(F.element_at(F.col("features"), 1).cast("int").alias("component"))
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("component")
    )


def m08_dbscan_core_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN pass 1 (grid + 3^d halo + exact eps-ball counts) through
    the engine's real applyInPandas path on 1-D p_retailprice — the
    oracle is a range self-join (squared-distance predicate mirrors
    the engine's d² ≤ eps² bit-for-bit)."""
    from dislib_spark.array.core import DsArray
    from dislib_spark.cluster.dbscan import build_halo, core_flags

    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("row_id"),
        F.array(F.col("p_retailprice").cast("double")).alias("features"),
    )
    n = p.count()
    halo = build_halo(DsArray(p, (n, 1)), eps=5.0, cache=False)
    flags = core_flags(halo, eps=5.0, min_samples=5)
    return flags.agg(
        F.sum(F.col("is_core").cast("long")).alias("n_core"),
        F.count(F.lit(1)).alias("n_points"),
    )


def m09_scaler_transform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler fit → transform through the engine estimator
    (reference preprocessing/standard_scaler.py transform), then
    z-score extremes + |z|>2 outlier counts per column — SQL-replayable
    standardization of the same three lineitem columns."""
    from dislib_spark.array.core import DsArray
    from dislib_spark.preprocessing import StandardScaler

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("row_id"),
        F.array(*[F.col(c).cast("double") for c in cols]).alias("features"),
    )
    n = li.count()
    z = StandardScaler().fit_transform(DsArray(li, (n, len(cols))))
    # one scan for all columns' z-extremes (was one unioned scan per
    # column); same aggregates over the same scan → identical values
    aggs = []
    for j, c in enumerate(cols):
        e = F.element_at(F.col("features"), j + 1)
        aggs += [
            F.round(F.min(e), 6).alias(f"_lo_{j}"),
            F.round(F.max(e), 6).alias(f"_hi_{j}"),
            F.sum((F.abs(e) > 2).cast("long")).alias(f"_n_{j}"),
        ]
    row = z.df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"_lo_{j}").alias("min_z"),
            F.col(f"_hi_{j}").alias("max_z"),
            F.col(f"_n_{j}").alias("n_outliers"),
        )
        for j, c in enumerate(cols)
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("_st"))
        .select("_st.*")
        .orderBy("col_name")
    )


def m10_logreg_grad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One logistic-regression gradient step at fixed weights
    w_j = ((j mod 7) - 3)/10 over the embeddings table (y = label<5).
    The per-row dot product stays in a JVM higher-order fold; z/p are
    projected to NAMED columns before the aggregate (Catalyst has no
    CSE inside HOF lambda bodies). Distributed-gradient kernel of any
    GLM fit — SQL-replayable via DuckDB list_inner_product."""
    e = load_table(spark, sf_dir, "embeddings")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    staged = (
        e.select("label", "embedding")
        .withColumn("z", z)
        .withColumn("p", 1.0 / (1.0 + F.exp(-F.col("z"))))
        .withColumn(
            "y", F.when(F.col("label") < 5, F.lit(1.0)).otherwise(0.0)
        )
    )
    resid = F.col("p") - F.col("y")
    grads = [
        F.round(
            F.avg(
                resid * F.element_at(F.col("embedding"), j + 1).cast("double")
            ),
            6,
        ).alias(f"g{j}")
        for j in range(4)
    ]
    return staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.avg(
                -(
                    F.col("y") * F.log(F.col("p"))
                    + (1.0 - F.col("y")) * F.log(1.0 - F.col("p"))
                )
            ),
            6,
        ).alias("loss"),
        *grads,
    )


def m11_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ROC-AUC via the rank-sum (Mann-Whitney) identity:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with average
    ranks for ties — ONE window pass + one aggregate, no pairwise
    join (the naive pos x neg comparison is O(n²)). Scorer is the
    fixed-weight logistic model of m10; labels y = (label < 5)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = e.select(
        F.when(F.col("label") < 5, F.lit(1.0)).otherwise(0.0).alias("y"),
        F.round(z, 9).alias("score"),
    )
    # scale shape: math.stats.roc_auc aggregates to per-score groups
    # FIRST (distinct-score cardinality), then one running-sum window
    # over the grouped rows for the tie-averaged rank — a global
    # row_number over raw rows would collapse the whole table into one
    # window partition. n_bins="auto" probes approx_count_distinct:
    # exact below 100k distinct scores (true at every oracle scale, so
    # hashes stay replayable), fixed-width 10k-bin bucketing above —
    # the declared plan is bounded at 100 TB without a manual swap-in
    # (branch engagement pinned in tests/test_stats_ops.py).
    from dislib_spark.math.stats import roc_auc

    return roc_auc(scored, "score", "y", n_bins="auto")


_M12_THRESHOLDS = [5.0, 10.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0, 45.0]


def m12_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed decision-stump split search — the kernel inside RF
    tree training (reference trees/ distributed split evaluation;
    MLlib does the same internally): evaluate every candidate
    threshold's weighted Gini in ONE pass of conditional aggregates
    (map-side combined — the data is read once for ALL thresholds,
    not once per threshold), then reshape the single stats row with
    ``stack``. Target y = (l_returnflag = 'R'), feature l_quantity."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("pos"),
    ]
    for i, t in enumerate(_M12_THRESHOLDS):
        c = F.col("q") <= t
        aggs.append(
            F.sum(F.when(c, 1).otherwise(0)).alias(f"nl_{i}")
        )
        aggs.append(
            F.sum(F.when(c, F.col("y")).otherwise(0)).alias(f"pl_{i}")
        )
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS DOUBLE), nl_{i}, pl_{i}"
        for i, t in enumerate(_M12_THRESHOLDS)
    )
    stacked = one.selectExpr(
        "n",
        "pos",
        f"stack({len(_M12_THRESHOLDS)}, {stack_args}) AS (thr, nl, pl)",
    )
    # weighted gini = (2·pl·(nl-pl)/nl + 2·pr·(nr-pr)/nr) / n
    gl = F.when(
        F.col("nl") > 0,
        2.0 * F.col("pl") * (F.col("nl") - F.col("pl")) / F.col("nl"),
    ).otherwise(0.0)
    nr = F.col("n") - F.col("nl")
    pr = F.col("pos") - F.col("pl")
    gr = F.when(nr > 0, 2.0 * pr * (nr - pr) / nr).otherwise(0.0)
    return stacked.select(
        "thr",
        F.col("nl").cast("long").alias("n_left"),
        nr.cast("long").alias("n_right"),
        F.round((gl + gr) / F.col("n"), 6).alias("wgini"),
    ).orderBy("thr")


def _nb_pred(d: DataFrame) -> DataFrame:
    """Shared NB prediction pipeline for m13/m32: fit MultinomialNB
    on the documents corpus, score, argmax on 6-dp-rounded joints
    with a class tiebreak (|joint| ~ 1e3 → float drift ~1e-12, five
    orders below the rounding grain, so engines can never disagree
    on a prediction). Returns (doc_id, pred, lang) — the true label
    rides along from the shared fit/score token table, so m13/m32
    need no join back onto the docs scan. The argmax is a min_by
    aggregate over the ordering struct (-rounded_joint, c): minimal
    struct = maximal rounded joint, ties broken by smallest class —
    exactly the previous row_number window's rn=1 row, but with
    map-side partial aggregation instead of a full sort+filter."""
    from dislib_spark.classification.naive_bayes import MultinomialNB

    nb = MultinomialNB(alpha=1.0).fit(d, label_col="lang", id_col="doc_id")
    sc = nb.score_documents(d)
    ord_ = F.struct(
        (-F.round(F.col("joint"), 6)).alias("_nj"),
        F.col("c").alias("_c"),
    )
    return (
        sc.groupBy("doc_id", "lang")
        .agg(F.min_by("c", ord_).alias("pred"))
        .select("doc_id", "pred", "lang")
    )


def m13_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed multinomial Naive Bayes (the fastText-shaped
    quality/language gate of LLM curation pipelines): fit on the
    documents corpus with lang labels, score every document, report
    the confusion matrix. The whole estimator — token-class counts,
    Lidstone smoothing, per-doc joint log-likelihoods, argmax — is
    replayed by the oracle (``_nb_pred`` has the tiebreak story)."""
    d = load_table(spark, sf_dir, "documents")
    pred = _nb_pred(d)
    # lang is carried through the prediction pipeline (functionally
    # dependent on the unique doc_id), so the former inner join back
    # onto the docs scan is value-identical and gone from the plan.
    return (
        pred.groupBy(F.col("lang").alias("true_lang"), "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("true_lang", "pred")
    )


def m14_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram (calibration-curve) bins for the fixed
    logistic scorer of m10: bucket predicted probability into 10
    equal bins and compare mean prediction with the actual positive
    rate — the model-evaluation kernel next to m11's AUC. One
    map-side-combined aggregation over the embedding scan."""
    e = load_table(spark, sf_dir, "embeddings")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    staged = (
        e.select("label", "embedding")
        .withColumn("z", z)
        .withColumn("p", 1.0 / (1.0 + F.exp(-F.col("z"))))
        .withColumn(
            "y", F.when(F.col("label") < 5, F.lit(1.0)).otherwise(0.0)
        )
    )
    b = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long")
    return (
        staged.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("p"), 6).alias("avg_pred"),
            F.round(F.avg("y"), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def m15_cv_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed 5-fold cross-validation of 1-feature OLS
    (l_quantity → l_extendedprice) with NO per-fold retraining scan:
    ONE pass collects per-fold sufficient statistics (n, Σx, Σy,
    Σx², Σxy); each fold's train-on-complement model is total-minus-
    fold algebra on those 5 rows; the tiny (fold, slope, intercept)
    table broadcasts back onto the fact scan for test RMSE. The
    model-selection kernel (model_selection.KFold + LinearRegression)
    expressed as mergeable partials — at 100 TB the data is read
    exactly twice (stats + scoring), not k times. Folds are md5-hash
    assigned (engine/layout/rerun-stable, the t10 convention)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    fold = (
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 5
    ).alias("fold")
    base = li.select(
        fold,
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    stats = base.groupBy("fold").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    tot = stats.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    t = stats.crossJoin(F.broadcast(tot))
    cn = F.col("tn") - F.col("n")
    csx = F.col("tsx") - F.col("sx")
    csy = F.col("tsy") - F.col("sy")
    csxx = F.col("tsxx") - F.col("sxx")
    csxy = F.col("tsxy") - F.col("sxy")
    slope = (cn * csxy - csx * csy) / (cn * csxx - csx * csx)
    params = t.select(
        "fold",
        slope.alias("b"),
        ((csy - slope * csx) / cn).alias("a"),
    )
    resid = F.col("y") - F.col("a") - F.col("b") * F.col("x")
    return (
        base.join(F.broadcast(params), "fold")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.avg("b"), 6).alias("slope"),
            F.round(F.avg("a"), 6).alias("intercept"),
            F.round(F.sqrt(F.avg(resid * resid)), 6).alias("rmse"),
        )
        .orderBy("fold")
    )


_M16_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]


def m16_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of four lineitem measures via the
    engine's one-pass sufficient-statistics kernel
    (``math.stats.correlation_matrix``): ONE scan collects n/Σx/Σx²/
    Σxᵢxⱼ, the d(d-1)/2 correlations are algebra on that single
    packed row (the feature-screening pass before any model fit —
    and the exact moment pass PCA/OLS build on)."""
    from dislib_spark.math.stats import correlation_matrix

    li = load_table(spark, sf_dir, "lineitem")
    return correlation_matrix(li, _M16_COLS).orderBy("col_a", "col_b")


_M17_COLS = ["l_discount", "l_extendedprice", "l_quantity"]


def m17_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RobustScaler fit statistics (center = exact median, scale =
    IQR) for three lineitem measures in ONE aggregate
    (``math.stats.robust_stats`` — the outlier-resistant counterpart
    of m02's mean/std pass; ``approx_percentile`` is the documented
    100 TB swap-in)."""
    from dislib_spark.math.stats import robust_stats

    li = load_table(spark, sf_dir, "lineitem")
    return robust_stats(li, _M17_COLS).orderBy("col_name")


def m18_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Welch two-sample t-test (unequal variances) between
    returned ('R') and non-returned ('N') lineitem prices: ONE
    conditional-aggregate pass collects both groups' exact decimal
    sums/sum-of-squares (order-independent — money values are
    2-decimal), the t statistic and Welch-Satterthwaite df are scalar
    algebra on that single row. The A/B-significance kernel at any
    scale: O(1) reduce state."""
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice").cast("decimal(18,2)")

    def grp(flag: str, name: str):
        m = F.col("l_returnflag") == flag
        return [
            F.sum(F.when(m, 1).otherwise(0)).alias(f"n_{name}"),
            F.sum(F.when(m, v)).cast("double").alias(f"s_{name}"),
            F.sum(F.when(m, v * v)).cast("double").alias(f"q_{name}"),
        ]

    stats = li.agg(*grp("R", "r"), *grp("N", "n"))
    nr, nn = F.col("n_r").cast("double"), F.col("n_n").cast("double")
    mr, mn = F.col("s_r") / nr, F.col("s_n") / nn
    # sample variance from exact sums: (q - n*m^2) / (n-1)
    vr = (F.col("q_r") - nr * mr * mr) / (nr - 1)
    vn = (F.col("q_n") - nn * mn * mn) / (nn - 1)
    se2r, se2n = vr / nr, vn / nn
    t = (mr - mn) / F.sqrt(se2r + se2n)
    dof = (se2r + se2n) * (se2r + se2n) / (
        se2r * se2r / (nr - 1) + se2n * se2n / (nn - 1)
    )
    return stats.select(
        F.col("n_r").cast("bigint").alias("n_r"),
        F.col("n_n").cast("bigint").alias("n_n"),
        F.round(mr, 6).alias("mean_r"),
        F.round(mn, 6).alias("mean_n"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_df"),
    )


def m19_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "many models" pattern: one OLS line per l_returnflag via
    ``training.grouped_ols`` — groupBy().applyInPandas ships each
    segment to one Arrow batch for an arbitrary python fit (numpy
    normal equations here, deterministic → the oracle replays it with
    per-group REGR_SLOPE/REGR_INTERCEPT, checking the whole grouped-
    model path end-to-end)."""
    from dislib_spark.training.grouped import grouped_ols

    li = load_table(spark, sf_dir, "lineitem")
    return grouped_ols(
        li, "l_returnflag", "l_quantity", "l_extendedprice"
    ).orderBy("l_returnflag")


def m20_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic across the three l_returnflag groups
    (prices): per-group exact decimal sums/sumsq in one grouped pass,
    then between/within sum-of-squares algebra over the 3-row group
    table — the multi-group generalization of m18's two-sample test,
    still O(|groups|) reduce state."""
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice").cast("decimal(18,2)")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("q"),
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ts"),
        F.sum("q").alias("tq"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("ts") * F.col("ts") / F.col("nn")
    ssw = F.col("tq") - F.col("sb")
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k")))
    return agg.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("nn").cast("bigint").alias("n_rows"),
        # eta^2 effect size, not raw sums of squares: the raw SS
        # cancels ~1e20-scale doubles and its last ulps differ across
        # engines; the RATIO is stable to ~1e-10
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq"),
        F.round(fstat, 6).alias("f_stat"),
    )


def m21_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence between l_returnflag and
    l_linestatus: one grouped count builds the contingency table
    (|cells| rows of reduce state at any scale), row/column marginals
    come from windows OVER that tiny table, and the statistic plus
    Cramér's V are scalar algebra on exact integer counts — the
    categorical-association screen next to m16's numeric corr
    matrix."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("o")
    )
    wr = Window.partitionBy("l_returnflag")
    wc = Window.partitionBy("l_linestatus")
    wall = Window.partitionBy()
    cells = cells.select(
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wall).alias("n"),
        F.count(F.lit(1)).over(wr).alias("r_cells"),
        F.count(F.lit(1)).over(wc).alias("c_cells"),
    )
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    agg = cells.agg(
        F.max("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cells"),
        F.max("c_cells").alias("n_flags"),
        F.max("r_cells").alias("n_statuses"),
        F.sum(term).alias("chi2"),
    )
    dof = (F.col("n_flags") - 1) * (F.col("n_statuses") - 1)
    mindim = F.least(F.col("n_flags"), F.col("n_statuses")) - 1
    return agg.select(
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        dof.cast("bigint").alias("dof"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_rows") * mindim)), 6
        ).alias("cramers_v"),
    )


def m22_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_discount.

    Average (tie-adjusted) ranks are derived from DISTINCT-VALUE
    counts — cum_count − (count−1)/2 over the ordered distinct-value
    table — so the global window runs over ~50 rows, never the fact
    table; ranks broadcast-join back to rows. Half-integer ranks are
    doubled to integers and the Pearson cross-moments accumulate as
    exact DECIMAL(38,0) sums (order-independent — a double sum of
    rank products overflows 2^53 at sf0.1), with the correlation
    ratio computed once in double at the end."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("a"), F.col("l_discount").alias("b")
    )

    def ranks(col: str) -> DataFrame:
        cnt = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        # 2 * average tie rank = 2*cum - (cnt - 1)  (always an integer)
        return cnt.select(
            col,
            (2 * F.sum("cnt").over(w) - (F.col("cnt") - 1))
            .cast("decimal(38,0)")
            .alias(f"r2_{col[-1]}"),
        )

    ranked = (
        li.join(F.broadcast(ranks("a")), "a")
        .join(F.broadcast(ranks("b")), "b")
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("r2_a").cast("double").alias("sa"),
        F.sum("r2_b").cast("double").alias("sb"),
        F.sum(F.col("r2_a") * F.col("r2_a")).cast("double").alias("qa"),
        F.sum(F.col("r2_b") * F.col("r2_b")).cast("double").alias("qb"),
        F.sum(F.col("r2_a") * F.col("r2_b")).cast("double").alias("sab"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sab") - F.col("sa") * F.col("sb")
    den = F.sqrt(
        (n * F.col("qa") - F.col("sa") * F.col("sa"))
        * (n * F.col("qb") - F.col("sb") * F.col("sb"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(num / den, 6).alias("spearman_rho"),
    )


def m23_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between returned ('R') and
    non-returned ('N') lineitem price distributions, via
    ``math.stats.ks_statistic(n_bins="auto")``: one grouped pass
    collapses rows to per-distinct-price (count_R, count_N) pairs,
    then a single ordered window walks the merged ECDFs and takes the
    max gap. The auto probe keeps the exact distinct-value plan below
    100k distinct prices (true at every oracle scale — hashes stay
    replayable) and switches to the 10k-bin bounded-window ECDF above
    it, so the declared plan is the one that survives 100 TB."""
    from dislib_spark.math.stats import ks_statistic

    li = load_table(spark, sf_dir, "lineitem")
    ks = ks_statistic(
        li, "l_extendedprice", "l_returnflag", "R", "N", n_bins="auto"
    )
    return ks.select(
        F.col("n_a").alias("n_r"),
        F.col("n_b").alias("n_n"),
        F.round("ks_stat", 6).alias("ks_stat"),
    )


def m24_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality index for the m03 fixed-center
    assignment: per-cluster mean Euclidean distance to the assigned
    center (scatter S_i) from ONE grouped pass, then R_i =
    max_{j≠i} (S_i+S_j)/M_ij over the k×k center-distance table —
    k-row driver algebra, O(k) reduce state. The internal validation
    metric the reference's KMeans users compute by hand."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_discount").cast("double").alias("y"),
    )
    d2 = [
        (F.col("x") - cx) * (F.col("x") - cx)
        + (F.col("y") - cy) * (F.col("y") - cy)
        for cx, cy in _M03_CENTERS
    ]
    best = F.least(*d2)
    cluster = (
        F.when(d2[0] == best, 0).when(d2[1] == best, 1).otherwise(2)
    )
    # collapse to ONE row of per-cluster (n, scatter) via conditional
    # aggregation — no join at all (center distances are constants)
    one = li.select(cluster.alias("cluster"), F.sqrt(best).alias("dist")).agg(
        *[
            a
            for i in range(3)
            for a in (
                F.sum(F.when(F.col("cluster") == i, 1).otherwise(0)).alias(
                    f"n_{i}"
                ),
                (
                    F.sum(F.when(F.col("cluster") == i, F.col("dist")))
                    / F.sum(F.when(F.col("cluster") == i, 1).otherwise(0))
                ).alias(f"s_{i}"),
            )
        ]
    )
    import math

    def r_i(i: int):
        return F.greatest(
            *[
                (F.col(f"s_{i}") + F.col(f"s_{j}"))
                / F.lit(math.dist(_M03_CENTERS[i], _M03_CENTERS[j]))
                for j in range(3)
                if j != i
            ]
        )

    wide = one.select(
        "*", *[r_i(i).alias(f"r_{i}") for i in range(3)]
    )
    # reshape the single wide row to k output rows with stack —
    # `one` is computed exactly once (no per-cluster re-scan)
    out = wide.select(
        F.expr(
            "stack(3,"
            " CAST(0 AS BIGINT), n_0, s_0, r_0,"
            " CAST(1 AS BIGINT), n_1, s_1, r_1,"
            " CAST(2 AS BIGINT), n_2, s_2, r_2)"
            " AS (cluster, n, scatter, db_ratio)"
        )
    ).select(
        "cluster",
        F.col("n").cast("bigint").alias("n"),
        F.round("scatter", 6).alias("scatter"),
        F.round("db_ratio", 6).alias("db_ratio"),
    )
    return out.orderBy("cluster")


# --- m25: pairwise association rules ---------------------------------
def m25_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining on TPC-H baskets
    (``functions.basket.association_rules``): support, per-direction
    confidence and lift for part pairs co-ordered ≥3 times, top-20 by
    lift — the rule-scoring step on top of x42's candidate pairs. All
    metrics are exact integer ratios (long·long stays exact, then one
    double division), so the oracle replays them bit-for-bit; top-20
    via TakeOrderedAndProject, no global window."""
    from dislib_spark.functions.basket import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    out = association_rules(li, "l_orderkey", "l_partkey", min_support=3)
    return out.orderBy(F.desc("lift"), "p1", "p2").limit(20)


# --- m26: Weight-of-Evidence / Information Value ----------------------
def m26_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE binning of quantity deciles against the "returned" label
    (``math.stats.woe_iv``) — the credit-scoring feature-selection
    report (IV = Σ iv_term). One map-side-combined count pass; class
    totals re-aggregate the bucket table through a 1-row broadcast;
    exact integer counts make the single LN per bucket replayable."""
    from dislib_spark.math.stats import woe_iv

    li = load_table(spark, sf_dir, "lineitem")
    return woe_iv(
        li,
        bucket=F.floor(F.col("l_quantity") / 10).cast("int"),
        label=F.col("l_returnflag") == "R",
    ).orderBy("bucket")


def _m10_score():
    """Shared fixed-weight linear scorer over embeddings (the m10/m11
    logistic model): z = Σ e_j · w_j with w_j = ((j%7)-3)/10, rounded
    to 9 dp so the 64-term fold is order-proof across engines."""
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.round(z, 9)


def m27_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated PR-AUC) of the fixed m10
    scorer — the ranking-quality metric retrieval and hard-negative
    mining actually optimize (ROC-AUC ignores the head of the
    ranking; AP weights it). ``math.stats.average_precision``:
    distinct-score collapse + ONE descending running-sum window, same
    scale shape as m11's rank-sum AUC; ``n_bins="auto"`` probes the
    distinct-score cardinality once and swaps in the bounded 10k-bin
    window above 100k distinct scores — the m11/m23 policy, so the
    declared plan is the one that survives 100 TB (convergence pinned
    in tests/test_stats_ops.py)."""
    from dislib_spark.math.stats import average_precision

    e = load_table(spark, sf_dir, "embeddings")
    scored = e.select(
        F.when(F.col("label") < 5, F.lit(1.0)).otherwise(0.0).alias("y"),
        _m10_score().alias("score"),
    )
    return average_precision(scored, "score", "y", n_bins="auto")


def m28_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between the fixed
    m10 classifier (z > 0 ⇔ σ(z) > 0.5) and the binary label. The
    model-eval sibling of m13's confusion matrix: one conditional-
    aggregate pass to the four cell counts (O(1) reduce state), then
    kappa = (p_o − p_e)/(1 − p_e) as scalar algebra on exact integer
    counts — every float op is a division of exact ints, replayable
    to the last ulp."""
    e = load_table(spark, sf_dir, "embeddings")
    t = e.select(
        (F.col("label") < 5).cast("long").alias("y"),
        (_m10_score() > 0).cast("long").alias("p"),
    )
    cells = t.agg(
        F.sum(F.col("y") * F.col("p")).alias("n11"),
        F.sum(F.col("y") * (1 - F.col("p"))).alias("n10"),
        F.sum((1 - F.col("y")) * F.col("p")).alias("n01"),
        F.sum((1 - F.col("y")) * (1 - F.col("p"))).alias("n00"),
    )
    n = F.col("n11") + F.col("n10") + F.col("n01") + F.col("n00")
    po = (F.col("n11") + F.col("n00")) / n
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ) / (n * n)
    return cells.select(
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e"),
        n.cast("bigint").alias("n"),
    )


def m29_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier fulfillment-time survival over orders: duration =
    days from order date to the last lineitem shipment, event =
    status 'F' (fully shipped observed), 'O'/'P' right-censored.
    ``math.stats.km_curve``: one equi-join + one grouped collapse to
    per-day (events, leavers), then suffix/prefix windows over the
    distinct-DAY table (bounded by the observation span, never the
    order count) — the churn/time-to-X estimator for event logs."""
    from dislib_spark.math.stats import km_curve

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dur = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderstatus")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.datediff(
                F.to_date("last_ship"), F.to_date("o_orderdate")
            ).alias("dur"),
            (F.col("o_orderstatus") == "F").cast("long").alias("ev"),
        )
    )
    return km_curve(dur, "dur", "ev")


def m30_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette for the m03 fixed-center
    assignment: per row a = distance to own centroid, b = distance to
    the nearest OTHER centroid, s = (b−a)/max(a,b); mean s per
    cluster. The per-point companion of m24's cluster-level
    Davies-Bouldin — ONE scan with k literal-center distances sorted
    in-expression (array_sort), no join, O(k) state. SQRT is
    IEEE-exact so the only cross-engine drift is summation order,
    absorbed by the 6-dp rounding."""
    d_exprs = [
        (F.col("q") - F.lit(cx)) * (F.col("q") - F.lit(cx))
        + (F.col("dc") - F.lit(cd)) * (F.col("dc") - F.lit(cd))
        for cx, cd in _M03_CENTERS
    ]
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_discount").cast("double").alias("dc"),
    )
    least = F.least(*d_exprs)
    cluster = (
        F.when(d_exprs[0] == least, 0)
        .when(d_exprs[1] == least, 1)
        .otherwise(2)
    )
    arr = F.array_sort(F.array(*d_exprs))
    a = F.sqrt(F.element_at(arr, 1))
    b = F.sqrt(F.element_at(arr, 2))
    s = (b - a) / F.greatest(a, b)
    return (
        li.select(cluster.alias("cluster"), s.alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("s"), 6).alias("mean_s"),
        )
        .orderBy("cluster")
    )


def m31_brier_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper scoring rules for the fixed m10 logistic scorer: Brier
    score mean((p−y)²) and log-loss — the CALIBRATION-sensitive twins
    of m11's ranking-only AUC (a model can rank perfectly and still
    be miscalibrated; these catch it). One map-side-combined pass.

    Cross-engine float story: z is 9-dp-exact (``_m10_score``),
    clamped to ±27 so the sigmoid never rounds to 0/1, and p is
    rounded to 12 dp — the only engine-dependent op (EXP, ≤1 ulp)
    sits BELOW a rounding grain six orders above it, so both engines
    agree on every p and the 6-dp means are order-proof."""
    e = load_table(spark, sf_dir, "embeddings")
    zc = F.least(F.greatest(_m10_score(), F.lit(-27.0)), F.lit(27.0))
    t = e.select(
        (F.col("label") < 5).cast("double").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-zc)), 12).alias("p"),
    )
    d = F.col("p") - F.col("y")
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg(d * d), 6).alias("brier"),
        F.round(
            -F.avg(
                F.col("y") * F.log("p")
                + (1 - F.col("y")) * F.log(F.lit(1.0) - F.col("p"))
            ),
            6,
        ).alias("logloss"),
    )


def m32_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 for the m13 Naive-Bayes
    language gate — the metric table model cards actually report,
    built from the same ``_nb_pred`` pipeline. Two tiny groupBys over
    the |docs|-row prediction join (state is O(classes)), full-outer
    merged so a never-predicted class still reports recall 0. All
    three metrics are divisions of exact integer counts. The join is
    lazily checkpointed so the whole fit+score subtree executes once
    instead of once per groupBy branch (the t78/t79 pattern — without
    it the full-outer merge re-evaluates the 200-node NB pipeline on
    both sides)."""
    d = load_table(spark, sf_dir, "documents")
    # _nb_pred carries lang already — no join back onto the docs scan
    m = _nb_pred(d).localCheckpoint(eager=False)
    by_true = m.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum((F.col("pred") == F.col("lang")).cast("long")).alias("tp"),
    )
    by_pred = m.groupBy(F.col("pred").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = by_true.join(by_pred, "cls", "full_outer").na.fill(
        0, ["n_true", "tp", "n_pred"]
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.col("tp") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return j.select(
        "cls",
        F.col("tp").cast("bigint").alias("tp"),
        F.col("n_true").cast("bigint").alias("n_true"),
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("cls")


def m33_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (``math.stats.mann_whitney_u``):
    does the quantity distribution differ between returned ('R') and
    delivered ('N') line items? The non-parametric two-sample
    location test beside m18's Welch t and m23's KS — distinct-value
    collapse first (l_quantity has ~50 distinct values, so the
    midrank window sees 50 rows at ANY corpus size), exact
    DECIMAL(38,0) rank/tie cross-moments, pure-IEEE z algebra."""
    from dislib_spark.math.stats import mann_whitney_u

    li = load_table(spark, sf_dir, "lineitem")
    return mann_whitney_u(li, "l_quantity", "l_returnflag", "R", "N")


def m34_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of o_totalprice — the
    classic fabricated-data / ETL-corruption screen. The digit is
    taken from the DECIMAL(18,2) string form (never via LOG10, whose
    1-ulp libm drift could flip a digit at exact powers of ten);
    expected shares log10(1+1/d) and the χ² terms are scalar algebra
    on exact counts, windows over the 9-row digit table."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy())
    e = F.log10(1 + 1 / F.col("digit").cast("double"))
    chi = (F.col("n") - tot * e) * (F.col("n") - tot * e) / (tot * e)
    return counts.select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / tot, 6).alias("share_obs"),
        F.round(e, 6).alias("share_exp"),
        F.round(chi, 6).alias("chi2_term"),
    ).orderBy("digit")


def m35_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 customer split
    (c_custkey parity — the t10 hash-split idea): did variant B
    convert (≥1 order placed) better than variant A? THE
    experimentation readout kernel. One distinct-buyer collapse
    joined back to the customer dim (both map-side combined), one
    conditional aggregate to a single row of exact integer counts;
    rates, lift and z are pure IEEE algebra on those ints.
    (Conversion must be a RARE per-order property: this generator
    gives every customer ~10 orders, so any common property
    saturates the rate to 1.0 and degenerates z — 'placed a
    >480k big-ticket order' sits at ~33% at every scale.)"""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    buyers = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 480000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    t = c.join(buyers, "c_custkey", "left").select(
        (F.col("c_custkey") % 2).alias("v"),
        F.coalesce(F.col("conv"), F.lit(0)).alias("conv"),
    )
    s = t.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0)).alias(
            "c_a"
        ),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0)).alias(
            "c_b"
        ),
    )
    na, ca = F.col("n_a").cast("double"), F.col("c_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("c_b").cast("double")
    ra, rb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (rb - ra) / F.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    return s.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("conv_a"),
        F.round(ra, 6).alias("rate_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("conv_b"),
        F.round(rb, 6).alias("rate_b"),
        F.round(rb - ra, 6).alias("lift"),
        F.round(z, 6).alias("z"),
    )


def m36_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / decile lift of the fixed m10 scorer — the
    campaign-targeting twin of m14's reliability bins: rank the corpus
    by score descending, split into 10 equal deciles, and report per
    decile the positive count, cumulative gain (share of ALL positives
    captured so far) and lift (decile positive rate over the base
    rate).

    Scale shape: the global rank comes from ``with_global_index``
    (range-partitioned sort + offsets — TeraSort-shaped, no global
    Window over the corpus); the decile is x19's exact NTILE integer
    arithmetic on (rank, 1-row broadcast n). The only Windows run over
    the 10-row decile table. Counts are exact ints, every ratio an
    IEEE division of exact ints — bit-replayable."""
    from pyspark.sql import Window

    from dislib_spark.utils.base import with_global_index

    e = load_table(spark, sf_dir, "embeddings")
    t = e.select(
        F.col("vec_id"),
        _m10_score().alias("score"),
        (F.col("label") < 5).cast("long").alias("y"),
    )
    ranked = with_global_index(
        t, order_by=[F.desc("score"), "vec_id"], idx_col="_r"
    )
    tot = F.broadcast(t.agg(F.count(F.lit(1)).alias("_n")))
    dec = F.expr(
        "CAST(CASE WHEN _r < (_n % 10) * (_n DIV 10 + 1) "
        "THEN _r DIV (_n DIV 10 + 1) + 1 "
        "ELSE (_n % 10) + (_r - (_n % 10) * (_n DIV 10 + 1)) "
        "DIV (_n DIV 10) + 1 END AS INT)"
    ).alias("decile")
    g = (
        ranked.crossJoin(tot)
        .select(dec, "y")
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base_rate = F.sum("pos").over(wall) / F.sum("n").over(wall)
    return g.select(
        "decile",
        "n",
        "pos",
        F.round(F.col("pos") / F.col("n"), 6).alias("pos_rate"),
        F.round(
            F.sum("pos").over(wcum) / F.sum("pos").over(wall), 6
        ).alias("cum_gain"),
        F.round((F.col("pos") / F.col("n")) / base_rate, 6).alias(
            "lift"
        ),
    ).orderBy("decile")


def m37_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the m10 score distributions
    of the two label populations (label<5 vs rest) over 10 fixed-width
    bins — the model-monitoring staple for "did the scored population
    shift?" (PSI < 0.1 stable, > 0.25 shifted). One conditional-
    aggregate pass keyed on the bin; the global (lo, hi) bounds are a
    1-row broadcast (x74's lazy shape); Laplace-smoothed shares
    ((n+0.5)/(N+5)) keep empty bins finite. Counts exact ints, shares
    IEEE divisions, one LN per bin (1-ulp, absorbed by 6-dp
    rounding)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    t = e.select(
        _m10_score().alias("z"),
        (F.col("label") < 5).cast("long").alias("is_a"),
    )
    lohi = F.broadcast(
        t.agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(10.0)
    b = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0.0))
        .otherwise(
            F.least(
                F.lit(9.0),
                F.floor((F.col("z") - F.col("lo")) / width).cast(
                    "double"
                ),
            )
        )
        .cast("int")
        .alias("bin")
    )
    g = (
        t.crossJoin(lohi)
        .groupBy(b)
        .agg(
            F.sum("is_a").alias("n_a"),
            F.sum(1 - F.col("is_a")).alias("n_b"),
        )
    )
    wall = Window.partitionBy()
    sa = (F.col("n_a") + 0.5) / (F.sum("n_a").over(wall) + 5.0)
    sb = (F.col("n_b") + 0.5) / (F.sum("n_b").over(wall) + 5.0)
    return g.select(
        "bin",
        "n_a",
        "n_b",
        F.round(sa, 6).alias("share_a"),
        F.round(sb, 6).alias("share_b"),
        F.round((sa - sb) * F.log(sa / sb), 6).alias("psi_term"),
    ).orderBy("bin")


# Poisson(1) inverse-CDF thresholds on the 32-bit md5 prefix:
# floor(CDF(k) * 2^32) for k = 0..5 (weights cap at 6; P(X>6) < 1e-4).
# The SAME integer literals are embedded in the DuckDB oracle, so the
# resample weights are pure integer compares on both engines.
_POIS1_TH = (
    1580030168,
    3160060337,
    3950075421,
    4213413783,
    4279248373,
    4292415291,
)


def m38_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass Poisson bootstrap of the mean order price — the
    scale-out bootstrap (each row independently draws a Poisson(1)
    replication count per replica, so resampling needs NO data
    duplication or global coordination; public large-scale-bootstrap
    practice). 32 replicas in one scan: explode a 32-long replica
    index, draw the weight from the md5 of (orderkey, replica) via
    integer inverse-CDF thresholds, and reduce to 32 (Σw, Σw·price)
    pairs — reduce state is O(replicas), the shuffle moves 32 rows.
    DECIMAL money sums keep every replica mean order-exact; the
    replica table IS the CI (consumer takes percentiles of 32 rows).
    """
    from dislib_spark.utils.base import fan_out

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # fan_out: the single-row-group fixture scan is one task; the
    # 32x explode + md5 draw must not inherit that parallelism.
    reps = fan_out(o).select(
        "*",
        F.posexplode(F.sequence(F.lit(0), F.lit(31))).alias(
            "_i", "replica"
        ),
    ).drop("_i")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("#", F.col("o_orderkey"), F.col("replica"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = (
        F.when(u < _POIS1_TH[0], 0)
        .when(u < _POIS1_TH[1], 1)
        .when(u < _POIS1_TH[2], 2)
        .when(u < _POIS1_TH[3], 3)
        .when(u < _POIS1_TH[4], 4)
        .when(u < _POIS1_TH[5], 5)
        .otherwise(6)
    )
    g = (
        reps.select(
            "replica",
            w.alias("w"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
        .groupBy("replica")
        .agg(
            F.sum("w").cast("bigint").alias("n_b"),
            F.sum(
                (F.col("w") * F.col("x")).cast("decimal(28,2)")
            ).alias("s"),
        )
    )
    return g.select(
        "replica",
        "n_b",
        F.round(
            F.col("s").cast("double") / F.col("n_b"), 6
        ).alias("boot_mean"),
    ).orderBy("replica")


def m39_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the three return-flag populations of
    lineitem quantity (``math.stats.kruskal_wallis``) — the k-group
    rank ANOVA completing the nonparametric family next to m33's
    two-group Mann-Whitney. Distinct-value collapse first (the m11
    kernel: the ordered window sees |distinct| rows, never the
    corpus); doubled midranks stay integers, per-group rank sums are
    DECIMAL(38,0) cross-moments, and the tie correction is exact
    integer algebra — H replays to the 6-dp grain."""
    from dislib_spark.math.stats import kruskal_wallis

    li = load_table(spark, sf_dir, "lineitem")
    return kruskal_wallis(li, "l_quantity", "l_returnflag")


def m40_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the fixed m10 logistic scorer,
    replayed EXACTLY through the minimax identity: the isotonic fit
    at bin i equals ``max_{j<=i} min_{k>=i} avg(y over bins j..k)``,
    so no sequential pooling loop is needed. m14's reliability bins
    DIAGNOSE miscalibration; this query FIXES it (the declared-query
    face of ``regression.isotonic.IsotonicCalibrator``).

    Scale shape: the corpus collapses to B=16 score bins in ONE
    map-side-combined aggregate (the 100 TB contract — PAV input is
    bounded at B rows no matter the corpus); the minimax then runs as
    tiny B×B / B³ nested-loop joins on that aggregated frame (≤ 4096
    rows — broadcast-trivial). Determinism: pooled averages are
    IEEE divisions of exact integer (Σy, n) range sums, and min/max
    over deterministic doubles is deterministic — the fit replays
    bit-for-bit, no PAV pooling-order ambiguity.

    Returns (bin, n, avg_pred, frac_pos, calibrated) — calibrated is
    monotone non-decreasing in bin by construction.
    """
    e = load_table(spark, sf_dir, "embeddings")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    staged = (
        e.select("label", "embedding")
        .withColumn("z", z)
        .withColumn("p", 1.0 / (1.0 + F.exp(-F.col("z"))))
        .withColumn(
            "y", F.when(F.col("label") < 5, F.lit(1)).otherwise(0)
        )
    )
    b = F.least(F.floor(F.col("p") * 16), F.lit(15)).cast("long")
    # g feeds FOUR consumers (prefix window twice, the bin frame, the
    # final join) — pin the 16-row result once so the corpus-sized
    # binning aggregate runs ONE scan, not one per consumer.
    g = (
        staged.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").cast("long").alias("pos"),
            F.sum("p").alias("sump"),
        )
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pr = g.select(
        "bin",
        "cnt",
        "pos",
        F.sum("pos").over(wcum).alias("cp"),
        F.sum("cnt").over(wcum).alias("cc"),
    )
    lo = pr.select(
        F.col("bin").alias("j"),
        (F.col("cp") - F.col("pos")).alias("pp"),
        (F.col("cc") - F.col("cnt")).alias("pc"),
    )
    hi = pr.select(
        F.col("bin").alias("k"), F.col("cp"), F.col("cc")
    )
    pairs = lo.join(hi, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("cp") - F.col("pp"))
            / (F.col("cc") - F.col("pc"))
        ).alias("avg_jk"),
    )
    tri = g.select("bin").join(
        pairs, (F.col("j") <= F.col("bin")) & (F.col("k") >= F.col("bin"))
    )
    fit = (
        tri.groupBy("bin", "j")
        .agg(F.min("avg_jk").alias("mn"))
        .groupBy("bin")
        .agg(F.max("mn").alias("cal"))
    )
    return (
        g.join(fit, "bin")
        .select(
            "bin",
            F.col("cnt").alias("n"),
            F.round(F.col("sump") / F.col("cnt"), 6).alias("avg_pred"),
            F.round(F.col("pos") / F.col("cnt"), 6).alias("frac_pos"),
            F.round("cal", 6).alias("calibrated"),
        )
        .orderBy("bin")
    )


def m41_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between two fixed linear classifiers on
    the SAME rows — the correct significance test for "is model A
    better than model B" when both score one test set (marginal
    accuracies alone ignore the pairing). Discordant counts b (A
    right, B wrong) and c (A wrong, B right) feed the continuity-
    corrected statistic ``(|b−c|−1)²/(b+c)``.

    Classifier A = m10's weights ((j%7)−3)/10, B = ((j%5)−2)/10; a
    prediction is ``z > 0`` (≡ p > ½ — the sigmoid never needs
    evaluating, so no libm in the hot path). ONE map-side-combined
    conditional aggregate over the embedding scan; counts are exact
    integers, χ² is IEEE algebra on them. b+c = 0 yields NULL (the
    test is undefined with no discordant pairs)."""
    e = load_table(spark, sf_dir, "embeddings")

    def scorer(mod: int, shift: int):
        w = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((j % mod) - shift) / F.lit(10.0),
        )
        return F.aggregate(
            F.zip_with(
                F.col("embedding"), w, lambda a, b: a.cast("double") * b
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    staged = e.select(
        (F.col("label") < 5).alias("y"),
        (scorer(7, 3) > 0).alias("pa"),
        (scorer(5, 2) > 0).alias("pb"),
    ).select(
        (F.col("pa") == F.col("y")).cast("long").alias("a_ok"),
        (F.col("pb") == F.col("y")).cast("long").alias("b_ok"),
    )
    s = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a_ok").alias("na"),
        F.sum("b_ok").alias("nb"),
        F.sum(
            F.col("a_ok") * (1 - F.col("b_ok"))
        ).alias("b_disc"),
        F.sum(
            (1 - F.col("a_ok")) * F.col("b_ok")
        ).alias("c_disc"),
    )
    d = (F.col("b_disc") + F.col("c_disc")).cast("double")
    num = F.abs(F.col("b_disc") - F.col("c_disc")).cast("double") - 1.0
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("b_disc").cast("bigint").alias("b_disc"),
        F.col("c_disc").cast("bigint").alias("c_disc"),
        F.when(d == 0, F.lit(None).cast("double"))
        .otherwise(F.round(num * num / d, 6))
        .alias("chi2"),
        F.round(F.col("na") / F.col("n"), 6).alias("acc_a"),
        F.round(F.col("nb") / F.col("n"), 6).alias("acc_b"),
    )


def m42_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error of the fixed m10 scorer
    over the same 10 probability bins as m14's reliability diagram —
    the one-number summaries a model card reports (m14 shows the
    curve; ECE/MCE score it). The per-bin identity ``n_b·|conf_b −
    acc_b| = |Σp − Σy|`` folds ECE into exact bin sums: ECE =
    Σ_b |Σp_b − Σy_b| / N, so the only float accumulation is the
    same Σp m14 already carries (rounding absorbs its 1-ulp order
    sensitivity). ONE map-side-combined aggregate over the embedding
    scan + a 10-row fold."""
    e = load_table(spark, sf_dir, "embeddings")
    w = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: ((j % 7) - 3) / F.lit(10.0),
    )
    z = F.aggregate(
        F.zip_with(
            F.col("embedding"), w, lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    staged = (
        e.select("label", "embedding")
        .withColumn("z", z)
        .withColumn("p", 1.0 / (1.0 + F.exp(-F.col("z"))))
        .withColumn(
            "y", F.when(F.col("label") < 5, F.lit(1)).otherwise(0)
        )
    )
    b = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("long")
    g = staged.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("p").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
    )
    gap = F.abs(F.col("sp") - F.col("sy"))
    return g.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.round(F.sum(gap) / F.sum("n_b"), 6).alias("ece"),
        F.round(
            F.max(gap / F.col("n_b").cast("double")), 6
        ).alias("mce"),
    )


def m43_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g for every pair of the three return-flag
    populations of lineitem quantity — the EFFECT-SIZE report that
    belongs next to m18's t-test and m20's ANOVA (significance says a
    difference exists; d/g say whether it's big enough to matter;
    Hedges' small-sample correction ``1 − 3/(4N−9)``).

    ONE conditional-aggregate pass collects per-group (n, Σx, Σx²)
    with per-term DECIMAL casts (order-exact sums — the m18 recipe);
    the three pair rows are pure scalar algebra on that packed row,
    with the SQL oracle mirroring the exact operation order so every
    IEEE division replays bit-for-bit before the 6-dp rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    v = F.col("l_quantity").cast("decimal(18,6)")
    aggs = []
    for gn in ("A", "N", "R"):
        cond = F.col("l_returnflag") == gn
        aggs += [
            F.sum(cond.cast("long")).alias(f"n_{gn}"),
            F.sum(F.when(cond, v)).alias(f"s_{gn}"),
            F.sum(F.when(cond, v * v)).alias(f"ss_{gn}"),
        ]
    stats = li.agg(*aggs)

    pairs = [("A", "N"), ("A", "R"), ("N", "R")]
    proj = []
    for i, (a, b) in enumerate(pairs):
        n1 = F.col(f"n_{a}").cast("double")
        n2 = F.col(f"n_{b}").cast("double")
        s1 = F.col(f"s_{a}").cast("double")
        s2 = F.col(f"s_{b}").cast("double")
        q1 = F.col(f"ss_{a}").cast("double")
        q2 = F.col(f"ss_{b}").cast("double")
        m1, m2 = s1 / n1, s2 / n2
        var1 = (q1 - s1 * s1 / n1) / (n1 - 1.0)
        var2 = (q2 - s2 * s2 / n2) / (n2 - 1.0)
        sp = F.sqrt(
            ((n1 - 1.0) * var1 + (n2 - 1.0) * var2)
            / (n1 + n2 - 2.0)
        )
        d = (m1 - m2) / sp
        g = d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0))
        proj += [
            F.lit(a).alias(f"ga_{i}"),
            F.lit(b).alias(f"gb_{i}"),
            F.col(f"n_{a}").alias(f"na_{i}"),
            F.col(f"n_{b}").alias(f"nb_{i}"),
            F.round(m1 - m2, 6).alias(f"md_{i}"),
            F.round(d, 6).alias(f"d_{i}"),
            F.round(g, 6).alias(f"g_{i}"),
        ]
    return (
        stats.select(*proj)
        .selectExpr(
            "stack(3, "
            + ", ".join(
                f"ga_{i}, gb_{i}, na_{i}, nb_{i}, md_{i}, d_{i}, g_{i}"
                for i in range(3)
            )
            + ") AS (group_a, group_b, n_a, n_b, mean_diff,"
            " cohens_d, hedges_g)"
        )
        .orderBy("group_a", "group_b")
    )


def m44_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized) heteroskedasticity test
    for the m01 regression (l_quantity → l_extendedprice): regress
    squared residuals on the regressor; LM = n·R²_aux, χ²(1) — the
    diagnostic that decides whether m01's OLS standard errors can be
    trusted. Two passes: one sufficient-statistics aggregate fits
    (a, b); the 1-row fit broadcasts back onto the scan where per-row
    e² is computed identically on both engines and cast per-term to
    DECIMAL(38,6) so the auxiliary sums are order-exact (the m18
    recipe); the LM/R² algebra then replays bit-for-bit."""
    from dislib_spark.utils.base import fan_out

    # both aggregate passes sum per-term DECIMAL casts — order-exact
    # on any partitioning — so the under-split single-row-group scan
    # fans out to cluster parallelism (no-op at scale); the identical
    # repartition subtree is exchange-reused across the two passes
    li = fan_out(load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ))
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s1 = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    fit = F.broadcast(
        s1.select(
            "n",
            "sx",
            "sxx",
            b.alias("b"),
            ((sy - b * sx) / nn).alias("a"),
        )
    )
    e = (
        F.col("l_extendedprice")
        - (F.col("a") + F.col("b") * F.col("l_quantity"))
    )
    g = (e * e).cast("decimal(38,6)")
    s2 = (
        li.crossJoin(fit)
        .agg(
            F.first("n").alias("n"),
            F.first("sx").alias("sx"),
            F.first("sxx").alias("sxx"),
            F.sum(g).alias("sg"),
            F.sum(
                (F.col("l_quantity") * (e * e)).cast("decimal(38,6)")
            ).alias("sxg"),
            F.sum(((e * e) * (e * e)).cast("decimal(38,6)")).alias(
                "sgg"
            ),
        )
    )
    sg = F.col("sg").cast("double")
    sxg = F.col("sxg").cast("double")
    sgg = F.col("sgg").cast("double")
    num = nn * sxg - sx * sg
    r2 = (num * num) / (
        (nn * sxx - sx * sx) * (nn * sgg - sg * sg)
    )
    return s2.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(r2, 6).alias("r2_aux"),
        F.round(nn * r2, 6).alias("lm_stat"),
        F.lit(1).cast("int").alias("df"),
    )


def m45_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on the m01 regression residuals —
    the second OLS diagnostic beside m44's heteroskedasticity LM
    (JB = n/6·(S² + (K−3)²/4) from residual skewness S and kurtosis
    K; OLS-with-intercept residuals have exactly zero mean, so the
    central moments ARE the raw moments). Same two-pass shape as
    m44: the 1-row fit broadcasts onto the scan; Σe², Σe³, Σe⁴ are
    per-term DECIMAL(38,6) casts (order-exact, sign-carrying), and
    the S/K/JB algebra mirrors the oracle's operation order exactly
    (m2·√m2, never POWER)."""
    from dislib_spark.utils.base import fan_out

    # decimal sums are order-exact → fan out the 1-row-group scan
    # (see m44); no-op at scale, exchange-reused across the two passes
    li = fan_out(load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ))
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s1 = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    fit = F.broadcast(
        s1.select(
            "n",
            b.alias("b"),
            ((sy - b * sx) / nn).alias("a"),
        )
    )
    e = (
        F.col("l_extendedprice")
        - (F.col("a") + F.col("b") * F.col("l_quantity"))
    )
    s2 = li.crossJoin(fit).agg(
        F.first("n").alias("n"),
        F.sum((e * e).cast("decimal(38,6)")).alias("se2"),
        F.sum(((e * e) * e).cast("decimal(38,6)")).alias("se3"),
        F.sum(((e * e) * (e * e)).cast("decimal(38,6)")).alias("se4"),
    )
    nn2 = F.col("n").cast("double")
    m2 = F.col("se2").cast("double") / nn2
    s = (F.col("se3").cast("double") / nn2) / (m2 * F.sqrt(m2))
    k = (F.col("se4").cast("double") / nn2) / (m2 * m2)
    jb = nn2 / 6.0 * (s * s + (k - 3.0) * (k - 3.0) / 4.0)
    return s2.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(s, 6).alias("skewness"),
        F.round(k, 6).alias("kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
    )


def m46_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test across the three
    return-flag populations of lineitem quantity
    (``math.stats.brown_forsythe``) — the robust Levene variant that
    completes the OLS/ANOVA diagnostics family: m44 checks
    heteroskedasticity of the regression, m45 residual normality,
    and this one the equal-variance precondition the m39 Kruskal /
    m18 Welch comparisons care about. Median-centered so the whole
    statistic is a closed-form function of the per-(group, value)
    count table — distinct-value collapse first, per-group exact
    medians from one partitioned running-sum window, DECIMAL(38,6)
    per-term deviation sums, IEEE algebra replayed by the oracle."""
    from dislib_spark.math.stats import brown_forsythe

    li = load_table(spark, sf_dir, "lineitem")
    return brown_forsythe(li, "l_quantity", "l_returnflag")


def m47_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson serial-correlation test on the m01 regression
    residuals in ship-date order — the fourth OLS diagnostic (m44
    heteroskedasticity, m45 normality, m46 variance homogeneity,
    this one autocorrelation): DW = Σ(e_t − e_{t−1})² / Σe_t² over
    residuals ordered by (l_shipdate, l_orderkey, l_linenumber).

    Scale shape: the adjacent-difference sum is DE-GLOBALIZED — no
    single-partition LAG window; ``with_global_index`` assigns the
    order rank distributedly (range sort + per-partition offsets, the
    x19 recipe) and the (t−1, t) pairs come from one integer-keyed
    equi-join of the checkpointed frame against itself. Two lineitem
    scans (1-row fit broadcast, then residuals — the m44/m45 floor,
    see PLANS.md). Σe² and Σ(Δe)² are per-term DECIMAL(38,6) sums:
    order-exact, so DW and the ρ≈1−DW/2 shortcut replay exactly."""
    from dislib_spark.utils.base import with_global_index

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s1 = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    fit = F.broadcast(
        s1.select(b.alias("b"), ((sy - b * sx) / nn).alias("a"))
    )
    e = (
        F.col("l_extendedprice")
        - (F.col("a") + F.col("b") * F.col("l_quantity"))
    )
    resid = li.crossJoin(fit).select(
        e.alias("e"), "l_shipdate", "l_orderkey", "l_linenumber"
    )
    idx = with_global_index(
        resid, order_by=["l_shipdate", "l_orderkey", "l_linenumber"]
    )
    cur = idx.select(F.col("_idx").alias("i"), F.col("e").alias("e1"))
    prv = idx.select(
        (F.col("_idx") + 1).alias("i"), F.col("e").alias("e0")
    )
    sd = cur.join(prv, "i").agg(
        F.sum(
            (
                (F.col("e1") - F.col("e0"))
                * (F.col("e1") - F.col("e0"))
            ).cast("decimal(38,6)")
        ).alias("sd")
    )
    se = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("e") * F.col("e")).cast("decimal(38,6)")).alias(
            "se"
        ),
    )
    dw = F.col("sd").cast("double") / F.col("se").cast("double")
    return se.crossJoin(F.broadcast(sd)).select(
        F.col("n").cast("bigint").alias("n"),
        F.round(dw, 6).alias("dw"),
        F.round(1.0 - dw / 2.0, 6).alias("rho"),
    )


def m48_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-inflation factors for the three lineitem regressors
    (quantity, discount, tax) — the multicollinearity check that
    decides whether m06's multi-feature OLS coefficients are
    interpretable (VIF_j = diag_j of the inverse correlation matrix;
    for 3 regressors the inverse is closed-form via cofactors, e.g.
    VIF₁ = (1−r₂₃²)/det with det = 1 + 2r₁₂r₁₃r₂₃ − r₁₂² − r₁₃² −
    r₂₃²). ONE scan: the pairwise sufficient statistics (sums,
    squares, cross products) fold in a single map-side-combined
    aggregate as exact DECIMAL sums (the m44 recipe), and every
    correlation/cofactor/det step is IEEE algebra on those exact
    operands, mirrored operation-for-operation by the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(18,6)")
    d = F.col("l_discount").cast("decimal(18,6)")
    t = F.col("l_tax").cast("decimal(18,6)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(d).alias("s2"),
        F.sum(t).alias("s3"),
        F.sum(q * q).alias("s11"),
        F.sum(d * d).alias("s22"),
        F.sum(t * t).alias("s33"),
        F.sum(q * d).alias("s12"),
        F.sum(q * t).alias("s13"),
        F.sum(d * t).alias("s23"),
    )
    nn = F.col("n").cast("double")

    def dd(c):
        return F.col(c).cast("double")

    def corr(sij, si, sj, sii, sjj):
        return (nn * dd(sij) - dd(si) * dd(sj)) / F.sqrt(
            (nn * dd(sii) - dd(si) * dd(si))
            * (nn * dd(sjj) - dd(sj) * dd(sj))
        )

    r12 = corr("s12", "s1", "s2", "s11", "s22")
    r13 = corr("s13", "s1", "s3", "s11", "s33")
    r23 = corr("s23", "s2", "s3", "s22", "s33")
    staged = s.select(
        F.col("n").cast("bigint").alias("n"),
        r12.alias("r12"),
        r13.alias("r13"),
        r23.alias("r23"),
    )
    det = (
        1.0
        + 2.0 * F.col("r12") * F.col("r13") * F.col("r23")
        - F.col("r12") * F.col("r12")
        - F.col("r13") * F.col("r13")
        - F.col("r23") * F.col("r23")
    )
    return staged.select(
        "n",
        F.round("r12", 6).alias("r12"),
        F.round("r13", 6).alias("r13"),
        F.round("r23", 6).alias("r23"),
        F.round(
            (1.0 - F.col("r23") * F.col("r23")) / det, 6
        ).alias("vif_quantity"),
        F.round(
            (1.0 - F.col("r13") * F.col("r13")) / det, 6
        ).alias("vif_discount"),
        F.round(
            (1.0 - F.col("r12") * F.col("r12")) / det, 6
        ).alias("vif_tax"),
    )


def m49_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroskedastic one-way ANOVA across the return-flag
    populations of lineitem quantity (``math.stats.welch_anova``) —
    the parametric k-group MEAN test completing the family: m39 tests
    location by rank, m46 tests the variances, this one tests the
    means without assuming the equal variances m46 checks. ONE
    map-side aggregate to per-group exact decimal (n, Σx, Σx²); the
    k-row weight algebra replays operation-for-operation, and the
    degenerate guards (n_g ≤ 1, zero variance, k ≤ 1 → NULL) are
    mirrored in the oracle."""
    from dislib_spark.math.stats import welch_anova

    li = load_table(spark, sf_dir, "lineitem")
    return welch_anova(li, "l_quantity", "l_returnflag")


def m50_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' max-studentized-deviation outlier test on order
    totalprice — the single-most-extreme-value screen that belongs
    before any mean-based statistic in the m44-m49 diagnostics
    family: G = max(x̄−x_min, x_max−x̄)/s with the flagged side
    reported. ONE scan: (n, Σx, Σx², min, max) fold in a single
    map-side-combined aggregate with exact decimal sums; G is scalar
    IEEE algebra on those exact operands, mirrored by the oracle.
    Degenerate inputs (n ≤ 1 or zero variance) return NULL."""
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,6)")
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.min(F.col("o_totalprice")).alias("xmin"),
        F.max(F.col("o_totalprice")).alias("xmax"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean = sx / nn
    var = F.when(nn > 1.0, (sxx - sx * sx / nn) / (nn - 1.0))
    sd = F.sqrt(var)
    d_hi = F.col("xmax") - mean
    d_lo = mean - F.col("xmin")
    g = F.greatest(d_hi, d_lo) / sd
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.when(var > 0, F.round(sd, 6)).alias("sd"),
        F.when(var > 0, F.round(g, 6)).alias("g_stat"),
        F.when(
            var > 0,
            F.when(d_hi >= d_lo, F.lit("max")).otherwise(F.lit("min")),
        ).alias("outlier_side"),
    )


def m51_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's likelihood-ratio variance-homogeneity test across
    the return-flag populations of lineitem quantity
    (``math.stats.bartlett``) — the normal-theory counterpart of m46
    Brown-Forsythe: most powerful when the populations are normal,
    where the robust median-based variant deliberately gives up
    power. ONE map-side aggregate to per-group exact decimal
    (n, Σx, Σx²); the k-row log/pool algebra replays
    operation-for-operation and the degenerate guards (k ≤ 1,
    n_g ≤ 1, zero variance → NULL) are mirrored in the oracle."""
    from dislib_spark.math.stats import bartlett

    li = load_table(spark, sf_dir, "lineitem")
    return bartlett(li, "l_quantity", "l_returnflag")


def m52_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test over k=3 deterministic binary screens on
    orders — the k-classifier generalization of m41 McNemar: do the
    three rules (totalprice > 250k, priority ∈ {1-URGENT, 2-HIGH},
    order placed in H1) flag the same fraction of subjects?
    Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²) ~ χ²(k−1) under H0,
    with G_j the per-rule success totals, L_i the per-subject row
    sums and T = ΣL_i. ONE map-side-combined scan folds the corpus
    to five integer totals (G₁, G₂, G₃, T arrives as their sum,
    ΣL²) — exact integer arithmetic until the final division, every
    operation mirrored by the oracle; a zero denominator (every
    subject flagged by none or all rules) returns NULL."""
    o = load_table(spark, sf_dir, "orders")
    c1 = F.when(F.col("o_totalprice") > 250000.0, 1).otherwise(0)
    c2 = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    c3 = F.when(F.month("o_orderdate") <= 6, 1).otherwise(0)
    li = c1 + c2 + c3
    s = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c1).alias("g1"),
        F.sum(c2).alias("g2"),
        F.sum(c3).alias("g3"),
        F.sum(li * li).alias("sl2"),
    )
    t = F.col("g1") + F.col("g2") + F.col("g3")
    num = 2.0 * (
        3.0
        * (
            F.col("g1") * F.col("g1")
            + F.col("g2") * F.col("g2")
            + F.col("g3") * F.col("g3")
        ).cast("double")
        - (t * t).cast("double")
    )
    den = (3 * t - F.col("sl2")).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("g1").cast("bigint").alias("g1"),
        F.col("g2").cast("bigint").alias("g2"),
        F.col("g3").cast("bigint").alias("g3"),
        F.when(den > 0, F.round(num / den, 6)).alias("q_stat"),
        F.lit(2).cast("int").alias("df"),
    )


def m53_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (``math.stats.friedman``): blocks = ISO
    weeks of the events stream, matched treatments = event types,
    score = the week×type mean event value — "does event type shift
    value consistently across weeks?", the nonparametric repeated-
    measures ANOVA completing the rank family (m33 two-group, m39
    k-group independent, this one k-group BLOCKED). ONE corpus scan
    to the week×type cell grid with exact decimal sums; ranks,
    completeness filter and the tie-robust χ² algebra all replay on
    that bounded grid in the oracle."""
    from dislib_spark.math.stats import friedman

    ev = load_table(spark, sf_dir, "events")
    return friedman(
        ev, "value", F.date_trunc("week", F.col("ts")), "event_type"
    )


def m54_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between lineitem quantity and linenumber via the
    CONTINGENCY-TABLE closed form — the rank-correlation sibling of
    m22 Spearman that naive algorithms need O(n²) row pairs for: on
    discrete variables every pair statistic collapses onto the
    |X|×|Y| cell grid (≤ 50×7 here, corpus-size-independent), so
    concordant/discordant counts are one bounded cell-pair join, not
    a corpus self-join. ONE scan builds the grid; C, D and the tie
    terms n1/n2 are exact DECIMAL(38,0) integer sums over it
    (long-proof at any corpus size); τ-b = (C−D)/√((n0−n1)(n0−n2))
    is scalar IEEE mirrored by the oracle, NULL when either tie
    factor degenerates to zero."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.groupBy(
            F.col("l_quantity").cast("int").alias("x"),
            F.col("l_linenumber").cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    dec = "decimal(38,0)"
    a = cells.select(
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.col("cnt").alias("an"),
    )
    b = cells.select(
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cnt").alias("bn"),
    )
    prod = (F.col("an") * F.col("bn")).cast(dec)
    cd = (
        a.join(F.broadcast(b), F.col("ax") < F.col("bx"))
        .agg(
            F.sum(F.when(F.col("by") > F.col("ay"), prod)).alias("c"),
            F.sum(F.when(F.col("by") < F.col("ay"), prod)).alias("d"),
        )
    )
    tx = cells.groupBy("x").agg(F.sum("cnt").alias("t"))
    ty = cells.groupBy("y").agg(F.sum("cnt").alias("t"))
    tie = lambda df_: df_.agg(  # noqa: E731
        F.sum(
            (F.col("t").cast(dec) * (F.col("t") - 1).cast(dec)) / 2
        )
        .cast(dec)
        .alias("ties"),
        F.sum("t").cast(dec).alias("n"),
    )
    n1 = tie(tx).select(
        F.col("ties").alias("n1"), F.col("n").alias("n")
    )
    n2 = tie(ty).select(F.col("ties").alias("n2"))
    s = cd.crossJoin(F.broadcast(n1)).crossJoin(F.broadcast(n2))
    nd = F.col("n").cast("double")
    n0 = nd * (nd - 1.0) / 2.0
    den = (n0 - F.col("n1").cast("double")) * (
        n0 - F.col("n2").cast("double")
    )
    tau = (
        F.col("c").cast("double") - F.col("d").cast("double")
    ) / F.sqrt(den)
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("c").cast("double").alias("concordant"),
        F.col("d").cast("double").alias("discordant"),
        F.when(den > 0, F.round(tau, 6)).alias("tau_b"),
    )


def m55_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlations for the (quantity,
    extendedprice, discount) triple — what m16's raw correlations
    CANNOT answer: how much of the price-quantity association
    survives once discount is held fixed (r_xy·z = (r_xy −
    r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), all three rotations reported).
    The confounder screen that precedes m48's VIF check in any
    regression sanity pass. ONE map-side-combined scan folds the
    exact DECIMAL pairwise sufficient statistics (the m48 recipe);
    the partial-correlation algebra is IEEE on those exact operands,
    mirrored operation-for-operation, NULL when a denominator
    degenerates."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    z = F.col("l_discount").cast("decimal(18,6)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(y).alias("s2"),
        F.sum(z).alias("s3"),
        F.sum(x * x).alias("s11"),
        F.sum(y * y).alias("s22"),
        F.sum(z * z).alias("s33"),
        F.sum(x * y).alias("s12"),
        F.sum(x * z).alias("s13"),
        F.sum(y * z).alias("s23"),
    )
    nn = F.col("n").cast("double")

    def dd(c):
        return F.col(c).cast("double")

    def corr(sij, si, sj, sii, sjj):
        return (nn * dd(sij) - dd(si) * dd(sj)) / F.sqrt(
            (nn * dd(sii) - dd(si) * dd(si))
            * (nn * dd(sjj) - dd(sj) * dd(sj))
        )

    staged = s.select(
        F.col("n").cast("bigint").alias("n"),
        corr("s12", "s1", "s2", "s11", "s22").alias("r12"),
        corr("s13", "s1", "s3", "s11", "s33").alias("r13"),
        corr("s23", "s2", "s3", "s22", "s33").alias("r23"),
    )

    def partial(rab, rac, rbc):
        den = (1.0 - F.col(rac) * F.col(rac)) * (
            1.0 - F.col(rbc) * F.col(rbc)
        )
        return F.when(
            den > 0,
            F.round(
                (F.col(rab) - F.col(rac) * F.col(rbc)) / F.sqrt(den),
                6,
            ),
        )

    return staged.select(
        "n",
        F.round("r12", 6).alias("r_qty_price"),
        partial("r12", "r13", "r23").alias("r_qty_price_given_disc"),
        partial("r13", "r12", "r23").alias("r_qty_disc_given_price"),
        partial("r23", "r12", "r13").alias("r_price_disc_given_qty"),
    )


def m56_assoc_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association-strength battery on the
    (order priority × order month) contingency grid: raw Cramér's V
    (m21's estimator) plus the three corrections a 5×12 table
    actually needs — Bergsma's bias-corrected V (raw V is inflated
    on many-celled tables even under independence), Tschuprow's T
    (comparable across non-square tables) and Pearson's C. One
    grouped count collapses the corpus to ≤60 cells; marginals come
    from windows OVER that tiny grid and every estimator is scalar
    IEEE algebra on exact integer counts, mirrored by the oracle."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("rk"),
        F.month("o_orderdate").alias("ck"),
    ).agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("rk")
    wc = Window.partitionBy("ck")
    wall = Window.partitionBy()
    m = cells.select(
        "rk",
        "ck",
        "o",
        F.sum("o").over(wr).alias("row_tot"),
        F.sum("o").over(wc).alias("col_tot"),
        F.sum("o").over(wall).alias("n"),
    )
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    term = (
        (F.col("o").cast("double") - e)
        * (F.col("o").cast("double") - e)
        / e
    )
    agg = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("rk").alias("r"),
        F.countDistinct("ck").alias("c"),
        F.sum(term).alias("chi2"),
    )
    nd = F.col("n").cast("double")
    rd = F.col("r").cast("double")
    cd = F.col("c").cast("double")
    phi2 = F.col("chi2") / nd
    phi2c = F.greatest(
        phi2 - (rd - 1.0) * (cd - 1.0) / (nd - 1.0), F.lit(0.0)
    )
    rc = rd - (rd - 1.0) * (rd - 1.0) / (nd - 1.0)
    cc = cd - (cd - 1.0) * (cd - 1.0) / (nd - 1.0)
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("r").cast("int").alias("r"),
        F.col("c").cast("int").alias("c"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(phi2 / F.least(rd - 1.0, cd - 1.0)), 6
        ).alias("cramers_v"),
        F.round(
            F.sqrt(
                phi2c / F.least(rc - 1.0, cc - 1.0)
            ),
            6,
        ).alias("cramers_v_corrected"),
        F.round(
            F.sqrt(phi2 / F.sqrt((rd - 1.0) * (cd - 1.0))), 6
        ).alias("tschuprow_t"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("chi2") + nd)), 6
        ).alias("pearson_c"),
    )


def m57_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the m01 regression residual SIGNS
    in ship-date order — the nonparametric randomness check closing
    the OLS diagnostics family (m44 heteroskedasticity, m45
    normality, m46/m51 variance homogeneity, m47 autocorrelation
    magnitude; this one asks whether the residual SIGN sequence
    itself clusters): R = 1 + #(adjacent sign changes), z = (R −
    (2n₁n₂/n + 1)) / √(2n₁n₂(2n₁n₂ − n)/(n²(n−1))). Same
    de-globalized adjacent pairing as m47 (``with_global_index`` +
    integer-keyed self-join — no single-partition LAG); sign counts
    and the change count are integer-exact, the z algebra is double
    mirrored operation-for-operation; one-sided sign sets return
    NULL."""
    from dislib_spark.utils.base import with_global_index

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s1 = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    b = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    fit = F.broadcast(
        s1.select(b.alias("b"), ((sy - b * sx) / nn).alias("a"))
    )
    e = (
        F.col("l_extendedprice")
        - (F.col("a") + F.col("b") * F.col("l_quantity"))
    )
    resid = li.crossJoin(fit).select(
        (e > 0).cast("int").alias("s"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    idx = with_global_index(
        resid, order_by=["l_shipdate", "l_orderkey", "l_linenumber"]
    )
    cur = idx.select(F.col("_idx").alias("i"), F.col("s").alias("sc"))
    prv = idx.select(
        (F.col("_idx") + 1).alias("i"), F.col("s").alias("sp")
    )
    ch = cur.join(prv, "i").agg(
        F.sum(
            F.when(F.col("sc") != F.col("sp"), 1).otherwise(0)
        ).alias("changes")
    )
    cnt = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("n_pos"),
    )
    j = cnt.crossJoin(F.broadcast(ch))
    n1 = F.col("n_pos").cast("double")
    n2 = (F.col("n") - F.col("n_pos")).cast("double")
    ntot = F.col("n").cast("double")
    runs = (F.col("changes") + 1).cast("double")
    mu = 2.0 * n1 * n2 / ntot + 1.0
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - ntot)
        / (ntot * ntot * (ntot - 1.0))
    )
    return j.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.col("n") - F.col("n_pos")).cast("bigint").alias("n_neg"),
        (F.col("changes") + 1).cast("bigint").alias("runs"),
        F.when(var > 0, F.round((runs - mu) / F.sqrt(var), 6)).alias(
            "z"
        ),
    )


def m58_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: is the realized unit price
    (l_extendedprice / l_quantity) systematically above or below the
    catalog price (p_retailprice) for the same part? The
    distribution-free paired-location test — no symmetry or
    normality assumed, just the sign of each pair's difference —
    z = (n₊ − m/2)/√(m/4) over the m non-tied pairs. One fact-dim
    equi-join on partkey (broadcastable dimension) and one
    map-side-combined conditional aggregate; every count is integer-
    exact and the z algebra is mirrored operation-for-operation."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    d = (
        F.col("l_extendedprice") / F.col("l_quantity")
        - F.col("p_retailprice")
    )
    s = (
        li.join(pt, li["l_partkey"] == pt["p_partkey"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(d > 0, 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(d < 0, 1).otherwise(0)).alias("n_neg"),
        )
    )
    m = (F.col("n_pos") + F.col("n_neg")).cast("double")
    z = (F.col("n_pos").cast("double") - m / 2.0) / F.sqrt(m / 4.0)
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.when(m > 0, F.round(F.col("n_pos").cast("double") / m, 6))
        .alias("frac_above"),
        F.when(m > 0, F.round(z, 6)).alias("z"),
    )


def m59_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on the monthly revenue
    series — the nonparametric companion to x96's decomposition and
    x71's CUSUM: S = Σ_{i<j} sign(x_j − x_i) over the collapsed
    series, tie-corrected Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18,
    continuity-corrected z. The corpus collapses to ≤ |months| exact-
    decimal rows in ONE aggregate; the pair fold runs on that bounded
    series (a ~80-row inequality join — corpus-size-independent),
    every count integer-exact and the z algebra mirrored."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
        .localCheckpoint(eager=False)
    )
    a = m.select(F.col("mon").alias("ma"), F.col("rev").alias("ra"))
    b = m.select(F.col("mon").alias("mb"), F.col("rev").alias("rb"))
    s = a.join(F.broadcast(b), F.col("ma") < F.col("mb")).agg(
        F.sum(
            F.when(F.col("rb") > F.col("ra"), 1)
            .when(F.col("rb") < F.col("ra"), -1)
            .otherwise(0)
        ).alias("s_stat")
    )
    ties = (
        m.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum("t").alias("n"),
            F.sum(
                F.col("t")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tt"),
        )
    )
    j = ties.crossJoin(F.broadcast(s))
    nd = F.col("n").cast("double")
    var_s = (
        nd * (nd - 1.0) * (2.0 * nd + 5.0)
        - F.col("tt").cast("double")
    ) / 18.0
    sd = F.col("s_stat").cast("double")
    z = (
        F.when(sd > 0, (sd - 1.0) / F.sqrt(var_s))
        .when(sd < 0, (sd + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("n").cast("bigint").alias("n_months"),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        F.when(var_s > 0, F.round(var_s, 6)).alias("var_s"),
        F.when(var_s > 0, F.round(z, 6)).alias("z"),
    )


def m60_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of the engine's OWN md5 bucketing
    against uniform — the audit backing every seedless-determinism
    claim in this repo: t10's splits, t44's weighted sampling, x98's
    experiment arms all assume ``sampling.hash_bucket`` spreads keys
    evenly, and this query measures it (16 buckets over the order
    keys, χ² = Σ(O−E)²/E vs df=15, plus the min/max bucket shares a
    skew-sensitive consumer cares about). ONE scan to 16 integer
    cells; the statistic is scalar algebra on exact counts,
    mirrored."""
    from dislib_spark.sampling import hash_bucket

    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        hash_bucket(F.col("o_orderkey"), 16).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("o_cnt"))
    agg = g.agg(
        F.sum("o_cnt").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.min("o_cnt").alias("mn"),
        F.max("o_cnt").alias("mx"),
        F.sum(
            (F.col("o_cnt") * F.col("o_cnt")).cast("decimal(38,0)")
        ).alias("so2"),
    )
    nd = F.col("n").cast("double")
    e = nd / 16.0
    # Σ(O−E)²/E = (ΣO²)/E − n when all 16 cells exist (E constant)
    chi2 = F.col("so2").cast("double") / e - nd
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("int").alias("k_buckets"),
        F.round(F.col("mn").cast("double") / nd, 6).alias(
            "min_share"
        ),
        F.round(F.col("mx").cast("double") / nd, 6).alias(
            "max_share"
        ),
        F.when(F.col("k") == 16, F.round(chi2, 6)).alias("chi2"),
        F.lit(15).cast("int").alias("df"),
    )


def m61_tost_equivalence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOST equivalence test on the x98 experiment arms: m35/x98 can
    only fail to find a difference — this asks the opposite,
    regulatory-grade question, "are the two conversion rates
    equivalent within ±1 percentage point?" via two one-sided z
    tests (z_lower = (Δ+δ)/SE, z_upper = (Δ−δ)/SE, unpooled SE;
    equivalent iff both reject at 1.645). Same md5-parity
    assignment and per-user conversion fold as x98 — one scan, one
    2-row rollup, scalar algebra mirrored operation-for-operation;
    degenerate SE returns NULL."""
    from dislib_spark.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        hash_bucket(F.col("user_id"), 2) == 0, F.lit("control")
    ).otherwise(F.lit("treatment"))
    per_user = (
        ev.select("user_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(
                    0
                )
            ).alias("converted")
        )
        .select(arm.alias("arm"), "converted")
    )
    wide = per_user.agg(
        F.sum(
            F.when(F.col("arm") == "control", 1).otherwise(0)
        ).alias("nc"),
        F.sum(
            F.when(F.col("arm") == "control", F.col("converted"))
        ).alias("xc"),
        F.sum(
            F.when(F.col("arm") == "treatment", 1).otherwise(0)
        ).alias("nt"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("converted"))
        ).alias("xt"),
    )
    nc = F.col("nc").cast("double")
    nt = F.col("nt").cast("double")
    pc = F.col("xc").cast("double") / nc
    pt = F.col("xt").cast("double") / nt
    se = F.sqrt(
        pc * (1.0 - pc) / nc + pt * (1.0 - pt) / nt
    )
    delta = 0.01
    zl = (pt - pc + delta) / se
    zu = (pt - pc - delta) / se
    return wide.select(
        F.col("nc").cast("bigint").alias("n_control"),
        F.col("nt").cast("bigint").alias("n_treatment"),
        F.round(pc, 6).alias("rate_control"),
        F.round(pt, 6).alias("rate_treatment"),
        F.when(se > 0, F.round(zl, 6)).alias("z_lower"),
        F.when(se > 0, F.round(zu, 6)).alias("z_upper"),
        F.when(
            se > 0,
            ((zl > 1.645) & (zu < -1.645)).cast("int"),
        ).alias("equivalent"),
    )


def _grid_weighted_median(grid: DataFrame, value_col: str, weight_col: str) -> DataFrame:
    """Exact weighted median of a BOUNDED value grid — the m54 trick
    extended from counting to order statistics: ``grid`` rows are
    (value, multiplicity) with multiplicity as DECIMAL(38,0) (pair
    populations outgrow BIGINT long before 100 TB), and the median of
    the expanded population is read off ONE ordered window over the
    grid (corpus-size-independent rows), never the population itself.

    Even/odd handling without decimal division: with integer weights,
    ``2·cum ≥ W + (W mod 2)`` selects the lower median and
    ``2·cum ≥ W + 2 − (W mod 2)`` the upper; their mean is the
    textbook median for both parities. Returns one row
    (w_total DECIMAL, med DOUBLE)."""
    from pyspark.sql import Window

    v, w = F.col(value_col), F.col(weight_col)
    g = grid.groupBy(v.alias("_v")).agg(F.sum(w).alias("_w"))
    cum = F.sum("_w").over(
        Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = F.sum("_w").over(Window.partitionBy())
    c = g.select("_v", cum.alias("_c"), tot.alias("_t"))
    two_c = F.col("_c") * 2
    parity = F.col("_t") % 2
    lo = F.min(
        F.when(two_c >= F.col("_t") + parity, F.col("_v"))
    ).alias("_lo")
    hi = F.min(
        F.when(two_c >= F.col("_t") + 2 - parity, F.col("_v"))
    ).alias("_hi")
    return c.agg(F.max("_t").alias("w_total"), lo, hi).select(
        "w_total",
        ((F.col("_lo") + F.col("_hi")) / 2.0).alias("med"),
    )


def m62_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust regression of quantity on discount — the
    median-of-pairwise-slopes estimator that m01's OLS family has no
    robust counterpart for (a single corrupted shipment can move an
    OLS slope arbitrarily; Theil–Sen tolerates ~29% contamination).
    Naively O(n²) row pairs; on discrete variables every pairwise
    slope collapses onto the 11×50 (discount, quantity) cell grid
    (the m54 Kendall trick lifted from counting concordances to an
    ORDER STATISTIC): slope multiplicities are exact DECIMAL products
    of cell counts, and the weighted median reads off one window over
    ≤ |grid|² slope values — corpus-size-independent. Intercept is
    the matching weighted median of (y − β·x) over the cells.
    Returns (n, n_pairs, slope, intercept)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cells = (
        li.groupBy(
            F.col("l_discount").alias("x"),
            F.col("l_quantity").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("cnt").alias("an"),
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("cnt").alias("bn"),
    )
    pairs = a.join(F.broadcast(b), F.col("ax") < F.col("bx")).select(
        ((F.col("by") - F.col("ay")) / (F.col("bx") - F.col("ax")))
        .alias("slope"),
        (F.col("an") * F.col("bn")).cast(dec).alias("w"),
    )
    med = _grid_weighted_median(pairs, "slope", "w")
    n_row = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    slope = med.select(
        F.col("w_total").cast("double").alias("n_pairs"),
        F.col("med").alias("beta"),
    )
    resid = cells.crossJoin(F.broadcast(slope)).select(
        (F.col("y") - F.col("beta") * F.col("x")).alias("r"),
        F.col("cnt").cast(dec).alias("w"),
    )
    inter = _grid_weighted_median(resid, "r", "w").select(
        F.col("med").alias("intercept")
    )
    return (
        n_row.crossJoin(F.broadcast(slope))
        .crossJoin(F.broadcast(inter))
        .select(
            "n",
            "n_pairs",
            F.round(F.col("beta"), 6).alias("slope"),
            F.round(F.col("intercept"), 6).alias("intercept"),
        )
    )


def m63_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges–Lehmann pseudomedian of lineitem quantity — the median
    of all n(n+1)/2 Walsh averages (xᵢ+xⱼ)/2, i ≤ j: the robust
    location estimate the m33/m58 rank tests invert (the
    confidence-interval midpoint a Wilcoxon signed-rank test
    implies), sitting between the mean (m02, 0% breakdown) and the
    median (m17, 50%) at ~29%. Same bounded-grid order-statistic
    machinery as m62: Walsh averages collapse onto the 50-value
    quantity grid — same-value pairs weigh cnt·(cnt+1)/2, cross-value
    pairs cntₐ·cnt_b — and one window over ≤ |grid|² averages reads
    the exact weighted median. Returns (n, n_walsh_pairs,
    hl_estimate)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cells = (
        li.groupBy(F.col("l_quantity").alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(F.col("v").alias("av"), F.col("cnt").alias("an"))
    b = cells.select(F.col("v").alias("bv"), F.col("cnt").alias("bn"))
    cross = a.join(F.broadcast(b), F.col("av") < F.col("bv")).select(
        ((F.col("av") + F.col("bv")) / 2.0).alias("walsh"),
        (F.col("an") * F.col("bn")).cast(dec).alias("w"),
    )
    same = cells.select(
        F.col("v").cast("double").alias("walsh"),
        (F.col("cnt").cast(dec) * (F.col("cnt") + 1).cast(dec) / 2)
        .cast(dec)
        .alias("w"),
    )
    med = _grid_weighted_median(cross.unionByName(same), "walsh", "w")
    n_row = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    return n_row.crossJoin(F.broadcast(med)).select(
        "n",
        F.col("w_total").cast("double").alias("n_walsh_pairs"),
        F.round(F.col("med"), 6).alias("hl_estimate"),
    )


def m64_siegel_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Siegel repeated-median regression of quantity on discount —
    the 50%-breakdown upgrade of m62's Theil–Sen (~29%): slope =
    median over points i of (median over j≠i of pairwise slopes), so
    even a majority-contaminated pair set can't move it. Both median
    layers collapse onto the 11×50 cell grid: the inner medians are
    PER-CELL weighted medians over ≤|grid| slope rows (window
    partitioned by the anchor cell — bounded AND keyed, never
    global), the outer one reuses m62's ``_grid_weighted_median``
    over the ≤|grid| per-cell medians weighted by cell counts.
    Intercept = the matching outer median of (y − β·x). Returns
    (n, slope, intercept)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    cells = (
        li.groupBy(
            F.col("l_discount").alias("x"),
            F.col("l_quantity").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("cnt").alias("an"),
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("cnt").alias("bn"),
    )
    slopes = (
        a.join(F.broadcast(b), F.col("ax") != F.col("bx"))
        .groupBy(
            "ax",
            "ay",
            "an",
            ((F.col("by") - F.col("ay")) / (F.col("bx") - F.col("ax")))
            .alias("s"),
        )
        .agg(F.sum(F.col("bn").cast(dec)).alias("w"))
    )
    key = ["ax", "ay"]
    wcum = Window.partitionBy(*key).orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*key)
    c = slopes.select(
        "ax", "ay", "an", "s",
        F.sum("w").over(wcum).alias("c"),
        F.sum("w").over(wall).alias("t"),
    )
    two_c, parity = F.col("c") * 2, F.col("t") % 2
    inner = c.groupBy("ax", "ay", "an").agg(
        (
            (
                F.min(F.when(two_c >= F.col("t") + parity, F.col("s")))
                + F.min(
                    F.when(two_c >= F.col("t") + 2 - parity, F.col("s"))
                )
            )
            / 2.0
        ).alias("med_i")
    )
    outer = _grid_weighted_median(
        inner.select("med_i", F.col("an").cast(dec).alias("w")),
        "med_i",
        "w",
    )
    beta = outer.select(F.col("med").alias("beta"))
    resid = cells.crossJoin(F.broadcast(beta)).select(
        (F.col("y") - F.col("beta") * F.col("x")).alias("r"),
        F.col("cnt").cast(dec).alias("w"),
    )
    inter = _grid_weighted_median(resid, "r", "w").select(
        F.col("med").alias("intercept")
    )
    n_row = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        n_row.crossJoin(F.broadcast(beta))
        .crossJoin(F.broadcast(inter))
        .select(
            "n",
            # + 0.0 folds IEEE -0.0 to 0.0 (engines disagree on the
            # rounded zero's sign when the raw median is a tiny
            # negative; the oracle applies the same normalization)
            (F.round(F.col("beta"), 6) + 0.0).alias("slope"),
            (F.round(F.col("intercept"), 6) + 0.0).alias("intercept"),
        )
    )


def m65_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α internal-consistency reliability over the
    (quantity, discount, tax) item triple — the feature-QA question
    m16's pairwise correlations stop short of: do these k columns
    measure ONE construct (α = k/(k−1)·(1 − Σvarᵢ/var(Σitems)))?
    Read before averaging features into a composite score. ONE
    map-side-combined scan folds the exact DECIMAL sufficient
    statistics (the m55 recipe: sums, squares, cross-products); every
    variance/covariance is population-form scalar algebra on those
    exact operands, mirrored operation-for-operation. Also reports
    the average inter-item correlation (the standardized-α
    ingredient). Returns (n, k, alpha, avg_inter_item_corr)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    xs = [F.col(c).cast("decimal(18,6)") for c in cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, x in enumerate(xs):
        aggs.append(F.sum(x).alias(f"s{i}"))
        aggs.append(F.sum(x * x).alias(f"q{i}"))
    for i in range(3):
        for j in range(i + 1, 3):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"p{i}{j}"))
    s = li.agg(*aggs)
    nn = F.col("n").cast("double")

    def dd(c):
        return F.col(c).cast("double")

    def var(i):
        return dd(f"q{i}") / nn - (dd(f"s{i}") / nn) ** 2

    def cov(i, j):
        return dd(f"p{i}{j}") / nn - (dd(f"s{i}") / nn) * (
            dd(f"s{j}") / nn
        )

    sum_var = var(0) + var(1) + var(2)
    sum_cov = cov(0, 1) + cov(0, 2) + cov(1, 2)
    var_total = sum_var + 2.0 * sum_cov
    k = 3.0
    alpha = (k / (k - 1.0)) * (1.0 - sum_var / var_total)
    rbar = (
        cov(0, 1) / F.sqrt(var(0) * var(1))
        + cov(0, 2) / F.sqrt(var(0) * var(2))
        + cov(1, 2) / F.sqrt(var(1) * var(2))
    ) / 3.0
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(3).cast("int").alias("k"),
        F.when(var_total > 0, F.round(alpha, 6)).alias("alpha"),
        F.round(rbar, 6).alias("avg_inter_item_corr"),
    )


def m66_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 most influential lineitems by Cook's distance under
    m01's price-on-quantity OLS — the per-ROW influence diagnostic
    that closes the m44–m49 regression-audit family (those test the
    residuals in aggregate; this names the observations that, if
    dropped, move the fit most: Dᵢ = eᵢ²hᵢ / (p·s²·(1−hᵢ)²) with the
    closed-form simple-regression leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx).
    The m44 two-scan shape: one exact-DECIMAL sufficient-stats scan
    folds fit + s² + Sxx into a 1-row broadcast, one residual scan
    scores every row; top-15 by (D desc, key) is a rank-k orderBy —
    never a full sort at the driver. Returns (l_orderkey,
    l_linenumber, x, y, leverage, cooks_d)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    nn = F.col("n").cast("double")

    def dd(c):
        return F.col(c).cast("double")

    sxx_c = dd("sxx") - dd("sx") * dd("sx") / nn
    sxy_c = dd("sxy") - dd("sx") * dd("sy") / nn
    syy_c = dd("syy") - dd("sy") * dd("sy") / nn
    slope = sxy_c / sxx_c
    fit = s.select(
        F.col("n").cast("double").alias("fn"),
        (dd("sx") / nn).alias("xbar"),
        slope.alias("b"),
        (dd("sy") / nn - slope * (dd("sx") / nn)).alias("a"),
        sxx_c.alias("sxx_c"),
        # s² = SSE/(n−2) with SSE = Syy_c − b·Sxy_c (all centered
        # moments from the same exact-decimal operands)
        ((syy_c - slope * sxy_c) / (nn - 2.0)).alias("s2"),
    )
    xd = F.col("l_quantity").cast("double")
    yd = F.col("l_extendedprice").cast("double")
    e = yd - (F.col("a") + F.col("b") * xd)
    h = 1.0 / F.col("fn") + (xd - F.col("xbar")) ** 2 / F.col("sxx_c")
    d = (e * e * h) / (
        2.0 * F.col("s2") * (1.0 - h) * (1.0 - h)
    )
    return (
        li.crossJoin(F.broadcast(fit))
        .select(
            "l_orderkey",
            "l_linenumber",
            xd.alias("x"),
            yd.alias("y"),
            h.alias("_h"),
            d.alias("_d"),
        )
        .orderBy(
            F.col("_d").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(15)
        .select(
            "l_orderkey",
            "l_linenumber",
            "x",
            "y",
            F.round(F.col("_h"), 6).alias("leverage"),
            F.round(F.col("_d"), 6).alias("cooks_d"),
        )
    )


def m67_mahalanobis_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-15 multivariate outliers by Mahalanobis D² over the
    (quantity, extendedprice, discount) triple — what m50's
    univariate Grubbs screen cannot see: a row whose coordinates are
    individually unremarkable but jointly inconsistent with the
    covariance structure. The 3×3 population covariance comes from
    the same ONE exact-DECIMAL sufficient-stats scan as m55; its
    inverse is the closed-form adjugate/determinant (nine scalar
    expressions — no linear-algebra library, fully SQL-replayable),
    broadcast onto a second scoring scan; top-15 by (D² desc, key)
    is a rank-k orderBy. Returns (l_orderkey, l_linenumber, x1, x2,
    x3, d2)."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    xs = [F.col(c).cast("decimal(18,6)") for c in cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, x in enumerate(xs):
        aggs.append(F.sum(x).alias(f"s{i}"))
    for i in range(3):
        for j in range(i, 3):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"p{i}{j}"))
    s = li.agg(*aggs)
    nn = F.col("n").cast("double")

    def dd(c):
        return F.col(c).cast("double")

    # memoized Column objects: every cv()/mu() call used to rebuild
    # its whole subtree through fresh py4j round-trips — ~1.7 s of
    # pure DRIVER-side construction for the det/inverse expansion
    # below (measured warm, sf0.1). Sharing the Column objects sends
    # each subtree through py4j once; the resulting expression tree
    # is structurally identical, so plan and values are unchanged.
    _mu = [dd(f"s{i}") / nn for i in range(3)]
    _cv = {
        (i, j): dd(f"p{i}{j}") / nn - _mu[i] * _mu[j]
        for i in range(3)
        for j in range(i, 3)
    }

    def mu(i):
        return _mu[i]

    def cv(i, j):
        a, b = min(i, j), max(i, j)
        return _cv[(a, b)]

    # adjugate / determinant of the symmetric 3x3 covariance
    det = (
        cv(0, 0) * (cv(1, 1) * cv(2, 2) - cv(1, 2) * cv(1, 2))
        - cv(0, 1) * (cv(0, 1) * cv(2, 2) - cv(1, 2) * cv(0, 2))
        + cv(0, 2) * (cv(0, 1) * cv(1, 2) - cv(1, 1) * cv(0, 2))
    )
    inv = {
        (0, 0): (cv(1, 1) * cv(2, 2) - cv(1, 2) * cv(1, 2)) / det,
        (0, 1): (cv(0, 2) * cv(1, 2) - cv(0, 1) * cv(2, 2)) / det,
        (0, 2): (cv(0, 1) * cv(1, 2) - cv(0, 2) * cv(1, 1)) / det,
        (1, 1): (cv(0, 0) * cv(2, 2) - cv(0, 2) * cv(0, 2)) / det,
        (1, 2): (cv(0, 2) * cv(0, 1) - cv(0, 0) * cv(1, 2)) / det,
        (2, 2): (cv(0, 0) * cv(1, 1) - cv(0, 1) * cv(0, 1)) / det,
    }
    fit_cols = [F.col("n")]
    for i in range(3):
        fit_cols.append(mu(i).alias(f"m{i}"))
    for (i, j), e in inv.items():
        fit_cols.append(e.alias(f"i{i}{j}"))
    fit = s.select(*fit_cols)
    d = [F.col(c).cast("double") - F.col(f"m{i}") for i, c in enumerate(cols)]
    d2 = (
        d[0] * d[0] * F.col("i00")
        + d[1] * d[1] * F.col("i11")
        + d[2] * d[2] * F.col("i22")
        + 2.0 * d[0] * d[1] * F.col("i01")
        + 2.0 * d[0] * d[2] * F.col("i02")
        + 2.0 * d[1] * d[2] * F.col("i12")
    )
    return (
        li.crossJoin(F.broadcast(fit))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col(cols[0]).cast("double").alias("x1"),
            F.col(cols[1]).cast("double").alias("x2"),
            F.col(cols[2]).cast("double").alias("x3"),
            d2.alias("_d2"),
        )
        .orderBy(F.col("_d2").desc(), "l_orderkey", "l_linenumber")
        .limit(15)
        .select(
            "l_orderkey",
            "l_linenumber",
            "x1",
            "x2",
            "x3",
            F.round(F.col("_d2"), 6).alias("d2"),
        )
    )


def m68_pinball_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile (pinball-loss) regression of quantity on discount at
    τ ∈ {0.25, 0.5, 0.75} — the loss-based member that completes the
    m62/m63/m64 robust family (τ=0.5 is LAD; the outer rows are the
    conditional-quantile bands OLS cannot give). Exact, not iterative:
    the profiled objective f(b) = min_a Σ w·ρ_τ(y − b·x − a) is
    convex piecewise-linear with breakpoints at pairwise data slopes,
    so the minimizer is one of the ≤ |Δy|·|Δx| ≈ 990 DISTINCT slope
    values of the 11×50 (discount, quantity) cell grid — m62's
    bounded-grid trick applied to candidate enumeration instead of
    multiplicity counting. Everything is INTEGER arithmetic (x scaled
    ×100, slopes and residuals ×2520 = lcm(1..10), loss ×4), so the
    per-candidate objective and the final argmin are bit-identical in
    any engine — no float-tie hazard in the winner selection.
    Corpus-size-independent after the one groupBy scan: candidates ×
    grid ≈ 0.5M tiny rows. Returns one row per τ: (tau, n, slope,
    intercept, avg_pinball)."""
    li = load_table(spark, sf_dir, "lineitem")
    scale = 2520  # lcm of the possible x-gaps 1..10 (x = discount·100)
    cells = (
        li.groupBy(
            F.round(F.col("l_discount") * 100).cast("int").alias("x"),
            F.col("l_quantity").cast("int").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    xv = cells.select("x").distinct()
    yv = cells.select("y").distinct()
    dx = (
        xv.alias("a")
        .join(xv.alias("b"), F.col("a.x") < F.col("b.x"))
        .select((F.col("b.x") - F.col("a.x")).alias("dx"))
        .distinct()
    )
    dy = (
        yv.alias("a")
        .join(yv.alias("b"), F.lit(True))
        .select((F.col("b.y") - F.col("a.y")).alias("dy"))
        .distinct()
    )
    # integer candidate slopes S = scale·Δy/Δx (Δx divides scale)
    cand = (
        dy.crossJoin(F.broadcast(dx))
        .selectExpr(f"CAST(dy AS BIGINT) * {scale} DIV dx AS s")
        .distinct()
    )
    # exact integer residual per (candidate, cell), collapsed by value
    # so the cumulative-weight quantile has unique order keys
    r = (
        cand.crossJoin(F.broadcast(cells))
        .select(
            "s",
            (F.col("y").cast("long") * scale
             - F.col("s") * F.col("x")).alias("resid"),
            "cnt",
        )
        .groupBy("s", "resid")
        .agg(F.sum("cnt").alias("w"))
    )
    wtot = cells.agg(F.sum("cnt").alias("w_all"))
    wr = Window.partitionBy("s").orderBy("resid")
    cum = r.select(
        "s", "resid", "w", F.sum("w").over(wr).alias("cumw")
    ).crossJoin(F.broadcast(wtot))
    taus = spark.range(1, 4).select(F.col("id").cast("int").alias("q4"))
    # optimal intercept per (s, τ): lower weighted τ-quantile of the
    # residuals — min resid with cumw ≥ ceil(q4·W/4), all integers
    thresh = F.expr("(q4 * w_all + 3) DIV 4")
    a_star = (
        cum.crossJoin(F.broadcast(taus))
        .where(F.col("cumw") >= thresh)
        .groupBy("s", "q4")
        .agg(F.min("resid").alias("a4"))
    )
    # 4×pinball objective per (s, τ): exact integer sum
    pin4 = F.when(
        F.col("resid") > F.col("a4"),
        F.col("q4") * (F.col("resid") - F.col("a4")),
    ).otherwise((4 - F.col("q4")) * (F.col("a4") - F.col("resid")))
    obj = (
        r.join(a_star, "s")
        .groupBy("s", "q4", "a4")
        .agg(F.sum(F.col("w") * pin4).alias("obj4"))
    )
    wbest = Window.partitionBy("q4").orderBy("obj4", "s")
    best = (
        obj.withColumn("_rn", F.row_number().over(wbest))
        .where(F.col("_rn") == 1)
        .crossJoin(F.broadcast(wtot))
    )
    return best.select(
        (F.col("q4") / 4.0).alias("tau"),
        F.col("w_all").cast("bigint").alias("n"),
        F.round(F.col("s") * 100.0 / scale, 6).alias("slope"),
        F.round(F.col("a4") / float(scale), 6).alias("intercept"),
        F.round(
            F.col("obj4") / (4.0 * scale * F.col("w_all")), 6
        ).alias("avg_pinball"),
    ).orderBy("tau")


def m69_passing_bablok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passing–Bablok method-comparison regression — the robust fit
    for 'do two measurements of the same quantity agree?' that m62's
    Theil–Sen is not (PB is symmetric in x/y and tests proportional
    plus constant bias): method A = the order header's total, method
    B = the sum of its line items, both binned to exact-integer
    $20k buckets (cent-level BIGINT sums, so the binning is immune to
    float summation order). Slopes collapse onto the bounded
    (x, y) cell grid (m62's trick); the PB estimator is the
    K-SHIFTED median of pairwise slopes — K = the weight of slopes
    < −1, slopes = −1 excluded — with the arithmetic lower/upper
    mid-mean convention (the 1983 paper's geometric mean is undefined
    for sign-mixed middle slopes; arithmetic replays exactly in both
    engines). Intercept = weighted median of y − b·x. A slope near 1
    and intercept near 0 is the 'methods agree' verdict. Returns
    (n, n_pairs, k_shift, slope, intercept)."""
    dec = "decimal(38,0)"
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    width = 2_000_000  # $20k in cents
    osums = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("_cents")
    )
    pts = (
        orders.join(osums, orders["o_orderkey"] == osums["l_orderkey"])
        .selectExpr(
            f"CAST(ROUND(o_totalprice * 100) AS BIGINT) DIV {width} AS x",
            f"_cents DIV {width} AS y",
        )
    )
    cells = (
        pts.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("cnt").alias("an"),
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("cnt").alias("bn"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ax") < F.col("bx"))
        .select(
            # try_divide: Catalyst may push the s != -1 filter into the
            # join condition and evaluate it on ax == bx candidate rows
            # before the ax < bx conjunct prunes them — a plain ANSI
            # division would throw there; NULL s rows are impossible on
            # real matches (bx > ax) and drop at the filter anyway
            F.try_divide(
                F.col("by") - F.col("ay"),
                (F.col("bx") - F.col("ax")).cast("double"),
            ).alias("s"),
            (F.col("an") * F.col("bn")).cast(dec).alias("w"),
        )
        .where(F.col("s") != -1.0)
    )
    tot = pairs.agg(
        F.sum("w").alias("npair"),
        F.sum(F.when(F.col("s") < -1.0, F.col("w")).otherwise(0)).alias(
            "kshift"
        ),
    )
    sv = pairs.groupBy("s").agg(F.sum("w").alias("w"))
    from pyspark.sql import Window as W

    cum = sv.select(
        "s",
        F.sum("w")
        .over(W.orderBy("s").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
    ).crossJoin(F.broadcast(tot))
    half = (F.col("npair") - F.col("npair") % 2) / 2
    lo_idx = half + F.col("kshift") + F.col("npair") % 2
    hi_idx = half + F.col("kshift") + 1
    picked = cum.agg(
        F.min(F.when(F.col("cum") >= lo_idx, F.col("s"))).alias("_lo"),
        F.min(F.when(F.col("cum") >= hi_idx, F.col("s"))).alias("_hi"),
    ).select(((F.col("_lo") + F.col("_hi")) / 2.0).alias("beta"))
    resid = cells.crossJoin(F.broadcast(picked)).select(
        (F.col("y") - F.col("beta") * F.col("x")).alias("r"),
        F.col("cnt").cast(dec).alias("w"),
    )
    inter = _grid_weighted_median(resid, "r", "w").select(
        F.col("med").alias("intercept")
    )
    n_row = cells.agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        n_row.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(picked))
        .crossJoin(F.broadcast(inter))
        .select(
            "n",
            F.col("npair").cast("double").alias("n_pairs"),
            F.col("kshift").cast("double").alias("k_shift"),
            F.round(F.col("beta"), 6).alias("slope"),
            F.round(F.col("intercept"), 6).alias("intercept"),
        )
    )


def m70_generalized_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner) multi-outlier screen on order
    totalprice — the r-outlier extension of m50's single-point Grubbs
    test: iteration i removes the point with the largest studentized
    deviation R_i = max|x−x̄|/s from the CURRENT sample and
    recomputes (x̄, s) exactly from the updated sufficient statistics
    (n, Σx, Σx² as exact decimals — subtract the removed value, never
    rescan). The removed extreme is always the current max or min, so
    at r = 3 iterations the candidate pool is the global top-3 ∪
    bottom-3 (two 3-row sort-limits — TakeOrderedAndProject, never a
    full sort); everything after the ONE stats scan is 1-row algebra.
    Ordering ties break (dev DESC, value DESC, side, rank) —
    deterministic. Returns one row per iteration with R_i, the
    removed value and its side."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    xdec = F.col("o_totalprice").cast("decimal(18,6)")
    s0 = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xdec).alias("sx"),
        F.sum(xdec * xdec).alias("sxx"),
    )
    base = o.select(
        xdec.alias("x"), F.col("o_totalprice").cast("double").alias("xd")
    )
    w_hi = Window.orderBy(F.desc("xd"))
    w_lo = Window.orderBy(F.asc("xd"))
    hi = (
        base.orderBy(F.desc("xd"))
        .limit(3)
        .select(
            "x", "xd", F.lit("hi").alias("side"),
            F.row_number().over(w_hi).alias("rn"),
        )
    )
    lo = (
        base.orderBy(F.asc("xd"))
        .limit(3)
        .select(
            "x", "xd", F.lit("lo").alias("side"),
            F.row_number().over(w_lo).alias("rn"),
        )
    )
    ext = hi.unionByName(lo).localCheckpoint(eager=False)

    nn = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    mean = sxd / nn
    var = (sxxd - sxd * sxd / nn) / (nn - 1.0)
    sd = F.sqrt(var)
    dev = F.abs(F.col("xd") - mean) / sd

    state = s0
    excluded = None
    out = []
    for i in (1, 2, 3):
        cand = (
            ext
            if excluded is None
            else ext.join(excluded, ["side", "rn"], "left_anti")
        )
        pick = (
            cand.crossJoin(F.broadcast(state))
            .select(
                "x", "xd", "side", "rn", "n", "sx", "sxx",
                mean.alias("mean"), sd.alias("sd"), dev.alias("dev"),
            )
            .orderBy(F.desc("dev"), F.desc("xd"), "side", "rn")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        out.append(
            pick.select(
                F.lit(i).alias("iter"),
                F.col("n").cast("bigint").alias("n_used"),
                F.round("mean", 6).alias("mean"),
                F.round("sd", 6).alias("sd"),
                F.round("dev", 6).alias("r_stat"),
                F.round("xd", 6).alias("removed_value"),
                "side",
            )
        )
        state = pick.select(
            (F.col("n") - 1).alias("n"),
            (F.col("sx") - F.col("x")).alias("sx"),
            (F.col("sxx") - F.col("x") * F.col("x")).alias("sxx"),
        )
        sel = pick.select("side", "rn")
        excluded = sel if excluded is None else excluded.unionByName(sel)
    return out[0].unionByName(out[1]).unionByName(out[2]).orderBy("iter")


def m72_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed robust moments on order totalprice —
    what the m50/m70 screens lead to when outliers are found: clamp
    (winsorize) at the 3rd order statistic from each end and report
    the robust mean/sd next to the raw mean, plus the 2-each-end
    TRIMMED mean computed exactly from the raw sum minus the four
    extreme order statistics. TWO scans (the classic robust-stats
    shape): two 3-row sort-limits fix the bounds, then one clamped
    fold with exact decimal sums; on 3 rows the middle order
    statistic is total − min − max, so no window is ever needed.
    All algebra on exact-decimal operands, mirrored by the oracle."""
    o = load_table(spark, sf_dir, "orders")
    xdec = F.col("o_totalprice").cast("decimal(18,6)")
    lo3 = (
        o.select(xdec.alias("x"))
        .orderBy(F.asc("x"))
        .limit(3)
        .agg(
            F.min("x").alias("x1"),
            (F.sum("x") - F.min("x") - F.max("x")).alias("x2"),
            F.max("x").alias("lo_b"),
        )
    )
    hi3 = (
        o.select(xdec.alias("x"))
        .orderBy(F.desc("x"))
        .limit(3)
        .agg(
            F.max("x").alias("xn"),
            (F.sum("x") - F.min("x") - F.max("x")).alias("xn1"),
            F.min("x").alias("hi_b"),
        )
    )
    bounds = F.broadcast(lo3.crossJoin(hi3))
    clamped = F.least(F.greatest(xdec, F.col("lo_b")), F.col("hi_b"))
    s = o.crossJoin(bounds).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xdec).alias("sx"),
        F.sum(clamped).alias("sw"),
        F.sum(clamped * clamped).alias("sww"),
        F.first("x1").alias("x1"),
        F.first("x2").alias("x2"),
        F.first("xn1").alias("xn1"),
        F.first("xn").alias("xn"),
        F.first("lo_b").alias("lo_b"),
        F.first("hi_b").alias("hi_b"),
    )
    nn = F.col("n").cast("double")
    swd = F.col("sw").cast("double")
    swwd = F.col("sww").cast("double")
    wmean = swd / nn
    wvar = (swwd - swd * swd / nn) / (nn - 1.0)
    trim_sum = (
        F.col("sx") - F.col("x1") - F.col("x2") - F.col("xn1")
        - F.col("xn")
    ).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("lo_b").cast("double"), 6).alias("lo_bound"),
        F.round(F.col("hi_b").cast("double"), 6).alias("hi_bound"),
        F.round(F.col("sx").cast("double") / nn, 6).alias("raw_mean"),
        F.round(wmean, 6).alias("winsor_mean"),
        F.round(F.sqrt(wvar), 6).alias("winsor_sd"),
        F.round(trim_sum / (nn - 4.0), 6).alias("trimmed_mean"),
    )


def m71_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dixon's Q gap-ratio outlier screen on order totalprice — the
    order-statistic complement of m50/m70's moment-based tests:
    Q_max = (x₍ₙ₎ − x₍ₙ₋₁₎)/(x₍ₙ₎ − x₍₁₎) and Q_min = (x₍₂₎ −
    x₍₁₎)/range ask whether either extreme is ISOLATED from its
    neighbor relative to the spread (a huge Grubbs G with a tiny Q
    means a heavy tail, not a rogue point). Two 2-row sort-limits
    (TakeOrderedAndProject — no full sort, no moments) + 1-row
    algebra; pure subtract/divide on parquet doubles, bit-replayable.
    Degenerate zero range returns NULL ratios."""
    o = load_table(spark, sf_dir, "orders")
    xd = F.col("o_totalprice").cast("double")
    n = F.broadcast(o.agg(F.count(F.lit(1)).alias("n")))
    hi = (
        o.select(xd.alias("x"))
        .orderBy(F.desc("x"))
        .limit(2)
        .agg(F.max("x").alias("x_max"), F.min("x").alias("x2_max"))
    )
    lo = (
        o.select(xd.alias("x"))
        .orderBy(F.asc("x"))
        .limit(2)
        .agg(F.min("x").alias("x_min"), F.max("x").alias("x2_min"))
    )
    rng = F.col("x_max") - F.col("x_min")
    q_max = (F.col("x_max") - F.col("x2_max")) / rng
    q_min = (F.col("x2_min") - F.col("x_min")) / rng
    return (
        hi.crossJoin(lo)
        .crossJoin(n)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.round("x_min", 6).alias("x_min"),
            F.round("x2_min", 6).alias("x2_min"),
            F.round("x2_max", 6).alias("x2_max"),
            F.round("x_max", 6).alias("x_max"),
            F.when(rng > 0, F.round(q_min, 6)).alias("q_min"),
            F.when(rng > 0, F.round(q_max, 6)).alias("q_max"),
            F.when(
                rng > 0,
                F.when(q_max >= q_min, F.lit("max")).otherwise(
                    F.lit("min")
                ),
            ).alias("flagged_side"),
        )
    )


def m73_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types on value — the
    nonparametric k-sample location test that needs NO ranks (the
    scale-friendly sibling of m33/m39's rank machinery): counts above
    vs not-above the GRAND median per group, then the 2×k chi-square.
    One exact interpolated-median pass (``percentile`` ≡ DuckDB
    MEDIAN), one grouped count scan against the 1-row broadcast
    median, 1-row algebra after — no window, no rank shuffle, the
    k-sample location screen that still runs in two scans at 100 TB.
    Ties AT the median land in the not-above arm (documented
    convention, replayed identically). Returns one row per group
    plus the shared (chi2, df)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    cells = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value") > F.col("med")).cast("long")
            ).alias("n_above"),
        )
        .select(
            "event_type",
            "n",
            "n_above",
            (F.col("n") - F.col("n_above")).alias("n_not_above"),
        )
    )
    tot = cells.agg(
        F.sum("n").alias("tot_n"),
        F.sum("n_above").alias("tot_a"),
        F.count(F.lit(1)).alias("k"),
    )
    nn = F.col("tot_n").cast("double")
    pa = F.col("tot_a").cast("double") / nn
    e_above = F.col("n").cast("double") * pa
    e_not = F.col("n").cast("double") * (1.0 - pa)
    da = F.col("n_above").cast("double") - e_above
    dn = F.col("n_not_above").cast("double") - e_not
    term = da * da / e_above + dn * dn / e_not
    with_tot = cells.crossJoin(F.broadcast(tot))
    chi = with_tot.agg(
        F.round(F.sum(term), 4).alias("chi2"),
        (F.max("k") - 1).cast("bigint").alias("df"),
    )
    return (
        with_tot.select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("n_above").cast("bigint").alias("n_above"),
            F.col("n_not_above").cast("bigint").alias("n_not_above"),
            F.round(e_above, 6).alias("expected_above"),
        )
        .crossJoin(F.broadcast(chi))
        .orderBy("event_type")
    )


def m74_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland–Altman agreement analysis on m69's method pairing
    (method A = the order header's total, method B = the sum of its
    line items, both in exact cents) — the companion plot statistic
    to Passing–Bablok regression: bias = mean difference, limits of
    agreement = bias ± 1.96·sd, and the fraction of pairs inside
    them. TWO scans (the m50 discipline): one exact-decimal
    sufficient-stats pass (n, Σd, Σd² over BIGINT cent differences),
    then one count scan against the 1-row broadcast double bounds —
    reduce state O(1), every input to the doubles exact, so both
    engines compute bit-identical bounds."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    osums = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).alias("_cents")
    )
    pairs = orders.join(
        osums, orders["o_orderkey"] == osums["l_orderkey"]
    ).select(
        (
            F.round(F.col("o_totalprice") * 100).cast("bigint")
            - F.col("_cents")
        ).alias("d")
    )
    ddec = F.col("d").cast("decimal(28,0)")
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(ddec).alias("sd_"),
        F.sum(ddec * ddec).alias("sdd"),
    )
    nn = F.col("n").cast("double")
    bias = F.col("sd_").cast("double") / nn
    var = (
        F.col("sdd").cast("double")
        - F.col("sd_").cast("double") * F.col("sd_").cast("double") / nn
    ) / (nn - 1.0)
    sd = F.sqrt(var)
    bounds = s.select(
        "n",
        bias.alias("bias"),
        sd.alias("sd"),
        (bias - 1.96 * sd).alias("lo"),
        (bias + 1.96 * sd).alias("hi"),
    )
    within = (
        pairs.crossJoin(F.broadcast(bounds))
        .agg(
            F.sum(
                (
                    (F.col("d").cast("double") >= F.col("lo"))
                    & (F.col("d").cast("double") <= F.col("hi"))
                ).cast("long")
            ).alias("n_within"),
            F.max("n").alias("n"),
            F.max("bias").alias("bias"),
            F.max("sd").alias("sd"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
        )
    )
    return within.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round("bias", 6).alias("bias_cents"),
        F.round("sd", 6).alias("sd_cents"),
        F.round("lo", 6).alias("loa_low"),
        F.round("hi", 6).alias("loa_high"),
        F.col("n_within").cast("bigint").alias("n_within"),
        F.round(
            F.col("n_within").cast("double") / F.col("n").cast("double"),
            6,
        ).alias("frac_within"),
    )


QUERIES = {
    "m01_ols_normal_eq": m01_ols_normal_eq,
    "m02_scaler_stats": m02_scaler_stats,
    "m03_kmeans_assign": m03_kmeans_assign,
    "m04_knn_classify": m04_knn_classify,
    "m05_pca_total_variance": m05_pca_total_variance,
    "m06_ols_two_features": m06_ols_two_features,
    "m07_gmm_estep": m07_gmm_estep,
    "m08_dbscan_core_count": m08_dbscan_core_count,
    "m09_scaler_transform_stats": m09_scaler_transform_stats,
    "m10_logreg_grad": m10_logreg_grad,
    "m11_auc": m11_auc,
    "m12_stump_split": m12_stump_split,
    "m13_nb_confusion": m13_nb_confusion,
    "m14_calibration": m14_calibration,
    "m15_cv_ols": m15_cv_ols,
    "m16_corr_matrix": m16_corr_matrix,
    "m17_robust_stats": m17_robust_stats,
    "m18_welch_ttest": m18_welch_ttest,
    "m19_grouped_ols": m19_grouped_ols,
    "m20_anova_f": m20_anova_f,
    "m21_chi2_independence": m21_chi2_independence,
    "m22_spearman": m22_spearman,
    "m23_ks_statistic": m23_ks_statistic,
    "m24_davies_bouldin": m24_davies_bouldin,
    "m25_lift_rules": m25_lift_rules,
    "m26_woe_iv": m26_woe_iv,
    "m27_average_precision": m27_average_precision,
    "m28_cohens_kappa": m28_cohens_kappa,
    "m29_kaplan_meier": m29_kaplan_meier,
    "m30_silhouette": m30_silhouette,
    "m31_brier_logloss": m31_brier_logloss,
    "m32_macro_f1": m32_macro_f1,
    "m33_mann_whitney": m33_mann_whitney,
    "m34_benford": m34_benford,
    "m35_ab_test": m35_ab_test,
    "m36_decile_lift": m36_decile_lift,
    "m37_psi": m37_psi,
    "m38_poisson_bootstrap": m38_poisson_bootstrap,
    "m39_kruskal_wallis": m39_kruskal_wallis,
    "m40_isotonic_calibration": m40_isotonic_calibration,
    "m41_mcnemar": m41_mcnemar,
    "m42_ece": m42_ece,
    "m43_effect_sizes": m43_effect_sizes,
    "m44_breusch_pagan": m44_breusch_pagan,
    "m45_jarque_bera": m45_jarque_bera,
    "m46_brown_forsythe": m46_brown_forsythe,
    "m47_durbin_watson": m47_durbin_watson,
    "m48_vif": m48_vif,
    "m49_welch_anova": m49_welch_anova,
    "m50_grubbs": m50_grubbs,
    "m51_bartlett": m51_bartlett,
    "m52_cochran_q": m52_cochran_q,
    "m53_friedman": m53_friedman,
    "m54_kendall_tau": m54_kendall_tau,
    "m55_partial_corr": m55_partial_corr,
    "m56_assoc_strength": m56_assoc_strength,
    "m57_runs_test": m57_runs_test,
    "m58_sign_test": m58_sign_test,
    "m59_mann_kendall": m59_mann_kendall,
    "m60_hash_uniformity": m60_hash_uniformity,
    "m61_tost_equivalence": m61_tost_equivalence,
    "m62_theil_sen": m62_theil_sen,
    "m63_hodges_lehmann": m63_hodges_lehmann,
    "m64_siegel_slope": m64_siegel_slope,
    "m65_cronbach_alpha": m65_cronbach_alpha,
    "m66_cooks_distance": m66_cooks_distance,
    "m67_mahalanobis_outliers": m67_mahalanobis_outliers,
    "m68_pinball_regression": m68_pinball_regression,
    "m69_passing_bablok": m69_passing_bablok,
    "m70_generalized_esd": m70_generalized_esd,
    "m71_dixon_q": m71_dixon_q,
    "m72_winsorized_stats": m72_winsorized_stats,
    "m73_moods_median": m73_moods_median,
    "m74_bland_altman": m74_bland_altman,
}


def _m07_score(k: int) -> str:
    """ln w_k - ½·ln|Σ_k| - ½·Σ (x-μ)²/σ² — the same quantity (modulo
    the shared d·ln2π constant) gmm._log_resp maximizes."""
    w, (mq, md), (vq, vd) = _M07_W[k], _M07_MU[k], _M07_VAR[k]
    return (
        f"(LN({w}) - 0.5 * (LN({vq}) + LN({vd}))"
        f" - 0.5 * ((l_quantity - {mq}) * (l_quantity - {mq}) / {vq}"
        f" + (l_discount - {md}) * (l_discount - {md}) / {vd}))"
    )


_M07_S = [_m07_score(k) for k in range(3)]


def _dist2(cx: float, cd: float) -> str:
    return (
        f"(l_quantity - {cx}) * (l_quantity - {cx})"
        f" + (l_discount - {cd}) * (l_discount - {cd})"
    )


_D = [_dist2(c[0], c[1]) for c in _M03_CENTERS]

ORACLE = {
    "m01_ols_normal_eq": """
        SELECT ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept
        FROM lineitem
    """,
    "m02_scaler_stats": """
        SELECT col_name, mean, std_pop, cmin, cmax FROM (
            SELECT 'l_quantity' AS col_name,
                   ROUND(AVG(l_quantity), 6) AS mean,
                   ROUND(STDDEV_POP(l_quantity), 6) AS std_pop,
                   ROUND(MIN(l_quantity), 6) AS cmin,
                   ROUND(MAX(l_quantity), 6) AS cmax
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice',
                   ROUND(AVG(l_extendedprice), 6),
                   ROUND(STDDEV_POP(l_extendedprice), 6),
                   ROUND(MIN(l_extendedprice), 6),
                   ROUND(MAX(l_extendedprice), 6)
            FROM lineitem
            UNION ALL
            SELECT 'l_discount',
                   ROUND(AVG(l_discount), 6),
                   ROUND(STDDEV_POP(l_discount), 6),
                   ROUND(MIN(l_discount), 6),
                   ROUND(MAX(l_discount), 6)
            FROM lineitem
        ) ORDER BY col_name
    """,
    "m03_kmeans_assign": f"""
        SELECT cluster, COUNT(*) AS n,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               ROUND(SUM(l_discount), 6) AS sum_disc
        FROM (
            SELECT l_quantity, l_discount,
                   CASE
                       WHEN {_D[0]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 0
                       WHEN {_D[1]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 1
                       ELSE 2
                   END AS cluster
            FROM lineitem
        ) GROUP BY cluster ORDER BY cluster
    """,
    "m05_pca_total_variance": """
        SELECT ROUND(SUM(v), 6) AS total_variance FROM (
            SELECT VAR_POP(ev) AS v FROM (
                SELECT GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                       CAST(UNNEST(embedding) AS DOUBLE) AS ev
                FROM embeddings
            ) GROUP BY k
        )
    """,
    "m06_ols_two_features": """
        WITH s AS (
            SELECT COUNT(*)::DOUBLE AS n,
                   SUM(l_quantity) AS sx1, SUM(l_discount) AS sx2,
                   SUM(l_extendedprice) AS sy,
                   SUM(l_quantity * l_quantity) AS s11,
                   SUM(l_quantity * l_discount) AS s12,
                   SUM(l_discount * l_discount) AS s22,
                   SUM(l_quantity * l_extendedprice) AS s1y,
                   SUM(l_discount * l_extendedprice) AS s2y
            FROM lineitem
        ),
        d AS (
            SELECT *,
                   s11*(s22*n - sx2*sx2) - s12*(s12*n - sx2*sx1)
                       + sx1*(s12*sx2 - s22*sx1) AS det
            FROM s
        )
        SELECT
            ROUND((s1y*(s22*n - sx2*sx2) - s12*(s2y*n - sx2*sy)
                   + sx1*(s2y*sx2 - s22*sy)) / det, 6) AS w_qty,
            ROUND((s11*(s2y*n - sy*sx2) - s1y*(s12*n - sx2*sx1)
                   + sx1*(s12*sy - s2y*sx1)) / det, 6) AS w_disc,
            ROUND((s11*(s22*sy - s2y*sx2) - s12*(s12*sy - s2y*sx1)
                   + s1y*(s12*sx2 - s22*sx1)) / det, 6) AS intercept
        FROM d
    """,
    "m07_gmm_estep": f"""
        SELECT component, COUNT(*) AS n FROM (
            SELECT CASE
                       WHEN {_M07_S[0]} >= {_M07_S[1]}
                        AND {_M07_S[0]} >= {_M07_S[2]} THEN 0
                       WHEN {_M07_S[1]} >= {_M07_S[2]} THEN 1
                       ELSE 2
                   END AS component
            FROM lineitem
        ) GROUP BY component ORDER BY component
    """,
    "m08_dbscan_core_count": """
        WITH nb AS (
            SELECT a.p_partkey AS id,
                   SUM(CASE WHEN (a.p_retailprice - b.p_retailprice)
                                * (a.p_retailprice - b.p_retailprice)
                                <= 25.0
                            THEN 1 ELSE 0 END) AS cnt
            FROM part a CROSS JOIN part b
            GROUP BY a.p_partkey
        )
        SELECT CAST(SUM(CASE WHEN cnt >= 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_core,
               COUNT(*) AS n_points
        FROM nb
    """,
    "m09_scaler_transform_stats": """
        WITH s AS (
            SELECT AVG(l_quantity) AS mq, STDDEV_POP(l_quantity) AS sq,
                   AVG(l_extendedprice) AS mp, STDDEV_POP(l_extendedprice) AS sp,
                   AVG(l_discount) AS md, STDDEV_POP(l_discount) AS sd
            FROM lineitem
        )
        SELECT col_name, min_z, max_z, n_outliers FROM (
            SELECT 'l_quantity' AS col_name,
                   ROUND(MIN((l_quantity - mq) / sq), 6) AS min_z,
                   ROUND(MAX((l_quantity - mq) / sq), 6) AS max_z,
                   SUM(CASE WHEN ABS((l_quantity - mq) / sq) > 2
                            THEN 1 ELSE 0 END)::BIGINT AS n_outliers
            FROM lineitem, s
            UNION ALL
            SELECT 'l_extendedprice',
                   ROUND(MIN((l_extendedprice - mp) / sp), 6),
                   ROUND(MAX((l_extendedprice - mp) / sp), 6),
                   SUM(CASE WHEN ABS((l_extendedprice - mp) / sp) > 2
                            THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem, s
            UNION ALL
            SELECT 'l_discount',
                   ROUND(MIN((l_discount - md) / sd), 6),
                   ROUND(MAX((l_discount - md) / sd), 6),
                   SUM(CASE WHEN ABS((l_discount - md) / sd) > 2
                            THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem, s
        ) ORDER BY col_name
    """,
    "m04_knn_classify": """
        WITH cells AS (
            SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        dists AS (
            SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                   ANY_VALUE(b.label) AS label,
                   ROUND(SQRT(SUM((a.v - b.v) * (a.v - b.v))), 6) AS dist
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.vec_id < 20 AND b.vec_id >= 20
            GROUP BY a.vec_id, b.vec_id
        ),
        nn AS (
            SELECT q_id, c_id, label FROM (
                SELECT q_id, c_id, label,
                       ROW_NUMBER() OVER (
                           PARTITION BY q_id ORDER BY dist, c_id) AS rank
                FROM dists
            ) WHERE rank <= 5
        ),
        votes AS (
            SELECT q_id, label, COUNT(*) AS votes FROM nn
            GROUP BY q_id, label
        )
        SELECT q_id, pred_label FROM (
            SELECT q_id, label AS pred_label,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY votes DESC, label) AS rk
            FROM votes
        ) WHERE rk = 1 ORDER BY q_id
    """,
    "m10_logreg_grad": """
        SELECT COUNT(*) AS n,
               ROUND(AVG(-(y * ln(p) + (1 - y) * ln(1 - p))), 6) AS loss,
               ROUND(AVG((p - y) * x0), 6) AS g0,
               ROUND(AVG((p - y) * x1), 6) AS g1,
               ROUND(AVG((p - y) * x2), 6) AS g2,
               ROUND(AVG((p - y) * x3), 6) AS g3
        FROM (
            SELECT 1.0 / (1.0 + exp(-list_inner_product(
                       list_transform(embedding, v -> v::DOUBLE),
                       list_transform(range(0, 64),
                                      j -> ((j % 7) - 3) / 10.0)
                   ))) AS p,
                   CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
                   embedding[1]::DOUBLE AS x0, embedding[2]::DOUBLE AS x1,
                   embedding[3]::DOUBLE AS x2, embedding[4]::DOUBLE AS x3
            FROM embeddings
        )
    """,
    "m11_auc": """
        WITH s AS (
            SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
                   ROUND(list_inner_product(
                       list_transform(embedding, v -> v::DOUBLE),
                       list_transform(range(0, 64),
                                      j -> ((j % 7) - 3) / 10.0)
                   ), 9) AS score
            FROM embeddings
        ),
        g AS (
            SELECT score, COUNT(*) AS n, SUM(y) AS n_pos_g
            FROM s GROUP BY score
        ),
        r AS (
            SELECT n, n_pos_g,
                   COALESCE(SUM(n) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0)
                   + (n + 1) / 2.0 AS arank
            FROM g
        )
        SELECT ROUND(
                   (SUM(n_pos_g * arank)
                    - SUM(n_pos_g) * (SUM(n_pos_g) + 1) / 2.0)
                   / (SUM(n_pos_g) * (SUM(n) - SUM(n_pos_g))), 6) AS auc,
               CAST(SUM(n_pos_g) AS BIGINT) AS n_pos,
               CAST(SUM(n) - SUM(n_pos_g) AS BIGINT) AS n_neg
        FROM r
    """,
}

ORACLE["m12_stump_split"] = """
    WITH s AS (
        SELECT l_quantity AS q,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ),
    t(thr) AS (VALUES (5.0), (10.0), (15.0), (20.0), (25.0), (30.0),
                      (35.0), (40.0), (45.0)),
    a AS (
        SELECT t.thr,
               COUNT(*) AS n, SUM(y) AS pos,
               SUM(CASE WHEN q <= t.thr THEN 1 ELSE 0 END) AS nl,
               SUM(CASE WHEN q <= t.thr THEN y ELSE 0 END) AS pl
        FROM s CROSS JOIN t GROUP BY t.thr
    )
    SELECT CAST(thr AS DOUBLE) AS thr,
           CAST(nl AS BIGINT) AS n_left,
           CAST(n - nl AS BIGINT) AS n_right,
           ROUND((CASE WHEN nl > 0
                       THEN 2.0 * pl * (nl - pl) / nl ELSE 0.0 END
                + CASE WHEN n - nl > 0
                       THEN 2.0 * (pos - pl) * ((n - nl) - (pos - pl))
                            / (n - nl) ELSE 0.0 END) / n, 6) AS wgini
    FROM a ORDER BY thr
"""

# Shared NB prediction CTE chain (ends at `pred(doc_id, pred)`),
# replaying MultinomialNB fit + score + 6-dp argmax; m13 and m32
# append their own final SELECTs.
_NB_PRED_SQL = """
    WITH tok AS (
        SELECT doc_id, lang AS c, w FROM (
            SELECT doc_id, lang,
                   UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> ''
    ),
    wc AS (SELECT c, w, COUNT(*) AS n_wc FROM tok GROUP BY c, w),
    c_tok AS (SELECT c, SUM(n_wc) AS n_c FROM wc GROUP BY c),
    vv AS (SELECT COUNT(DISTINCT w) AS v FROM wc),
    nd AS (SELECT lang AS c, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT COUNT(*)::DOUBLE AS n FROM documents),
    cls AS (
        SELECT nd.c, LN(nd.n_docs / tot.n) AS log_prior,
               LN(1.0 / (c_tok.n_c + vv.v)) AS log_floor
        FROM nd JOIN c_tok ON c_tok.c = nd.c, tot, vv
    ),
    lp AS (
        SELECT wc.c, wc.w,
               LN((wc.n_wc + 1.0) / (c_tok.n_c + vv.v)) AS logp
        FROM wc JOIN c_tok USING (c), vv
    ),
    dw AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM dw GROUP BY doc_id),
    seen AS (
        SELECT dw.doc_id, lp.c,
               SUM(dw.tf * lp.logp) AS s_seen, SUM(dw.tf) AS n_seen
        FROM dw JOIN lp USING (w) GROUP BY dw.doc_id, lp.c
    ),
    joint AS (
        SELECT cells.doc_id, cells.c,
               ROUND(cells.log_prior + COALESCE(seen.s_seen, 0)
                     + (cells.dl - COALESCE(seen.n_seen, 0))
                       * cells.log_floor, 6) AS j
        FROM (SELECT dl.doc_id, dl.dl, cls.* FROM dl CROSS JOIN cls)
             AS cells
        LEFT JOIN seen
          ON seen.doc_id = cells.doc_id AND seen.c = cells.c
    ),
    pred AS (
        SELECT doc_id, c AS pred FROM (
            SELECT doc_id, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY j DESC, c
                   ) AS rn
            FROM joint
        ) WHERE rn = 1
    )
"""

ORACLE["m13_nb_confusion"] = f"""
    {_NB_PRED_SQL}
    SELECT d.lang AS true_lang, p.pred, COUNT(*) AS n
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE["m14_calibration"] = """
    SELECT CAST(LEAST(FLOOR(p * 10), 9) AS BIGINT) AS bin,
           COUNT(*) AS n,
           ROUND(AVG(p), 6) AS avg_pred,
           ROUND(AVG(y), 6) AS frac_pos
    FROM (
        SELECT 1.0 / (1.0 + exp(-list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 7) - 3) / 10.0)
               ))) AS p,
               CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
        FROM embeddings
    )
    GROUP BY 1 ORDER BY bin
"""

ORACLE["m15_cv_ols"] = """
    WITH base AS (
        SELECT CAST(('0x' || substr(md5(
                   CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR)), 1, 4))
               AS INTEGER) % 5 AS fold,
               l_quantity AS x, l_extendedprice AS y
        FROM lineitem
    ),
    stats AS (
        SELECT fold, COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM base GROUP BY fold
    ),
    tot AS (
        SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
               SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
        FROM stats
    ),
    params AS (
        SELECT fold,
               ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
               / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx))
                   AS b,
               ((tsy - sy)
                - ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
                  / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx))
                  * (tsx - sx)) / (tn - n) AS a
        FROM stats, tot
    )
    SELECT fold, COUNT(*) AS n_test,
           ROUND(AVG(b), 6) AS slope,
           ROUND(AVG(a), 6) AS intercept,
           ROUND(SQRT(AVG((y - a - b * x) * (y - a - b * x))), 6) AS rmse
    FROM base JOIN params USING (fold)
    GROUP BY fold ORDER BY fold
"""


ORACLE["m16_corr_matrix"] = """
    SELECT col_a, col_b, corr FROM (
        SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b,
               ROUND((SUM(l_discount*l_extendedprice)/COUNT(*) - AVG(l_discount)*AVG(l_extendedprice))
                     / SQRT((SUM(l_discount*l_discount)/COUNT(*) - AVG(l_discount)*AVG(l_discount))
                          * (SUM(l_extendedprice*l_extendedprice)/COUNT(*) - AVG(l_extendedprice)*AVG(l_extendedprice))), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_discount' AS col_a, 'l_quantity' AS col_b,
               ROUND((SUM(l_discount*l_quantity)/COUNT(*) - AVG(l_discount)*AVG(l_quantity))
                     / SQRT((SUM(l_discount*l_discount)/COUNT(*) - AVG(l_discount)*AVG(l_discount))
                          * (SUM(l_quantity*l_quantity)/COUNT(*) - AVG(l_quantity)*AVG(l_quantity))), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_discount' AS col_a, 'l_tax' AS col_b,
               ROUND((SUM(l_discount*l_tax)/COUNT(*) - AVG(l_discount)*AVG(l_tax))
                     / SQRT((SUM(l_discount*l_discount)/COUNT(*) - AVG(l_discount)*AVG(l_discount))
                          * (SUM(l_tax*l_tax)/COUNT(*) - AVG(l_tax)*AVG(l_tax))), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice' AS col_a, 'l_quantity' AS col_b,
               ROUND((SUM(l_extendedprice*l_quantity)/COUNT(*) - AVG(l_extendedprice)*AVG(l_quantity))
                     / SQRT((SUM(l_extendedprice*l_extendedprice)/COUNT(*) - AVG(l_extendedprice)*AVG(l_extendedprice))
                          * (SUM(l_quantity*l_quantity)/COUNT(*) - AVG(l_quantity)*AVG(l_quantity))), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b,
               ROUND((SUM(l_extendedprice*l_tax)/COUNT(*) - AVG(l_extendedprice)*AVG(l_tax))
                     / SQRT((SUM(l_extendedprice*l_extendedprice)/COUNT(*) - AVG(l_extendedprice)*AVG(l_extendedprice))
                          * (SUM(l_tax*l_tax)/COUNT(*) - AVG(l_tax)*AVG(l_tax))), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b,
               ROUND((SUM(l_quantity*l_tax)/COUNT(*) - AVG(l_quantity)*AVG(l_tax))
                     / SQRT((SUM(l_quantity*l_quantity)/COUNT(*) - AVG(l_quantity)*AVG(l_quantity))
                          * (SUM(l_tax*l_tax)/COUNT(*) - AVG(l_tax)*AVG(l_tax))), 6) AS corr
        FROM lineitem
    ) ORDER BY col_a, col_b
"""

ORACLE["m17_robust_stats"] = """
    SELECT col_name, q25, median, q75, iqr FROM (
        SELECT 'l_discount' AS col_name,
               ROUND(QUANTILE_CONT(l_discount, 0.25), 6) AS q25,
               ROUND(QUANTILE_CONT(l_discount, 0.5), 6) AS median,
               ROUND(QUANTILE_CONT(l_discount, 0.75), 6) AS q75,
               ROUND(QUANTILE_CONT(l_discount, 0.75)
                     - QUANTILE_CONT(l_discount, 0.25), 6) AS iqr
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6),
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6),
               ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6),
               ROUND(QUANTILE_CONT(l_extendedprice, 0.75)
                     - QUANTILE_CONT(l_extendedprice, 0.25), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity',
               ROUND(QUANTILE_CONT(l_quantity, 0.25), 6),
               ROUND(QUANTILE_CONT(l_quantity, 0.5), 6),
               ROUND(QUANTILE_CONT(l_quantity, 0.75), 6),
               ROUND(QUANTILE_CONT(l_quantity, 0.75)
                     - QUANTILE_CONT(l_quantity, 0.25), 6)
        FROM lineitem
    ) ORDER BY col_name
"""

ORACLE["m18_welch_ttest"] = """
    WITH stats AS (
        SELECT SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_r,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s_r,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q_r,
               SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS n_n,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS s_n,
               CAST(SUM(CASE WHEN l_returnflag = 'N'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS q_n
        FROM lineitem
    ),
    alg AS (
        SELECT n_r, n_n,
               s_r / n_r AS mr, s_n / n_n AS mn,
               ((q_r - n_r * (s_r / n_r) * (s_r / n_r)) / (n_r - 1)) / n_r AS se2r,
               ((q_n - n_n * (s_n / n_n) * (s_n / n_n)) / (n_n - 1)) / n_n AS se2n
        FROM stats
    )
    SELECT n_r::BIGINT AS n_r, n_n::BIGINT AS n_n,
           ROUND(mr, 6) AS mean_r,
           ROUND(mn, 6) AS mean_n,
           ROUND((mr - mn) / SQRT(se2r + se2n), 6) AS t_stat,
           ROUND((se2r + se2n) * (se2r + se2n)
                 / (se2r * se2r / (n_r - 1) + se2n * se2n / (n_n - 1)), 6)
               AS welch_df
    FROM alg
"""

ORACLE["m19_grouped_ols"] = """
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

ORACLE["m20_anova_f"] = """
    WITH g AS (
        SELECT l_returnflag,
               COUNT(*)::DOUBLE AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS q
        FROM lineitem GROUP BY l_returnflag
    ),
    agg AS (
        SELECT COUNT(*)::DOUBLE AS k, SUM(n) AS nn, SUM(s) AS ts,
               SUM(q) AS tq, SUM(s * s / n) AS sb
        FROM g
    )
    SELECT k::BIGINT AS n_groups, nn::BIGINT AS n_rows,
           ROUND((sb - ts * ts / nn)
                 / ((sb - ts * ts / nn) + (tq - sb)), 6) AS eta_sq,
           ROUND(((sb - ts * ts / nn) / (k - 1))
                 / ((tq - sb) / (nn - k)), 6) AS f_stat
    FROM agg
"""

ORACLE["m21_chi2_independence"] = """
    WITH cells AS (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS o
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (
        SELECT o,
               SUM(o) OVER (PARTITION BY l_returnflag) AS row_tot,
               SUM(o) OVER (PARTITION BY l_linestatus) AS col_tot,
               SUM(o) OVER () AS n,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS r_cells,
               COUNT(*) OVER (PARTITION BY l_linestatus) AS c_cells
        FROM cells
    ),
    agg AS (
        SELECT MAX(n) AS n_rows, COUNT(*) AS n_cells,
               MAX(c_cells) AS n_flags, MAX(r_cells) AS n_statuses,
               SUM((o::DOUBLE - row_tot::DOUBLE * col_tot::DOUBLE / n::DOUBLE)
                   * (o::DOUBLE - row_tot::DOUBLE * col_tot::DOUBLE / n::DOUBLE)
                   / (row_tot::DOUBLE * col_tot::DOUBLE / n::DOUBLE)) AS chi2
        FROM m
    )
    SELECT n_rows::BIGINT AS n_rows, n_cells::BIGINT AS n_cells,
           ((n_flags - 1) * (n_statuses - 1))::BIGINT AS dof,
           ROUND(chi2, 4) AS chi2,
           ROUND(SQRT(chi2 / (n_rows * (LEAST(n_flags, n_statuses) - 1))), 6)
               AS cramers_v
    FROM agg
"""

ORACLE["m22_spearman"] = """
    WITH base AS (SELECT l_quantity AS a, l_discount AS b FROM lineitem),
    ca AS (SELECT a, COUNT(*) AS cnt FROM base GROUP BY a),
    ra AS (
        SELECT a,
               2 * SUM(cnt) OVER (ORDER BY a
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (cnt - 1) AS r2a
        FROM ca
    ),
    cb AS (SELECT b, COUNT(*) AS cnt FROM base GROUP BY b),
    rb AS (
        SELECT b,
               2 * SUM(cnt) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - (cnt - 1) AS r2b
        FROM cb
    ),
    j AS (SELECT r2a, r2b FROM base JOIN ra USING (a) JOIN rb USING (b)),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(r2a) AS DOUBLE) AS sa,
               CAST(SUM(r2b) AS DOUBLE) AS sb,
               CAST(SUM(r2a * r2a) AS DOUBLE) AS qa,
               CAST(SUM(r2b * r2b) AS DOUBLE) AS qb,
               CAST(SUM(r2a * r2b) AS DOUBLE) AS sab
        FROM j
    )
    SELECT n::BIGINT AS n_rows,
           ROUND((n::DOUBLE * sab - sa * sb)
                 / SQRT((n::DOUBLE * qa - sa * sa)
                      * (n::DOUBLE * qb - sb * sb)), 6) AS spearman_rho
    FROM s
"""

# m23 replays the n_bins="auto" policy: exact per-distinct-value ECDF
# when distinct prices <= 100k, fixed-width 10k-bin ECDF above. The
# oracle branches on the EXACT distinct count while Spark probes an
# HLL estimate (±2%) — they agree because no scale sits anywhere near
# the threshold (4k / 40k / 393k distinct at the three test scales).
# The bin key (v-lo)/width uses identical IEEE double ops on both
# engines, so bucket ids are bit-equal.
ORACLE["m23_ks_statistic"] = """
    WITH src AS (
        SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_returnflag AS g
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    meta AS (
        SELECT COUNT(DISTINCT v) AS nd, MIN(v) AS lo, MAX(v) AS hi
        FROM src
    ),
    keyed AS (
        SELECT CASE
                 WHEN (SELECT nd FROM meta) <= 100000 THEN v
                 WHEN (SELECT hi FROM meta) = (SELECT lo FROM meta)
                   THEN 0.0
                 ELSE LEAST(9999.0, FLOOR(
                        (v - (SELECT lo FROM meta))
                        / (((SELECT hi FROM meta) - (SELECT lo FROM meta))
                           / 10000.0)))
               END AS k,
               g
        FROM src
    ),
    grp AS (
        SELECT k,
               SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS cr,
               SUM(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS cn
        FROM keyed GROUP BY k
    ),
    e AS (
        SELECT SUM(cr) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r,
               SUM(cn) OVER (ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
               SUM(cr) OVER () AS n_r,
               SUM(cn) OVER () AS n_n
        FROM grp
    )
    SELECT MAX(n_r)::BIGINT AS n_r, MAX(n_n)::BIGINT AS n_n,
           ROUND(MAX(ABS(cum_r::DOUBLE / n_r::DOUBLE
                       - cum_n::DOUBLE / n_n::DOUBLE)), 6) AS ks_stat
    FROM e
"""

def _m24_oracle() -> str:
    import math

    d = {
        (i, j): repr(math.dist(_M03_CENTERS[i], _M03_CENTERS[j]))
        for i in range(3)
        for j in range(3)
        if i != j
    }
    rows = []
    for i in range(3):
        js = [j for j in range(3) if j != i]
        ratio = ", ".join(
            f"(s_{i} + s_{j}) / {d[(i, j)]}" for j in js
        )
        rows.append(
            f"SELECT {i}::BIGINT AS cluster, n_{i}::BIGINT AS n,"
            f" ROUND(s_{i}, 6) AS scatter,"
            f" ROUND(GREATEST({ratio}), 6) AS db_ratio FROM one"
        )
    union = "\n        UNION ALL\n        ".join(rows)
    sums = ",\n               ".join(
        f"SUM(CASE WHEN cluster = {i} THEN 1 ELSE 0 END) AS n_{i},"
        f"\n               SUM(CASE WHEN cluster = {i} THEN dist END)"
        f" / SUM(CASE WHEN cluster = {i} THEN 1 ELSE 0 END) AS s_{i}"
        for i in range(3)
    )
    return f"""
    WITH a AS (
        SELECT CASE
                   WHEN {_D[0]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 0
                   WHEN {_D[1]} = LEAST({_D[0]}, {_D[1]}, {_D[2]}) THEN 1
                   ELSE 2
               END AS cluster,
               SQRT(LEAST({_D[0]}, {_D[1]}, {_D[2]})) AS dist
        FROM lineitem
    ),
    one AS (
        SELECT {sums}
        FROM a
    )
    SELECT * FROM (
        {union}
    ) ORDER BY cluster
    """


ORACLE["m24_davies_bouldin"] = _m24_oracle()

# m25: integer counts make every metric an exact ratio; the BIGINT
# products stay under 2^63 at any TPC-H scale (n_ab, N ≤ rows).
ORACLE["m25_lift_rules"] = """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
    ),
    pairs AS (
        SELECT a.it AS p1, c.it AS p2, COUNT(*) AS n_ab
        FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    items AS (SELECT it, COUNT(*) AS cnt FROM b GROUP BY it),
    tot AS (SELECT COUNT(DISTINCT bk) AS n_bask FROM b)
    SELECT p1, p2, n_ab, ca.cnt AS n_a, cb.cnt AS n_b,
           ROUND(n_ab / ca.cnt, 6) AS conf_ab,
           ROUND(n_ab / cb.cnt, 6) AS conf_ba,
           ROUND((n_ab * n_bask) / (ca.cnt * cb.cnt), 6) AS lift
    FROM pairs
    JOIN items ca ON ca.it = p1
    JOIN items cb ON cb.it = p2
    CROSS JOIN tot
    ORDER BY lift DESC, p1, p2 LIMIT 20
"""

# m26: counts are exact integers; the single LN per bucket is the
# only float op (round 6 absorbs libm ulp); buckets missing a class
# are dropped on both sides identically.
ORACLE["m26_woe_iv"] = """
    WITH per AS (
        SELECT CAST(FLOOR(l_quantity / 10) AS INT) AS bucket,
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS pos_n,
               SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
                   AS neg_n
        FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(pos_n) AS P, SUM(neg_n) AS N FROM per)
    SELECT bucket, CAST(pos_n AS BIGINT) AS pos_n,
           CAST(neg_n AS BIGINT) AS neg_n,
           ROUND(LN((pos_n / P) / (neg_n / N)), 6) AS woe,
           ROUND((pos_n / P - neg_n / N)
                 * LN((pos_n / P) / (neg_n / N)), 6) AS iv_term
    FROM per CROSS JOIN tot
    WHERE pos_n > 0 AND neg_n > 0
    ORDER BY bucket
"""

_M10_SCORE_SQL = """ROUND(list_inner_product(
    list_transform(embedding, v -> v::DOUBLE),
    list_transform(range(0, 64), j -> ((j % 7) - 3) / 10.0)
), 9)"""

# m27: exact integer counts per distinct 9-dp score; each AP term is
# one IEEE-exact division, the final sum is rounded 6 orders above
# accumulated ulp drift. Replays the n_bins="auto" policy like m23:
# exact per-distinct-score collapse when distinct scores <= 100k,
# fixed-width 10k-bin keys above (identical IEEE double bin math on
# both engines); the oracle branches on the EXACT distinct count
# while Spark probes HLL (±2%) — they agree because no test scale
# sits near the threshold.
ORACLE["m27_average_precision"] = f"""
    WITH s AS (
        SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
               {_M10_SCORE_SQL} AS v
        FROM embeddings
    ),
    meta AS (
        SELECT COUNT(DISTINCT v) AS nd, MIN(v) AS lo, MAX(v) AS hi
        FROM s
    ),
    keyed AS (
        SELECT CASE
                 WHEN (SELECT nd FROM meta) <= 100000 THEN v
                 WHEN (SELECT hi FROM meta) = (SELECT lo FROM meta)
                   THEN 0.0
                 ELSE LEAST(9999.0, FLOOR(
                        (v - (SELECT lo FROM meta))
                        / (((SELECT hi FROM meta) - (SELECT lo FROM meta))
                           / 10000.0)))
               END AS score,
               y
        FROM s
    ),
    g AS (
        SELECT score, COUNT(*) AS n, SUM(y) AS pos
        FROM keyed GROUP BY score
    ),
    r AS (
        SELECT n, pos,
               SUM(n) OVER (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cn,
               SUM(pos) OVER (ORDER BY score DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cp
        FROM g
    )
    SELECT ROUND(SUM(pos * cp / cn) / SUM(pos), 6) AS ap,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(n) - SUM(pos) AS BIGINT) AS n_neg
    FROM r
"""

# m28: all four cells are exact integer counts; kappa/p_o/p_e are
# divisions of exact ints — bit-identical on both engines.
ORACLE["m28_cohens_kappa"] = f"""
    WITH t AS (
        SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
               CASE WHEN {_M10_SCORE_SQL} > 0 THEN 1 ELSE 0 END AS p
        FROM embeddings
    ),
    c AS (
        SELECT SUM(y * p) AS n11, SUM(y * (1 - p)) AS n10,
               SUM((1 - y) * p) AS n01,
               SUM((1 - y) * (1 - p)) AS n00
        FROM t
    )
    SELECT ROUND(((n11 + n00)::DOUBLE / (n11 + n10 + n01 + n00)
                  - ((n11 + n10) * (n11 + n01)
                     + (n01 + n00) * (n10 + n00))::DOUBLE
                    / ((n11 + n10 + n01 + n00)::DOUBLE
                       * (n11 + n10 + n01 + n00)))
                 / (1 - ((n11 + n10) * (n11 + n01)
                         + (n01 + n00) * (n10 + n00))::DOUBLE
                        / ((n11 + n10 + n01 + n00)::DOUBLE
                           * (n11 + n10 + n01 + n00))), 6) AS kappa,
           ROUND((n11 + n00)::DOUBLE
                 / (n11 + n10 + n01 + n00), 6) AS p_o,
           ROUND(((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00))::DOUBLE
                 / ((n11 + n10 + n01 + n00)::DOUBLE
                    * (n11 + n10 + n01 + n00)), 6) AS p_e,
           CAST(n11 + n10 + n01 + n00 AS BIGINT) AS n
    FROM c
"""

# m29: counts are exact integers; the factor 1-d/n is an IEEE-exact
# division; LN/EXP accumulate <=1 ulp per of ~400 terms, six orders
# below the 6-dp rounding grain. Zero factors bypass LN entirely.
ORACLE["m29_kaplan_meier"] = """
    WITH dur AS (
        SELECT DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                         CAST(MAX(l.l_shipdate) AS DATE)) AS t,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderstatus
    ),
    g AS (SELECT t, SUM(ev) AS d, COUNT(*) AS m FROM dur GROUP BY t),
    r AS (
        SELECT t, d,
               SUM(m) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) AS n_risk
        FROM g
    ),
    s AS (
        SELECT t, d, n_risk,
               CASE WHEN MIN(1 - d::DOUBLE / n_risk) OVER cum = 0
                    THEN 0.0
                    ELSE EXP(SUM(CASE WHEN d < n_risk
                                      THEN LN(1 - d::DOUBLE / n_risk)
                                      ELSE 0.0 END) OVER cum)
               END AS surv
        FROM r
        WINDOW cum AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW)
    )
    SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_event, ROUND(surv, 6) AS survival
    FROM s WHERE d > 0 ORDER BY t
"""

# m30: distances reuse the m03/m24 literal centers; SQRT and the
# (b-a)/max(a,b) ratio are IEEE-exact per row, so only the per-group
# mean's summation order differs — absorbed by ROUND(...,6).
ORACLE["m30_silhouette"] = f"""
    WITH p AS (
        SELECT CASE
                   WHEN {_D[0]} = LEAST({_D[0]}, {_D[1]}, {_D[2]})
                       THEN 0
                   WHEN {_D[1]} = LEAST({_D[0]}, {_D[1]}, {_D[2]})
                       THEN 1
                   ELSE 2
               END AS cluster,
               list_sort([{_D[0]}, {_D[1]}, {_D[2]}]) AS arr
        FROM lineitem
    ),
    s AS (
        SELECT cluster,
               (SQRT(arr[2]) - SQRT(arr[1]))
                   / GREATEST(SQRT(arr[1]), SQRT(arr[2])) AS s
        FROM p
    )
    SELECT cluster, COUNT(*) AS n, ROUND(AVG(s), 6) AS mean_s
    FROM s GROUP BY cluster ORDER BY cluster
"""

# m31: z is 9-dp exact and clamped to +-27 so p never rounds to 0/1;
# p is rounded to 12 dp so EXP's <=1-ulp libm drift sits six orders
# below the grain — both engines see identical p, and the 6-dp means
# absorb summation order.
ORACLE["m31_brier_logloss"] = f"""
    WITH s AS (
        SELECT CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y,
               ROUND(1.0 / (1.0 + EXP(-LEAST(GREATEST(
                   {_M10_SCORE_SQL}, -27.0), 27.0))), 12) AS p
        FROM embeddings
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG((p - y) * (p - y)), 6) AS brier,
           ROUND(-AVG(y * LN(p) + (1 - y) * LN(1.0 - p)), 6)
               AS logloss
    FROM s
"""

# m32: per-class metrics are divisions of the exact confusion-cell
# integers produced by the shared NB replay.
ORACLE["m32_macro_f1"] = f"""
    {_NB_PRED_SQL},
    conf AS (
        SELECT d.lang AS t, p.pred AS p
        FROM pred p JOIN documents d USING (doc_id)
    ),
    bt AS (
        SELECT t AS cls, COUNT(*) AS n_true,
               SUM(CASE WHEN p = t THEN 1 ELSE 0 END) AS tp
        FROM conf GROUP BY t
    ),
    bp AS (SELECT p AS cls, COUNT(*) AS n_pred FROM conf GROUP BY p),
    j AS (
        SELECT COALESCE(bt.cls, bp.cls) AS cls,
               COALESCE(tp, 0) AS tp,
               COALESCE(n_true, 0) AS n_true,
               COALESCE(n_pred, 0) AS n_pred
        FROM bt FULL OUTER JOIN bp ON bt.cls = bp.cls
    ),
    m AS (
        SELECT cls, tp, n_true, n_pred,
               CASE WHEN n_pred > 0 THEN tp / CAST(n_pred AS DOUBLE)
                    ELSE 0.0 END AS prec,
               CASE WHEN n_true > 0 THEN tp / CAST(n_true AS DOUBLE)
                    ELSE 0.0 END AS rec
        FROM j
    )
    SELECT cls, CAST(tp AS BIGINT) AS tp,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred,
           ROUND(prec, 6) AS precision,
           ROUND(rec, 6) AS recall,
           ROUND(CASE WHEN prec + rec > 0
                      THEN 2 * prec * rec / (prec + rec)
                      ELSE 0.0 END, 6) AS f1
    FROM m ORDER BY cls
"""

# m33: midranks carried DOUBLED as exact DECIMAL(38,0) cross-moments;
# u/z/rank-biserial are pure IEEE algebra on those exact integers.
ORACLE["m33_mann_whitney"] = """
    WITH src AS (
        SELECT CAST(l_quantity AS DOUBLE) AS val, l_returnflag AS g
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ),
    per AS (
        SELECT val,
               SUM(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS na_v,
               COUNT(*) AS t
        FROM src GROUP BY val
    ),
    r AS (
        SELECT na_v, t,
               2 * SUM(t) OVER (ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t + 1 AS rank2
        FROM per
    ),
    s AS (
        SELECT SUM(CAST(na_v AS DECIMAL(38,0)) * rank2) AS r2a,
               CAST(SUM(na_v) AS DECIMAL(38,0)) AS na,
               CAST(SUM(t) AS DECIMAL(38,0)) AS nn,
               SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS ties
        FROM r
    ),
    d AS (
        SELECT CAST(na AS DOUBLE) AS nad,
               CAST(nn - na AS DOUBLE) AS nbd,
               CAST(nn AS DOUBLE) AS nd,
               CAST(r2a AS DOUBLE) AS r2ad,
               CAST(ties AS DOUBLE) AS tiesd,
               CAST(na AS BIGINT) AS n_a,
               CAST(nn - na AS BIGINT) AS n_b
        FROM s
    )
    SELECT n_a, n_b,
           ROUND((r2ad - nad * (nad + 1)) / 2.0, 6) AS u_a,
           ROUND(((r2ad - nad * (nad + 1)) / 2.0 - nad * nbd / 2.0)
                 / SQRT(nad * nbd / 12.0
                        * ((nd + 1) - tiesd / (nd * (nd - 1)))), 6)
               AS z,
           ROUND(1.0 - 2.0 * ((r2ad - nad * (nad + 1)) / 2.0)
                     / (nad * nbd), 6) AS rank_biserial
    FROM d
"""

# m34: the first digit comes from the DECIMAL string form (LOG10
# could flip a digit at exact powers of ten); LOG10 only feeds the
# expected shares, where 1-ulp drift sits 10 orders under ROUND(,6).
ORACLE["m34_benford"] = """
    WITH d AS (
        SELECT CAST(SUBSTRING(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
    ),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    w AS (
        SELECT digit, n,
               CAST(SUM(n) OVER () AS DOUBLE) AS tot,
               LOG10(1 + 1 / CAST(digit AS DOUBLE)) AS e
        FROM c
    )
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n / tot, 6) AS share_obs,
           ROUND(e, 6) AS share_exp,
           ROUND((n - tot * e) * (n - tot * e) / (tot * e), 6)
               AS chi2_term
    FROM w ORDER BY digit
"""

# m35: every statistic is IEEE algebra on four exact integer counts.
ORACLE["m35_ab_test"] = """
    WITH pu AS (
        SELECT c.c_custkey,
               CASE WHEN b.c_custkey IS NULL THEN 0 ELSE 1 END AS conv
        FROM customer c
        LEFT JOIN (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                   WHERE o_totalprice > 480000)
            b ON b.c_custkey = c.c_custkey
    ),
    s AS (
        SELECT SUM(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
                   AS n_a,
               SUM(CASE WHEN c_custkey % 2 = 0 THEN conv ELSE 0 END)
                   AS c_a,
               SUM(CASE WHEN c_custkey % 2 = 1 THEN 1 ELSE 0 END)
                   AS n_b,
               SUM(CASE WHEN c_custkey % 2 = 1 THEN conv ELSE 0 END)
                   AS c_b
        FROM pu
    ),
    d AS (
        SELECT CAST(n_a AS DOUBLE) AS na, CAST(c_a AS DOUBLE) AS ca,
               CAST(n_b AS DOUBLE) AS nb, CAST(c_b AS DOUBLE) AS cb,
               CAST(n_a AS BIGINT) AS n_a_i,
               CAST(c_a AS BIGINT) AS c_a_i,
               CAST(n_b AS BIGINT) AS n_b_i,
               CAST(c_b AS BIGINT) AS c_b_i
        FROM s
    )
    SELECT n_a_i AS n_a, c_a_i AS conv_a,
           ROUND(ca / na, 6) AS rate_a,
           n_b_i AS n_b, c_b_i AS conv_b,
           ROUND(cb / nb, 6) AS rate_b,
           ROUND(cb / nb - ca / na, 6) AS lift,
           ROUND((cb / nb - ca / na)
                 / SQRT((ca + cb) / (na + nb)
                        * (1 - (ca + cb) / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 6) AS z
    FROM d
"""


# m36: NTILE(10) replays the exact integer decile arithmetic (x19's
# equivalence); counts are exact ints, ratios IEEE divisions.
ORACLE["m36_decile_lift"] = f"""
    WITH s AS (
        SELECT vec_id, {_M10_SCORE_SQL} AS score,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM embeddings
    ),
    d AS (
        SELECT y, CAST(NTILE(10) OVER (ORDER BY score DESC, vec_id)
                       AS INTEGER) AS decile
        FROM s
    ),
    g AS (
        SELECT decile, COUNT(*) AS n, SUM(y) AS pos
        FROM d GROUP BY decile
    )
    SELECT decile, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           ROUND(pos::DOUBLE / n::DOUBLE, 6) AS pos_rate,
           ROUND((SUM(pos) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  )::DOUBLE
                 / (SUM(pos) OVER ())::DOUBLE, 6) AS cum_gain,
           ROUND((pos::DOUBLE / n::DOUBLE)
                 / ((SUM(pos) OVER ())::DOUBLE
                    / (SUM(n) OVER ())::DOUBLE), 6) AS lift
    FROM g
    ORDER BY decile
"""

# m37: bin keys are the identical IEEE floor((z-lo)/width) on both
# engines; Laplace-smoothed shares are divisions of exact ints plus
# literal constants; one LN per bin absorbed by 6-dp rounding.
ORACLE["m37_psi"] = f"""
    WITH s AS (
        SELECT {_M10_SCORE_SQL} AS z,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS is_a
        FROM embeddings
    ),
    meta AS (SELECT MIN(z) AS lo, MAX(z) AS hi FROM s),
    keyed AS (
        SELECT CAST(CASE
                 WHEN (SELECT hi FROM meta) = (SELECT lo FROM meta)
                   THEN 0.0
                 ELSE LEAST(9.0, FLOOR(
                        (z - (SELECT lo FROM meta))
                        / (((SELECT hi FROM meta) - (SELECT lo FROM meta))
                           / 10.0)))
               END AS INTEGER) AS bin,
               is_a
        FROM s
    ),
    g AS (
        SELECT bin, SUM(is_a) AS n_a, SUM(1 - is_a) AS n_b
        FROM keyed GROUP BY bin
    )
    SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND((n_a + 0.5) / ((SUM(n_a) OVER ()) + 5.0), 6) AS share_a,
           ROUND((n_b + 0.5) / ((SUM(n_b) OVER ()) + 5.0), 6) AS share_b,
           ROUND(((n_a + 0.5) / ((SUM(n_a) OVER ()) + 5.0)
                  - (n_b + 0.5) / ((SUM(n_b) OVER ()) + 5.0))
                 * LN(((n_a + 0.5) / ((SUM(n_a) OVER ()) + 5.0))
                      / ((n_b + 0.5) / ((SUM(n_b) OVER ()) + 5.0))),
                 6) AS psi_term
    FROM g
    ORDER BY bin
"""


# m38: identical Poisson(1) integer thresholds; decimal money sums
# make each replica mean order-exact; division operands are an exact
# double and an exact integer on both engines.
ORACLE["m38_poisson_bootstrap"] = """
    WITH reps AS (
        SELECT o_orderkey, o_totalprice, UNNEST(range(0, 32)) AS replica
        FROM orders
    ),
    u AS (
        SELECT replica, o_totalprice,
               CAST(('0x' || substr(md5(
                   o_orderkey || '#' || replica), 1, 8)) AS BIGINT) AS u
        FROM reps
    ),
    w AS (
        SELECT replica, o_totalprice,
               CASE WHEN u < 1580030168 THEN 0
                    WHEN u < 3160060337 THEN 1
                    WHEN u < 3950075421 THEN 2
                    WHEN u < 4213413783 THEN 3
                    WHEN u < 4279248373 THEN 4
                    WHEN u < 4292415291 THEN 5
                    ELSE 6 END AS w
        FROM u
    )
    SELECT replica,
           CAST(SUM(w) AS BIGINT) AS n_b,
           ROUND(CAST(SUM(CAST(w * CAST(o_totalprice AS DECIMAL(18,2))
                               AS DECIMAL(28,2))) AS DOUBLE)
                 / CAST(SUM(w) AS BIGINT), 6) AS boot_mean
    FROM w
    GROUP BY replica
    ORDER BY replica
"""


# m39: doubled midranks are exact integers; group rank sums are
# DECIMAL(38,0) (their squares pass 2^53) cast to double identically
# on both engines; ties and N are exact ints feeding IEEE divisions.
ORACLE["m39_kruskal_wallis"] = """
    WITH per AS (
        SELECT CAST(l_quantity AS DOUBLE) AS val, l_returnflag AS g,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    pv AS (SELECT val, SUM(c) AS t FROM per GROUP BY val),
    pv2 AS (
        SELECT val, t,
               SUM(t) OVER (ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - t AS cumprev
        FROM pv
    ),
    grp AS (
        SELECT g, SUM(c) AS n_g,
               SUM(CAST(c * (2 * cumprev + t + 1)
                        AS DECIMAL(38,0))) AS r2g
        FROM per JOIN pv2 USING (val) GROUP BY g
    ),
    agg AS (
        SELECT SUM(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                   / CAST(n_g AS DOUBLE)) AS s,
               COUNT(*) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n
        FROM grp
    ),
    ties AS (
        SELECT CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)
                    AS DOUBLE) AS tie
        FROM pv
    )
    SELECT n, CAST(k AS INTEGER) AS k,
           ROUND(3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                 * s - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
           CASE WHEN (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) = 0
                     OR (1.0 - tie
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                            * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                        = 0
                THEN NULL
                ELSE ROUND(
                 (3.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                  * s - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                 / (1.0 - tie
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
                 6) END AS h_tie_corrected
    FROM agg CROSS JOIN ties
"""

ORACLE["m40_isotonic_calibration"] = """
    WITH staged AS (
        SELECT 1.0 / (1.0 + exp(-list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 7) - 3) / 10.0)
               ))) AS p,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM embeddings
    ),
    g AS (
        SELECT CAST(LEAST(FLOOR(p * 16), 15) AS BIGINT) AS bin,
               COUNT(*) AS cnt,
               CAST(SUM(y) AS BIGINT) AS pos,
               SUM(p) AS sump
        FROM staged GROUP BY 1
    ),
    pr AS (
        SELECT bin, cnt, pos,
               CAST(SUM(pos) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cp,
               CAST(SUM(cnt) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cc
        FROM g
    ),
    pairs AS (
        SELECT lo.bin AS j, hi.bin AS k,
               (hi.cp - (lo.cp - lo.pos))
               / (hi.cc - (lo.cc - lo.cnt)) AS avg_jk
        FROM pr lo JOIN pr hi ON lo.bin <= hi.bin
    ),
    fit AS (
        SELECT bin, MAX(mn) AS cal FROM (
            SELECT g.bin, p.j, MIN(p.avg_jk) AS mn
            FROM g JOIN pairs p
              ON p.j <= g.bin AND p.k >= g.bin
            GROUP BY g.bin, p.j
        ) GROUP BY bin
    )
    SELECT g.bin, g.cnt AS n,
           ROUND(g.sump / g.cnt, 6) AS avg_pred,
           ROUND(g.pos / CAST(g.cnt AS DOUBLE), 6) AS frac_pos,
           ROUND(f.cal, 6) AS calibrated
    FROM g JOIN fit f USING (bin)
    ORDER BY bin
"""

ORACLE["m41_mcnemar"] = """
    WITH staged AS (
        SELECT (label < 5) AS y,
               (list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 7) - 3) / 10.0)) > 0) AS pa,
               (list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 5) - 2) / 10.0)) > 0) AS pb
        FROM embeddings
    ),
    ok AS (
        SELECT CASE WHEN pa = y THEN 1 ELSE 0 END AS a_ok,
               CASE WHEN pb = y THEN 1 ELSE 0 END AS b_ok
        FROM staged
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(a_ok) AS BIGINT) AS na,
               CAST(SUM(b_ok) AS BIGINT) AS nb,
               CAST(SUM(a_ok * (1 - b_ok)) AS BIGINT) AS b_disc,
               CAST(SUM((1 - a_ok) * b_ok) AS BIGINT) AS c_disc
        FROM ok
    )
    SELECT n, b_disc, c_disc,
           CASE WHEN b_disc + c_disc = 0 THEN NULL
                ELSE ROUND(
                    (ABS(CAST(b_disc - c_disc AS DOUBLE)) - 1.0)
                    * (ABS(CAST(b_disc - c_disc AS DOUBLE)) - 1.0)
                    / CAST(b_disc + c_disc AS DOUBLE), 6)
           END AS chi2,
           ROUND(na / CAST(n AS DOUBLE), 6) AS acc_a,
           ROUND(nb / CAST(n AS DOUBLE), 6) AS acc_b
    FROM s
"""

ORACLE["m42_ece"] = """
    WITH staged AS (
        SELECT 1.0 / (1.0 + exp(-list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 7) - 3) / 10.0)
               ))) AS p,
               CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
        FROM embeddings
    ),
    g AS (
        SELECT CAST(LEAST(FLOOR(p * 10), 9) AS BIGINT) AS bin,
               COUNT(*) AS n_b,
               SUM(p) AS sp,
               CAST(SUM(y) AS BIGINT) AS sy
        FROM staged GROUP BY 1
    )
    SELECT CAST(SUM(n_b) AS BIGINT) AS n,
           ROUND(SUM(ABS(sp - sy)) / SUM(n_b), 6) AS ece,
           ROUND(MAX(ABS(sp - sy) / CAST(n_b AS DOUBLE)), 6) AS mce
    FROM g
"""

ORACLE["m43_effect_sizes"] = """
    WITH st AS (
        SELECT
            CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            SUM(CASE WHEN l_returnflag = 'A'
                     THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS s_a,
            SUM(CASE WHEN l_returnflag = 'A'
                     THEN CAST(l_quantity AS DECIMAL(18,6))
                          * CAST(l_quantity AS DECIMAL(18,6)) END)
                AS ss_a,
            CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_n,
            SUM(CASE WHEN l_returnflag = 'N'
                     THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS s_n,
            SUM(CASE WHEN l_returnflag = 'N'
                     THEN CAST(l_quantity AS DECIMAL(18,6))
                          * CAST(l_quantity AS DECIMAL(18,6)) END)
                AS ss_n,
            CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_r,
            SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS s_r,
            SUM(CASE WHEN l_returnflag = 'R'
                     THEN CAST(l_quantity AS DECIMAL(18,6))
                          * CAST(l_quantity AS DECIMAL(18,6)) END)
                AS ss_r
        FROM lineitem
    ),
    p AS (
        SELECT 'A' AS group_a, 'N' AS group_b,
               n_a AS n1i, n_n AS n2i,
               CAST(n_a AS DOUBLE) AS n1, CAST(n_n AS DOUBLE) AS n2,
               CAST(s_a AS DOUBLE) AS s1, CAST(s_n AS DOUBLE) AS s2,
               CAST(ss_a AS DOUBLE) AS q1, CAST(ss_n AS DOUBLE) AS q2
        FROM st
        UNION ALL
        SELECT 'A', 'R', n_a, n_r,
               CAST(n_a AS DOUBLE), CAST(n_r AS DOUBLE),
               CAST(s_a AS DOUBLE), CAST(s_r AS DOUBLE),
               CAST(ss_a AS DOUBLE), CAST(ss_r AS DOUBLE)
        FROM st
        UNION ALL
        SELECT 'N', 'R', n_n, n_r,
               CAST(n_n AS DOUBLE), CAST(n_r AS DOUBLE),
               CAST(s_n AS DOUBLE), CAST(s_r AS DOUBLE),
               CAST(ss_n AS DOUBLE), CAST(ss_r AS DOUBLE)
        FROM st
    )
    SELECT group_a, group_b, n1i AS n_a, n2i AS n_b,
           ROUND(s1 / n1 - s2 / n2, 6) AS mean_diff,
           ROUND((s1 / n1 - s2 / n2)
                 / SQRT(((n1 - 1.0) * ((q1 - s1 * s1 / n1) / (n1 - 1.0))
                         + (n2 - 1.0) * ((q2 - s2 * s2 / n2) / (n2 - 1.0)))
                        / (n1 + n2 - 2.0)), 6) AS cohens_d,
           ROUND(((s1 / n1 - s2 / n2)
                  / SQRT(((n1 - 1.0) * ((q1 - s1 * s1 / n1) / (n1 - 1.0))
                          + (n2 - 1.0) * ((q2 - s2 * s2 / n2) / (n2 - 1.0)))
                         / (n1 + n2 - 2.0)))
                 * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6) AS hedges_g
    FROM p
    ORDER BY group_a, group_b
"""

ORACLE["m44_breusch_pagan"] = """
    WITH s1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               -- DECIMAL(28,6) casts force DuckDB's int128 multiply
               -- path (18-digit physical int64 products overflow);
               -- the products are exact either way, matching Spark's
               -- exact decimal(18,6) x decimal(18,6) arithmetic
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT n, CAST(sx AS DOUBLE) AS sx, CAST(sxx AS DOUBLE) AS sxx,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM s1
    ),
    s2 AS (
        SELECT MAX(f.n) AS n, MAX(f.sx) AS sx, MAX(f.sxx) AS sxx,
               SUM(CAST((l.l_extendedprice
                         - (f.a + f.b * l.l_quantity))
                        * (l.l_extendedprice
                           - (f.a + f.b * l.l_quantity))
                        AS DECIMAL(38,6))) AS sg,
               SUM(CAST(l.l_quantity
                        * ((l.l_extendedprice
                            - (f.a + f.b * l.l_quantity))
                           * (l.l_extendedprice
                              - (f.a + f.b * l.l_quantity)))
                        AS DECIMAL(38,6))) AS sxg,
               SUM(CAST(((l.l_extendedprice
                          - (f.a + f.b * l.l_quantity))
                         * (l.l_extendedprice
                            - (f.a + f.b * l.l_quantity)))
                        * ((l.l_extendedprice
                            - (f.a + f.b * l.l_quantity))
                           * (l.l_extendedprice
                              - (f.a + f.b * l.l_quantity)))
                        AS DECIMAL(38,6))) AS sgg
        FROM lineitem l CROSS JOIN fit f
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                   - sx * CAST(sg AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                     - sx * CAST(sg AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
                       - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))),
                 6) AS r2_aux,
           ROUND(CAST(n AS DOUBLE)
                 * ((CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                     - sx * CAST(sg AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sxg AS DOUBLE)
                       - sx * CAST(sg AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
                       - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))),
                 6) AS lm_stat,
           CAST(1 AS INTEGER) AS df
    FROM s2
"""

ORACLE["m45_jarque_bera"] = """
    WITH s1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM s1
    ),
    s2 AS (
        SELECT MAX(f.n) AS n,
               SUM(CAST((l.l_extendedprice
                         - (f.a + f.b * l.l_quantity))
                        * (l.l_extendedprice
                           - (f.a + f.b * l.l_quantity))
                        AS DECIMAL(38,6))) AS se2,
               SUM(CAST(((l.l_extendedprice
                          - (f.a + f.b * l.l_quantity))
                         * (l.l_extendedprice
                            - (f.a + f.b * l.l_quantity)))
                        * (l.l_extendedprice
                           - (f.a + f.b * l.l_quantity))
                        AS DECIMAL(38,6))) AS se3,
               SUM(CAST(((l.l_extendedprice
                          - (f.a + f.b * l.l_quantity))
                         * (l.l_extendedprice
                            - (f.a + f.b * l.l_quantity)))
                        * ((l.l_extendedprice
                            - (f.a + f.b * l.l_quantity))
                           * (l.l_extendedprice
                              - (f.a + f.b * l.l_quantity)))
                        AS DECIMAL(38,6))) AS se4
        FROM lineitem l CROSS JOIN fit f
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((CAST(se3 AS DOUBLE) / CAST(n AS DOUBLE))
                 / ((CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * SQRT(CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))),
                 6) AS skewness,
           ROUND((CAST(se4 AS DOUBLE) / CAST(n AS DOUBLE))
                 / ((CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))),
                 6) AS kurtosis,
           ROUND(CAST(n AS DOUBLE) / 6.0
                 * (((CAST(se3 AS DOUBLE) / CAST(n AS DOUBLE))
                     / ((CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))
                        * SQRT(CAST(se2 AS DOUBLE)
                               / CAST(n AS DOUBLE))))
                    * ((CAST(se3 AS DOUBLE) / CAST(n AS DOUBLE))
                       / ((CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))
                          * SQRT(CAST(se2 AS DOUBLE)
                                 / CAST(n AS DOUBLE))))
                    + (((CAST(se4 AS DOUBLE) / CAST(n AS DOUBLE))
                        / ((CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(se2 AS DOUBLE)
                              / CAST(n AS DOUBLE)))) - 3.0)
                      * (((CAST(se4 AS DOUBLE) / CAST(n AS DOUBLE))
                          / ((CAST(se2 AS DOUBLE)
                              / CAST(n AS DOUBLE))
                             * (CAST(se2 AS DOUBLE)
                                / CAST(n AS DOUBLE)))) - 3.0)
                      / 4.0),
                 6) AS jb_stat
    FROM s2
"""

# m46: per-group exact medians from the running-sum positions
# (n+1)//2 / (n+2)//2 over the distinct-value table; c·|v−med| and
# c·|v−med|² per-term DECIMAL(38,6) so the deviation sums are
# order-exact; the W algebra mirrors the engine's operation order.
ORACLE["m46_brown_forsythe"] = """
    WITH per AS (
        SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS val,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    pv AS (
        SELECT g, val, c,
               SUM(c) OVER (PARTITION BY g ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(c) OVER (PARTITION BY g) AS n_g
        FROM per
    ),
    med AS (
        SELECT g,
               (MAX(CASE WHEN cum - c < FLOOR((n_g + 1) / 2)
                          AND FLOOR((n_g + 1) / 2) <= cum
                         THEN val END)
                + MAX(CASE WHEN cum - c < FLOOR((n_g + 2) / 2)
                            AND FLOOR((n_g + 2) / 2) <= cum
                           THEN val END)) / 2.0 AS med
        FROM pv GROUP BY g
    ),
    grp AS (
        SELECT per.g,
               CAST(SUM(c) AS BIGINT) AS n_g,
               SUM(CAST(c * ABS(val - med) AS DECIMAL(38,6))) AS sz,
               SUM(CAST(c * ABS(val - med) * ABS(val - med)
                        AS DECIMAL(38,6))) AS szz
        FROM per JOIN med USING (g) GROUP BY per.g
    ),
    agg AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               COUNT(*) AS k,
               SUM(CAST(sz AS DOUBLE)) AS sz_all,
               SUM(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                   / CAST(n_g AS DOUBLE)) AS sq_over_n,
               SUM(CAST(szz AS DOUBLE)
                   - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                     / CAST(n_g AS DOUBLE)) AS den
        FROM grp
    )
    SELECT n, CAST(k AS INTEGER) AS k,
           CASE WHEN k <= 1 OR den = 0 THEN NULL
                ELSE ROUND(
                    (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                    / (CAST(k AS DOUBLE) - 1.0)
                    * (sq_over_n
                       - CAST(n AS DOUBLE)
                         * (sz_all / CAST(n AS DOUBLE))
                         * (sz_all / CAST(n AS DOUBLE)))
                    / den, 6) END AS w,
           CAST(k - 1 AS INTEGER) AS df1,
           CAST(n - k AS BIGINT) AS df2
    FROM agg
"""

# m47: the m44 fit CTE; the adjacent difference replays as LAG over
# the unique (shipdate, orderkey, linenumber) order; Σe² and Σ(Δe)²
# are per-term DECIMAL(38,6) sums — order-exact both engines.
ORACLE["m47_durbin_watson"] = """
    WITH s1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM s1
    ),
    r AS (
        SELECT l.l_extendedprice - (f.a + f.b * l.l_quantity) AS e,
               l.l_shipdate, l.l_orderkey, l.l_linenumber
        FROM lineitem l CROSS JOIN fit f
    ),
    o AS (
        SELECT e,
               LAG(e) OVER (ORDER BY l_shipdate, l_orderkey,
                            l_linenumber) AS ep
        FROM r
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(e * e AS DECIMAL(38,6))) AS se,
               SUM(CASE WHEN ep IS NULL
                        THEN CAST(0 AS DECIMAL(38,6))
                        ELSE CAST((e - ep) * (e - ep)
                                  AS DECIMAL(38,6)) END) AS sd
        FROM o
    )
    SELECT n,
           ROUND(CAST(sd AS DOUBLE) / CAST(se AS DOUBLE), 6) AS dw,
           ROUND(1.0 - (CAST(sd AS DOUBLE) / CAST(se AS DOUBLE))
                 / 2.0, 6) AS rho
    FROM agg
"""

# m48: exact decimal sufficient stats (the m44 int128-product note),
# then correlations/cofactors/det mirrored operation-for-operation.
ORACLE["m48_vif"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS s1,
               SUM(CAST(l_discount AS DECIMAL(18,6))) AS s2,
               SUM(CAST(l_tax AS DECIMAL(18,6))) AS s3,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS s11,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS s22,
               SUM(CAST(l_tax AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS s33,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS s12,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS s13,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS s23
        FROM lineitem
    ),
    r AS (
        SELECT CAST(n AS BIGINT) AS n,
               (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))
                   AS r12,
               (CAST(n AS DOUBLE) * CAST(s13 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                         - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)))
                   AS r13,
               (CAST(n AS DOUBLE) * CAST(s23 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                         - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)))
                   AS r23
        FROM s
    )
    SELECT n,
           ROUND(r12, 6) AS r12,
           ROUND(r13, 6) AS r13,
           ROUND(r23, 6) AS r23,
           ROUND((1.0 - r23 * r23)
                 / (1.0 + 2.0 * r12 * r13 * r23
                    - r12 * r12 - r13 * r13 - r23 * r23), 6)
               AS vif_quantity,
           ROUND((1.0 - r13 * r13)
                 / (1.0 + 2.0 * r12 * r13 * r23
                    - r12 * r12 - r13 * r13 - r23 * r23), 6)
               AS vif_discount,
           ROUND((1.0 - r12 * r12)
                 / (1.0 + 2.0 * r12 * r13 * r23
                    - r12 * r12 - r13 * r13 - r23 * r23), 6)
               AS vif_tax
    FROM r
"""

# m49: exact decimal per-group sufficient stats, then the Welch
# weight algebra and degenerate guards mirrored operation-for-
# operation (w = n/var and t-terms stay behind CASE like the engine).
ORACLE["m49_welch_anova"] = """
    WITH grp AS (
        SELECT l_returnflag AS g, COUNT(*) AS n_g,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx
        FROM lineitem GROUP BY 1
    ),
    st AS (
        SELECT n_g,
               CAST(sx AS DOUBLE) / CAST(n_g AS DOUBLE) AS m,
               CASE WHEN CAST(n_g AS DOUBLE) > 1.0
                    THEN (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n_g AS DOUBLE))
                         / (CAST(n_g AS DOUBLE) - 1.0)
               END AS v
        FROM grp
    ),
    st2 AS (
        SELECT n_g, m, v,
               CASE WHEN v > 0 THEN CAST(n_g AS DOUBLE) / v END AS w
        FROM st
    ),
    a1 AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, COUNT(*) AS k,
               SUM(w) AS sw, SUM(w * m) AS swm,
               MIN(n_g) AS min_n,
               MIN(CASE WHEN v > 0 THEN 1.0 ELSE 0.0 END) AS w_ok
        FROM st2
    ),
    a2 AS (
        SELECT MAX(a1.n) AS n, MAX(a1.k) AS k,
               SUM(st2.w * (st2.m - a1.swm / a1.sw)
                   * (st2.m - a1.swm / a1.sw)) AS num,
               SUM(CASE WHEN st2.n_g > 1
                        THEN (1.0 - st2.w / a1.sw)
                             * (1.0 - st2.w / a1.sw)
                             / (CAST(st2.n_g AS DOUBLE) - 1.0)
                   END) AS t,
               MAX(a1.min_n) AS min_n, MAX(a1.w_ok) AS w_ok
        FROM st2 CROSS JOIN a1
    )
    SELECT n, CAST(k AS INTEGER) AS k,
           CASE WHEN k <= 1 OR min_n <= 1 OR w_ok < 1.0 THEN NULL
                ELSE ROUND((num / (CAST(k AS DOUBLE) - 1.0))
                           / (1.0 + 2.0
                              * (3.0 * t / (CAST(k AS DOUBLE)
                                            * CAST(k AS DOUBLE)
                                            - 1.0))
                              * (CAST(k AS DOUBLE) - 2.0) / 3.0), 6)
           END AS w,
           CAST(k - 1 AS INTEGER) AS df1,
           CASE WHEN k <= 1 OR min_n <= 1 OR w_ok < 1.0 THEN NULL
                ELSE ROUND(1.0 / (3.0 * t
                                  / (CAST(k AS DOUBLE)
                                     * CAST(k AS DOUBLE) - 1.0)), 6)
           END AS df2
    FROM a2
"""

# m50: one exact-decimal sufficient-stats aggregate; G is scalar
# algebra mirrored operation-for-operation, guards mirrored.
ORACLE["m50_grubbs"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sx,
               SUM(CAST(o_totalprice AS DECIMAL(28,6))
                   * CAST(o_totalprice AS DECIMAL(28,6))) AS sxx,
               MIN(o_totalprice) AS xmin,
               MAX(o_totalprice) AS xmax
        FROM orders
    ),
    st AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
               CASE WHEN CAST(n AS DOUBLE) > 1.0
                    THEN (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         / (CAST(n AS DOUBLE) - 1.0)
               END AS v,
               xmin, xmax
        FROM s
    )
    SELECT n,
           ROUND(mean, 6) AS mean,
           CASE WHEN v > 0 THEN ROUND(SQRT(v), 6) END AS sd,
           CASE WHEN v > 0
                THEN ROUND(GREATEST(xmax - mean, mean - xmin)
                           / SQRT(v), 6)
           END AS g_stat,
           CASE WHEN v > 0
                THEN CASE WHEN xmax - mean >= mean - xmin
                          THEN 'max' ELSE 'min' END
           END AS outlier_side
    FROM st
"""

# m51: per-group exact-decimal sufficient stats, then the k-row
# Bartlett log/pool algebra mirrored operation-for-operation; guards
# (k<=1, n_g<=1, zero variance) mirrored as NULL.
ORACLE["m51_bartlett"] = """
    WITH grp AS (
        SELECT l_returnflag AS g,
               COUNT(*) AS n_g,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx
        FROM lineitem GROUP BY l_returnflag
    ),
    st AS (
        SELECT n_g,
               CASE WHEN CAST(n_g AS DOUBLE) > 1.0
                    THEN (CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n_g AS DOUBLE))
                         / (CAST(n_g AS DOUBLE) - 1.0)
               END AS v
        FROM grp
    ),
    agg AS (
        SELECT SUM(n_g) AS n,
               COUNT(*) AS k,
               SUM((CAST(n_g AS DOUBLE) - 1.0) * v) AS ssw,
               SUM(CASE WHEN v > 0
                        THEN (CAST(n_g AS DOUBLE) - 1.0) * LN(v)
                   END) AS slnv,
               SUM(CASE WHEN n_g > 1
                        THEN 1.0 / (CAST(n_g AS DOUBLE) - 1.0)
                   END) AS sinv,
               MIN(n_g) AS min_n,
               MIN(CASE WHEN v > 0 THEN 1.0 ELSE 0.0 END) AS v_ok
        FROM st
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS INTEGER) AS k,
           CASE WHEN k <= 1 OR min_n <= 1 OR v_ok < 1.0 THEN NULL
                ELSE ROUND(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                            * LN(ssw / (CAST(n AS DOUBLE)
                                        - CAST(k AS DOUBLE)))
                            - slnv)
                           / (1.0 + (sinv
                                     - 1.0 / (CAST(n AS DOUBLE)
                                              - CAST(k AS DOUBLE)))
                                    / (3.0 * (CAST(k AS DOUBLE)
                                              - 1.0))), 6)
           END AS t_stat,
           CAST(k - 1 AS INTEGER) AS df
    FROM agg
"""

# m52: one integer-exact scan to (n, G1, G2, G3, sum L^2); the Q
# algebra is mirrored operation-for-operation, zero denominator ->
# NULL on both sides.
ORACLE["m52_cochran_q"] = """
    WITH ind AS (
        SELECT CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END AS c1,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS c2,
               CASE WHEN MONTH(o_orderdate) <= 6 THEN 1 ELSE 0 END AS c3
        FROM orders
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(c1) AS g1, SUM(c2) AS g2, SUM(c3) AS g3,
               SUM((c1 + c2 + c3) * (c1 + c2 + c3)) AS sl2
        FROM ind
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(g1 AS BIGINT) AS g1,
           CAST(g2 AS BIGINT) AS g2,
           CAST(g3 AS BIGINT) AS g3,
           CASE WHEN CAST(3 * (g1 + g2 + g3) - sl2 AS DOUBLE) > 0
                THEN ROUND(2.0 * (CAST(3 * (g1 * g1 + g2 * g2 + g3 * g3)
                                       AS DOUBLE)
                                  - CAST((g1 + g2 + g3) * (g1 + g2 + g3)
                                         AS DOUBLE))
                           / CAST(3 * (g1 + g2 + g3) - sl2 AS DOUBLE), 6)
           END AS q_stat,
           CAST(2 AS INTEGER) AS df
    FROM s
"""

# m53: exact-decimal cell means -> deterministic-IEEE ranked grid;
# ranks are half-integers so every downstream sum is float-exact and
# order-independent; algebra mirrored operation-for-operation.
ORACLE["m53_friedman"] = """
    WITH cells AS (
        SELECT date_trunc('week', ts) AS blk, event_type AS trt,
               COUNT(*) AS n_c,
               SUM(CAST(value AS DECIMAL(18,6))) AS sx
        FROM events GROUP BY 1, 2
    ),
    cm AS (
        SELECT blk, trt,
               CAST(sx AS DOUBLE) / CAST(n_c AS DOUBLE) AS m
        FROM cells
    ),
    kt AS (SELECT COUNT(DISTINCT trt) AS k FROM cm),
    complete AS (
        SELECT cm.blk, cm.trt, cm.m, kt.k
        FROM cm, kt
        QUALIFY COUNT(*) OVER (PARTITION BY blk) = kt.k
    ),
    ranked AS (
        SELECT trt, k, blk,
               CAST(RANK() OVER (PARTITION BY blk ORDER BY m)
                    AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY blk, m)
                       AS DOUBLE) - 1.0) / 2.0 AS r
        FROM complete
    ),
    pt AS (
        SELECT trt, MAX(k) AS k, COUNT(DISTINCT blk) AS b,
               SUM(r) AS rj, SUM(r * r) AS rj2
        FROM ranked GROUP BY trt
    ),
    agg AS (
        SELECT MAX(b) AS b, MAX(k) AS k, SUM(rj2) AS a,
               SUM((rj - CAST(b AS DOUBLE)
                         * (CAST(k AS DOUBLE) + 1.0) / 2.0)
                   * (rj - CAST(b AS DOUBLE)
                           * (CAST(k AS DOUBLE) + 1.0) / 2.0)) AS ssq
        FROM pt
    )
    SELECT CAST(b AS BIGINT) AS b,
           CAST(k AS INTEGER) AS k,
           CASE WHEN a - CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
                        * (CAST(k AS DOUBLE) + 1.0)
                        * (CAST(k AS DOUBLE) + 1.0) / 4.0 > 0
                THEN ROUND((CAST(k AS DOUBLE) - 1.0) * ssq
                           / (a - CAST(b AS DOUBLE)
                                  * CAST(k AS DOUBLE)
                                  * (CAST(k AS DOUBLE) + 1.0)
                                  * (CAST(k AS DOUBLE) + 1.0) / 4.0),
                           6)
           END AS chi2_f,
           CAST(k - 1 AS INTEGER) AS df
    FROM agg
"""

# m54: pair statistics collapsed onto the bounded value grid; C/D/tie
# sums integer-exact, the tau algebra mirrored operation-for-
# operation in double.
ORACLE["m54_kendall_tau"] = """
    WITH cells AS (
        SELECT CAST(l_quantity AS INTEGER) AS x,
               CAST(l_linenumber AS INTEGER) AS y,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    cd AS (
        SELECT SUM(CASE WHEN b.y > a.y THEN a.cnt * b.cnt END) AS c,
               SUM(CASE WHEN b.y < a.y THEN a.cnt * b.cnt END) AS d
        FROM cells a JOIN cells b ON a.x < b.x
    ),
    tx AS (SELECT x, SUM(cnt) AS t FROM cells GROUP BY x),
    ty AS (SELECT y, SUM(cnt) AS t FROM cells GROUP BY y),
    s1 AS (SELECT SUM((t * (t - 1)) // 2) AS n1, SUM(t) AS n FROM tx),
    s2 AS (SELECT SUM((t * (t - 1)) // 2) AS n2 FROM ty)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(c AS DOUBLE) AS concordant,
           CAST(d AS DOUBLE) AS discordant,
           CASE WHEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                      / 2.0 - CAST(n1 AS DOUBLE))
                     * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                        / 2.0 - CAST(n2 AS DOUBLE)) > 0
                THEN ROUND((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
                           / SQRT((CAST(n AS DOUBLE)
                                   * (CAST(n AS DOUBLE) - 1.0) / 2.0
                                   - CAST(n1 AS DOUBLE))
                                  * (CAST(n AS DOUBLE)
                                     * (CAST(n AS DOUBLE) - 1.0) / 2.0
                                     - CAST(n2 AS DOUBLE))), 6)
           END AS tau_b
    FROM cd, s1, s2
"""

# m55: the m48 exact-decimal sufficient-stats scan; partial-corr
# algebra mirrored operation-for-operation, degenerate -> NULL.
ORACLE["m55_partial_corr"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS s1,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS s2,
               SUM(CAST(l_discount AS DECIMAL(18,6))) AS s3,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS s11,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS s22,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS s33,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS s12,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS s13,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS s23
        FROM lineitem
    ),
    r AS (
        SELECT CAST(n AS BIGINT) AS n,
               (CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                         - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))
                   AS r12,
               (CAST(n AS DOUBLE) * CAST(s13 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                         - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)))
                   AS r13,
               (CAST(n AS DOUBLE) * CAST(s23 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s3 AS DOUBLE))
               / SQRT((CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(s33 AS DOUBLE)
                         - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)))
                   AS r23
        FROM s
    )
    SELECT n,
           ROUND(r12, 6) AS r_qty_price,
           CASE WHEN (1.0 - r13 * r13) * (1.0 - r23 * r23) > 0
                THEN ROUND((r12 - r13 * r23)
                           / SQRT((1.0 - r13 * r13)
                                  * (1.0 - r23 * r23)), 6)
           END AS r_qty_price_given_disc,
           CASE WHEN (1.0 - r12 * r12) * (1.0 - r23 * r23) > 0
                THEN ROUND((r13 - r12 * r23)
                           / SQRT((1.0 - r12 * r12)
                                  * (1.0 - r23 * r23)), 6)
           END AS r_qty_disc_given_price,
           CASE WHEN (1.0 - r12 * r12) * (1.0 - r13 * r13) > 0
                THEN ROUND((r23 - r12 * r13)
                           / SQRT((1.0 - r12 * r12)
                                  * (1.0 - r13 * r13)), 6)
           END AS r_price_disc_given_qty
    FROM r
"""

# m56: contingency grid + window marginals (the m21 recipe on the
# orders 5x12 grid); the four estimators' algebra mirrored
# operation-for-operation on exact integer counts.
ORACLE["m56_assoc_strength"] = """
    WITH cells AS (
        SELECT o_orderpriority AS rk, MONTH(o_orderdate) AS ck,
               COUNT(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    m AS (
        SELECT rk, ck, o,
               SUM(o) OVER (PARTITION BY rk) AS row_tot,
               SUM(o) OVER (PARTITION BY ck) AS col_tot,
               SUM(o) OVER () AS n
        FROM cells
    ),
    agg AS (
        SELECT MAX(n) AS n,
               COUNT(DISTINCT rk) AS r,
               COUNT(DISTINCT ck) AS c,
               SUM((o::DOUBLE - row_tot::DOUBLE * col_tot::DOUBLE
                                / n::DOUBLE)
                   * (o::DOUBLE - row_tot::DOUBLE * col_tot::DOUBLE
                                  / n::DOUBLE)
                   / (row_tot::DOUBLE * col_tot::DOUBLE / n::DOUBLE))
                   AS chi2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(r AS INTEGER) AS r,
           CAST(c AS INTEGER) AS c,
           ROUND(chi2, 4) AS chi2,
           ROUND(SQRT((chi2 / n::DOUBLE)
                      / LEAST(r::DOUBLE - 1.0, c::DOUBLE - 1.0)), 6)
               AS cramers_v,
           ROUND(SQRT(GREATEST(chi2 / n::DOUBLE
                               - (r::DOUBLE - 1.0) * (c::DOUBLE - 1.0)
                                 / (n::DOUBLE - 1.0), 0.0)
                      / LEAST(r::DOUBLE - (r::DOUBLE - 1.0)
                                          * (r::DOUBLE - 1.0)
                                          / (n::DOUBLE - 1.0) - 1.0,
                              c::DOUBLE - (c::DOUBLE - 1.0)
                                          * (c::DOUBLE - 1.0)
                                          / (n::DOUBLE - 1.0) - 1.0)),
                 6) AS cramers_v_corrected,
           ROUND(SQRT((chi2 / n::DOUBLE)
                      / SQRT((r::DOUBLE - 1.0) * (c::DOUBLE - 1.0))),
                 6) AS tschuprow_t,
           ROUND(SQRT(chi2 / (chi2 + n::DOUBLE)), 6) AS pearson_c
    FROM agg
"""

# m57: m47's fit/residual/ordering replay; sign-change and sign
# counts integer-exact, z algebra mirrored operation-for-operation.
ORACLE["m57_runs_test"] = """
    WITH s1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy
        FROM lineitem
    ),
    fit AS (
        SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
               (CAST(sy AS DOUBLE)
                - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
        FROM s1
    ),
    r AS (
        SELECT CASE WHEN l.l_extendedprice
                         - (f.a + f.b * l.l_quantity) > 0
                    THEN 1 ELSE 0 END AS s,
               l.l_shipdate, l.l_orderkey, l.l_linenumber
        FROM lineitem l CROSS JOIN fit f
    ),
    o AS (
        SELECT s,
               LAG(s) OVER (ORDER BY l_shipdate, l_orderkey,
                            l_linenumber) AS sp
        FROM r
    ),
    agg AS (
        SELECT COUNT(*) AS n,
               SUM(s) AS n_pos,
               SUM(CASE WHEN sp IS NOT NULL AND s <> sp
                        THEN 1 ELSE 0 END) AS changes
        FROM o
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n - n_pos AS BIGINT) AS n_neg,
           CAST(changes + 1 AS BIGINT) AS runs,
           CASE WHEN 2.0 * CAST(n_pos AS DOUBLE)
                        * CAST(n - n_pos AS DOUBLE)
                        * (2.0 * CAST(n_pos AS DOUBLE)
                           * CAST(n - n_pos AS DOUBLE)
                           - CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * (CAST(n AS DOUBLE) - 1.0)) > 0
                THEN ROUND((CAST(changes + 1 AS DOUBLE)
                            - (2.0 * CAST(n_pos AS DOUBLE)
                               * CAST(n - n_pos AS DOUBLE)
                               / CAST(n AS DOUBLE) + 1.0))
                           / SQRT(2.0 * CAST(n_pos AS DOUBLE)
                                  * CAST(n - n_pos AS DOUBLE)
                                  * (2.0 * CAST(n_pos AS DOUBLE)
                                     * CAST(n - n_pos AS DOUBLE)
                                     - CAST(n AS DOUBLE))
                                  / (CAST(n AS DOUBLE)
                                     * CAST(n AS DOUBLE)
                                     * (CAST(n AS DOUBLE) - 1.0))),
                           6)
           END AS z
    FROM agg
"""

# m58: one partkey equi-join + one conditional aggregate; sign
# counts integer-exact (double comparisons identical both engines),
# z algebra mirrored.
ORACLE["m58_sign_test"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN l_extendedprice / l_quantity
                             - p_retailprice > 0
                        THEN 1 ELSE 0 END) AS n_pos,
               SUM(CASE WHEN l_extendedprice / l_quantity
                             - p_retailprice < 0
                        THEN 1 ELSE 0 END) AS n_neg
        FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CASE WHEN CAST(n_pos + n_neg AS DOUBLE) > 0
                THEN ROUND(CAST(n_pos AS DOUBLE)
                           / CAST(n_pos + n_neg AS DOUBLE), 6)
           END AS frac_above,
           CASE WHEN CAST(n_pos + n_neg AS DOUBLE) > 0
                THEN ROUND((CAST(n_pos AS DOUBLE)
                            - CAST(n_pos + n_neg AS DOUBLE) / 2.0)
                           / SQRT(CAST(n_pos + n_neg AS DOUBLE)
                                  / 4.0), 6)
           END AS z
    FROM s
"""

# m59: exact-decimal monthly collapse, bounded-series pair fold,
# tie-corrected variance and continuity-corrected z mirrored.
ORACLE["m59_mann_kendall"] = """
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mon,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS rev
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT SUM(CASE WHEN b.rev > a.rev THEN 1
                        WHEN b.rev < a.rev THEN -1
                        ELSE 0 END) AS s_stat
        FROM m a JOIN m b ON a.mon < b.mon
    ),
    ties AS (
        SELECT SUM(t) AS n,
               SUM(t * (t - 1) * (2 * t + 5)) AS tt
        FROM (SELECT COUNT(*) AS t FROM m GROUP BY rev)
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(s_stat AS BIGINT) AS s_stat,
           CASE WHEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                      * (2.0 * CAST(n AS DOUBLE) + 5.0)
                      - CAST(tt AS DOUBLE)) / 18.0 > 0
                THEN ROUND((CAST(n AS DOUBLE)
                            * (CAST(n AS DOUBLE) - 1.0)
                            * (2.0 * CAST(n AS DOUBLE) + 5.0)
                            - CAST(tt AS DOUBLE)) / 18.0, 6)
           END AS var_s,
           CASE WHEN (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
                      * (2.0 * CAST(n AS DOUBLE) + 5.0)
                      - CAST(tt AS DOUBLE)) / 18.0 > 0
                THEN ROUND(CASE
                    WHEN s_stat > 0
                    THEN (CAST(s_stat AS DOUBLE) - 1.0)
                         / SQRT((CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0)
                                 * (2.0 * CAST(n AS DOUBLE) + 5.0)
                                 - CAST(tt AS DOUBLE)) / 18.0)
                    WHEN s_stat < 0
                    THEN (CAST(s_stat AS DOUBLE) + 1.0)
                         / SQRT((CAST(n AS DOUBLE)
                                 * (CAST(n AS DOUBLE) - 1.0)
                                 * (2.0 * CAST(n AS DOUBLE) + 5.0)
                                 - CAST(tt AS DOUBLE)) / 18.0)
                    ELSE 0.0 END, 6)
           END AS z
    FROM ties CROSS JOIN s
"""

# m60: hash_bucket's md5 parity replayed verbatim (the documented
# DuckDB form); chi2 via the constant-E identity on exact counts.
ORACLE["m60_hash_uniformity"] = """
    WITH g AS (
        SELECT CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 4) AS INTEGER) % 16 AS bucket,
               COUNT(*) AS o_cnt
        FROM orders GROUP BY 1
    ),
    agg AS (
        SELECT SUM(o_cnt) AS n, COUNT(*) AS k,
               MIN(o_cnt) AS mn, MAX(o_cnt) AS mx,
               SUM(o_cnt * o_cnt) AS so2
        FROM g
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS INTEGER) AS k_buckets,
           ROUND(CAST(mn AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS min_share,
           ROUND(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS max_share,
           CASE WHEN k = 16
                THEN ROUND(CAST(so2 AS DOUBLE)
                           / (CAST(n AS DOUBLE) / 16.0)
                           - CAST(n AS DOUBLE), 6)
           END AS chi2,
           CAST(15 AS INTEGER) AS df
    FROM agg
"""

# m61: x98's assignment/conversion replay; unpooled-SE TOST algebra
# mirrored operation-for-operation, zero SE -> NULL.
ORACLE["m61_tost_equivalence"] = """
    WITH pu AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS converted,
               CASE WHEN CAST('0x' || substr(
                              md5(CAST(user_id AS VARCHAR)), 1, 4)
                          AS INTEGER) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM events
        GROUP BY user_id
    ),
    w AS (
        SELECT SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
                   AS nc,
               SUM(CASE WHEN arm = 'control' THEN converted END)
                   AS xc,
               SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
                   AS nt,
               SUM(CASE WHEN arm = 'treatment' THEN converted END)
                   AS xt
        FROM pu
    ),
    st AS (
        SELECT CAST(nc AS BIGINT) AS n_control,
               CAST(nt AS BIGINT) AS n_treatment,
               CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE) AS pc,
               CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE) AS pt,
               SQRT((CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                    * (1.0 - CAST(xc AS DOUBLE) / CAST(nc AS DOUBLE))
                    / CAST(nc AS DOUBLE)
                    + (CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
                      * (1.0 - CAST(xt AS DOUBLE)
                               / CAST(nt AS DOUBLE))
                      / CAST(nt AS DOUBLE)) AS se
        FROM w
    )
    SELECT n_control, n_treatment,
           ROUND(pc, 6) AS rate_control,
           ROUND(pt, 6) AS rate_treatment,
           CASE WHEN se > 0
                THEN ROUND((pt - pc + 0.01) / se, 6) END AS z_lower,
           CASE WHEN se > 0
                THEN ROUND((pt - pc - 0.01) / se, 6) END AS z_upper,
           CASE WHEN se > 0
                THEN CAST(CASE WHEN (pt - pc + 0.01) / se > 1.645
                                AND (pt - pc - 0.01) / se < -1.645
                          THEN 1 ELSE 0 END AS INTEGER)
           END AS equivalent
    FROM st
"""

# m62: pairwise slopes collapsed onto the bounded (discount,
# quantity) grid; slope/residual weighted medians via the
# 2·cum ≥ W + parity selector (exact for both parities), HUGEINT
# weights mirror the engine's DECIMAL(38,0).
ORACLE["m62_theil_sen"] = """
    WITH cells AS (
        SELECT l_discount AS x, l_quantity AS y, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    pairs AS (
        SELECT (b.y - a.y) / (b.x - a.x) AS v,
               CAST(a.cnt AS HUGEINT) * b.cnt AS w
        FROM cells a JOIN cells b ON a.x < b.x
    ),
    g AS (SELECT v, SUM(w) AS w FROM pairs GROUP BY v),
    c AS (
        SELECT v,
               SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER () AS t
        FROM g
    ),
    sm AS (
        SELECT MAX(t) AS w_total,
               (MIN(CASE WHEN 2 * c >= t + (t % 2) THEN v END)
                + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN v END))
               / 2.0 AS beta
        FROM c
    ),
    r AS (
        SELECT (cells.y - sm.beta * cells.x) AS v,
               CAST(cells.cnt AS HUGEINT) AS w
        FROM cells, sm
    ),
    rg AS (SELECT v, SUM(w) AS w FROM r GROUP BY v),
    rc AS (
        SELECT v,
               SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER () AS t
        FROM rg
    ),
    im AS (
        SELECT (MIN(CASE WHEN 2 * c >= t + (t % 2) THEN v END)
                + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN v END))
               / 2.0 AS intercept
        FROM rc
    )
    SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM cells) AS n,
           CAST(sm.w_total AS DOUBLE) AS n_pairs,
           ROUND(sm.beta, 6) AS slope,
           ROUND(im.intercept, 6) AS intercept
    FROM sm, im
"""

# m63: Walsh averages on the 50-value quantity grid — cross pairs
# weigh cnt_a*cnt_b, same-value pairs cnt*(cnt+1)/2 (i <= j); same
# weighted-median selector as m62.
ORACLE["m63_hodges_lehmann"] = """
    WITH cells AS (
        SELECT l_quantity AS v, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    ),
    walsh AS (
        SELECT (a.v + b.v) / 2.0 AS v,
               CAST(a.cnt AS HUGEINT) * b.cnt AS w
        FROM cells a JOIN cells b ON a.v < b.v
        UNION ALL
        SELECT v, CAST(cnt AS HUGEINT) * (cnt + 1) // 2 AS w
        FROM cells
    ),
    g AS (SELECT v, SUM(w) AS w FROM walsh GROUP BY v),
    c AS (
        SELECT v,
               SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER () AS t
        FROM g
    )
    SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM cells) AS n,
           CAST(MAX(t) AS DOUBLE) AS n_walsh_pairs,
           ROUND((MIN(CASE WHEN 2 * c >= t + (t % 2) THEN v END)
                  + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN v END))
                 / 2.0, 6) AS hl_estimate
    FROM c
"""

# m64: inner per-anchor-cell weighted medians (window PARTITIONed by
# the anchor), outer weighted median over the cell medians, the same
# 2*cum >= W + parity selector as m62 at both layers.
ORACLE["m64_siegel_slope"] = """
    WITH cells AS (
        SELECT l_discount AS x, l_quantity AS y, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.x AS ax, a.y AS ay, a.cnt AS an,
               (b.y - a.y) / (b.x - a.x) AS s,
               SUM(CAST(b.cnt AS HUGEINT)) AS w
        FROM cells a JOIN cells b ON a.x <> b.x
        GROUP BY 1, 2, 3, 4
    ),
    c AS (
        SELECT ax, ay, an, s,
               SUM(w) OVER (PARTITION BY ax, ay ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER (PARTITION BY ax, ay) AS t
        FROM slopes
    ),
    inner_med AS (
        SELECT ax, ay, an,
               (MIN(CASE WHEN 2 * c >= t + (t % 2) THEN s END)
                + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN s END))
               / 2.0 AS med_i
        FROM c GROUP BY ax, ay, an
    ),
    og AS (
        SELECT med_i AS v, SUM(CAST(an AS HUGEINT)) AS w
        FROM inner_med GROUP BY med_i
    ),
    oc AS (
        SELECT v,
               SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER () AS t
        FROM og
    ),
    sm AS (
        SELECT (MIN(CASE WHEN 2 * c >= t + (t % 2) THEN v END)
                + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN v END))
               / 2.0 AS beta
        FROM oc
    ),
    r AS (
        SELECT (cells.y - sm.beta * cells.x) AS v,
               CAST(cells.cnt AS HUGEINT) AS w
        FROM cells, sm
    ),
    rg AS (SELECT v, SUM(w) AS w FROM r GROUP BY v),
    rc AS (
        SELECT v,
               SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
               SUM(w) OVER () AS t
        FROM rg
    ),
    im AS (
        SELECT (MIN(CASE WHEN 2 * c >= t + (t % 2) THEN v END)
                + MIN(CASE WHEN 2 * c >= t + 2 - (t % 2) THEN v END))
               / 2.0 AS intercept
        FROM rc
    )
    SELECT (SELECT CAST(SUM(cnt) AS BIGINT) FROM cells) AS n,
           ROUND(sm.beta, 6) + 0.0 AS slope,
           ROUND(im.intercept, 6) + 0.0 AS intercept
    FROM sm, im
"""

# m65: one exact-decimal sufficient-stats scan; population
# variance/covariance and the alpha algebra mirrored
# operation-for-operation.
ORACLE["m65_cronbach_alpha"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS s0,
               SUM(CAST(l_discount AS DECIMAL(18,6))) AS s1,
               SUM(CAST(l_tax AS DECIMAL(18,6))) AS s2,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS q0,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS q1,
               SUM(CAST(l_tax AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS q2,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS p01,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS p02,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_tax AS DECIMAL(28,6))) AS p12
        FROM lineitem
    ),
    v AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(q0 AS DOUBLE) / CAST(n AS DOUBLE)
                 - POW(CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE), 2)
                   AS v0,
               CAST(q1 AS DOUBLE) / CAST(n AS DOUBLE)
                 - POW(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 2)
                   AS v1,
               CAST(q2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - POW(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE), 2)
                   AS v2,
               CAST(p01 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS c01,
               CAST(p02 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c02,
               CAST(p12 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c12
        FROM s
    )
    SELECT n,
           CAST(3 AS INTEGER) AS k,
           CASE WHEN (v0 + v1 + v2) + 2.0 * (c01 + c02 + c12) > 0
                THEN ROUND((3.0 / 2.0)
                           * (1.0 - (v0 + v1 + v2)
                              / ((v0 + v1 + v2)
                                 + 2.0 * (c01 + c02 + c12))), 6)
           END AS alpha,
           ROUND((c01 / SQRT(v0 * v1) + c02 / SQRT(v0 * v2)
                  + c12 / SQRT(v1 * v2)) / 3.0, 6)
               AS avg_inter_item_corr
    FROM v
"""

# m66: the m44 two-scan shape — exact-decimal fit + per-row
# residual/leverage scoring; the top-15 selection orders by the
# UNROUNDED D (identical IEEE expression both engines) with key
# tiebreaks.
ORACLE["m66_cooks_distance"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS sxy,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS syy
        FROM lineitem
    ),
    fit AS (
        SELECT CAST(n AS DOUBLE) AS fn,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
               (CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                  / CAST(n AS DOUBLE))
               / (CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS b,
               CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   / CAST(n AS DOUBLE) AS sxx_c,
               CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS sxy_c,
               CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS syy_c,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        FROM s
    ),
    f2 AS (
        SELECT fn, xbar, b, sxx_c,
               ybar - b * xbar AS a,
               (syy_c - b * sxy_c) / (fn - 2.0) AS s2
        FROM fit
    ),
    scored AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS x,
               CAST(l_extendedprice AS DOUBLE) AS y,
               1.0 / fn + POW(CAST(l_quantity AS DOUBLE) - xbar, 2)
                          / sxx_c AS h,
               CAST(l_extendedprice AS DOUBLE)
                 - (a + b * CAST(l_quantity AS DOUBLE)) AS e,
               s2
        FROM lineitem, f2
    )
    SELECT l_orderkey, l_linenumber, x, y,
           ROUND(h, 6) AS leverage,
           ROUND((e * e * h) / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
               AS cooks_d
    FROM scored
    ORDER BY (e * e * h) / (2.0 * s2 * (1.0 - h) * (1.0 - h)) DESC,
             l_orderkey, l_linenumber
    LIMIT 15
"""

# m67: one exact-decimal sufficient-stats scan; the 3x3 covariance
# inverse via adjugate/det and the quadratic form mirrored term-for-
# term (same left-to-right sum order); top-15 ordered by the
# UNROUNDED d2 with key tiebreaks.
ORACLE["m67_mahalanobis_outliers"] = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS s0,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS s1,
               SUM(CAST(l_discount AS DECIMAL(18,6))) AS s2,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_quantity AS DECIMAL(28,6))) AS p00,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS p01,
               SUM(CAST(l_quantity AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS p02,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                   * CAST(l_extendedprice AS DECIMAL(28,6))) AS p11,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS p12,
               SUM(CAST(l_discount AS DECIMAL(28,6))
                   * CAST(l_discount AS DECIMAL(28,6))) AS p22
        FROM lineitem
    ),
    c AS (
        SELECT CAST(n AS DOUBLE) AS fn,
               CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS m0,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2,
               CAST(p00 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE)) AS c00,
               CAST(p01 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS c01,
               CAST(p02 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c02,
               CAST(p11 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS c11,
               CAST(p12 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c12,
               CAST(p22 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) AS c22
        FROM s
    ),
    dt AS (
        SELECT *,
               c00 * (c11 * c22 - c12 * c12)
               - c01 * (c01 * c22 - c12 * c02)
               + c02 * (c01 * c12 - c11 * c02) AS det
        FROM c
    ),
    inv AS (
        SELECT fn, m0, m1, m2,
               (c11 * c22 - c12 * c12) / det AS i00,
               (c02 * c12 - c01 * c22) / det AS i01,
               (c01 * c12 - c02 * c11) / det AS i02,
               (c00 * c22 - c02 * c02) / det AS i11,
               (c02 * c01 - c00 * c12) / det AS i12,
               (c00 * c11 - c01 * c01) / det AS i22
        FROM dt
    ),
    scored AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS x1,
               CAST(l_extendedprice AS DOUBLE) AS x2,
               CAST(l_discount AS DOUBLE) AS x3,
               (CAST(l_quantity AS DOUBLE) - m0)
                 * (CAST(l_quantity AS DOUBLE) - m0) * i00
               + (CAST(l_extendedprice AS DOUBLE) - m1)
                 * (CAST(l_extendedprice AS DOUBLE) - m1) * i11
               + (CAST(l_discount AS DOUBLE) - m2)
                 * (CAST(l_discount AS DOUBLE) - m2) * i22
               + 2.0 * (CAST(l_quantity AS DOUBLE) - m0)
                 * (CAST(l_extendedprice AS DOUBLE) - m1) * i01
               + 2.0 * (CAST(l_quantity AS DOUBLE) - m0)
                 * (CAST(l_discount AS DOUBLE) - m2) * i02
               + 2.0 * (CAST(l_extendedprice AS DOUBLE) - m1)
                 * (CAST(l_discount AS DOUBLE) - m2) * i12
                   AS d2
        FROM lineitem, inv
    )
    SELECT l_orderkey, l_linenumber, x1, x2, x3,
           ROUND(d2, 6) AS d2
    FROM scored
    ORDER BY d2 DESC, l_orderkey, l_linenumber
    LIMIT 15
"""

# m68: identical integer-exact pipeline — x scaled x100, slopes and
# residuals x2520 (lcm of the x-gaps), pinball x4 — so the candidate
# objectives and the (obj4, s) argmin replay bit-identically; the only
# doubles are the final display divisions.
ORACLE["m68_pinball_regression"] = """
    WITH cells AS (
        SELECT CAST(ROUND(l_discount * 100) AS INT) AS x,
               CAST(l_quantity AS INT) AS y,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    ),
    wtot AS (SELECT SUM(cnt) AS w_all FROM cells),
    dx AS (
        SELECT DISTINCT b.x - a.x AS dx
        FROM (SELECT DISTINCT x FROM cells) a
        JOIN (SELECT DISTINCT x FROM cells) b ON a.x < b.x
    ),
    dy AS (
        SELECT DISTINCT b.y - a.y AS dy
        FROM (SELECT DISTINCT y FROM cells) a
        JOIN (SELECT DISTINCT y FROM cells) b ON TRUE
    ),
    cand AS (
        SELECT DISTINCT CAST(dy AS BIGINT) * 2520 // dx AS s
        FROM dy CROSS JOIN dx
    ),
    r AS (
        SELECT s, CAST(y AS BIGINT) * 2520 - s * x AS resid,
               SUM(cnt) AS w
        FROM cand CROSS JOIN cells
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT s, resid, w,
               SUM(w) OVER (
                   PARTITION BY s ORDER BY resid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cumw
        FROM r
    ),
    a_star AS (
        SELECT c.s, t.q4, MIN(c.resid) AS a4
        FROM cum c
        CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS q4) t
        CROSS JOIN wtot
        WHERE c.cumw >= (t.q4 * w_all + 3) // 4
        GROUP BY c.s, t.q4
    ),
    obj AS (
        SELECT a.s, a.q4, a.a4,
               SUM(r.w * CASE WHEN r.resid > a.a4
                              THEN a.q4 * (r.resid - a.a4)
                              ELSE (4 - a.q4) * (a.a4 - r.resid)
                         END) AS obj4
        FROM a_star a JOIN r ON r.s = a.s
        GROUP BY a.s, a.q4, a.a4
    ),
    best AS (
        SELECT s, q4, a4, obj4 FROM (
            SELECT s, q4, a4, obj4,
                   ROW_NUMBER() OVER (
                       PARTITION BY q4 ORDER BY obj4, s
                   ) AS rn
            FROM obj
        ) WHERE rn = 1
    )
    SELECT q4 / 4.0 AS tau,
           CAST(w_all AS BIGINT) AS n,
           ROUND(s * 100.0 / 2520, 6) AS slope,
           ROUND(a4 / 2520.0, 6) AS intercept,
           ROUND(obj4 / (4.0 * 2520 * w_all), 6) AS avg_pinball
    FROM best CROSS JOIN wtot
    ORDER BY tau
"""

# m69: identical exact pipeline — integer-cent bins, grid pair slopes
# as doubles (same IEEE ops both engines), DECIMAL pair weights, the
# K-shifted lower/upper order statistics picked by cumulative-weight
# thresholds, arithmetic mid-mean convention; intercept = the shared
# lower/upper weighted-median rule on y - b*x.
ORACLE["m69_passing_bablok"] = """
    WITH osums AS (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   AS cents
        FROM lineitem GROUP BY 1
    ),
    pts AS (
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT) // 2000000
                   AS x,
               s.cents // 2000000 AS y
        FROM orders o JOIN osums s ON o.o_orderkey = s.l_orderkey
    ),
    cells AS (
        SELECT x, y, COUNT(*) AS cnt FROM pts GROUP BY 1, 2
    ),
    pairs AS (
        SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS s,
               CAST(a.cnt AS DECIMAL(38,0))
                   * CAST(b.cnt AS DECIMAL(38,0)) AS w
        FROM cells a JOIN cells b ON a.x < b.x
    ),
    kept AS (SELECT s, w FROM pairs WHERE s <> -1.0),
    tot AS (
        SELECT SUM(w) AS n_pairs,
               SUM(CASE WHEN s < -1.0 THEN w
                        ELSE CAST(0 AS DECIMAL(38,0)) END) AS k
        FROM kept
    ),
    sv AS (SELECT s, SUM(w) AS w FROM kept GROUP BY s),
    cum AS (
        SELECT s,
               SUM(w) OVER (ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM sv
    ),
    beta AS (
        SELECT (MIN(CASE WHEN cum >= (n_pairs - n_pairs % 2) / 2
                                      + k + n_pairs % 2
                         THEN s END)
                + MIN(CASE WHEN cum >= (n_pairs - n_pairs % 2) / 2
                                        + k + 1
                           THEN s END)) / 2.0 AS beta
        FROM cum, tot
    ),
    resid AS (
        SELECT c.y - b.beta * c.x AS r,
               CAST(c.cnt AS DECIMAL(38,0)) AS w
        FROM cells c, beta b
    ),
    rv AS (SELECT r, SUM(w) AS w FROM resid GROUP BY r),
    rcum AS (
        SELECT r,
               SUM(w) OVER (ORDER BY r
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               SUM(w) OVER () AS t
        FROM rv
    ),
    inter AS (
        SELECT (MIN(CASE WHEN 2 * cum >= t + t % 2 THEN r END)
                + MIN(CASE WHEN 2 * cum >= t + 2 - t % 2 THEN r END))
               / 2.0 AS intercept
        FROM rcum
    ),
    nrow AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells)
    SELECT n,
           CAST(n_pairs AS DOUBLE) AS n_pairs,
           CAST(k AS DOUBLE) AS k_shift,
           ROUND(beta, 6) AS slope,
           ROUND(intercept, 6) AS intercept
    FROM nrow, tot, beta, inter
"""

# m70: the m50 exact-decimal sufficient-stat algebra unrolled for
# r = 3 removals — each iteration's (mean, sd) comes from the updated
# (n, Σx, Σx²), the argmax is picked from the top-3 ∪ bottom-3
# candidate pool with the same (dev DESC, value DESC, side, rank)
# tiebreaks, and the removed value is subtracted exactly.
ORACLE["m70_generalized_esd"] = """
    WITH s0 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sx,
               SUM(CAST(o_totalprice AS DECIMAL(28,6))
                   * CAST(o_totalprice AS DECIMAL(28,6))) AS sxx
        FROM orders
    ),
    hi AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS x,
               CAST(o_totalprice AS DOUBLE) AS xd,
               'hi' AS side,
               ROW_NUMBER() OVER (ORDER BY o_totalprice DESC) AS rn
        FROM orders ORDER BY o_totalprice DESC LIMIT 3
    ),
    lo AS (
        SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS x,
               CAST(o_totalprice AS DOUBLE) AS xd,
               'lo' AS side,
               ROW_NUMBER() OVER (ORDER BY o_totalprice ASC) AS rn
        FROM orders ORDER BY o_totalprice ASC LIMIT 3
    ),
    ext AS (SELECT * FROM hi UNION ALL SELECT * FROM lo),
    p1 AS (
        SELECT e.*, s0.n, s0.sx, s0.sxx,
               CAST(s0.sx AS DOUBLE) / CAST(s0.n AS DOUBLE) AS mean,
               SQRT((CAST(s0.sxx AS DOUBLE)
                     - CAST(s0.sx AS DOUBLE) * CAST(s0.sx AS DOUBLE)
                       / CAST(s0.n AS DOUBLE))
                    / (CAST(s0.n AS DOUBLE) - 1.0)) AS sd
        FROM ext e, s0
        ORDER BY ABS(e.xd - CAST(s0.sx AS DOUBLE)
                     / CAST(s0.n AS DOUBLE))
                 / SQRT((CAST(s0.sxx AS DOUBLE)
                         - CAST(s0.sx AS DOUBLE)
                           * CAST(s0.sx AS DOUBLE)
                           / CAST(s0.n AS DOUBLE))
                        / (CAST(s0.n AS DOUBLE) - 1.0)) DESC,
                 e.xd DESC, e.side, e.rn
        LIMIT 1
    ),
    s1 AS (
        SELECT s0.n - 1 AS n, s0.sx - p1.x AS sx,
               s0.sxx - CAST(p1.x AS DECIMAL(28,6))
                        * CAST(p1.x AS DECIMAL(28,6)) AS sxx
        FROM s0, p1
    ),
    p2 AS (
        SELECT e.*, s1.n, s1.sx, s1.sxx,
               CAST(s1.sx AS DOUBLE) / CAST(s1.n AS DOUBLE) AS mean,
               SQRT((CAST(s1.sxx AS DOUBLE)
                     - CAST(s1.sx AS DOUBLE) * CAST(s1.sx AS DOUBLE)
                       / CAST(s1.n AS DOUBLE))
                    / (CAST(s1.n AS DOUBLE) - 1.0)) AS sd
        FROM ext e, s1, p1
        WHERE NOT (e.side = p1.side AND e.rn = p1.rn)
        ORDER BY ABS(e.xd - CAST(s1.sx AS DOUBLE)
                     / CAST(s1.n AS DOUBLE))
                 / SQRT((CAST(s1.sxx AS DOUBLE)
                         - CAST(s1.sx AS DOUBLE)
                           * CAST(s1.sx AS DOUBLE)
                           / CAST(s1.n AS DOUBLE))
                        / (CAST(s1.n AS DOUBLE) - 1.0)) DESC,
                 e.xd DESC, e.side, e.rn
        LIMIT 1
    ),
    s2 AS (
        SELECT s1.n - 1 AS n, s1.sx - p2.x AS sx,
               s1.sxx - CAST(p2.x AS DECIMAL(28,6))
                        * CAST(p2.x AS DECIMAL(28,6)) AS sxx
        FROM s1, p2
    ),
    p3 AS (
        SELECT e.*, s2.n, s2.sx, s2.sxx,
               CAST(s2.sx AS DOUBLE) / CAST(s2.n AS DOUBLE) AS mean,
               SQRT((CAST(s2.sxx AS DOUBLE)
                     - CAST(s2.sx AS DOUBLE) * CAST(s2.sx AS DOUBLE)
                       / CAST(s2.n AS DOUBLE))
                    / (CAST(s2.n AS DOUBLE) - 1.0)) AS sd
        FROM ext e, s2, p1, p2
        WHERE NOT (e.side = p1.side AND e.rn = p1.rn)
          AND NOT (e.side = p2.side AND e.rn = p2.rn)
        ORDER BY ABS(e.xd - CAST(s2.sx AS DOUBLE)
                     / CAST(s2.n AS DOUBLE))
                 / SQRT((CAST(s2.sxx AS DOUBLE)
                         - CAST(s2.sx AS DOUBLE)
                           * CAST(s2.sx AS DOUBLE)
                           / CAST(s2.n AS DOUBLE))
                        / (CAST(s2.n AS DOUBLE) - 1.0)) DESC,
                 e.xd DESC, e.side, e.rn
        LIMIT 1
    )
    SELECT CAST(1 AS INTEGER) AS iter, CAST(n AS BIGINT) AS n_used,
           ROUND(mean, 6) AS mean, ROUND(sd, 6) AS sd,
           ROUND(ABS(xd - mean) / sd, 6) AS r_stat,
           ROUND(xd, 6) AS removed_value, side
    FROM p1
    UNION ALL
    SELECT CAST(2 AS INTEGER), CAST(n AS BIGINT),
           ROUND(mean, 6), ROUND(sd, 6),
           ROUND(ABS(xd - mean) / sd, 6), ROUND(xd, 6), side
    FROM p2
    UNION ALL
    SELECT CAST(3 AS INTEGER), CAST(n AS BIGINT),
           ROUND(mean, 6), ROUND(sd, 6),
           ROUND(ABS(xd - mean) / sd, 6), ROUND(xd, 6), side
    FROM p3
    ORDER BY iter
"""

# m71: order-statistic gap ratios from two 2-row sort-limits; pure
# double subtract/divide, bit-replayable; zero range -> NULL.
ORACLE["m71_dixon_q"] = """
    WITH nn AS (SELECT COUNT(*) AS n FROM orders),
    hi AS (
        SELECT MAX(x) AS x_max, MIN(x) AS x2_max FROM (
            SELECT CAST(o_totalprice AS DOUBLE) AS x
            FROM orders ORDER BY x DESC LIMIT 2
        )
    ),
    lo AS (
        SELECT MIN(x) AS x_min, MAX(x) AS x2_min FROM (
            SELECT CAST(o_totalprice AS DOUBLE) AS x
            FROM orders ORDER BY x ASC LIMIT 2
        )
    )
    SELECT CAST(nn.n AS BIGINT) AS n,
           ROUND(lo.x_min, 6) AS x_min,
           ROUND(lo.x2_min, 6) AS x2_min,
           ROUND(hi.x2_max, 6) AS x2_max,
           ROUND(hi.x_max, 6) AS x_max,
           CASE WHEN hi.x_max - lo.x_min > 0
                THEN ROUND((lo.x2_min - lo.x_min)
                           / (hi.x_max - lo.x_min), 6) END AS q_min,
           CASE WHEN hi.x_max - lo.x_min > 0
                THEN ROUND((hi.x_max - hi.x2_max)
                           / (hi.x_max - lo.x_min), 6) END AS q_max,
           CASE WHEN hi.x_max - lo.x_min > 0
                THEN CASE WHEN (hi.x_max - hi.x2_max)
                               / (hi.x_max - lo.x_min)
                              >= (lo.x2_min - lo.x_min)
                                 / (hi.x_max - lo.x_min)
                          THEN 'max' ELSE 'min' END
           END AS flagged_side
    FROM hi, lo, nn
"""

# m72: bounds from two 3-row sort-limits (middle of 3 = sum − min −
# max), then one clamped exact-decimal fold; every operand mirrored.
ORACLE["m72_winsorized_stats"] = """
    WITH lo3 AS (
        SELECT MIN(x) AS x1, SUM(x) - MIN(x) - MAX(x) AS x2,
               MAX(x) AS lo_b
        FROM (SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS x
              FROM orders ORDER BY x ASC LIMIT 3)
    ),
    hi3 AS (
        SELECT MAX(x) AS xn, SUM(x) - MIN(x) - MAX(x) AS xn1,
               MIN(x) AS hi_b
        FROM (SELECT CAST(o_totalprice AS DECIMAL(18,6)) AS x
              FROM orders ORDER BY x DESC LIMIT 3)
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sx,
               SUM(LEAST(GREATEST(
                   CAST(o_totalprice AS DECIMAL(18,6)), lo3.lo_b),
                   hi3.hi_b)) AS sw,
               SUM(CAST(LEAST(GREATEST(
                       CAST(o_totalprice AS DECIMAL(18,6)), lo3.lo_b),
                       hi3.hi_b) AS DECIMAL(28,6))
                   * CAST(LEAST(GREATEST(
                       CAST(o_totalprice AS DECIMAL(18,6)), lo3.lo_b),
                       hi3.hi_b) AS DECIMAL(28,6))) AS sww,
               ANY_VALUE(lo3.x1) AS x1, ANY_VALUE(lo3.x2) AS x2,
               ANY_VALUE(hi3.xn1) AS xn1, ANY_VALUE(hi3.xn) AS xn,
               ANY_VALUE(lo3.lo_b) AS lo_b,
               ANY_VALUE(hi3.hi_b) AS hi_b
        FROM orders, lo3, hi3
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(CAST(lo_b AS DOUBLE), 6) AS lo_bound,
           ROUND(CAST(hi_b AS DOUBLE), 6) AS hi_bound,
           ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS raw_mean,
           ROUND(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS winsor_mean,
           ROUND(SQRT((CAST(sww AS DOUBLE)
                       - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0)), 6) AS winsor_sd,
           ROUND(CAST(sx - x1 - x2 - xn1 - xn AS DOUBLE)
                 / (CAST(n AS DOUBLE) - 4.0), 6) AS trimmed_mean
    FROM s
"""

# m73: the 2xk chi-square replayed from the same two scans — DuckDB
# MEDIAN is the interpolated percentile(0.5); ties at the median land
# in the not-above arm in both engines (strict > above).
ORACLE["m73_moods_median"] = """
    WITH med AS (SELECT MEDIAN(value) AS med FROM events),
    cells AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CASE WHEN value > med THEN 1 ELSE 0 END) AS n_above
        FROM events, med GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(n) AS tn, SUM(n_above) AS ta, COUNT(*) AS k
        FROM cells
    ),
    terms AS (
        SELECT c.event_type, c.n, c.n_above, t.k,
               CAST(c.n AS DOUBLE)
                   * (CAST(t.ta AS DOUBLE) / CAST(t.tn AS DOUBLE))
                   AS e_above,
               CAST(c.n AS DOUBLE)
                   * (1.0 - CAST(t.ta AS DOUBLE) / CAST(t.tn AS DOUBLE))
                   AS e_not
        FROM cells c, tot t
    ),
    chi AS (
        SELECT ROUND(SUM(
                   (CAST(n_above AS DOUBLE) - e_above)
                   * (CAST(n_above AS DOUBLE) - e_above) / e_above
                 + (CAST(n - n_above AS DOUBLE) - e_not)
                   * (CAST(n - n_above AS DOUBLE) - e_not) / e_not
               ), 4) AS chi2,
               CAST(MAX(k) - 1 AS BIGINT) AS df
        FROM terms
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n_above AS BIGINT) AS n_above,
           CAST(n - n_above AS BIGINT) AS n_not_above,
           ROUND(e_above, 6) AS expected_above,
           chi.chi2 AS chi2, chi.df AS df
    FROM terms, chi ORDER BY event_type
"""

# m74: the exact-decimal sufficient stats and the double algebra
# mirrored term-for-term; the within-LoA count compares the same
# exact integer differences to the same bit-identical double bounds.
ORACLE["m74_bland_altman"] = """
    WITH pairs AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
               - s._cents AS d
        FROM orders
        JOIN (SELECT l_orderkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                         AS _cents
              FROM lineitem GROUP BY l_orderkey) s
          ON o_orderkey = s.l_orderkey
    ),
    s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(d AS DECIMAL(28,0))) AS sd_,
               SUM(CAST(d AS DECIMAL(28,0))
                   * CAST(d AS DECIMAL(28,0))) AS sdd
        FROM pairs
    ),
    b AS (
        SELECT n,
               CAST(sd_ AS DOUBLE) / CAST(n AS DOUBLE) AS bias,
               SQRT((CAST(sdd AS DOUBLE)
                     - CAST(sd_ AS DOUBLE) * CAST(sd_ AS DOUBLE)
                       / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0)) AS sd
        FROM s
    ),
    bounds AS (
        SELECT n, bias, sd,
               bias - 1.96 * sd AS lo,
               bias + 1.96 * sd AS hi
        FROM b
    ),
    w AS (
        SELECT SUM(CASE WHEN CAST(d AS DOUBLE) >= lo
                         AND CAST(d AS DOUBLE) <= hi
                        THEN 1 ELSE 0 END) AS n_within
        FROM pairs, bounds
    )
    SELECT CAST(bounds.n AS BIGINT) AS n_pairs,
           ROUND(bias, 6) AS bias_cents,
           ROUND(sd, 6) AS sd_cents,
           ROUND(lo, 6) AS loa_low,
           ROUND(hi, 6) AS loa_high,
           CAST(n_within AS BIGINT) AS n_within,
           ROUND(CAST(n_within AS DOUBLE)
                 / CAST(bounds.n AS DOUBLE), 6) AS frac_within
    FROM bounds, w
"""
