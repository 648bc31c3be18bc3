"""Physical-plan regression tests: the optimizations we rely on at
100 TB must stay in the plan (pushdown, pruning, broadcast, partial
aggregation, no accidental cartesian products)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dislib_spark.queries import all_queries
from tests.conftest import SF_SMOKE

# queries whose non-equi/broadcast-nested-loop joins are intentional
_BNLJ_OK = {
    "m04_knn_classify",
    "m08_dbscan_core_count",  # 3^d halo offsets: tiny broadcast replication
    "m54_kendall_tau",  # cell-pair join over the bounded 50x7 value grid
    "m59_mann_kendall",  # pair fold over the bounded monthly series
    "v01_cosine_topk",
    "v08_mips_topk",  # broadcast query set vs corpus scan, like v01
    "v25_mutual_knn",  # broadcast 100-vector slice pair scoring, like v01
    "v26_stratified_cell_sample",  # 16-row broadcast of IVF centers, like v04
    "v04_ivf_topk",
    "v10_ivf_stored_index",  # 16-row broadcast of the IVF centers, like v04
    "x02_set_ops",
    "x07_range_join",
    "x14_hll_distinct",  # 1-row broadcast of the merged-total scalar
    "t16_tfidf_topk",  # 1-row broadcast of the corpus doc count
    "t17_bm25",  # 1-row broadcast of corpus (N, avgdl) stats
    "t23_lm_score",  # 1-row broadcast of the corpus token total
    "t69_quality_lm_agreement",  # same 1-row LM-total broadcast as t23
    "m15_cv_ols",  # 1-row broadcast of the total sufficient stats
    "t31_token_mi",  # |classes|-row + 1-row marginal broadcasts
    "t32_source_drift",  # |groups|-row + 1-row marginal broadcasts
    "t33_bigram_lm",  # 1-row broadcast of the corpus token total
    "t38_pmi_collocations",  # 1-row broadcast of the bigram total
    "x17_bloom_semi_join",  # 1-row broadcast of the bloom bit array
    "v06_pq_topk",  # broadcast of the tiny query set vs PQ codes
    "t34_dsir_select",  # 1-row broadcast of the (N_raw, N_tgt, V) totals
    "v09_hybrid_rrf",  # v01-style broadcast query vec + t17 1-row stats
    "x46_gapfill",  # day-spine × type cross join: both dimension-sized
    "m13_nb_confusion",  # |classes|-row class-stats broadcast per doc
    "m32_macro_f1",  # same _nb_pred |classes|-row broadcast as m13
    "x70_acf",  # 1-row broadcast of mu, then of the Σd² denominator
    "x71_cusum",  # 1-row broadcast of mu onto the |days| rollup
    "v12_mmr_rerank",  # v01-style broadcast query set feeding the MMR pool
    "v13_hard_negatives",  # broadcast query set vs corpus scan, like v01
    "t42_temperature_sample",  # 1-row broadcast of the (Σmass, Σn) totals
    "s08_decayed_hitters",  # 1-row broadcast of the decay reference hour
    "x60_quality_checks",  # 1-row broadcast of the FK-orphan count
    "x19_ntile",  # 1-row broadcast of the total row count
    "x48_skew_profile",  # 1-row broadcast of the top-k count scalar
    "m25_lift_rules",  # 1-row broadcast of the basket-total scalar
    "v14_sq8_error",  # 1-row broadcast of the SQ8 min/max stats
    "v15_hamming_topk",  # broadcast query codes vs corpus scan, like v01
    "x65_scd2",  # 3-row probe list broadcast against the interval table
    "m26_woe_iv",  # 1-row broadcast of the class totals
    "t46_burstiness",  # 1-row broadcast of the corpus doc-count scalar
    "x74_histogram_quantiles",  # 1-row broadcast of the (lo, hi) bounds
    "v18_ann_recall",  # v01/v03/v04 broadcast query sets, like v01
    "v19_quant_recall",  # v01/v06/v15 broadcast query sets, like v01
    "m39_kruskal_wallis",  # 1-row broadcasts of the N total and tie sum
    "x79_abc_pareto",  # 1-row broadcast of the total-revenue scalar
    "x77_freshness_audit",  # 1-row broadcast of the corpus watermark
    "m36_decile_lift",  # 1-row broadcast of the total row count (x19 shape)
    "m37_psi",  # 1-row broadcast of the (lo, hi) bin bounds
    "t51_idf_simhash",  # 1-row broadcast of the corpus doc count (idf)
    "x80_growth_accounting",  # 1-row broadcast of the max observed week
    "m40_isotonic_calibration",  # B<=16-row minimax joins on the binned frame
    "v21_filtered_ann",  # broadcast query set / centers, the v01/v04 shape
    "x82_stride_quantiles",  # 1-row broadcasts of (n, rows) and the bound
    "v22_ivf_cell_balance",  # 16-row centers + 1-row total broadcasts
    "v23_probe_recall_curve",  # broadcast centers/probes + 1-row nq (v04 shape)
    "m44_breusch_pagan",  # 1-row broadcast of the fitted (a, b) onto the scan
    "m45_jarque_bera",  # same 1-row fit broadcast as m44
    "x90_retention_triangle",  # 1-row broadcast of the max-week horizon
    "x88_sketch_table",  # 1-row broadcasts of the merged totals and bound (x82 shape)
    "v24_ivf_index_maintenance",  # broadcast centers/probes, the v04/v10 shape
    "m47_durbin_watson",  # 1-row fit + 1-row diff-sum broadcasts (m44 shape)
    "m57_runs_test",  # 1-row fit + 1-row change-count broadcasts (m47 shape)
    "x94_time_to_convert",  # 1-row broadcast of the viewer total for shares
    "m49_welch_anova",  # 1-row grand-mean + guard broadcasts onto the k-row frame
    "m62_theil_sen",  # cell-pair join over the bounded 11x50 grid (m54 shape)
    "m63_hodges_lehmann",  # Walsh-pair join over the bounded 50-value grid
    "m64_siegel_slope",  # same bounded grid pair join as m62, twice-medianed
    "t71_length_quality_calibration",  # 1-row broadcast of n (the x19/m36 shape)
    "x100_bitemporal_audit",  # 3-row broadcast probe interval join (x65 shape)
    "m66_cooks_distance",  # 1-row broadcast of the fitted (a, b, s2) stats
    "m67_mahalanobis_outliers",  # 1-row broadcast of the (mu, Sigma^-1) stats
    "x103_forgotten_users",  # 1-row broadcasts of the erased/residual totals
    "s16_streaming_erasure",  # same 1-row erased/residual total broadcasts as x103
    "x105_erasure_propagation",  # 1-row broadcast of the stale-group count
    "x107_retention_plan",  # 1-row broadcast of the watermark (max day)
    "t76_dedup_threshold_curve",  # 1-row broadcasts of per-threshold summary aggs
    "v30_maintained_recall",  # broadcast centers/probes/queries, the v04/v24 shape
    "v31_ivfpq_topk",  # broadcast 16-row centers + 5-query probe/ADC tables
    "v32_ivfpq_recall",  # v31's broadcasts + v01's broadcast query set
    "m68_pinball_regression",  # <=990 candidate slopes x bounded 11x50 grid (m62 shape)
    "m69_passing_bablok",  # cell-pair join over the bounded $20k-bin grid (m62 shape)
    "v33_ivfsq_topk",  # broadcast 16-row centers + 1-row SQ8 stats (v31 shape)
    "v34_ann_cost_frontier",  # broadcast centers/sizes + 1-row corpus/nq totals (v23 shape)
    "v35_ivfsq_recall",  # v33's broadcasts + v01's broadcast query set (v32 shape)
    "s17_streaming_retention",  # 1-row broadcast of the residual-expired total (s16 shape)
    "m70_generalized_esd",  # 1-row sufficient-stats broadcast onto the 6-row extremes pool
    "m71_dixon_q",  # 1-row (n, hi-pair, lo-pair) scalar crossjoins
    "m72_winsorized_stats",  # 1-row winsor-bounds broadcast onto the scan
    "m73_moods_median",  # 1-row grand-median broadcast onto the count scan
    "m74_bland_altman",  # 1-row LoA-bounds broadcast onto the within count
    "x110_erasure_then_retention",  # 1-row residual-total broadcasts (x103 shape)
    "x111_retention_forecast",  # 1-row broadcast of the watermark (x107 shape)
    "v36_ivfsq_maintenance",  # 1-row SQ8 stats broadcast onto the audit join (v14 shape)
}


def _plan(spark, name):
    df = all_queries()[name](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark):
    plan = _plan(spark, "q01_filter_project")
    assert "GreaterThan(l_quantity,30.0)" in plan  # filter reached the scan
    assert "LessThan(l_discount,0.05)" in plan
    # column pruning: only 4 columns read of 11
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert read.count(":") <= 5
    assert "l_extendedprice" not in read


def test_q06_broadcast_join(spark):
    plan = _plan(spark, "q06_join_agg")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q03_partial_aggregation(spark):
    plan = _plan(spark, "q03_group_agg")
    # partial + final hash aggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2


def test_no_unexpected_cartesian_or_python(spark):
    for name in sorted(all_queries()):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        if "BroadcastNestedLoopJoin" in plan:
            assert name in _BNLJ_OK, f"{name}: unexpected BNLJ"


def test_plancheck_utility(spark):
    """plan_facts/assert_scale_safe agree with the raw-plan greps this
    suite runs, on one good query and one deliberately bad plan."""
    from dislib_spark.utils.plancheck import assert_scale_safe, plan_facts

    df = all_queries()["q06_join_agg"](spark, SF_SMOKE)
    facts = assert_scale_safe(df)
    assert "BroadcastHashJoin" in facts.join_kinds
    assert not facts.has_cartesian and not facts.has_python_row_udf
    assert facts.n_scans >= 2
    assert facts.pushed_filters  # q06's date filter reaches the scan

    a = spark.range(100).select(F.col("id").alias("a"))
    b = spark.range(100).select(F.col("id").alias("b"))
    bad = a.crossJoin(b)
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="scale-safe"):
        assert_scale_safe(bad)
    assert plan_facts(bad).has_bnlj or plan_facts(bad).has_cartesian


def test_x19_ntile_no_global_window(spark):
    """NTILE must not funnel the table through one partition: the
    distributed-rank form has NO Window operator and NO
    single-partition exchange (ntile(k) OVER (ORDER BY ...) would
    show both)."""
    plan = _plan(spark, "x19_ntile")
    assert "Window" not in plan
    # the only single-partition exchange is the scalar COUNT(*)'s
    # final 1-row aggregate (partial agg runs map-side; the exchange
    # moves #partitions rows, not data) — the ranked DATA path must
    # never collapse to one partition
    assert plan.count("SinglePartition") <= 1


def test_v09_lexical_topk_no_global_window(spark):
    """The lexical top-100 must plan as TakeOrderedAndProject
    (per-partition top-k + k-row merge), never a global row_number
    Window over every scored document. The only Window allowed is
    cosine_topk's per-q_id partitioned one (WindowGroupLimit pushes
    the k-limit into it)."""
    plan = _plan(spark, "v09_hybrid_rrf")
    assert "TakeOrderedAndProject" in plan
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            # every window spec must name a partition key (a global
            # window's spec starts with the sort column + DESC/ASC)
            spec = line.split("windowspecdefinition(", 1)[1]
            assert spec.startswith("q_id"), f"global window: {line}"
    # bounded scalar aggs only (1-row corpus stats, 100-row rank agg)
    assert plan.count("SinglePartition") <= 2


def test_t43_vocab_rank_no_global_window(spark):
    """The Zipf vocab ranking must use the distributed global index
    (range partition + offsets), never a row_number Window over the
    whole vocabulary in one partition."""
    plan = _plan(spark, "t43_zipf_fit")
    assert "Window" not in plan
    # only the final 1-row regression aggregate may single-partition
    assert plan.count("SinglePartition") <= 1


def test_x69_gini_no_near_global_window(spark):
    """Per-region Gini ranks: 5 regions means a partitionBy(region)
    Window holds n/5 rows per partition — the rank must come from the
    distributed global index + 5-row broadcast offset join instead."""
    plan = _plan(spark, "x69_gini")
    assert "Window" not in plan
    assert plan.count("SinglePartition") <= 1


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_no_forced_broadcast_of_sf_growing_relations(spark):
    """customer / per-user aggregates grow linearly with SF (billions
    of rows at 100 TB) — they must never carry a forced F.broadcast
    hint.  Detection: with autoBroadcastJoinThreshold=-1 and AQE off,
    the ONLY broadcast joins left in a plan are explicit hints, so
    the SF-growing join must surface as a shuffle join
    (SortMergeJoin) while genuinely fixed-size hints (nation, region,
    1-row stats frames) may remain broadcast."""
    targets = [
        "q06_join_agg",        # orders ⋈ customer
        "x15_funnel",          # events ⋈ per-user stage aggregates
        "x16_cohort",          # events ⋈ per-user first-event frame
        "x55_share_report",    # orders ⋈ customer (⋈ nation ⋈ region)
        "x60_quality_checks",  # orders anti-⋈ customer
        "x68_mom_growth",      # orders ⋈ customer (⋈ nation ⋈ region)
        # x69_gini is covered by the source guard below: its
        # with_global_index localCheckpoint hides the join subplan.
    ]
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        for name in targets:
            plan = _plan(spark, name)
            assert "SortMergeJoin" in plan, (
                f"{name}: SF-growing relation still hint-broadcast "
                "(no shuffle join appears with broadcast disabled)"
            )
    # the fixed-size dims keep their hints: with the same conf the
    # nation/region joins of x55 must still broadcast
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        plan = _plan(spark, "x55_share_report")
        assert "BroadcastHashJoin" in plan  # nation/region hints intact


def test_no_broadcast_hint_on_sf_growing_source():
    """Source guard (mirrors the crossJoin allowlist): query modules
    must never wrap a bare SF-growing frame — customer/orders/
    lineitem/events loads or per-user aggregates — in F.broadcast.
    Bounded frames (1-row .agg(...) stats, nation/region dims,
    codebooks) don't match the bare-identifier pattern."""
    import pathlib
    import re

    qdir = pathlib.Path(__file__).resolve().parents[1] / (
        "dislib_spark/queries"
    )
    # bare single-letter / table-name identifiers used for SF tables
    forbidden = re.compile(
        r"F\.broadcast\((?:c|o|l|v|p|ev|first|active|customer|orders"
        r"|lineitem|events|docs|emb)\)"
    )
    hits = []
    for py in sorted(qdir.glob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if forbidden.search(line):
                hits.append(f"{py.name}:{i}: {line.strip()}")
    assert not hits, "forced broadcast of SF-growing frame:\n" + "\n".join(hits)


def test_v16_medoids_two_phase_topk(spark):
    """v16 ranks per label (~10 groups): the plan must be the
    two-phase top-k — a PARTIAL WindowGroupLimit before the label
    exchange (each map task ships ≤ k rows per label) and a FINAL one
    after it, so the Window input is k·partitions rows, never n/|labels|
    rows per reducer."""
    plan = _plan(spark, "v16_centroid_medoids")
    assert "row_number(), 3, Partial" in plan
    assert "row_number(), 3, Final" in plan
    # partial limit must precede the label exchange in operator order
    p = plan.index("Partial")
    x = plan.index("hashpartitioning(label", p)
    f = plan.index("row_number(), 3, Final")
    assert p < f


def test_x84_event_paths_plan_pinned(spark):
    """x84 sessionizes + takes two LEADs off ONE scan: the plan must
    hold at one events scan and at most two exchanges (the user-key
    session window + the final path rollup) — a regression to
    per-LEAD re-scans or extra shuffles fails here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(all_queries()["x84_event_paths"](spark, SF_SMOKE))
    assert f.n_scans == 1
    assert f.n_exchanges <= 2
    assert not f.has_cartesian and not f.has_python_row_udf


def test_x86_audience_overlap_plan_pinned(spark):
    """x86's segment-pair overlap must keep every join broadcast (the
    segment frames are audience-sized) and stay within its recorded
    shuffle budget — a silent SortMergeJoin or an extra per-pair
    re-aggregation fails here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["x86_audience_overlap"](spark, SF_SMOKE)
    )
    assert f.n_scans <= 4
    assert f.n_exchanges <= 8
    assert "SortMergeJoin" not in f.join_kinds
    assert not f.has_cartesian and not f.has_python_row_udf


def test_x92_bucketed_join_plan_pinned(spark):
    """x92's value is its LAYOUT: with broadcast disabled, the
    orders-lineitem join off the bucketed tables must plan as a
    SortMergeJoin with NO Exchange and NO Sort below it (bucketBy
    kills the shuffle, sortBy kills the sort) — the zero-shuffle
    fact-fact join contract."""
    import re

    df = all_queries()["x92_bucketed_join"](spark, SF_SMOKE)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # rebuild under the no-broadcast conf so the join strategy is
        # decided by the bucketed layout alone
        df = all_queries()["x92_bucketed_join"](spark, SF_SMOKE)
        plan = _plan_df(df)
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        # nothing between the join and its bucketed scans may shuffle
        # or sort; the rollup above the join still exchanges once
        pre_join = plan.split("SortMergeJoin")[0]
        scans = [
            line
            for line in plan.splitlines()
            if "Scan parquet" in line
        ]
        assert len(scans) >= 2
        assert re.search(r"Exchange hashpartitioning\(o_orderkey", plan) is None
        assert re.search(r"Exchange hashpartitioning\(l_orderkey", plan) is None
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan_df(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_x93_max_concurrency_plan_pinned(spark):
    """x93's sweep line must stay ONE global prefix sum: the endpoint
    explode feeds with_running_total (whose offset join is a
    broadcast), and the peak recovery is a broadcast join back — a
    regression to a per-type global window or a SortMergeJoin fails
    here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["x93_max_concurrency"](spark, SF_SMOKE)
    )
    assert f.n_scans <= 4
    assert f.n_exchanges <= 5
    assert "SortMergeJoin" not in f.join_kinds
    assert not f.has_cartesian and not f.has_python_row_udf


def test_t67_lsh_band_sweep_plan_pinned(spark):
    """t67 shares ONE checkpointed signature pass across its three
    band configs; every join must stay broadcast (candidate sets are
    bounded) and the shuffle budget must hold — a regression that
    rebuilds signatures per config or shuffles shingle arrays through
    the band buckets fails here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["t67_lsh_band_sweep"](spark, SF_SMOKE)
    )
    assert f.n_exchanges <= 9
    assert "SortMergeJoin" not in f.join_kinds
    assert not f.has_cartesian and not f.has_python_row_udf


def test_t65_priority_dedup_plan_pinned(spark):
    """t65's winner selection is a struct-min AGGREGATE, not a
    corpus window: two scans (base + join back), tight shuffle
    budget, broadcast-only joins."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["t65_priority_dedup"](spark, SF_SMOKE)
    )
    assert f.n_scans <= 2
    assert f.n_exchanges <= 3
    assert not f.has_cartesian and not f.has_python_row_udf


def _assert_no_global_window(plan: str) -> None:
    """Every Window in the plan must carry a partition key: a
    windowspecdefinition whose FIRST argument is already an ordering
    term (carries ASC/DESC NULLS) has no partition columns — the
    all-rows-to-one-task shape these pins exist to forbid."""
    import re

    specs = list(
        re.finditer(
            r"windowspecdefinition\((.*?)specifiedwindowframe", plan
        )
    )
    for m in specs:
        first = m.group(1).split(",")[0].strip()
        assert not re.search(r"(ASC|DESC) NULLS", first), (
            "global Window (no partition key): " + m.group(0)[:120]
        )


def test_x93_x102_never_global_window(spark):
    """The two prefix-primitive queries (x93 running total, x102
    running max) must NEVER plan a partition-less Window — their
    whole point is replacing the global-window sweep with the
    physical-partition-id trick (utils/base.py); a regression that
    reintroduces `Window ... ORDER BY` without a partition key moves
    the corpus through one task."""
    from dislib_spark.utils.plancheck import plan_text

    for name in ("x93_max_concurrency", "x102_late_arrival_audit"):
        plan = plan_text(all_queries()[name](spark, SF_SMOKE))
        _assert_no_global_window(plan)


def test_x95_header_line_reconciliation_plan_pinned(spark):
    """x95 is ONE lineitem rollup + ONE equi-join to headers + one
    fold: two scans, at most three exchanges (rollup key, join side,
    final per-priority fold), broadcast or shuffled-hash join only —
    a second lineitem scan or a per-order window fails here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["x95_header_line_reconciliation"](
            spark, SF_SMOKE
        )
    )
    assert f.n_scans == 2
    assert f.n_exchanges <= 3
    assert not f.has_cartesian and not f.has_python_row_udf


def test_v29_v30_maintenance_plan_pinned(spark):
    """The stored-index maintenance queries must stay within their
    recorded scan/shuffle budgets (the t70 stored-index discipline
    applied to the vector indexes): v29's report reads the maintained
    PQ codes table plus the bounded before/after distortion probes —
    a regression that rescans the logical corpus per maintenance step
    blows the scan budget; v30's recall gate adds the brute-force
    exact side (two extra bounded scans). v31's composed IVF-PQ is
    pinned too: cell-pruned candidates + code lookups + shortlist
    re-rank, never a corpus-wide exact scoring pass."""
    from dislib_spark.utils.plancheck import plan_facts

    budgets = {
        "v29_pq_index_maintenance": (5, 6),
        "v30_maintained_recall": (9, 10),
        "v31_ivfpq_topk": (6, 7),
    }
    for name, (scans, exchanges) in budgets.items():
        f = plan_facts(all_queries()[name](spark, SF_SMOKE))
        assert f.n_scans <= scans, (name, f.n_scans)
        assert f.n_exchanges <= exchanges, (name, f.n_exchanges)
        assert not f.has_cartesian and not f.has_python_row_udf, name


def test_stored_ivfpq_and_ivfsq_probe_plan_pinned(
    spark, tmp_path_factory
):
    """The STORED-table probe paths (the v10/t70 discipline applied
    to the composed indexes): ivfpq_query_index / ivfsq_query_index
    against a parquet-round-tripped ``partitionBy("cell")`` codes
    table must stay within their recorded scan/shuffle budgets — the
    probe reads the codes table (cell equi-join against the broadcast
    probes → only the probed lists' partitions matter), the raw-vector
    table only for the shortlist re-rank, and never re-derives the
    index from the corpus. A regression that re-encodes or re-assigns
    the corpus per query batch blows the scan budget; a corpus-wide
    scoring pass shows up as a cartesian/extra exchange."""
    import tempfile

    from pyspark.sql import functions as F

    from dislib_spark.tables import load_table
    from dislib_spark.utils.plancheck import plan_facts
    from dislib_spark.vector.search import (
        ivfpq_index,
        ivfpq_query_index,
        ivfsq_index,
        ivfsq_query_index,
    )

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    tmp = str(tmp_path_factory.mktemp("storedprobe"))
    e.select("vec_id", "embedding").write.parquet(f"{tmp}/vecs")
    vecs = spark.read.parquet(f"{tmp}/vecs")

    ctrs, books, cc = ivfpq_index(
        e, centers="seed", codebooks="seed", n_centroids=16
    )
    cc.write.partitionBy("cell").parquet(f"{tmp}/pq_codes")
    ctrs.write.parquet(f"{tmp}/pq_ctrs")
    pq = ivfpq_query_index(
        q,
        spark.read.parquet(f"{tmp}/pq_ctrs"),
        books,
        spark.read.parquet(f"{tmp}/pq_codes"),
        vecs,
        k=10,
        n_probe=4,
        rerank=50,
    )
    f = plan_facts(pq)
    # queries + centers + codes + vectors (+ window-stage reuse):
    # measured 6 scans / 3 exchanges; headroom of 1
    assert f.n_scans <= 7, f.n_scans
    assert f.n_exchanges <= 4, f.n_exchanges
    assert not f.has_cartesian and not f.has_python_row_udf

    sctrs, stats, scc = ivfsq_index(e, centers="seed")
    scc.write.partitionBy("cell").parquet(f"{tmp}/sq_codes")
    stats.write.parquet(f"{tmp}/sq_stats")
    sctrs.write.parquet(f"{tmp}/sq_ctrs")
    sq = ivfsq_query_index(
        q,
        spark.read.parquet(f"{tmp}/sq_ctrs"),
        spark.read.parquet(f"{tmp}/sq_stats"),
        spark.read.parquet(f"{tmp}/sq_codes"),
        vecs,
        k=10,
        n_probe=4,
        rerank=50,
    )
    f2 = plan_facts(sq)
    # + the 1-row stats scan: measured 7 scans / 3 exchanges
    assert f2.n_scans <= 8, f2.n_scans
    assert f2.n_exchanges <= 4, f2.n_exchanges
    assert not f2.has_cartesian and not f2.has_python_row_udf


def test_t70_archive_probe_plan_pinned(spark):
    """t70's decontamination must touch the corpus only through the
    stored band index: the benchmark side is bounded, every join is
    band-key equi or candidate-sized, and the plan stays within its
    recorded scan/shuffle budget — a corpus rescan regression (the
    thing the stored index exists to prevent) fails here."""
    from dislib_spark.utils.plancheck import plan_facts

    f = plan_facts(
        all_queries()["t70_archive_decontamination"](spark, SF_SMOKE)
    )
    assert f.n_scans <= 4
    assert f.n_exchanges <= 6
    assert not f.has_cartesian and not f.has_python_row_udf
