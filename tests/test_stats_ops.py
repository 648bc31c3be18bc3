"""Numpy/python parity for math.stats, RobustScaler, and
pmi_collocations (the library functions behind m16/m17/t38)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from dislib_spark.array.core import array as ds_array
from dislib_spark.math.stats import correlation_matrix, robust_stats
from dislib_spark.preprocessing import RobustScaler
from dislib_spark.text.features import pmi_collocations


@pytest.fixture(scope="module")
def xmat():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 4))
    x[:, 1] = 0.8 * x[:, 0] + 0.2 * x[:, 1]  # correlated pair
    x[:, 3] = x[:, 3] * 50 + 10  # different scale
    return x


def test_correlation_matrix_numpy_parity(spark, xmat):
    df = spark.createDataFrame(
        [tuple(float(v) for v in row) for row in xmat],
        "a double, b double, c double, d double",
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c", "d"]).collect()
    }
    ref = np.corrcoef(xmat, rowvar=False)
    names = ["a", "b", "c", "d"]
    assert len(got) == 6
    for i in range(4):
        for j in range(i + 1, 4):
            assert got[(names[i], names[j])] == pytest.approx(
                ref[i, j], abs=1e-6
            )


def test_robust_stats_numpy_parity(spark, xmat):
    df = spark.createDataFrame(
        [(float(v),) for v in xmat[:, 3]], "d double"
    )
    row = robust_stats(df, ["d"]).collect()[0]
    q25, q50, q75 = np.percentile(xmat[:, 3], [25, 50, 75])
    assert row["q25"] == pytest.approx(q25, abs=1e-6)
    assert row["median"] == pytest.approx(q50, abs=1e-6)
    assert row["q75"] == pytest.approx(q75, abs=1e-6)
    assert row["iqr"] == pytest.approx(q75 - q25, abs=1e-6)


def test_robust_scaler_roundtrip_and_stats(spark, xmat):
    a = ds_array(xmat[:100], spark)
    sc = RobustScaler()
    z = sc.fit_transform(a)
    # center/scale match numpy medians/IQRs
    med = np.median(xmat[:100], axis=0)
    q75, q25 = np.percentile(xmat[:100], [75, 25], axis=0)
    np.testing.assert_allclose(sc.center_, med, atol=1e-9)
    np.testing.assert_allclose(sc.scale_, q75 - q25, atol=1e-9)
    # transform matches numpy; inverse restores the input
    zt = z.collect()
    np.testing.assert_allclose(
        zt, (xmat[:100] - med) / (q75 - q25), atol=1e-9
    )
    back = sc.inverse_transform(z).collect()
    np.testing.assert_allclose(back, xmat[:100], atol=1e-9)


def test_pmi_collocations_python_parity(spark):
    docs = [
        "new york is a big city",
        "new york has new parks",
        "the city is big",
        "big city big dreams in new york",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["n12"], r["pmi"])
        for r in pmi_collocations(df, min_count=2).collect()
    }
    # pure-python reference
    bigrams = []
    for t in docs:
        w = [x for x in t.split(" ") if x]
        bigrams += list(zip(w, w[1:]))
    from collections import Counter

    bc = Counter(bigrams)
    n1 = Counter(a for a, _ in bigrams)
    n2 = Counter(b for _, b in bigrams)
    n = len(bigrams)
    ref = {
        p: (c, round(math.log(c * n / (n1[p[0]] * n2[p[1]])), 6))
        for p, c in bc.items()
        if c >= 2
    }
    assert got == ref
    assert ("new", "york") in got and got[("new", "york")][0] == 3


def test_unpivot_query_shape(spark):
    from dislib_spark.queries.extended import x50_unpivot
    from tests.conftest import SF_SMOKE

    df = x50_unpivot(spark, SF_SMOKE)
    rows = df.collect()
    flags = {r["l_returnflag"] for r in rows}
    measures = {r["measure"] for r in rows}
    assert measures == {"sum_qty", "sum_price", "n_rows"}
    assert len(rows) == 3 * len(flags)


def test_grouped_fit_many_models(spark):
    import numpy as np

    from dislib_spark.training.grouped import grouped_fit, grouped_ols

    rng = np.random.default_rng(3)
    rows = []
    slopes = {"a": 2.0, "b": -1.0, "c": 0.5}
    for g, sl in slopes.items():
        x = rng.normal(size=200)
        y = sl * x + 3.0 + rng.normal(scale=0.01, size=200)
        rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: (r["slope"], r["intercept"]) for r in grouped_ols(df, "g", "x", "y").collect()}
    for g, sl in slopes.items():
        assert got[g][0] == pytest.approx(sl, abs=0.01)
        assert got[g][1] == pytest.approx(3.0, abs=0.01)

    # arbitrary-fit harness: per-group max via a custom fit callable
    res = grouped_fit(
        df, "g",
        lambda pdf: {"xmax": float(pdf["x"].max())},
        "g string, xmax double",
    )
    want = {g: max(r[1] for r in rows if r[0] == g) for g in slopes}
    assert {r["g"]: r["xmax"] for r in res.collect()} == pytest.approx(want)


def test_isotonic_calibrator_pav_parity(spark):
    import numpy as np

    from dislib_spark.regression.isotonic import IsotonicCalibrator

    rng = np.random.default_rng(11)
    # distinct scores (tie handling differs across implementations),
    # noisy monotone labels
    x = np.sort(rng.choice(np.arange(0, 10_000), size=400, replace=False)) / 10_000.0
    p = 1.0 / (1.0 + np.exp(-8 * (x - 0.5)))
    y = (rng.random(400) < p).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "score double, y double"
    )
    cal = IsotonicCalibrator().fit(df, "score", "y")

    def pav(vals):
        # pool-adjacent-violators on unit weights: the PAV fit at the
        # training points (classic textbook reference implementation)
        blocks = [[v, 1.0] for v in vals]
        out = []
        for b in blocks:
            out.append(b)
            while len(out) > 1 and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]:
                s2, w2 = out.pop()
                out[-1][0] += s2
                out[-1][1] += w2
        fitted = []
        for ssum, w in out:
            fitted += [ssum / w] * int(w)
        return np.array(fitted)

    want = pav(list(y))
    got = {
        r["score"]: r["calibrated"]
        for r in cal.transform(df, "score").select("score", "calibrated").collect()
    }
    for xi, wi in zip(x, want):
        assert got[float(xi)] == pytest.approx(wi, abs=1e-9)
    # monotone non-decreasing step function
    assert (np.diff(cal.predictions_) >= -1e-12).all()


def _np_ks(a: np.ndarray, b: np.ndarray) -> float:
    """Straight-line two-sample KS on sorted arrays."""
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def test_ks_statistic_exact_and_binned(spark):
    from dislib_spark.math.stats import ks_statistic
    from dislib_spark.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    rows = li.where(F.col("l_returnflag").isin("R", "N")).select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    a = np.array([r.l_extendedprice for r in rows if r.l_returnflag == "R"])
    b = np.array([r.l_extendedprice for r in rows if r.l_returnflag == "N"])
    want = _np_ks(a, b)

    exact = ks_statistic(
        li, "l_extendedprice", "l_returnflag", "R", "N"
    ).collect()[0]
    assert exact.n_a == len(a) and exact.n_b == len(b)
    assert math.isclose(exact.ks_stat, want, abs_tol=1e-12)

    # binned scale path: lower bound, converging with bin count
    d256 = ks_statistic(
        li, "l_extendedprice", "l_returnflag", "R", "N", n_bins=256
    ).collect()[0].ks_stat
    d16 = ks_statistic(
        li, "l_extendedprice", "l_returnflag", "R", "N", n_bins=16
    ).collect()[0].ks_stat
    assert d256 <= want + 1e-12
    assert d16 <= want + 1e-12
    assert want - d256 <= 0.05
    assert d256 >= d16 - 0.05


def test_ks_statistic_degenerate_constant_column(spark):
    from dislib_spark.math.stats import ks_statistic

    df = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 5.0)] * 7, "g string, v double"
    )
    out = ks_statistic(df, "v", "g", "a", "b", n_bins=64).collect()[0]
    assert out.ks_stat == 0.0
    assert (out.n_a, out.n_b) == (10, 7)


def test_grouped_fit_nested_schema_and_nonstring_key(spark):
    """DDL schemas with parameterized/nested types parse correctly
    (a naive split-on-comma would mangle decimal(10,2) and
    array<...>), and grouped_ols derives the key type from the input
    instead of hardcoding string."""
    from dislib_spark.training.grouped import grouped_fit, grouped_ols

    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 1.0, 3.0), (2, 0.0, 0.0), (2, 1.0, -1.0)],
        "g long, x double, y double",
    )
    # non-string group key: output key column keeps bigint type
    ols = grouped_ols(df, "g", "x", "y")
    assert dict(ols.dtypes)["g"] == "bigint"
    got = {r["g"]: r["slope"] for r in ols.collect()}
    assert got == {1: 2.0, 2: -1.0}

    res = grouped_fit(
        df,
        "g",
        lambda pdf: {
            "dec": round(float(pdf["y"].sum()), 2),
            "arr": [float(pdf["x"].min()), float(pdf["x"].max())],
        },
        "g long, dec decimal(10,2), arr array<double>",
    )
    rows = {r["g"]: (float(r["dec"]), list(r["arr"])) for r in res.collect()}
    assert rows == {1: (4.0, [0.0, 1.0]), 2: (-1.0, [0.0, 1.0])}


def test_roc_auc_exact_vs_binned_convergence(spark):
    """Binned AUC (the 100 TB swap-in for continuous scores)
    converges to the exact tie-averaged Mann-Whitney AUC as bins
    shrink, and matches a numpy reference exactly in the n_bins=None
    path."""
    import numpy as np

    from dislib_spark.math.stats import roc_auc

    rng = np.random.default_rng(7)
    neg = rng.normal(0.0, 1.0, 4000)
    pos = rng.normal(0.8, 1.0, 1000)
    rows = [(float(s), 0.0) for s in neg] + [(float(s), 1.0) for s in pos]
    df = spark.createDataFrame(rows, "score double, y double")

    # numpy exact tie-averaged AUC (rank-sum form)
    allv = np.concatenate([neg, pos])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    r = np.arange(1, len(allv) + 1, dtype=float)
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        r[i : j + 1] = (i + 1 + j + 1) / 2.0
        i = j + 1
    ranks[order] = r
    pos_ranks = ranks[len(neg):]
    want = (pos_ranks.sum() - len(pos) * (len(pos) + 1) / 2.0) / (
        len(pos) * len(neg)
    )

    exact = roc_auc(df, "score", "y").collect()[0]
    assert exact["n_pos"] == 1000 and exact["n_neg"] == 4000
    assert exact["auc"] == pytest.approx(want, abs=1e-6)

    errs = []
    for nb in (16, 256, 4096):
        b = roc_auc(df, "score", "y", n_bins=nb).collect()[0]
        errs.append(abs(b["auc"] - want))
    # convergence: error shrinks with finer bins and is tiny at 4096
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 1e-3
    assert errs[0] < 0.05


def test_copurchase_giant_basket_capped(spark):
    """A synthetic whale basket (5000 items in one order) would emit
    ~12.5M pairs uncapped; max_basket bounds the per-basket fan-out at
    max_basket^2 with deterministic smallest-id truncation, and normal
    baskets are untouched (cap-invariant)."""
    from dislib_spark.functions.basket import copurchase_pairs

    rows = [(999, i) for i in range(5000)]  # the whale
    rows += [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (2, 12)]
    df = spark.createDataFrame(rows, "ok long, item long")

    capped = copurchase_pairs(
        df, "ok", "item", min_support=1, max_basket=20
    ).collect()
    pairs = {(r["p1"], r["p2"]) for r in capped}
    # whale contributes exactly C(20,2) pairs over its 20 SMALLEST ids
    # (which already include the small baskets' items 10-12), so the
    # distinct pair count is exactly 190 — not ~12.5M
    assert len(capped) == (20 * 19) // 2
    assert max(p2 for _, p2 in pairs) == 19  # truncation kept ids 0..19
    # support merges across baskets; duplicate lines count once
    sup = {(r["p1"], r["p2"]): r["n"] for r in capped}
    assert sup[(10, 11)] == 3  # whale + order1 + order2
    assert sup[(11, 12)] == 2  # whale + order2 (dup line once)
    assert sup[(0, 1)] == 1  # whale-only pair

    # uncapped run on the small baskets alone is cap-invariant
    small = df.where(F.col("ok") < 10)
    got = {
        (r["p1"], r["p2"]): r["n"]
        for r in copurchase_pairs(small, "ok", "item").collect()
    }
    assert got == {(10, 11): 2, (10, 12): 1, (11, 12): 1}


def test_association_rules_hand_computed(spark):
    """4 baskets: {a,b}, {a,b}, {a,c}, {b}. n_a=3 n_b=3 n_c=1 N=4;
    pair (a,b): n_ab=2, conf both 2/3, lift 2·4/9."""
    from dislib_spark.functions.basket import association_rules

    lines = spark.createDataFrame(
        [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"), (2, "b"),  # dup line counts once
            (3, "a"), (3, "c"),
            (4, "b"),
        ],
        "ok long, item string",
    )
    rules = {
        (r["p1"], r["p2"]): r
        for r in association_rules(lines, "ok", "item").collect()
    }
    ab = rules[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["conf_ab"] == round(2 / 3, 6)
    assert ab["conf_ba"] == round(2 / 3, 6)
    assert ab["lift"] == round(2 * 4 / (3 * 3), 6)
    ac = rules[("a", "c")]
    assert (ac["n_ab"], ac["n_a"], ac["n_b"]) == (1, 3, 1)
    assert ac["lift"] == round(1 * 4 / (3 * 1), 6)
    # min_support filters the tail
    from dislib_spark.functions.basket import association_rules as ar

    assert {(r["p1"], r["p2"]) for r in
            ar(lines, "ok", "item", min_support=2).collect()} == {("a", "b")}


def test_sq8_quantization_numpy_parity(spark):
    """Codes and reconstruction error match the numpy SQ8 closed form
    on a small deterministic matrix."""
    import numpy as np

    from dislib_spark.vector.quantize import sq8_encode, sq8_error_stats

    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 6)).astype(np.float32)
    labels = (np.arange(40) % 2).astype(int)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row], int(l))
         for i, (row, l) in enumerate(zip(x, labels))],
        "vec_id long, embedding array<float>, label int",
    )
    xd = x.astype(np.float64)
    mn, mx = xd.min(axis=0), xd.max(axis=0)
    q = np.floor((xd - mn) * 255.0 / (mx - mn) + 0.5)
    recon = mn + q * (mx - mn) / 255.0
    got_codes = {
        r["vec_id"]: r["codes"]
        for r in sq8_encode(df, "embedding", 6).collect()
    }
    for i in range(40):
        assert got_codes[i] == [int(c) for c in q[i]]
        assert all(0 <= c <= 255 for c in got_codes[i])
    err = ((xd - recon) ** 2).sum(axis=1)
    stats = {
        r["label"]: r
        for r in sq8_error_stats(df, "embedding", 6, by="label").collect()
    }
    for lab in (0, 1):
        mask = labels == lab
        assert stats[lab]["n_vecs"] == int(mask.sum())
        assert abs(stats[lab]["mse"]
                   - err[mask].sum() / (mask.sum() * 6)) < 1e-6
        assert abs(stats[lab]["max_err"] - err[mask].max()) < 1e-6


def test_binary_quantize_hamming_numpy_parity(spark):
    """Sign-bit packing and Hamming top-k match the numpy closed form
    (including a >32-dim split across two words)."""
    import numpy as np

    from dislib_spark.vector.quantize import binary_quantize, hamming_topk

    rng = np.random.default_rng(11)
    x = rng.normal(size=(30, 40)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )
    signs = (x.astype(np.float64) > 0).astype(np.int64)
    w0 = (signs[:, :32] << np.arange(32)).sum(axis=1)
    w1 = (signs[:, 32:] << np.arange(8)).sum(axis=1)
    got = {
        r["vec_id"]: r["bits"]
        for r in binary_quantize(df, "embedding", 40).collect()
    }
    for i in range(30):
        assert got[i] == [int(w0[i]), int(w1[i])]
    ham = (signs[:, None, :] != signs[None, :, :]).sum(axis=2)
    top = hamming_topk(
        df.where("vec_id < 3"), df, dim=40, k=5
    ).collect()
    for r in top:
        assert r["hamming"] == int(ham[r["q_id"], r["c_id"]])
    # rank-1 is always the query itself at distance 0
    assert {(r["q_id"], r["c_id"]) for r in top if r["rank"] == 1} == {
        (0, 0), (1, 1), (2, 2)
    }


def test_entity_pairs_hand_computed(spark):
    """Blocked linkage: pairs only within blocks; similarities match
    the python closed form; max_block caps a whale block."""
    from pyspark.sql import functions as F

    from dislib_spark.linkage import (
        entity_pairs,
        numeric_similarity,
        string_similarity,
    )

    df = spark.createDataFrame(
        [
            (1, "alice", 100.0, "B1"),
            (2, "alicx", 150.0, "B1"),  # lev 1, |Δbal| 50
            (3, "bob", 100.0, "B1"),
            (4, "alice", 100.0, "B2"),  # other block: never pairs w/ 1
        ],
        "id long, name string, bal double, blk string",
    )
    scores = {
        "name": string_similarity(F.col("a_name"), F.col("b_name")),
        "bal": numeric_similarity(F.col("a_bal"), F.col("b_bal"), 100.0),
    }
    out = {
        (r["a_id"], r["b_id"]): r
        for r in entity_pairs(
            df, "id", ["blk"], scores, {"name": 0.5, "bal": 0.5}
        ).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    r12 = out[(1, 2)]
    assert r12["sim_name"] == round(1 - 1 / 5, 6)
    assert r12["sim_bal"] == 0.5
    assert abs(r12["score"] - (0.5 * (1 - 1 / 5) + 0.5 * 0.5)) < 1e-6
    # whale-block cap: keep 2 smallest ids per block → only (1,2)
    capped = entity_pairs(
        df, "id", ["blk"], scores, {"name": 1.0}, max_block=2
    ).collect()
    assert {(r["a_id"], r["b_id"]) for r in capped} == {(1, 2)}


def test_woe_iv_python_parity(spark):
    """WOE/IV match the closed form; a bucket missing one class is
    dropped (its WOE is infinite)."""
    import math

    from pyspark.sql import functions as F

    from dislib_spark.math.stats import woe_iv

    rows = [(b, lab) for b, n_pos, n_neg in [(0, 8, 2), (1, 3, 7), (2, 5, 0)]
            for lab in [True] * n_pos + [False] * n_neg]
    df = spark.createDataFrame(rows, "b int, y boolean")
    got = {
        r["bucket"]: r
        for r in woe_iv(df, F.col("b"), F.col("y")).collect()
    }
    assert set(got) == {0, 1}  # bucket 2 has no negatives → dropped
    P, N = 16, 9
    for b, (p, n) in {0: (8, 2), 1: (3, 7)}.items():
        woe = math.log((p / P) / (n / N))
        assert abs(got[b]["woe"] - woe) < 1e-6
        assert abs(got[b]["iv_term"] - (p / P - n / N) * woe) < 1e-6
        assert (got[b]["pos_n"], got[b]["neg_n"]) == (p, n)


def test_average_precision_exact_vs_binned(spark):
    """Exact AP matches the numpy tie-block formula; the binned
    variant (the bounded-window 100 TB path) converges as bins
    shrink."""
    import numpy as np

    from dislib_spark.math.stats import average_precision

    rng = np.random.default_rng(11)
    neg = rng.normal(0.0, 1.0, 4000)
    pos = rng.normal(0.8, 1.0, 1000)
    rows = [(float(s), 0.0) for s in neg] + [(float(s), 1.0) for s in pos]
    df = spark.createDataFrame(rows, "score double, y double")

    allv = np.concatenate([neg, pos])
    ally = np.concatenate([np.zeros(len(neg)), np.ones(len(pos))])
    # tie-block AP: AP = sum over distinct thresholds of
    # (pos_in_block / P) * (cum_pos / cum_n)
    order = np.argsort(-allv, kind="mergesort")
    sv, sy = allv[order], ally[order]
    want, cum_n, cum_p = 0.0, 0, 0.0
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        blk_p = sy[i : j + 1].sum()
        cum_n += j - i + 1
        cum_p += blk_p
        want += blk_p * (cum_p / cum_n)
        i = j + 1
    want /= ally.sum()

    exact = average_precision(df, "score", "y").collect()[0]
    assert exact["n_pos"] == 1000 and exact["n_neg"] == 4000
    assert exact["ap"] == pytest.approx(want, abs=1e-6)

    errs = []
    for nb in (16, 256, 4096):
        b = average_precision(df, "score", "y", n_bins=nb).collect()[0]
        errs.append(abs(b["ap"] - want))
    assert errs[0] >= errs[2]
    assert errs[2] < 1e-3
    assert errs[0] < 0.05


def test_cohens_kappa_numpy_parity(spark):
    """m28's cell-count kappa formula agrees with the textbook
    (p_o - p_e)/(1 - p_e) computed independently in numpy on the
    reconstructed label pairs (sklearn.metrics.cohen_kappa_score's
    definition)."""
    import numpy as np

    from dislib_spark.queries.ml import m28_cohens_kappa

    row = m28_cohens_kappa(spark, "/root/testdata/sf0.001").collect()[0]

    import duckdb

    yp = duckdb.sql(
        """
        SELECT CASE WHEN label < 5 THEN 1 ELSE 0 END AS y,
               CASE WHEN ROUND(list_inner_product(
                   list_transform(embedding, v -> v::DOUBLE),
                   list_transform(range(0, 64),
                                  j -> ((j % 7) - 3) / 10.0)), 9) > 0
                    THEN 1 ELSE 0 END AS p
        FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet')
        """
    ).df()
    y, p = yp["y"].to_numpy(), yp["p"].to_numpy()
    n = len(y)
    po = float((y == p).mean())
    pe = float(
        (y == 1).mean() * (p == 1).mean()
        + (y == 0).mean() * (p == 0).mean()
    )
    want = (po - pe) / (1 - pe)
    assert row["kappa"] == pytest.approx(want, abs=1e-6)
    assert row["p_o"] == pytest.approx(po, abs=1e-6)
    assert row["n"] == n
    assert -1.0 <= row["kappa"] <= 1.0


def test_km_curve_textbook_toy(spark):
    """Hand-computed Kaplan-Meier on the classic 6-subject example,
    including a terminal all-fail time (survival pinned to 0 without
    any ln(0))."""
    from dislib_spark.math.stats import km_curve

    rows = [(1, 1), (1, 0), (2, 1), (3, 1), (3, 0), (4, 1)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    got = {
        r["t"]: (r["n_risk"], r["n_event"], r["survival"])
        for r in km_curve(df, "dur", "ev").collect()
    }
    assert set(got) == {1, 2, 3, 4}  # censored-only times excluded
    assert got[1] == (6, 1, round(5 / 6, 6))
    assert got[2] == (4, 1, round(5 / 6 * 3 / 4, 6))
    assert got[3] == (3, 1, round(5 / 6 * 3 / 4 * 2 / 3, 6))
    assert got[4] == (1, 1, 0.0)


def test_silhouette_numpy_parity(spark):
    """m30's per-cluster simplified silhouette matches a direct numpy
    evaluation of (b-a)/max(a,b) against the fixed m03 centers."""
    import numpy as np
    import pandas as pd

    from dislib_spark.queries.ml import _M03_CENTERS, m30_silhouette

    pdf = pd.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_quantity", "l_discount"],
    )
    x = pdf.to_numpy(dtype=float)
    c = np.array(_M03_CENTERS)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    cl = np.argmin(d2, axis=1)
    srt = np.sqrt(np.sort(d2, axis=1))
    s = (srt[:, 1] - srt[:, 0]) / np.maximum(srt[:, 0], srt[:, 1])

    got = {
        r["cluster"]: (r["n"], r["mean_s"])
        for r in m30_silhouette(spark, "/root/testdata/sf0.001").collect()
    }
    for k in range(3):
        n, mean_s = got[k]
        assert n == int((cl == k).sum())
        assert mean_s == pytest.approx(float(s[cl == k].mean()), abs=1e-6)


def test_mann_whitney_u_python_parity(spark):
    """mann_whitney_u vs a direct midrank implementation (ties
    included), on a small two-group sample."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 12, size=80)  # heavy ties
    b = rng.integers(2, 14, size=65)
    rows = [(float(v), "A") for v in a] + [(float(v), "B") for v in b]
    df = spark.createDataFrame(rows, ["val", "grp"])

    from dislib_spark.math.stats import mann_whitney_u

    got = mann_whitney_u(df, "val", "grp", "A", "B").collect()[0]

    # reference midrank computation
    allv = np.concatenate([a, b]).astype(float)
    order = np.sort(np.unique(allv))
    ranks = {}
    cum = 0
    for v in order:
        t = int((allv == v).sum())
        ranks[v] = cum + (t + 1) / 2.0
        cum += t
    ra = sum(ranks[float(v)] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    ua = ra - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    ties = sum(
        int((allv == v).sum()) ** 3 - int((allv == v).sum())
        for v in order
    )
    sig2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (ua - mu) / math.sqrt(sig2)
    rbc = 1.0 - 2.0 * ua / (na * nb)

    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["u_a"] - ua) < 1e-6
    assert abs(got["z"] - z) < 1e-6
    assert abs(got["rank_biserial"] - rbc) < 1e-6


def test_mann_whitney_u_identical_groups_z_zero(spark):
    """Same distribution in both groups with one value -> all tied:
    sigma is 0-adjacent only when EVERY row ties; use two values so
    sigma > 0 and z is finite, u_a = its mean under H0 exactly when
    the groups mirror each other."""
    rows = [(1.0, "A"), (2.0, "A"), (1.0, "B"), (2.0, "B")]
    df = spark.createDataFrame(rows, ["val", "grp"])
    from dislib_spark.math.stats import mann_whitney_u

    got = mann_whitney_u(df, "val", "grp", "A", "B").collect()[0]
    assert got["u_a"] == 2.0  # = na*nb/2 under perfect symmetry
    assert got["z"] == 0.0


def test_bin_key_survives_lo_hi_column_collision(spark):
    """_with_bin_key broadcasts its (min, max) bounds into the
    caller's frame under internal __bk_* names — an input that
    already carries 'lo'/'hi' columns must neither raise an
    ambiguous-reference error nor mis-bin (ADVICE r6)."""
    rng = np.random.default_rng(7)
    vals = rng.normal(0.0, 1.0, size=400)
    rows = [
        (float(v), "A" if i % 2 == 0 else "B", 1.0, 2.0)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["val", "grp", "lo", "hi"])
    clean = df.drop("lo", "hi")
    from dislib_spark.math.stats import mann_whitney_u

    got = mann_whitney_u(
        df, "val", "grp", "A", "B", n_bins=32
    ).collect()[0]
    ref = mann_whitney_u(
        clean, "val", "grp", "A", "B", n_bins=32
    ).collect()[0]
    assert got["n_a"] == ref["n_a"] and got["n_b"] == ref["n_b"]
    assert got["u_a"] == ref["u_a"] and got["z"] == ref["z"]


def test_all_binned_kernels_survive_lo_hi_collision(spark):
    """Every binned ECDF-family kernel (ks_statistic / roc_auc /
    average_precision) now routes through _with_bin_key, so a caller
    frame that already carries 'lo'/'hi' columns must produce exactly
    the same result as one without them (VERDICT r7 item 1 — the
    ADVICE r6 fix had covered only mann_whitney_u/kruskal_wallis)."""
    rng = np.random.default_rng(13)
    vals = rng.normal(0.0, 1.0, size=400)
    rows = [
        (float(v), "A" if i % 2 == 0 else "B",
         float(i % 2), 1.0, 2.0)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["val", "grp", "y", "lo", "hi"])
    clean = df.drop("lo", "hi")
    from dislib_spark.math.stats import (
        average_precision,
        ks_statistic,
        roc_auc,
    )

    for fn, args in (
        (ks_statistic, ("val", "grp", "A", "B")),
        (roc_auc, ("val", "y")),
        (average_precision, ("val", "y")),
    ):
        got = fn(df, *args, n_bins=32).collect()[0]
        ref = fn(clean, *args, n_bins=32).collect()[0]
        assert got == ref, fn.__name__


def test_auto_bins_branch_selection(spark):
    """n_bins="auto" (the declared m11/m23 default) picks the exact
    path below the distinct-count threshold and the binned path above
    it — pinned by equality with the explicitly-requested plans."""
    import numpy as np

    from dislib_spark.math.stats import ks_statistic, roc_auc

    rng = np.random.default_rng(11)
    rows = [
        (float(s), float(s > 0.4)) for s in rng.normal(0.3, 1.0, 3000)
    ]
    df = spark.createDataFrame(rows, "score double, y double")

    # ~3000 distinct scores: below a high threshold → exact plan
    lo = roc_auc(df, "score", "y", n_bins="auto",
                 auto_threshold=1_000_000).collect()[0]
    exact = roc_auc(df, "score", "y").collect()[0]
    assert lo == exact

    # above a tiny threshold → identical to the explicit binned plan
    hi = roc_auc(df, "score", "y", n_bins="auto",
                 auto_threshold=100, auto_bins=64).collect()[0]
    binned = roc_auc(df, "score", "y", n_bins=64).collect()[0]
    assert hi == binned
    assert hi != exact  # 64 coarse bins must actually have engaged

    kdf = df.select(
        "score", F.when(F.col("y") > 0, "a").otherwise("b").alias("g")
    )
    klo = ks_statistic(kdf, "score", "g", "a", "b", n_bins="auto",
                       auto_threshold=1_000_000).collect()[0]
    kexact = ks_statistic(kdf, "score", "g", "a", "b").collect()[0]
    assert klo == kexact
    khi = ks_statistic(kdf, "score", "g", "a", "b", n_bins="auto",
                       auto_threshold=100, auto_bins=64).collect()[0]
    kbinned = ks_statistic(kdf, "score", "g", "a", "b",
                           n_bins=64).collect()[0]
    assert khi == kbinned


def test_average_precision_auto_bins_branch(spark):
    """m27's declared default: n_bins="auto" picks the exact plan
    below the distinct-score threshold and the binned plan above it —
    pinned by equality with the explicitly-requested plans (the m23
    convergence pattern)."""
    import numpy as np

    from dislib_spark.math.stats import average_precision

    rng = np.random.default_rng(27)
    rows = [
        (float(s), float(s > 0.4)) for s in rng.normal(0.3, 1.0, 3000)
    ]
    df = spark.createDataFrame(rows, "score double, y double")

    lo = average_precision(df, "score", "y", n_bins="auto",
                           auto_threshold=1_000_000).collect()[0]
    exact = average_precision(df, "score", "y").collect()[0]
    assert lo == exact

    hi = average_precision(df, "score", "y", n_bins="auto",
                           auto_threshold=100, auto_bins=64).collect()[0]
    binned = average_precision(df, "score", "y", n_bins=64).collect()[0]
    assert hi == binned
    assert hi != exact  # the 64 coarse bins must actually engage


def test_auto_bins_exact_reprobe_near_threshold(spark):
    """The auto policy must be deterministic AT the threshold: the
    HLL estimate (±2%) lands inside the ±5% guard band, triggering an
    exact count_distinct re-probe, so the branch matches the oracle's
    exact-count branch on both sides of the boundary."""
    from dislib_spark.math.stats import roc_auc

    rows = [(float(i), float(i % 2)) for i in range(103)]
    df = spark.createDataFrame(rows, "score double, y double")
    # 103 distinct, threshold 100 → exact re-probe says 103 > 100 →
    # binned plan, equal to the explicit one
    over = roc_auc(df, "score", "y", n_bins="auto",
                   auto_threshold=100, auto_bins=16).collect()[0]
    binned = roc_auc(df, "score", "y", n_bins=16).collect()[0]
    assert over == binned

    df97 = spark.createDataFrame(rows[:97], "score double, y double")
    # 97 distinct, threshold 100 → exact re-probe says 97 <= 100 →
    # exact plan, regardless of HLL noise
    under = roc_auc(df97, "score", "y", n_bins="auto",
                    auto_threshold=100, auto_bins=16).collect()[0]
    exact = roc_auc(df97, "score", "y").collect()[0]
    assert under == exact


def test_kruskal_wallis_matches_scipy_formula(spark):
    """KW H with midrank ties vs a hand/naive computation on a small
    fixture (scipy's definition)."""
    import numpy as np

    from dislib_spark.math.stats import kruskal_wallis

    rng = np.random.default_rng(39)
    rows = []
    for g, (mu, n) in enumerate([(0.0, 40), (0.5, 35), (0.2, 45)]):
        for x in rng.normal(mu, 1.0, n):
            rows.append((round(float(x), 1), f"g{g}"))  # forces ties
    df = spark.createDataFrame(rows, "v double, g string")
    got = kruskal_wallis(df, "v", "g").collect()[0]

    # naive midrank computation
    vals = sorted(r[0] for r in rows)
    n = len(vals)
    import collections

    cnt = collections.Counter(vals)
    start, rank_of = 1, {}
    for v in sorted(cnt):
        t = cnt[v]
        rank_of[v] = start + (t - 1) / 2.0
        start += t
    groups = collections.defaultdict(list)
    for v, g in rows:
        groups[g].append(rank_of[v])
    s = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    tie = sum(t**3 - t for t in cnt.values())
    hc = h / (1 - tie / (n**3 - n))
    assert abs(got["h"] - h) < 1e-6
    assert abs(got["h_tie_corrected"] - hc) < 1e-6
    assert got["n"] == n and got["k"] == 3


def test_running_total_exact(spark):
    """with_running_total: inclusive decimal prefix sum in total
    order, independent of partitioning."""
    from pyspark.sql import functions as F

    from dislib_spark.utils.base import with_running_total

    rows = [(i, float((i * 13) % 37)) for i in range(500)]
    df = (
        spark.createDataFrame(rows, "id long, v double")
        .repartition(11)
        .select("id", F.col("v").cast("decimal(18,2)").alias("v"))
    )
    got = {
        r["id"]: float(r["cum"])
        for r in with_running_total(
            df, "v", [F.desc("v"), "id"], "cum"
        ).collect()
    }
    acc, want = 0.0, {}
    for i, v in sorted(rows, key=lambda r: (-r[1], r[0])):
        acc += v
        want[i] = acc
    assert all(abs(got[k] - want[k]) < 1e-9 for k in want)


def test_rank_tests_auto_bins_branch(spark):
    """m33/m39: n_bins="auto" picks the exact plan below the
    distinct-count threshold and the binned (bounded-window) plan
    above it — the last two ECDF-family kernels get the same
    m11/m23/m27 contract, pinned by equality with the explicitly
    requested plans on a ~3000-distinct-value column."""
    import numpy as np

    from dislib_spark.math.stats import kruskal_wallis, mann_whitney_u

    rng = np.random.default_rng(33)
    rows = [
        (float(s) + 0.15 * (i % 3), f"g{i % 3}")
        for i, s in enumerate(rng.normal(0.0, 1.0, 3000))
    ]
    df = spark.createDataFrame(rows, "val double, grp string")

    lo = mann_whitney_u(df, "val", "grp", "g0", "g1", n_bins="auto",
                        auto_threshold=1_000_000).collect()[0]
    exact = mann_whitney_u(df, "val", "grp", "g0", "g1").collect()[0]
    assert lo == exact
    hi = mann_whitney_u(df, "val", "grp", "g0", "g1", n_bins="auto",
                        auto_threshold=100, auto_bins=64).collect()[0]
    binned = mann_whitney_u(
        df, "val", "grp", "g0", "g1", n_bins=64
    ).collect()[0]
    assert hi == binned
    assert hi != exact  # the 64 coarse bins must actually engage
    # binning converges: finer bins land closer to the exact z
    fine = mann_whitney_u(
        df, "val", "grp", "g0", "g1", n_bins=1024
    ).collect()[0]
    assert abs(fine["z"] - exact["z"]) <= abs(hi["z"] - exact["z"]) + 1e-9
    assert abs(fine["z"] - exact["z"]) < 0.05

    klo = kruskal_wallis(df, "val", "grp", n_bins="auto",
                         auto_threshold=1_000_000).collect()[0]
    kexact = kruskal_wallis(df, "val", "grp").collect()[0]
    assert klo == kexact
    khi = kruskal_wallis(df, "val", "grp", n_bins="auto",
                         auto_threshold=100, auto_bins=64).collect()[0]
    kbinned = kruskal_wallis(df, "val", "grp", n_bins=64).collect()[0]
    assert khi == kbinned
    assert khi != kexact
    kfine = kruskal_wallis(df, "val", "grp", n_bins=1024).collect()[0]
    assert (
        abs(kfine["h"] - kexact["h"])
        <= abs(khi["h"] - kexact["h"]) + 1e-9
    )
    assert abs(kfine["h"] - kexact["h"]) < 0.5


def test_kruskal_degenerate_tie_correction_null(spark):
    """One distinct value: C = 1 - (N^3-N)/(N^3-N) = 0, so the
    tie-corrected H must surface as NULL, never NaN/Inf (ADVICE r5);
    the uncorrected H is exactly 0 (every midrank is (N+1)/2)."""
    from dislib_spark.math.stats import kruskal_wallis

    rows = [(1.0, "a"), (1.0, "a"), (1.0, "b"), (1.0, "b")]
    df = spark.createDataFrame(rows, "val double, grp string")
    got = kruskal_wallis(df, "val", "grp").collect()[0]
    assert got["h"] == 0.0
    assert got["h_tie_corrected"] is None
    assert got["n"] == 4 and got["k"] == 2


def test_running_total_offset_widening(spark):
    """Cross-partition offsets outgrow the input column's decimal
    precision: with decimal(18,2) values near its 16-integer-digit
    cap, cumulative offsets exceed the input type — they must be
    carried as decimal(38,2) and stay EXACT (never silently nulled
    and coalesced to 0, the ADVICE r5 failure mode)."""
    import decimal

    from pyspark.sql import functions as F

    from dislib_spark.utils.base import with_running_total

    big = decimal.Decimal("9000000000000000.25")  # 9e15: > 1e16 after 2 rows
    rows = [(i, big) for i in range(40)]
    df = (
        spark.createDataFrame(rows, "id long, v decimal(18,2)")
        .repartition(7)
    )
    got = {
        r["id"]: r["cum"]
        for r in with_running_total(df, "v", ["id"], "cum").collect()
    }
    assert got[0] == big
    for i in range(40):
        assert got[i] == big * (i + 1), (i, got[i])


def test_m40_minimax_equals_weighted_pav(spark):
    """m40's minimax identity (max_{j<=i} min_{k>=i} pooled avg) must
    equal sequential weighted pool-adjacent-violators on the same
    binned data — the textbook equivalence the query's docstring
    claims — and the fit must be monotone non-decreasing."""
    from dislib_spark.queries.ml import m40_isotonic_calibration

    rows = sorted(
        m40_isotonic_calibration(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) >= 3
    # reconstruct exact integer positives from the rounded frac_pos
    blocks = [
        [float(round(r["frac_pos"] * r["n"])), float(r["n"]), 1]
        for r in rows
    ]
    out = []
    for b in blocks:
        out.append(list(b))
        while (
            len(out) > 1
            and out[-2][0] / out[-2][1] > out[-1][0] / out[-1][1]
        ):
            s2, w2, c2 = out.pop()
            out[-1][0] += s2
            out[-1][1] += w2
            out[-1][2] += c2
    want = []
    for s, w, c in out:
        want += [s / w] * c
    cal = [r["calibrated"] for r in rows]
    for got, exp in zip(cal, want):
        assert got == pytest.approx(exp, abs=2e-6)
    assert all(b >= a for a, b in zip(cal, cal[1:]))


def test_brown_forsythe_matches_numpy(spark):
    """brown_forsythe vs the direct textbook computation (median-
    centered absolute deviations, one-way ANOVA F) on three heavily
    tied integer groups."""
    rng = np.random.default_rng(3)
    a = rng.integers(0, 15, 120).astype(float)
    b = rng.integers(0, 25, 90).astype(float)
    c = rng.integers(5, 20, 75).astype(float)
    rows = (
        [(float(v), "A") for v in a]
        + [(float(v), "B") for v in b]
        + [(float(v), "C") for v in c]
    )
    df = spark.createDataFrame(rows, ["v", "g"])
    from dislib_spark.math.stats import brown_forsythe

    got = brown_forsythe(df, "v", "g").collect()[0]
    groups = [a, b, c]
    zs = [np.abs(g - np.median(g)) for g in groups]
    n, k = sum(len(g) for g in groups), len(groups)
    zbar = np.concatenate(zs).mean()
    num = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs)
    den = sum(((z - z.mean()) ** 2).sum() for z in zs)
    ref = (n - k) / (k - 1) * num / den
    assert got["n"] == n and got["k"] == k
    assert got["df1"] == k - 1 and got["df2"] == n - k
    assert got["w"] == pytest.approx(ref, abs=1e-5)


def test_brown_forsythe_degenerate_returns_null_w(spark):
    """A single group (k=1) and an all-constant sample both make W
    meaningless -> NULL, not NaN/inf."""
    from dislib_spark.math.stats import brown_forsythe

    one = spark.createDataFrame(
        [(1.0, "A"), (2.0, "A"), (3.0, "A")], ["v", "g"]
    )
    assert brown_forsythe(one, "v", "g").collect()[0]["w"] is None
    const = spark.createDataFrame(
        [(5.0, "A"), (5.0, "A"), (5.0, "B"), (5.0, "B")], ["v", "g"]
    )
    assert brown_forsythe(const, "v", "g").collect()[0]["w"] is None


def test_m48_vif_numpy_parity(spark):
    """m48's closed-form 3x3 inverse diagonal vs numpy's
    inv(corrcoef) on the same lineitem regressors."""
    from dislib_spark.queries.ml import m48_vif
    from dislib_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    got = m48_vif(spark, SF_SMOKE).collect()[0]
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_quantity", "l_discount", "l_tax")
        .collect()
    )
    x = np.array([[r[0], r[1], r[2]] for r in rows], dtype=float)
    r = np.corrcoef(x, rowvar=False)
    vifs = np.diag(np.linalg.inv(r))
    assert got["vif_quantity"] == pytest.approx(vifs[0], abs=1e-5)
    assert got["vif_discount"] == pytest.approx(vifs[1], abs=1e-5)
    assert got["vif_tax"] == pytest.approx(vifs[2], abs=1e-5)
    assert got["r12"] == pytest.approx(r[0, 1], abs=1e-6)


def test_welch_anova_matches_reference(spark):
    """welch_anova vs the direct Welch (1951) computation on three
    groups with unequal variances."""
    from dislib_spark.math.stats import welch_anova

    rng = np.random.default_rng(5)
    groups = {
        "A": rng.normal(10, 1, 80),
        "B": rng.normal(10.5, 3, 60),
        "C": rng.normal(9.8, 0.5, 100),
    }
    rows = [
        (round(float(v), 4), g) for g, vs in groups.items() for v in vs
    ]
    df = spark.createDataFrame(rows, ["v", "g"])
    got = welch_anova(df, "v", "g").collect()[0]

    vals = [np.round(v, 4) for v in groups.values()]
    n = [len(v) for v in vals]
    m = [v.mean() for v in vals]
    s2 = [v.var(ddof=1) for v in vals]
    w = [ni / vi for ni, vi in zip(n, s2)]
    sw = sum(w)
    xw = sum(wi * mi for wi, mi in zip(w, m)) / sw
    k = 3
    num = sum(wi * (mi - xw) ** 2 for wi, mi in zip(w, m)) / (k - 1)
    t = sum((1 - wi / sw) ** 2 / (ni - 1) for wi, ni in zip(w, n))
    lam = 3 * t / (k * k - 1)
    ref_w = num / (1 + 2 * lam * (k - 2) / 3)
    assert got["n"] == sum(n) and got["k"] == k
    assert got["w"] == pytest.approx(ref_w, abs=1e-4)
    assert got["df2"] == pytest.approx(1 / lam, abs=1e-3)


def test_welch_anova_degenerate_null(spark):
    """Constant group, singleton group, or k=1 -> NULL statistic,
    never NaN/inf/ANSI division error."""
    from dislib_spark.math.stats import welch_anova

    const = spark.createDataFrame(
        [(5.0, "A"), (5.0, "A"), (6.0, "B"), (7.0, "B")], ["v", "g"]
    )
    r = welch_anova(const, "v", "g").collect()[0]
    assert r["w"] is None and r["df2"] is None
    single = spark.createDataFrame(
        [(5.0, "A"), (6.0, "A"), (7.0, "B")], ["v", "g"]
    )
    assert welch_anova(single, "v", "g").collect()[0]["w"] is None
    k1 = spark.createDataFrame(
        [(5.0, "A"), (6.0, "A"), (7.0, "A")], ["v", "g"]
    )
    assert welch_anova(k1, "v", "g").collect()[0]["w"] is None


def test_running_max_exact(spark):
    """with_running_max (x102's kernel): inclusive and
    strict-predecessor distributed prefix max in total order match a
    local replay, independent of input partitioning; the global
    first row's exclusive max is NULL."""
    from dislib_spark.utils.base import with_running_max

    rows = [(i, int((i * 17) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(13)
    inc = {
        r["id"]: r["rm"]
        for r in with_running_max(df, "v", ["id"], "rm").collect()
    }
    exc = {
        r["id"]: r["rm"]
        for r in with_running_max(
            df, "v", ["id"], "rm", inclusive=False
        ).collect()
    }
    best = None
    for i, v in rows:
        assert exc[i] == best
        best = v if best is None or v > best else best
        assert inc[i] == best
