"""ML estimator parity vs numpy closed-form / hand oracles
(SURVEY.md §5.2 #3 — sklearn isn't in this container, so oracles are
numpy implementations of the same math)."""

from __future__ import annotations

import numpy as np
import pytest

import dislib_spark as ds
from dislib_spark.cluster import DBSCAN, Daura, GaussianMixture, KMeans, lloyd_fit
from dislib_spark.classification import (
    LinearSVC,
    RandomForestClassifier,
    RandomForestRegressor,
)
from dislib_spark.decomposition import PCA
from dislib_spark.model_selection import GridSearchCV, KFold, train_test_split
from dislib_spark.preprocessing import MinMaxScaler, StandardScaler
from dislib_spark.recommendation import ALS
from dislib_spark.regression import Lasso, LinearRegression
from dislib_spark.utils import shuffle

RNG = np.random.RandomState(42)


def _blobs(n=120, centers=((0, 0), (6, 6), (0, 6)), spread=0.5):
    pts, labels = [], []
    per = n // len(centers)
    for i, c in enumerate(centers):
        pts.append(RNG.randn(per, len(c)) * spread + np.array(c))
        labels += [i] * per
    return np.vstack(pts), np.array(labels, dtype=float)


def test_linear_regression_matches_normal_eq(spark):
    X = RNG.randn(200, 3)
    w_true = np.array([2.0, -1.0, 0.5])
    yv = X @ w_true + 3.0 + RNG.randn(200) * 0.01
    x = ds.array(X, spark)
    y = ds.array(yv.reshape(-1, 1), spark)
    lr = LinearRegression().fit(x, y)
    # numpy oracle
    Z = np.hstack([X, np.ones((200, 1))])
    w_np = np.linalg.solve(Z.T @ Z, Z.T @ yv)
    assert np.allclose(lr.coef_, w_np[:3], atol=1e-8)
    assert np.isclose(lr.intercept_, w_np[3], atol=1e-8)
    pred = lr.predict(x).collect().ravel()
    assert np.allclose(pred, Z @ w_np, atol=1e-8)


def test_standard_scaler_parity(spark):
    X = RNG.randn(100, 4) * [1, 5, 0.1, 10] + [0, 3, -2, 100]
    x = ds.array(X, spark)
    sc = StandardScaler().fit(x)
    assert np.allclose(sc.mean_, X.mean(0), atol=1e-9)
    assert np.allclose(sc.scale_, X.std(0), atol=1e-9)
    xt = sc.transform(x).collect()
    assert np.allclose(xt, (X - X.mean(0)) / X.std(0), atol=1e-9)
    assert np.allclose(sc.inverse_transform(sc.transform(x)).collect(), X, atol=1e-8)


def test_minmax_scaler_parity(spark):
    X = RNG.rand(80, 3) * 7 - 2
    x = ds.array(X, spark)
    sc = MinMaxScaler(feature_range=(-1.0, 1.0)).fit(x)
    expected = (X - X.min(0)) / (X.max(0) - X.min(0)) * 2 - 1
    assert np.allclose(sc.transform(x).collect(), expected, atol=1e-9)
    assert np.allclose(sc.inverse_transform(sc.transform(x)).collect(), X, atol=1e-8)


def test_pca_matches_numpy_eigh(spark):
    X, _ = _blobs(90)
    x = ds.array(X, spark)
    pca = PCA(n_components=2).fit(x)
    cov = np.cov(X.T, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    assert np.allclose(pca.explained_variance_, w[:2], atol=1e-8)
    for c in range(2):  # up to sign
        dot = abs(np.dot(pca.components_[c], v[:, c]))
        assert np.isclose(dot, 1.0, atol=1e-8)
    # projection roundtrip
    xt = pca.transform(x)
    back = pca.inverse_transform(xt).collect()
    assert np.allclose(back, X, atol=1e-6)  # full rank here (d=2=k)


def test_kmeans_recovers_blobs(spark):
    X, labels = _blobs(150)
    x = ds.array(X, spark)
    km = KMeans(n_clusters=3, init="k-means||", max_iter=20, random_state=7).fit(x)
    pred = km.predict(x).collect().ravel()
    # same-blob rows share a cluster (purity 1.0 on separated blobs)
    for b in range(3):
        vals = pred[labels == b]
        assert len(np.unique(vals)) == 1
    # inertia close to numpy Lloyd oracle
    centers = km.centers
    d2 = ((X[:, None, :] - centers[None]) ** 2).sum(2).min(1).sum()
    assert d2 < 150 * 0.5**2 * 4


def test_lloyd_fit_matches_numpy_lloyd(spark):
    """Parity: same seeded init + same iteration count ⇒ same centers
    as a numpy Lloyd implementation (the reference's oracle style)."""
    X, _ = _blobs(90)
    x = ds.array(X, spark)
    centers, n_iter = lloyd_fit(x, n_clusters=3, max_iter=20, random_state=3)
    assert centers.shape == (3, 2)

    rng = np.random.RandomState(3)
    idx = sorted(rng.choice(90, 3, replace=False).tolist())
    c_np = X[idx].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - c_np[None]) ** 2).sum(2)
        assign = d2.argmin(1)
        for c in range(3):
            if (assign == c).any():
                c_np[c] = X[assign == c].mean(0)
    assert np.allclose(centers, c_np, atol=1e-6)


def test_gmm_diag_and_spherical(spark):
    X, labels = _blobs(150)
    x = ds.array(X, spark)
    for ct in ("diag", "spherical", "tied", "full"):
        gm = GaussianMixture(
            n_components=3, covariance_type=ct, max_iter=30, random_state=11
        ).fit(x)
        pred = gm.predict(x).collect().ravel()
        for b in range(3):
            vals, counts = np.unique(pred[labels == b], return_counts=True)
            assert counts.max() / counts.sum() > 0.95, (ct, b)


def test_dbscan_blobs(spark):
    X, labels = _blobs(120, spread=0.3)
    x = ds.array(X, spark)
    db = DBSCAN(eps=1.0, min_samples=4)
    pred = db.fit_predict(x).collect().ravel()
    assert db.n_clusters_ == 3
    for b in range(3):
        vals = pred[labels == b]
        vals = vals[vals >= 0]
        assert len(np.unique(vals)) == 1


def test_dbscan_noise(spark):
    X = np.vstack([RNG.randn(50, 2) * 0.2, [[50.0, 50.0]]])
    x = ds.array(X, spark)
    pred = DBSCAN(eps=1.0, min_samples=4).fit_predict(x).collect().ravel()
    assert pred[-1] == -1  # isolated point is noise
    assert (pred[:-1] >= 0).all()


def test_daura_clusters(spark):
    # 6 points, two tight groups at distance 10
    pts = np.array([0.0, 0.1, 0.2, 10.0, 10.1, 10.2])
    n = len(pts)
    rows = [
        (i, j, float(abs(pts[i] - pts[j])))
        for i in range(n)
        for j in range(n)
    ]
    dist = spark.createDataFrame(rows, "i long, j long, dist double")
    clusters = Daura(cutoff=0.5).fit_predict(dist)
    assert sorted(map(sorted, clusters)) == [[0, 1, 2], [3, 4, 5]]


def test_random_forest_classifier(spark):
    X, labels = _blobs(150)
    x = ds.array(X, spark)
    y = ds.array(labels.reshape(-1, 1), spark)
    rf = RandomForestClassifier(n_estimators=5, random_state=1).fit(x, y)
    assert rf.score(x, y) > 0.95
    rf_hard = RandomForestClassifier(
        n_estimators=5, random_state=1, hard_vote=True
    ).fit(x, y)
    assert rf_hard.score(x, y) > 0.95


def test_random_forest_regressor(spark):
    X = RNG.rand(200, 2) * 4
    yv = X[:, 0] * 3 + X[:, 1]
    x = ds.array(X, spark)
    y = ds.array(yv.reshape(-1, 1), spark)
    rf = RandomForestRegressor(n_estimators=10, random_state=1).fit(x, y)
    assert rf.score(x, y) > 0.9


def test_linear_svc(spark):
    X, labels = _blobs(100, centers=((0, 0), (6, 6)))
    x = ds.array(X, spark)
    y = ds.array(labels.reshape(-1, 1), spark)
    svc = LinearSVC(c=1.0).fit(x, y)
    pred = svc.predict(x).collect().ravel()
    assert (pred == labels).mean() > 0.97


def test_lasso_sparsifies(spark):
    X = RNG.randn(300, 5)
    yv = 3.0 * X[:, 0] + RNG.randn(300) * 0.01  # only feature 0 matters
    x = ds.array(X, spark)
    y = ds.array(yv.reshape(-1, 1), spark)
    lasso = Lasso(lmbd=0.1).fit(x, y)
    assert abs(lasso.coef_[0]) > 2.5
    assert np.all(np.abs(lasso.coef_[1:]) < 0.05)


def test_als_reconstructs(spark):
    # low-rank ratings: u·v with rank 2
    U = RNG.randn(30, 2)
    V = RNG.randn(20, 2)
    R = U @ V.T
    rows = [
        (int(u), int(i), float(R[u, i]))
        for u in range(30)
        for i in range(20)
        if RNG.rand() < 0.5
    ]
    ratings = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
    als = ALS(n_f=2, max_iter=10, lambda_=0.01, random_state=5).fit(ratings)
    rmse = -als.score(ratings)
    assert rmse < 0.2


def test_train_test_split_and_kfold(spark):
    X = RNG.randn(100, 3)
    yv = RNG.randn(100, 1)
    x, y = ds.array(X, spark), ds.array(yv, spark)
    x_tr, x_te, y_tr, y_te = train_test_split(x, y, test_size=0.3, random_state=1)
    assert x_tr.shape[0] + x_te.shape[0] == 100
    assert y_tr.shape[0] == x_tr.shape[0]
    # no overlap, all rows covered (by multiset of feature rows)
    all_rows = np.vstack([x_tr.collect(), x_te.collect()])
    assert np.allclose(
        np.sort(all_rows, axis=0), np.sort(X, axis=0), atol=1e-12
    )

    kf = KFold(n_splits=4)
    sizes = []
    for (xa, ya), (xb, yb) in kf.split(x, y):
        assert xa.shape[0] + xb.shape[0] == 100
        sizes.append(xb.shape[0])
    assert sum(sizes) == 100


def test_grid_search(spark):
    X, labels = _blobs(90)
    # shuffle so contiguous KFold folds contain all classes
    perm = np.random.RandomState(0).permutation(len(X))
    X, labels = X[perm], labels[perm]
    x = ds.array(X, spark)
    y = ds.array(labels.reshape(-1, 1), spark)
    gs = GridSearchCV(
        lambda **p: RandomForestClassifier(random_state=1, **p),
        {"n_estimators": [1, 5]},
        cv=3,
    ).fit(x, y)
    assert gs.best_score_ > 0.9
    assert gs.best_params_["n_estimators"] in (1, 5)
    assert gs.best_estimator_ is not None


def test_shuffle_preserves_rows(spark):
    X = RNG.randn(60, 2)
    yv = np.arange(60, dtype=float).reshape(-1, 1)
    x, y = ds.array(X, spark), ds.array(yv, spark)
    xs, ys = shuffle(x, y, random_state=4)
    Xs, Ys = xs.collect(), ys.collect()
    # same multiset, same pairing
    order = np.argsort(Ys.ravel())
    assert np.allclose(Xs[order], X, atol=1e-12)
    # actually permuted
    assert not np.allclose(Ys.ravel(), yv.ravel())


def test_ols_wide_path(spark):
    """d>16 routes through the packed-Gramian Arrow path; same
    solution as numpy."""
    X = RNG.randn(150, 20)
    w_true = RNG.randn(20)
    yv = X @ w_true + 1.5
    x = ds.array(X, spark)
    y = ds.array(yv.reshape(-1, 1), spark)
    lr = LinearRegression().fit(x, y)
    Z = np.hstack([X, np.ones((150, 1))])
    w_np = np.linalg.solve(Z.T @ Z, Z.T @ yv)
    assert np.allclose(lr.coef_, w_np[:20], atol=1e-8)
    assert np.isclose(lr.intercept_, w_np[20], atol=1e-8)


def test_simple_svc_numpy():
    from dislib_spark.classification.smo import SimpleSVC

    X, labels = _blobs(80, centers=((0, 0), (5, 5)), spread=0.6)
    for kernel in ("linear", "rbf"):
        clf = SimpleSVC(kernel=kernel, C=1.0, random_state=0).fit(X, labels)
        acc = (clf.predict(X) == labels).mean()
        assert acc > 0.95, (kernel, acc)
        assert 0 < len(clf.support_) < len(X)


def test_cascade_svm(spark):
    from dislib_spark.classification import CascadeSVM

    X, labels = _blobs(120, centers=((0, 0), (6, 6)), spread=0.6)
    perm = np.random.RandomState(3).permutation(len(X))
    X, labels = X[perm], labels[perm]
    x = ds.array(X, spark)
    y = ds.array(labels.reshape(-1, 1), spark)
    csvm = CascadeSVM(kernel="rbf", max_iter=2, random_state=0).fit(x, y)
    assert csvm.score(x, y) > 0.93


def test_gmm_mllib_backend(spark):
    X, labels = _blobs(150)
    x = ds.array(X, spark)
    gm = GaussianMixture(
        n_components=3, covariance_type="full", backend="mllib",
        max_iter=30, random_state=7,
    ).fit(x)
    assert gm.weights_.shape == (3,)
    assert gm.covariances_.shape == (3, 2, 2)
    pred = gm.predict(x).collect().ravel()
    assert len(np.unique(pred)) >= 2


def test_gmm_full_matches_structure(spark):
    """Native full EM recovers per-blob covariance scale."""
    X, labels = _blobs(150, spread=0.5)
    x = ds.array(X, spark)
    gm = GaussianMixture(
        n_components=3, covariance_type="full", max_iter=30, random_state=1
    ).fit(x)
    # each covariance ≈ 0.25·I (spread²)
    for c in range(3):
        diag = np.diag(gm.covariances_[c])
        assert np.all(diag > 0.05) and np.all(diag < 1.0)
        off = gm.covariances_[c][0, 1]
        assert abs(off) < 0.2


def test_knn_distance_weights_parity(spark):
    """knn_classify(weights='distance') vs a numpy implementation of
    sklearn's semantics (1/dist votes; exact matches take all).
    Reference classification/knn/base.py:29-39."""
    from dislib_spark.neighbors.knn import knn_classify

    rng = np.random.RandomState(7)
    X = rng.standard_normal((80, 4))
    y = rng.randint(0, 3, 80)
    # plant an exact duplicate so the zero-distance rule is exercised
    X[41] = X[3]
    y[41] = 2
    y[3] = 2
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], int(y[i])) for i in range(80)],
        "vec_id long, embedding array<double>, label int",
    )
    Q = np.vstack([X[:10], X[3:4]])  # query 10 includes an exact match
    queries = spark.createDataFrame(
        [(100 + i, [float(v) for v in Q[i]]) for i in range(len(Q))],
        "vec_id long, embedding array<double>",
    )
    k = 5
    got = {
        r["q_id"]: r["pred_label"]
        for r in knn_classify(queries, corpus, k=k, weights="distance").collect()
    }
    for qi in range(len(Q)):
        d = np.round(np.sqrt(((X - Q[qi]) ** 2).sum(axis=1)), 6)
        order = np.lexsort((np.arange(80), d))[:k]
        dd, ll = d[order], y[order]
        if (dd == 0).any():
            w = (dd == 0).astype(float)
        else:
            w = 1.0 / dd
        votes = {}
        for wi, li in zip(w, ll):
            votes[li] = votes.get(li, 0.0) + wi
        best = sorted(votes.items(), key=lambda t: (-t[1], t[0]))[0][0]
        assert got[100 + qi] == best, f"query {qi}"


def test_knn_callable_weights(spark):
    from pyspark.sql import functions as F

    from dislib_spark.neighbors.knn import knn_classify

    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, 0.0], 1), (2, [0.0, 1.1], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(9, [0.1, 0.0])], "vec_id long, embedding array<double>"
    )
    # exp(-d): the single close label-0 vote (e^-0.1 = 0.90) beats the
    # two far label-1 votes (e^-0.9 + e^-1.10 = 0.74)…
    out = knn_classify(
        queries, corpus, k=3, weights=lambda d: F.exp(-d)
    ).collect()
    assert out[0]["pred_label"] == 0
    # …while uniform voting flips it (two label-1 votes beat one)
    out = knn_classify(queries, corpus, k=3, weights="uniform").collect()
    assert out[0]["pred_label"] == 1


def test_logistic_regression_sklearn_parity(spark):
    """Separable blobs: accuracy ~1.0 and decision function sign
    agrees with sklearn's lbfgs fit on the same data."""
    import numpy as np

    import dislib_spark as ds
    from dislib_spark.classification import LogisticRegression

    rng = np.random.RandomState(11)
    x0 = rng.randn(80, 3) + np.array([2.0, 2.0, 0.0])
    x1 = rng.randn(80, 3) + np.array([-2.0, -2.0, 0.0])
    X = np.vstack([x0, x1])
    y = np.array([0.0] * 80 + [1.0] * 80)
    perm = rng.permutation(160)
    X, y = X[perm], y[perm]

    dx = ds.array(X, spark)
    dy = ds.array(y.reshape(-1, 1), spark)
    clf = LogisticRegression(max_iter=100).fit(dx, dy)
    assert clf.score(dx, dy) >= 0.99

    proba = clf.predict_proba(dx).collect()
    assert proba.shape == (160, 2)
    assert np.allclose(proba.sum(axis=1), 1.0, atol=1e-9)

    try:
        from sklearn.linear_model import LogisticRegression as SK
    except ImportError:
        return
    sk = SK(max_iter=200, C=1e6).fit(X, y)
    # same predictions on a held-out grid of fresh points
    Xt = rng.randn(50, 3)
    got = clf.predict(ds.array(Xt, spark)).collect().ravel()
    want = sk.predict(Xt)
    assert (got == want).mean() >= 0.95
