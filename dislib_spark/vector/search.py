"""Vector similarity search over embedding columns.

Operates on the ``embeddings`` schema (vec_id BIGINT,
embedding ARRAY<FLOAT>, label INT — FIXTURES.md §A).

Three tiers for the 100 TB target:

- ``cosine_topk``: brute-force exact top-k — query set broadcast
  against the corpus (one narrow map + per-query top-k window). The
  correctness baseline; linear in corpus size, embarrassingly
  parallel.
- ``lsh_topk``: random-hyperplane LSH bucketing (signed projections →
  bucket join) — candidates only from matching buckets, the scale
  path when the corpus no longer admits a full scan per query batch.
- ``ivf_topk``: IVF-style coarse quantization — KMeans centroids as
  the inverted index, probe the nearest n_probe cells only.

Dot products / norms are JVM higher-order functions
(zip_with/aggregate) — no Python in the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dislib_spark.utils.base import fan_out


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus scan; rank per query with a window.

    Norms are computed once per side in the projection (not per pair);
    the per-pair work is a single zip_with/aggregate dot product. The
    float ops per pair are identical to ``cosine_similarity`` (dot /
    (norm_a * norm_b)), so results match the naive form bit-for-bit.

    Returns (q_id, c_id, sim, rank), rank 1..k, ties broken by c_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "q_id",
        "c_id",
        F.round(
            _dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_nrm") * F.col("c_nrm")),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def mips_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by raw INNER PRODUCT (MIPS — the retrieval scoring
    used by recommender/two-tower models, where vector magnitude
    carries signal and cosine is the wrong metric).

    Same plan shape as :func:`cosine_topk`: broadcast query set ×
    corpus scan, one zip_with/aggregate dot per pair, per-query
    window top-k. Scale path: MIPS reduces to cosine by the standard
    augmentation (append sqrt(M² − ‖x‖²) to corpus vectors, 0 to
    queries, M = max corpus norm), after which every ANN index here
    (LSH/IVF/PQ) applies unchanged.

    Returns (q_id, c_id, dot, rank), rank 1..k, ties broken by c_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "q_id",
        "c_id",
        F.round(_dot(F.col("q_vec"), F.col("c_vec")), 6).alias("dot"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("dot"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ threshold), exact.

    Block-partitioned pair join (theta-join partitioning): each vector
    is assigned a block ``p = xxhash64(id) mod B`` and replicated to
    the ``B`` block-pair keys ``(min(p,q), max(p,q))``; pairs are then
    enumerated by an EQUI-join on the key. Every unordered pair meets
    in exactly one bucket (same-block pairs only in ``(p,p)``, guarded
    by the block-match predicate), so no post-hoc dedup is needed.

    Scale design: the inherent work for exact pair scoring is n²/2
    dots, but unlike a broadcast nested-loop join the shuffle spreads
    it across B(B+1)/2 key groups — replication factor B (rows), task
    parallelism B², no driver-side broadcast of the corpus, plan is a
    plain shuffled equi-join. Raise ``n_blocks`` with corpus size. For
    high thresholds (≥0.8) prefer ``neardup_pairs_lsh``: banded
    hyperplane-LSH candidates + the same exact re-rank, sub-quadratic.

    Norms are computed once per vector before replication; per-pair
    float ops (dot / (nrm_a * nrm_b)) are bit-identical to
    ``cosine_similarity``. Returns (a_id, b_id, sim), a_id < b_id.
    """
    B = n_blocks
    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("p"),
    )
    # Replicate each vector to its B block-pair keys via a narrow
    # explode (no cross join in the plan).
    rep = base.select(
        "id",
        "vec",
        "nrm",
        "p",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("q"),
    ).select(
        "id",
        "vec",
        "nrm",
        "p",
        F.least("p", "q").alias("lo"),
        F.greatest("p", "q").alias("hi"),
    )
    a = rep.select(
        F.col("id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
        F.col("p").alias("a_p"),
        "lo",
        "hi",
    )
    b = rep.select(
        F.col("id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
        F.col("p").alias("b_p"),
        "lo",
        "hi",
    )
    # Each pair meets exactly once: in bucket (lo,hi) == their block
    # multiset. a_p==lo & b_p==hi or a_p==hi & b_p==lo covers both
    # cross-block orders and pins same-block pairs to (p,p).
    pairs = a.join(b, ["lo", "hi"]).where(
        (F.col("a_id") < F.col("b_id"))
        & (
            ((F.col("a_p") == F.col("lo")) & (F.col("b_p") == F.col("hi")))
            | ((F.col("a_p") == F.col("hi")) & (F.col("b_p") == F.col("lo")))
        )
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 16,
    band_bits: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Sub-quadratic near-dup pairs for high thresholds: banded
    random-hyperplane LSH candidates + exact cosine re-rank.

    Candidate recall for a pair at similarity s is
    ``1 - (1 - p^band_bits)^n_bands`` with ``p = 1 - acos(s)/pi``
    (defaults: ≥0.99 at s=0.9 — gated by
    tests/test_ann_quality_skew.py). Candidates come from per-band
    bucket equi-joins, so the plan has no nested-loop join and work
    scales with bucket occupancy, not corpus².
    """
    if dim is None:
        dim = _infer_dim(df, vec_col)
    planes = _hyperplanes(dim, n_bands * band_bits, seed)
    base = fan_out(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("nrm"),
        *[
            lsh_signature(
                F.col(vec_col), planes[i * band_bits : (i + 1) * band_bits]
            ).alias(f"band_{i}")
            for i in range(n_bands)
        ],
    )
    sigs = base.select(
        "id",
        "vec",
        "nrm",
        F.posexplode(F.array(*[f"band_{i}" for i in range(n_bands)])).alias(
            "band_idx", "band_sig"
        ),
    )
    a = sigs.select(
        F.col("id").alias("a_id"),
        F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
        "band_idx",
        "band_sig",
    )
    b = sigs.select(
        F.col("id").alias("b_id"),
        F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
        "band_idx",
        "band_sig",
    )
    cand = (
        a.join(b, ["band_idx", "band_sig"])
        .where(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.select(
            "a_id",
            "b_id",
            F.round(
                _dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Read the embedding width from the data (one tiny job) instead
    of trusting a caller-supplied dim — a wrong dim would silently
    truncate zip_with projections to the shorter length."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row["d"])


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(<v, plane_i>)."""
    bits = []
    for plane in planes:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: join queries to corpus on the LSH bucket,
    exact cosine within the bucket. The bucket join replaces the full
    crossJoin — candidate count scales with bucket occupancy, not
    corpus size. ``dim`` is inferred from the corpus when not given
    (a stale caller-supplied dim would silently truncate the zip_with
    projection). Returns (q_id, c_id, sim, rank).
    """
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    planes = _hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
) -> tuple[DataFrame, DataFrame]:
    """Build the persistent IVF index: ``(centers, assignments)``.

    ``centers="kmeans"`` (default) trains the coarse quantizer with
    MLlib KMeans; ``centers="seed"`` takes the ``n_cells`` corpus
    vectors with the smallest ids as the cells — a deterministic,
    ANSI-replayable quantizer (the v04 oracle replays assignment,
    probing and scoring value-exactly). Same inverted-list layout and
    probe plan either way.

    ``centers`` is the tiny (cell, center) coarse-quantizer table;
    ``assignments`` is one row per corpus vector (c_id, c_vec, cell)
    — the inverted lists. Persist with
    ``assignments.write.partitionBy("cell").parquet(path)`` (plus
    ``centers`` alongside) and per-batch queries probe the stored
    lists WITHOUT rescanning or re-clustering the corpus: the probe
    equi-join on ``cell`` partition-prunes straight to the n_probe
    lists touched. Appending a new batch = assign its vectors with
    the SAME centers (``assign_to_cells``) and append — the
    vector-side twin of ``text.dedup.minhash_index``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if centers not in ("kmeans", "seed"):
        raise ValueError(f"centers must be 'kmeans' or 'seed', got {centers!r}")
    if centers == "seed":
        seed_rows = (
            corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .orderBy("_id")
            .limit(n_cells)
            .collect()
        )
        center_rows = [
            (i, [float(x) for x in r["_v"]]) for i, r in enumerate(seed_rows)
        ]
        centers_df = corpus.sparkSession.createDataFrame(
            center_rows, "cell int, center array<double>"
        )
        assigned = assign_to_cells(corpus, centers_df, id_col, vec_col)
        return centers_df, assigned

    corpus_vec = fan_out(corpus).select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell")
    model = km.fit(corpus_vec)
    assigned = model.transform(corpus_vec).select("c_id", "c_vec", "cell")
    centers = model.clusterCenters()
    center_rows = [(i, [float(v) for v in ctr]) for i, ctr in enumerate(centers)]
    centers_df = corpus.sparkSession.createDataFrame(
        center_rows, "cell int, center array<double>"
    )
    return centers_df, assigned


def ivf_query_index(
    queries: DataFrame,
    centers: DataFrame,
    assignments: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a (possibly parquet-stored) IVF index: nearest n_probe
    cells per query via the broadcast centers table, exact cosine on
    the probed inverted lists only. When ``assignments`` is read from
    a ``partitionBy("cell")`` parquet index, the cell equi-join
    partition-prunes the scan to the probed lists. Returns
    (q_id, c_id, sim, rank)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    assigned = assignments
    # nearest n_probe cells per query (centers are tiny → broadcast)
    qc = q.crossJoin(F.broadcast(centers)).select(
        "q_id",
        "q_vec",
        "cell",
        F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("center"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    wq = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = qc.withColumn("pr", F.row_number().over(wq)).where(
        F.col("pr") <= n_probe
    ).select("q_id", "q_vec", "cell")

    scored = F.broadcast(probes).join(assigned, "cell").select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
) -> DataFrame:
    """IVF coarse-quantized ANN: coarse centroids form the inverted
    index; each corpus vector is assigned to its nearest cell; each
    query probes its n_probe nearest cells and scores only those
    candidate lists. Composition of ``ivf_index`` + ``ivf_query_index``
    (build the index once and persist it when the corpus outlives the
    query batch); ``centers`` as in ``ivf_index``. Returns
    (q_id, c_id, sim, rank)."""
    ctrs, assigned = ivf_index(
        corpus, n_cells, seed, id_col, vec_col, centers=centers
    )
    return ivf_query_index(
        queries, ctrs, assigned, k=k, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col,
    )


def assign_to_cells(
    batch: DataFrame,
    centers: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors to an existing IVF index's cells (argmin
    L2 to the centers) — the append step that keeps a stored index
    current without re-clustering. Returns (c_id, c_vec, cell),
    union-compatible with ``ivf_index``'s assignment table.

    The centers table is driver-small by contract (n_cells rows), so
    the argmin is a literal-centers PROJECTION: per row, an array of
    n_cells d² values and one array_min/array_position pick. The
    previous crossJoin×n_cells + per-c_id window form shuffled
    n_cells× the corpus payload through an Exchange + sort just to
    keep rn=1 (guide §2.4: remove shuffles outright) — measured
    1.16 s vs 0.25 s at sf0.1 and unboundedly worse at scale. Float
    math is unchanged (same (a−c)² zip_with/aggregate per center,
    same double literals), and ties break to the lowest cell id
    exactly as the old ORDER BY d2, cell did (``array_position``
    returns the FIRST minimum in cell-id order)."""
    rows = sorted(
        (int(r["cell"]), [float(x) for x in r["center"]])
        for r in centers.collect()
    )
    b = fan_out(batch).select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
    )
    # ONE F.expr per derived column: the equivalent Column-API build
    # (n_cells × dim F.lit calls) costs ~1 ms of py4j PER CALL —
    # ~0.7 s of pure driver time per assignment plan at 16×64. The
    # SQL string parses JVM-side to the identical expression tree
    # (repr() round-trips doubles exactly; the D suffix forces
    # DoubleType, never ANSI decimal).
    def d2(ctr: list[float]) -> str:
        lits = ",".join(repr(c) + "D" for c in ctr)
        return (
            f"aggregate(zip_with(c_vec, array({lits}), "
            "(a, c) -> (CAST(a AS DOUBLE) - c) * (CAST(a AS DOUBLE) - c)), "
            "0.0D, (acc, v) -> acc + v)"
        )

    darr = "array(" + ",".join(d2(ctr) for _, ctr in rows) + ")"
    cells = "array(" + ",".join(str(cell) for cell, _ in rows) + ")"
    # d² array materialized once per row (_d2 column), then the
    # argmin pick reads the bound reference — no re-evaluation
    return (
        b.select("c_id", "c_vec", F.expr(darr).alias("_d2"))
        .select(
            "c_id",
            "c_vec",
            F.expr(
                f"element_at({cells}, "
                "CAST(array_position(_d2, array_min(_d2)) AS INT))"
            ).alias("cell"),
        )
    )


def pq_codebooks(
    corpus: DataFrame,
    n_subvectors: int = 8,
    n_centroids: int = 16,
    seed: int = 29,
    vec_col: str = "embedding",
    dim: int | None = None,
    method: str = "kmeans",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split vectors into
    ``n_subvectors`` contiguous slices, KMeans each slice
    independently (MLlib, distributed). Returns
    ``codebooks[m][c] = centroid c of subspace m`` — tiny
    (m·c·dim/m floats), lives on the driver/broadcasts.

    Compression story: a float32 d-dim vector (4d bytes) becomes
    ``n_subvectors`` uint8 codes — 96x smaller at d=64/m=8 — so a
    100 TB embedding corpus's index fits hot in memory and the
    exact re-rank only touches the short candidate list."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if method not in ("kmeans", "seed"):
        raise ValueError(f"method must be 'kmeans' or 'seed', got {method!r}")
    if dim is None:
        dim = _infer_dim(corpus, vec_col)
    sub = dim // n_subvectors
    if method == "seed":
        # Deterministic, ANSI-replayable codebooks: the n_centroids
        # lowest-id corpus vectors, unit-normalized, sliced per
        # subspace — the v06 oracle replays encode/ADC value-exactly.
        import numpy as np

        rows = (
            corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
            .orderBy("_id")
            .limit(n_centroids)
            .collect()
        )
        X = np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)
        nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
        nrm[nrm == 0.0] = 1.0
        X = X / nrm
        return [
            X[:, m * sub : (m + 1) * sub].tolist()
            for m in range(n_subvectors)
        ]
    # L2-normalize first: ADC approximates L2, and L2 on unit vectors
    # is monotone with cosine (the metric the re-rank and the exact
    # baseline use). Norm projected to a named column before the HOF.
    src = (
        fan_out(corpus)
        .select(
            F.col(vec_col).cast("array<double>").alias("_raw"),
            _norm(F.col(vec_col)).alias("_nrm"),
        )
        .select(
            F.transform(F.col("_raw"), lambda x: x / F.col("_nrm")).alias("v")
        )
    )
    # Codebooks are trained on a deterministic hash-sample (standard
    # PQ practice — FAISS trains on ~10-100k vectors regardless of
    # corpus size): 8 full-corpus KMeans fits were the 500k-smoke
    # bottleneck. The sampled projection is checkpointed ONCE and
    # all n_subvectors fits slice it — not one corpus scan per fit.
    sample_cap = 100_000
    n = corpus.count()
    if n > sample_cap:
        # modulus 10**9 keeps the fraction from truncating to zero
        # until n > 1e14 rows; max(1, ...) guards even past that
        mod = 1_000_000_000
        keep = max(1, int(mod * sample_cap / n))
        src = src.where(F.pmod(F.xxhash64(F.col("v")), F.lit(mod)) < keep)
    src = src.localCheckpoint(eager=False)
    books = []
    for m in range(n_subvectors):
        sl = src.select(
            array_to_vector(F.slice("v", m * sub + 1, sub)).alias("_s")
        )
        km = KMeans(
            k=n_centroids,
            seed=seed + m,
            featuresCol="_s",
            predictionCol="c",
            maxIter=10,
        )
        model = km.fit(sl)
        books.append(
            [[float(x) for x in ctr] for ctr in model.clusterCenters()]
        )
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as its per-subspace nearest-centroid codes
    (array<int>, one per subvector). Vectorized numpy under
    ``mapInArrow`` (one argmin matmul per subspace per Arrow batch,
    codebooks shipped once via closure) — the m·c per-row
    expression-tree folds of the first cut recomputed the normalize
    inside every lambda (no CSE in lambda bodies) and measured 100×
    slower at 500k rows; dense pairwise math belongs in BLAS, the
    semantic-dedup lesson. Shuffle-free narrow map either way.
    Returns (id, *keep, codes) — ``keep`` names extra input columns
    passed through the Arrow batch untouched, so a caller that
    already carries e.g. the IVF cell can get (id, cell, codes) from
    ONE narrow pass instead of joining two corpus-sized tables."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    B = np.asarray(codebooks, dtype=np.float64)  # (m, c, sub)
    bnorm2 = (B * B).sum(axis=2)  # (m, c)

    staged = fan_out(corpus).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        F.col(vec_col).cast("array<double>").alias("_raw"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id", staged.schema["id"].dataType, True),
            *[staged.schema[c] for c in keep],
            T.StructField(
                "codes", T.ArrayType(T.IntegerType(), False), False
            ),
        ]
    )

    def fn(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index("_raw"))
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64, copy=False).reshape(len(col), -1)
            nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            X = X / nrm
            codes = np.empty((len(col), n_sub), dtype=np.int32)
            for m in range(n_sub):
                Xm = X[:, m * sub : (m + 1) * sub]
                # argmin ||x−c||² == argmin (−2x·c + ||c||²)
                codes[:, m] = (bnorm2[m] - 2.0 * (Xm @ B[m].T)).argmin(
                    axis=1
                )
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index("id"))]
                + [
                    b.column(b.schema.get_field_index(c))
                    for c in keep
                ]
                + [pa.array(codes.tolist(), type=pa.list_(pa.int32()))],
                names=["id", *keep, "codes"],
            )

    return staged.mapInArrow(fn, out_schema)


def _adc_table_sql(
    books: list[list[list[float]]],
    raw_col: str = "_qraw",
    nrm_col: str = "_qnrm",
) -> str:
    """SQL string for the per-query ADC distance table
    ``dt[m][c] = ||q_unit_m − book[m][c]||²`` — the exact expression
    tree the previous Column-API loop built, parsed JVM-side in ONE
    py4j call instead of ~1k (n_subvectors × n_centroids F.lit calls
    measured ~0.7 s of pure driver build time per plan). Same
    operators, same literal doubles (repr round-trips exactly, D
    suffix forces DoubleType), so values and plans are unchanged."""
    sub = len(books[0][0])
    parts = []
    for m, book in enumerate(books):
        sl = (
            f"slice(transform({raw_col}, x -> x / {nrm_col}), "
            f"{m * sub + 1}, {sub})"
        )
        cents = ",".join(
            "aggregate(zip_with(" + sl + ", array("
            + ",".join(repr(float(v)) + "D" for v in ctr)
            + "), (a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
            for ctr in book
        )
        parts.append(f"array({cents})")
    return "array(" + ",".join(parts) + ")"


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_subvectors: int = 8,
    n_centroids: int = 32,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 100,
    codebooks: str = "kmeans",
) -> DataFrame:
    """PQ asymmetric-distance ANN: corpus stored as PQ codes; each
    query precomputes a (subspace x centroid) distance table and
    scores candidates by summing table lookups (ADC), then the top
    ``rerank`` candidates are re-scored with exact cosine.

    ``codebooks``: ``"kmeans"`` (default, MLlib-trained) or ``"seed"``
    (lowest-id vectors as centroids — deterministic, DuckDB-replayable
    end to end; see ``pq_codebooks``).

    Scale: the scored join is query-broadcast x codes (codes are
    ~d/32 of the raw corpus bytes), per-candidate work is
    ``n_subvectors`` array lookups; the exact re-rank touches only
    ``rerank`` rows per query. Returns (q_id, c_id, sim, rank)."""
    books = pq_codebooks(
        corpus, n_subvectors, n_centroids, seed, vec_col=vec_col,
        method=codebooks, id_col=id_col,
    )
    codes = pq_encode(corpus, books, id_col, vec_col).localCheckpoint()

    # per-query ADC table: dist_table[m][c] = ||q_m - book[m][c]||²
    # on the UNIT query vector (codebooks are unit-space too), built
    # JVM-side from the broadcast-small codebook literals (one parsed
    # SQL expression — see _adc_table_sql)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(vec_col).cast("array<double>").alias("_qraw"),
        _norm(F.col(vec_col)).alias("_qnrm"),
    ).select("q_id", "q_vec", F.expr(_adc_table_sql(books)).alias("dt"))

    # ADC score: sum_m dt[m][codes[m]] — n_subvectors lookups/pair
    adc = F.aggregate(
        F.zip_with(
            F.col("dt"),
            F.col("codes"),
            lambda t, c: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        F.broadcast(q).crossJoin(codes)
        .select("q_id", "q_vec", F.col("id").alias("c_id"), adc.alias("adc"))
    )
    wq = Window.partitionBy("q_id").orderBy("adc", "c_id")
    short = cand.withColumn("r", F.row_number().over(wq)).where(
        F.col("r") <= rerank
    ).select("q_id", "q_vec", "c_id")

    exact = short.join(
        corpus.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_id",
    ).select(
        "q_id",
        "c_id",
        F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return exact.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivfpq_index(
    corpus: DataFrame,
    n_cells: int = 16,
    n_subvectors: int = 8,
    n_centroids: int = 16,
    seed: int = 17,
    pq_seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
    codebooks: str = "kmeans",
) -> tuple[DataFrame, list[list[list[float]]], DataFrame]:
    """Build the composed IVF-PQ index: ``(coarse_centers, codebooks,
    cell_codes)``. ``cell_codes`` is the persistable stored-index
    table — one row per corpus vector carrying its cell AND its PQ
    codes; write it ``partitionBy("cell")`` (centers + codebooks
    alongside, both driver-small) and probe batches touch only their
    n_probe lists without rescanning or re-clustering the corpus.
    Build cost (two quantizer trainings + one encode pass + one
    id-equi join) is paid ONCE per index lifetime — the per-query
    economics live in :func:`ivfpq_query_index`."""
    ctrs, assigned = ivf_index(
        corpus, n_cells, seed, id_col, vec_col, centers=centers
    )
    books = pq_codebooks(
        corpus, n_subvectors, n_centroids, pq_seed, vec_col=vec_col,
        method=codebooks, id_col=id_col,
    )
    # cell + codes in ONE narrow pass: the assignment (a projection)
    # flows straight into the encode mapInArrow with the cell carried
    # through the Arrow batch — no corpus×corpus c_id equi-join, so
    # the index build has no join shuffle at all (guide §2.4; at
    # scale the old join shuffled both corpus-sized sides)
    cell_codes = pq_encode(
        assigned, books, id_col="c_id", vec_col="c_vec", keep=("cell",)
    ).select(F.col("id").alias("c_id"), "cell", "codes")
    return ctrs, books, cell_codes


def ivfpq_query_index(
    queries: DataFrame,
    centers: DataFrame,
    books: list[list[list[float]]],
    cell_codes: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a (possibly parquet-stored) IVF-PQ index: candidate
    GENERATION is IVF cell pruning (each query probes its ``n_probe``
    nearest coarse cells — the cell equi-join partition-prunes a
    ``partitionBy("cell")`` stored index to those lists), candidate
    SCORING is PQ asymmetric-distance lookups on the compressed codes
    (``n_subvectors`` array lookups per candidate, never the raw
    floats), and EXACT cosine runs only on the top ``rerank`` ADC
    candidates per query, fetched from ``vectors`` (the raw
    (id, vec) table — touched for rerank·|Q| rows only). No stage is
    corpus-broadcast or corpus-crossJoin. Returns
    (q_id, c_id, sim, rank)."""
    # per-query: nearest n_probe cells (broadcast coarse centers) and
    # the ADC distance table on the UNIT query vector, built JVM-side
    # (one parsed SQL expression — see _adc_table_sql)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(vec_col).cast("array<double>").alias("_qraw"),
        _norm(F.col(vec_col)).alias("_qnrm"),
    ).select(
        "q_id", "q_vec", "_qraw",
        F.expr(_adc_table_sql(books)).alias("dt"),
    )
    qc = q.crossJoin(F.broadcast(centers)).select(
        "q_id",
        "q_vec",
        "dt",
        "cell",
        F.aggregate(
            F.zip_with(
                F.col("_qraw"),
                F.col("center"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    wp = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = (
        qc.withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= n_probe)
        .select("q_id", "q_vec", "dt", "cell")
    )

    # ADC over the probed lists only: equi-join on cell (partition-
    # pruning on a stored index), score = sum of table lookups
    adc = F.aggregate(
        F.zip_with(
            F.col("dt"),
            F.col("codes"),
            lambda t, c: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = F.broadcast(probes).join(cell_codes, "cell").select(
        "q_id", "q_vec", "c_id", adc.alias("adc")
    )
    wq = Window.partitionBy("q_id").orderBy("adc", "c_id")
    short = (
        cand.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= rerank)
        .select("q_id", "q_vec", "c_id")
    )
    exact = short.join(
        vectors.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_id",
    ).select(
        "q_id",
        "c_id",
        F.round(
            cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return exact.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    n_subvectors: int = 8,
    n_centroids: int = 16,
    rerank: int = 50,
    seed: int = 17,
    pq_seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
    codebooks: str = "kmeans",
) -> DataFrame:
    """IVF-PQ composed ANN — the production FAISS ``IVFPQ`` shape:
    :func:`ivfpq_index` (build once, persist when the corpus outlives
    the query batch) composed with :func:`ivfpq_query_index` (cell-
    pruned candidates, ADC scoring on compressed codes, exact cosine
    re-rank on the ``rerank`` shortlist only). Codes quantize the
    full unit vector (flat PQ, matching ``pq_topk``/``pq_encode``),
    not the cell residual — the variant the v29/v28 maintenance and
    distortion kernels already audit.

    ``centers``/``codebooks``: "kmeans" (MLlib-trained) or "seed"
    (lowest-id deterministic — DuckDB-replayable end to end, the v31
    oracle). Returns (q_id, c_id, sim, rank)."""
    ctrs, books, cell_codes = ivfpq_index(
        corpus, n_cells, n_subvectors, n_centroids, seed, pq_seed,
        id_col, vec_col, centers, codebooks,
    )
    return ivfpq_query_index(
        queries, ctrs, books, cell_codes, corpus,
        k=k, n_probe=n_probe, rerank=rerank,
        id_col=id_col, vec_col=vec_col,
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009): merge any
    number of ranked candidate lists into one score,
    ``rrf(d) = Σ_lists 1 / (k + rank_list(d))`` — the standard hybrid
    (lexical + dense) retrieval combiner; k=60 is the published
    default. Items absent from a list contribute nothing (no rank
    imputation), so each list only needs its top-N.

    Scale shape: a UNION ALL of top-N lists (each already bounded) and
    one aggregation on the id — no corpus-sized work and no join
    between the lists. Deterministic: the 1/(k+rank) terms per id are
    a fixed multiset, so the sum is partitioning-independent (≤ a few
    terms; IEEE addition is commutative).

    Returns (id, rrf, n_lists).
    """
    tagged = [
        df.select(
            F.col(id_col).alias("_id"),
            (1.0 / (F.lit(float(k)) + F.col(rank_col))).alias("_term"),
        )
        for df in ranked_lists
    ]
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionAll(t)
    return (
        allr.groupBy("_id")
        .agg(
            F.round(F.sum("_term"), 6).alias("rrf"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .select(F.col("_id").alias(id_col), "rrf", "n_lists")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors whose LABEL DIFFERS from the
    query's (the near-boundary negatives a two-tower/contrastive loss
    learns most from).

    Same broadcast-query × corpus-scan plan as :func:`cosine_topk`;
    the label inequality is a pre-ranking filter pushed into the
    joined scan, so mismatched pairs never reach the window. Not in
    the reference (no vector layer); standard embedding-training
    surface.

    Returns (q_id, q_label, c_id, sim, rank), rank 1..k, ties by c_id.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(label_col).alias("q_label"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("c_id"),
        F.col(label_col).alias("c_label"),
        F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("c_label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "c_id",
            F.round(
                _dot(F.col("q_vec"), F.col("c_vec"))
                / (F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def mmr_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    fetch_k: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR 1998): fetch the exact cosine top-``fetch_k``
    per query, then greedily select ``k`` results maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)``.

    Scale split: candidate generation is the distributed part (the
    corpus-sized scan of :func:`cosine_topk`); the greedy loop is
    inherently sequential but only ever sees ``fetch_k`` vectors, so
    it runs per query group in ONE Arrow batch via
    ``groupBy().applyInPandas`` — per-query work is O(fetch_k²·dim)
    numpy, queries parallelize across executors, nothing touches the
    driver.

    Deterministic: ties broken by lowest candidate id at every pick.
    Returns (q_id, c_id, sim, mmr_score, rank), rank 1..k.
    """
    import numpy as np
    import pandas as pd

    cand = cosine_topk(queries, corpus, k=fetch_k, id_col=id_col,
                       vec_col=vec_col)
    cand = cand.join(
        corpus.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_id",
    )

    # id columns inherit the caller's id_col type (string doc ids are
    # as valid as bigint vec ids)
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = (
        f"q_id {id_type}, c_id {id_type}, sim double, "
        "mmr_score double, rank int"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["sim", "c_id"],
                              ascending=[False, True]).reset_index(drop=True)
        vecs = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["c_vec"]]
        )
        nrm = np.linalg.norm(vecs, axis=1)
        nrm[nrm == 0.0] = 1.0
        unit = vecs / nrm[:, None]
        sims = pdf["sim"].to_numpy()
        ids = pdf["c_id"].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        remaining = list(range(n))
        while remaining and len(chosen) < k:
            if not chosen:
                best_i, best_s = remaining[0], sims[remaining[0]]
            else:
                sel = unit[chosen]
                best_i, best_s = -1, -np.inf
                for i in remaining:
                    red = float(np.max(sel @ unit[i]))
                    s = lam * sims[i] - (1.0 - lam) * red
                    if s > best_s or (s == best_s and ids[i] < ids[best_i]):
                        best_i, best_s = i, s
            chosen.append(best_i)
            scores.append(float(best_s))
            remaining.remove(best_i)
        out = pdf.iloc[chosen][["q_id", "c_id", "sim"]].copy()
        out["mmr_score"] = [round(s, 6) for s in scores]
        out["rank"] = range(1, len(chosen) + 1)
        return out

    return cand.groupBy("q_id").applyInPandas(greedy, schema)


def ivf_index_maintain(
    spark,
    index_path: str,
    centers: DataFrame,
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """UPSERT/DELETE maintenance against a ``partitionBy("cell")``
    stored IVF assignments table — the index-lifecycle step between
    ``ivf_index`` (build) and ``ivf_query_index`` (probe), reference
    analogue the incremental fit surface of ``neighbors/base.py``.

    Cell-scoped copy-on-write: only the cell partitions that hold an
    old version of a touched id, or receive a new/updated vector, are
    rewritten (crash-safe tmp+rename swap via
    ``sources.merge.replace_partitions_path``); every other inverted
    list's files are untouched — at 100 TB the rewrite cost is
    proportional to the maintenance batch's cell fan-out, never the
    index. An update that moves a vector between cells rewrites both
    its old and new cell; a cell whose last vectors are deleted has
    its directory removed, and a brand-new cell's directory is
    created. A crash mid-maintenance never corrupts untouched cells:
    the replacement partitions are durable in a sibling directory
    before any rename, and an interrupted swap rolls forward on the
    next call.

    Upserts are assigned with the STORED (stale) centers — the IVF
    maintenance contract: the coarse quantizer is retrained on
    rebuild, never on append (matching ``assign_to_cells``).
    """
    from dislib_spark.sources.merge import (
        _recover_partition_swap,
        replace_partitions_path,
    )

    if upserts is None and deletes is None:
        return
    _recover_partition_swap(index_path, "cell")
    stored = spark.read.parquet(index_path)
    parts = []
    if upserts is not None:
        parts.append(upserts.select(F.col(id_col).alias("c_id")))
    if deletes is not None:
        parts.append(deletes.select(F.col(id_col).alias("c_id")))
    touched = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    touched = touched.distinct()
    new_assign = (
        assign_to_cells(upserts, centers, id_col, vec_col)
        if upserts is not None
        else None
    )
    affected = (
        stored.join(F.broadcast(touched), "c_id", "left_semi")
        .select("cell")
        .distinct()
    )
    if new_assign is not None:
        affected = affected.union(
            new_assign.select("cell")
        ).distinct()
    cells = [r["cell"] for r in affected.collect()]
    if not cells:
        return
    kept = stored.where(F.col("cell").isin(cells)).join(
        F.broadcast(touched), "c_id", "left_anti"
    )
    out = kept if new_assign is None else kept.unionByName(new_assign)
    replace_partitions_path(index_path, "cell", cells, out)


def pq_distortion(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(vector, subspace) quantization error of a PQ codebook:
    min over centroids of the squared L2 residual on the normalized
    slice, plus the winning code — the raw material for the v28
    distortion audit (per-subspace MSE and code-usage balance decide
    whether a codebook needs retraining before anyone trusts its ADC
    scores). Same BLAS-under-``mapInArrow`` shape and normalization
    as :func:`pq_encode` (argmin AND min from one distance matrix per
    subspace); shuffle-free narrow map, 1→m row fan-out.
    Returns (id, m, code, min_d2)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    B = np.asarray(codebooks, dtype=np.float64)
    bnorm2 = (B * B).sum(axis=2)

    staged = fan_out(corpus).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_raw"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id", staged.schema["id"].dataType, True),
            T.StructField("m", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField("min_d2", T.DoubleType(), False),
        ]
    )

    def fn(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index("_raw"))
            ids = b.column(b.schema.get_field_index("id"))
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64, copy=False).reshape(len(col), -1)
            nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            X = X / nrm
            n = len(col)
            out_id, out_m, out_c, out_d = [], [], [], []
            idv = ids.to_pylist()
            for m in range(n_sub):
                Xm = X[:, m * sub : (m + 1) * sub]
                # full ||x−c||² = ||x||² − 2x·c + ||c||² (exact, not
                # the argmin-only shortcut: the VALUE matters here)
                xnorm2 = (Xm * Xm).sum(axis=1, keepdims=True)
                D = xnorm2 - 2.0 * (Xm @ B[m].T) + bnorm2[m]
                c = D.argmin(axis=1)
                out_id.extend(idv)
                out_m.extend([m] * n)
                out_c.extend(int(x) for x in c)
                out_d.extend(float(D[i, c[i]]) for i in range(n))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id),
                    pa.array(out_m, type=pa.int32()),
                    pa.array(out_c, type=pa.int32()),
                    pa.array(out_d, type=pa.float64()),
                ],
                names=["id", "m", "code", "min_d2"],
            )

    return staged.mapInArrow(fn, out_schema)


def pq_index_maintain(
    spark,
    index_path: str,
    codebooks: list[list[list[float]]],
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """UPSERT/DELETE maintenance against a ``partitionBy("cell")``
    stored PQ codes table (cell = first subspace code) — the
    :func:`ivf_index_maintain` contract applied to the PQ index:
    upserts are encoded with the STORED (stale) codebooks (codebooks
    retrain on rebuild, never on append — the drift that v29's
    distortion audit measures), and the rewrite is cell-scoped
    copy-on-write via the crash-safe
    ``sources.merge.replace_partitions_path`` swap: only partitions
    holding an old version of a touched id or receiving a new code
    are rewritten; a cell left empty has its directory removed, a
    new first-code cell is created, and an interrupted maintenance
    rolls forward on the next call."""
    from dislib_spark.sources.merge import (
        _recover_partition_swap,
        replace_partitions_path,
    )

    if upserts is None and deletes is None:
        return
    _recover_partition_swap(index_path, "cell")
    stored = spark.read.parquet(index_path)
    parts = []
    if upserts is not None:
        parts.append(upserts.select(F.col(id_col).alias("id")))
    if deletes is not None:
        parts.append(deletes.select(F.col(id_col).alias("id")))
    touched = (
        parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    ).distinct()
    new_codes = (
        pq_encode(upserts, codebooks, id_col, vec_col).withColumn(
            "cell", F.col("codes")[0]
        )
        if upserts is not None
        else None
    )
    affected = (
        stored.join(F.broadcast(touched), "id", "left_semi")
        .select("cell")
        .distinct()
    )
    if new_codes is not None:
        affected = affected.union(new_codes.select("cell")).distinct()
    cells = [r["cell"] for r in affected.collect()]
    if not cells:
        return
    kept = stored.where(F.col("cell").isin(cells)).join(
        F.broadcast(touched), "id", "left_anti"
    )
    out = kept if new_codes is None else kept.unionByName(new_codes)
    replace_partitions_path(index_path, "cell", cells, out)


def pq_stored_residuals(
    vectors: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(vector, subspace) residual of the codes a SERVING index
    actually stores — ``codes`` joined to the current raw vectors,
    d² = ||x_m − book[m][stored_code]||² on the unit-normalized
    slice (the :func:`pq_distortion` math with the argmin replaced
    by the stored lookup). Hash-equal to ``pq_distortion`` exactly
    when the stored codes ARE the argmin under ``codebooks`` — which
    is what v29 value-checks after maintenance. Same
    BLAS-under-``mapInArrow`` shape; the join is the only shuffle.
    Returns (id, m, code, d2)."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import types as T

    n_sub = len(codebooks)
    sub = len(codebooks[0][0])
    B = np.asarray(codebooks, dtype=np.float64)

    staged = (
        fan_out(vectors)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("_raw"),
        )
        .join(codes.select("id", "codes"), "id")
    )
    out_schema = T.StructType(
        [
            T.StructField("id", staged.schema["id"].dataType, True),
            T.StructField("m", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField("d2", T.DoubleType(), False),
        ]
    )

    def fn(batches):
        for b in batches:
            col = b.column(b.schema.get_field_index("_raw"))
            cds = b.column(b.schema.get_field_index("codes"))
            ids = b.column(b.schema.get_field_index("id")).to_pylist()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64, copy=False).reshape(
                len(col), -1
            )
            nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
            nrm[nrm == 0.0] = 1.0
            X = X / nrm
            C = np.asarray(cds.to_pylist(), dtype=np.int64).reshape(
                len(col), n_sub
            )
            n = len(col)
            out_id, out_m, out_c, out_d = [], [], [], []
            for m in range(n_sub):
                Xm = X[:, m * sub : (m + 1) * sub]
                R = Xm - B[m][C[:, m]]
                d2 = (R * R).sum(axis=1)
                out_id.extend(ids)
                out_m.extend([m] * n)
                out_c.extend(int(x) for x in C[:, m])
                out_d.extend(float(x) for x in d2)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id),
                    pa.array(out_m, type=pa.int32()),
                    pa.array(out_c, type=pa.int32()),
                    pa.array(out_d, type=pa.float64()),
                ],
                names=["id", "m", "code", "d2"],
            )

    return staged.mapInArrow(fn, out_schema)


def ivfsq_index(
    corpus: DataFrame,
    n_cells: int = 16,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the composed IVF-SQ8 index (the FAISS ``IVF,SQ8`` shape):
    ``(coarse_centers, sq8_stats, cell_codes)``. Candidate GENERATION
    is IVF cell pruning exactly as :func:`ivf_index`; candidate
    STORAGE is int8 scalar-quantized codes (``vector.quantize`` —
    per-dimension min/max grid over the corpus, 4× smaller than raw
    float32 and, unlike PQ, decodable per dimension without a trained
    codebook). ``cell_codes`` is the persistable stored-index table —
    one row per corpus vector carrying its cell AND its SQ8 codes;
    write it ``partitionBy("cell")`` (centers + the 1-row stats frame
    alongside, both driver-small) and probe batches touch only their
    n_probe lists. Build cost (one quantizer pass + one min/max
    aggregation + one encode pass + one id-equi join) is paid once
    per index lifetime."""
    from dislib_spark.vector.quantize import (
        sq8_encode_with_stats,
        sq8_stats,
    )

    d = dim if dim is not None else _infer_dim(corpus, vec_col)
    ctrs, assigned = ivf_index(
        corpus, n_cells, seed, id_col, vec_col, centers=centers
    )
    # ONE stats pass feeds both the encode and the returned grid:
    # sq8_encode would re-derive sq8_stats from the corpus, putting a
    # second full min/max aggregation scan in the plan (identical
    # values — the same corpus — so reuse is free); the lazy
    # checkpoint materializes the 1-row grid once for its two
    # consumers instead of re-aggregating the corpus per consumer
    stats = sq8_stats(corpus, vec_col, d).localCheckpoint(eager=False)
    # cell + codes in ONE narrow chain over the assignment projection
    # (encode is a JVM transform against the broadcast grid) — no
    # corpus×corpus c_id equi-join in the index build (guide §2.4)
    cell_codes = sq8_encode_with_stats(
        assigned, "c_vec", stats
    ).select("c_id", "cell", "codes")
    return ctrs, stats, cell_codes


def _sq8_reconstruct(codes: Column) -> Column:
    """Decode SQ8 codes back to doubles against broadcast ``mins``/
    ``maxs`` array columns (in scope via crossJoin of the 1-row stats
    frame): ``mn + code·(mx−mn)/255``; constant dimensions decode to
    ``mn`` exactly (their code is 0 by :func:`~dislib_spark.vector.
    quantize.sq8_encode`'s contract)."""

    def recon(c: Column, i: Column) -> Column:
        mn = F.element_at("mins", i + F.lit(1))
        mx = F.element_at("maxs", i + F.lit(1))
        return F.when(mx == mn, mn).otherwise(
            mn + c.cast("double") * (mx - mn) / F.lit(255.0)
        )

    return F.transform(codes, recon)


def ivfsq_query_index(
    queries: DataFrame,
    centers: DataFrame,
    stats: DataFrame,
    cell_codes: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a (possibly parquet-stored) IVF-SQ8 index: each query
    finds its ``n_probe`` nearest coarse cells via the broadcast
    centers (the cell equi-join partition-prunes a
    ``partitionBy("cell")`` stored index to those lists), candidates
    are scored by cosine against the SQ8-RECONSTRUCTED vector
    (asymmetric distance: query exact, corpus decoded from its 8-bit
    codes — never the raw floats), and exact cosine runs only on the
    top ``rerank`` candidates per query, fetched from ``vectors``
    (rerank·|Q| rows). The reconstruction is JVM array arithmetic
    against the broadcast 1-row stats frame — no Python, no extra
    shuffle. Returns (q_id, c_id, sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(vec_col).cast("array<double>").alias("_qraw"),
    )
    qc = q.crossJoin(F.broadcast(centers)).select(
        "q_id",
        "q_vec",
        "_qraw",
        "cell",
        F.aggregate(
            F.zip_with(
                F.col("_qraw"),
                F.col("center"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("d2"),
    )
    wp = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = (
        qc.withColumn("pr", F.row_number().over(wp))
        .where(F.col("pr") <= n_probe)
        .select("q_id", "q_vec", "_qraw", "cell")
    )
    # asymmetric scoring on the probed lists: decode each candidate's
    # codes against the broadcast grid, rank by ROUNDED cosine (9 dp,
    # c_id tiebreak) so the shortlist cut is engine-stable
    withstats = cell_codes.crossJoin(F.broadcast(stats)).select(
        "cell", "c_id", _sq8_reconstruct(F.col("codes")).alias("_recon")
    )
    cand = F.broadcast(probes).join(withstats, "cell").select(
        "q_id",
        "q_vec",
        "c_id",
        F.round(
            cosine_similarity(F.col("_qraw"), F.col("_recon")), 9
        ).alias("sim_q"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim_q"), "c_id")
    short = (
        cand.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= rerank)
        .select("q_id", "q_vec", "c_id")
    )
    exact = short.join(
        vectors.select(
            F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
        ),
        "c_id",
    ).select(
        "q_id",
        "c_id",
        F.round(
            cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "c_id")
    return exact.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivfsq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    rerank: int = 50,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centers: str = "kmeans",
) -> DataFrame:
    """IVF-SQ8 composed ANN: :func:`ivfsq_index` (build once, persist
    when the corpus outlives the query batch) composed with
    :func:`ivfsq_query_index`. ``centers`` as in :func:`ivf_index` —
    "seed" makes every stage (assignment, probing, SQ8 encode/decode,
    asymmetric scoring, exact re-rank) deterministic and
    DuckDB-replayable (the v33 oracle). Returns
    (q_id, c_id, sim, rank)."""
    ctrs, stats, cell_codes = ivfsq_index(
        corpus, n_cells, seed, id_col, vec_col, centers=centers
    )
    return ivfsq_query_index(
        queries, ctrs, stats, cell_codes, corpus,
        k=k, n_probe=n_probe, rerank=rerank,
        id_col=id_col, vec_col=vec_col,
    )


def ivfsq_index_maintain(
    spark,
    index_path: str,
    centers: DataFrame,
    stats: DataFrame,
    upserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """UPSERT/DELETE maintenance against a ``partitionBy("cell")``
    stored IVF-SQ8 codes table (:func:`ivfsq_index`'s ``cell_codes``)
    — :func:`ivf_index_maintain`'s discipline applied to the
    quantized index: upserts are assigned with the STORED (stale)
    coarse centers AND encoded against the STORED SQ8 grid
    (``stats``) — both quantizers are part of the index format,
    retrained on rebuild, never on append (out-of-grid values clamp
    to the edge codes). Cell-scoped copy-on-write through the same
    journaled crash-safe ``replace_partitions_path`` swap: rewrite
    cost tracks the maintenance batch's cell fan-out, never the
    index; untouched inverted lists stay byte-identical."""
    from dislib_spark.sources.merge import (
        _recover_partition_swap,
        replace_partitions_path,
    )
    from dislib_spark.vector.quantize import sq8_encode_with_stats

    if upserts is None and deletes is None:
        return
    _recover_partition_swap(index_path, "cell")
    stored = spark.read.parquet(index_path)
    parts = []
    if upserts is not None:
        parts.append(upserts.select(F.col(id_col).alias("c_id")))
    if deletes is not None:
        parts.append(deletes.select(F.col(id_col).alias("c_id")))
    touched = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    touched = touched.distinct()
    new_rows = None
    if upserts is not None:
        assigned = assign_to_cells(upserts, centers, id_col, vec_col)
        codes = sq8_encode_with_stats(
            assigned.select(
                F.col("c_id").alias(id_col),
                F.col("c_vec").alias(vec_col),
            ),
            vec_col,
            stats,
        ).select(F.col(id_col).alias("c_id"), "codes")
        new_rows = assigned.select("c_id", "cell").join(codes, "c_id")
    affected = (
        stored.join(F.broadcast(touched), "c_id", "left_semi")
        .select("cell")
        .distinct()
    )
    if new_rows is not None:
        affected = affected.union(new_rows.select("cell")).distinct()
    cells = [r["cell"] for r in affected.collect()]
    if not cells:
        return
    kept = stored.where(F.col("cell").isin(cells)).join(
        F.broadcast(touched), "c_id", "left_anti"
    )
    out = kept if new_rows is None else kept.unionByName(new_rows)
    replace_partitions_path(index_path, "cell", cells, out)
