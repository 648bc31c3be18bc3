"""Similarity-search extension queries over ``embeddings`` with
DuckDB oracles.

Exact paths (brute-force cosine top-k, near-dup pairs) are oracle-
checked via explicit unnest-join dot products in double precision.
The declared approximate paths (v03 hyperplane LSH, v04 IVF, v06 PQ)
use seed-deterministic planes/centers/codebooks, so their candidate
generation AND scoring are value-replayed in DuckDB too; only the
MLlib-KMeans-trained variants (v10 stored index, v12 greedy MMR) are
rows-only, with pytest recall/parity gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.tables import load_table
from dislib_spark.vector.projection import project, projection_planes
from dislib_spark.vector.search import (
    _norm as _l2norm,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    mips_topk,
    neardup_pairs,
)


def _pin(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint for a subpipeline consumed by 2+ branches
    of a recall/eval query (the m32/t78/t79 pattern): without it the
    whole search subtree (brute-force crossJoin, probe pipeline,
    per-query window sort) re-executes once per consumer — plans grow
    to 100-300 nodes and the driver spends seconds planning and
    orchestrating duplicated AQE stages. eager=False keeps the
    materialization INSIDE the timed action (nothing runs at plan
    build); values are bit-identical, the branches just read the
    small checkpointed result instead of re-deriving it."""
    return df.localCheckpoint(eager=False)


def v08_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return mips_topk(q, e, k=10).orderBy("q_id", "rank")


def v01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return cosine_topk(q, e, k=10).orderBy("q_id", "rank")


def v02_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    return neardup_pairs(e, threshold=0.2).orderBy("a_id", "b_id")


def v03_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return lsh_topk(q, e, k=10).orderBy("q_id", "rank")


def v04_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the deterministic seed quantizer (cells = the 16
    lowest-id corpus vectors): assignment, n_probe=4 probing and the
    probed-list cosine scoring are all value-replayed by the DuckDB
    oracle. The KMeans-trained quantizer stays covered by v10 (stored
    index) and the recall pytest gates."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ivf_topk(q, e, k=10, centers="seed").orderBy("q_id", "rank")


def v05_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL norm preservation: project 64-dim embeddings to 8 dims with
    the seed-7 plane literals and report per-label norm-ratio stats.
    The planes are embedded verbatim in the DuckDB oracle, so the
    whole projection is value-checked."""
    e = load_table(spark, sf_dir, "embeddings")
    planes = projection_planes(64, 8, seed=7)
    pnrm = F.sqrt(
        F.aggregate(
            project(F.col("embedding"), planes),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    staged = e.select(
        "label",
        pnrm.alias("pnrm"),
        _l2norm(F.col("embedding")).alias("onrm"),
    ).select("label", (F.col("pnrm") / F.col("onrm")).alias("ratio"))
    return (
        staged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("ratio"), 6).alias("avg_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
        )
        .orderBy("label")
    )




def v06_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (codebooks → uint8-ish codes → ADC
    scoring → exact re-rank) with the deterministic seed codebooks
    (16 lowest-id vectors, unit-normalized, sliced per subspace): the
    DuckDB oracle replays encode, the per-query ADC tables, the
    rerank-100 shortlist and the exact-cosine top-10 value-exactly.
    KMeans-trained codebooks stay recall-gated in
    tests/test_ann_quality_skew.py."""
    from dislib_spark.vector.search import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return pq_topk(
        q, e, k=10, n_centroids=16, codebooks="seed"
    ).orderBy("q_id", "rank")


def v07_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup with deterministic seed centroids
    (first 8 vectors): literal-center argmax-cosine assignment (zero
    shuffle) + within-cluster pair join (candidate-bounded). Fully
    value-replayed by the DuckDB oracle."""
    from dislib_spark.vector.semantic import semantic_dedup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(
        e, n_clusters=8, threshold=0.3, centers="seed"
    ).orderBy("a_id", "b_id")


def v09_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking (query terms) fused
    with dense cosine ranking (query vector = embedding 0, the same
    document's vector — doc_id and vec_id align 1:1) by reciprocal-
    rank fusion, the standard RAG retrieval combiner. Both input
    lists are bounded top-100 rankings on 6-dp-rounded scores with
    id tiebreaks, so ranks — and therefore the fused score — are
    bit-deterministic on both engines.

    The lexical top-100 is ``orderBy().limit(100)`` — Spark plans it
    as TakeOrderedAndProject (per-partition top-k then a k-row merge),
    NOT a global row_number Window that would funnel every scored doc
    through one partition. Rank numbers are then assigned on the
    already-bounded 100-row set via one sorted-array posexplode (a
    100-row scalar agg, no Window operator at all)."""
    from dislib_spark.text.tfidf import bm25_scores
    from dislib_spark.vector.search import rrf_fuse

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    lex = bm25_scores(d, ["spark", "query", "stream"])
    top = lex.orderBy(F.desc("bm25"), "doc_id").limit(100)
    lex_rank = (
        top.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("bm25")).alias("_nb"),
                        F.col("doc_id").alias("doc_id"),
                    )
                )
            ).alias("_a")
        )
        .select(F.posexplode("_a").alias("_pos", "_s"))
        .select(
            F.col("_s.doc_id").alias("doc_id"),
            (F.col("_pos") + 1).cast("int").alias("rank"),
        )
    )
    dense_rank = (
        cosine_topk(e.where(F.col("vec_id") == 0), e, k=100)
        .select(F.col("c_id").alias("doc_id"), "rank")
    )
    fused = rrf_fuse([lex_rank, dense_rank], k=60)
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(15)


def v10_ivf_stored_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-once/query-per-batch ANN: build the IVF index on the
    even-id corpus, persist it ``partitionBy(cell)`` to parquet, read
    it back, and probe it with odd-id queries — the archive is
    touched only through the cell equi-join, which partition-prunes
    the stored inverted lists (the vector twin of t37's incremental
    dedup index). Rows-only in the driver (MLlib KMeans isn't
    ANSI-replayable); stored≡in-memory equality and the append path
    are pytest-gated (tests/test_ivf_index.py)."""
    import tempfile

    from dislib_spark.vector.search import ivf_index, ivf_query_index

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.where(F.col("vec_id") % 2 == 0)
    queries = e.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 20))
    centers, assigned = ivf_index(corpus, n_cells=16, seed=17)
    tmp = tempfile.mkdtemp(prefix="ivf_index_")
    assigned.write.partitionBy("cell").mode("overwrite").parquet(
        f"{tmp}/assignments"
    )
    centers.write.mode("overwrite").parquet(f"{tmp}/centers")
    stored_c = spark.read.parquet(f"{tmp}/centers")
    stored_a = spark.read.parquet(f"{tmp}/assignments")
    return ivf_query_index(
        queries, stored_c, stored_a, k=5, n_probe=4
    ).orderBy("q_id", "rank")


def v11_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-population telemetry: pairwise cosine between
    per-label centroid vectors (``vector.drift.centroid_similarity``)
    — one grouped mean over the exploded corpus, then a
    dimension-sized pair join. Full oracle (means + dots are
    ANSI-replayable)."""
    from dislib_spark.vector.drift import centroid_similarity

    e = load_table(spark, sf_dir, "embeddings").where(F.col("label") < 5)
    return centroid_similarity(e).orderBy("label_a", "label_b")


def v12_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval: exact cosine top-50 per query
    (distributed), greedy λ=0.7 re-rank to 10 inside one Arrow batch
    per query (``vector.search.mmr_rerank``). Greedy selection is
    sequential → rows-only here; exact-greedy parity is pytest-gated
    (tests/test_mmr_negatives.py)."""
    from dislib_spark.vector.search import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return mmr_rerank(q, e, k=10, fetch_k=50).orderBy("q_id", "rank")


def v13_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: per query, exact cosine
    top-10 among corpus vectors with a DIFFERENT label
    (``vector.search.hard_negatives``) — full oracle (label filter +
    unnest-join dot products)."""
    from dislib_spark.vector.search import hard_negatives

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return hard_negatives(q, e, k=10).orderBy("q_id", "rank")


# --- v14: SQ8 scalar-quantization acceptance report ------------------
def v14_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization reconstruction-error report per label
    (``vector.quantize.sq8_error_stats``): the 4× -compression
    acceptance gate before an ANN index swaps to quantized codes. One
    min/max aggregation pass (no explode), stats broadcast back,
    codes + exact-decimal error sums map-side."""
    from dislib_spark.vector.quantize import sq8_error_stats

    e = load_table(spark, sf_dir, "embeddings")
    return sq8_error_stats(e, "embedding", dim=64, by="label")


# --- v15: binary (sign-bit) quantization + Hamming top-k -------------
def v15_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding search: sign bits packed to 32-bit words
    (``vector.quantize.binary_quantize``), top-10 per query by
    ``Σ bit_count(xor(words))`` — the 32×-compression first-stage
    filter in front of exact rerank. Pure integer arithmetic, so the
    oracle replay is exact, not tolerance-based."""
    from dislib_spark.vector.quantize import hamming_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return hamming_topk(q, e, dim=64, k=10).orderBy("q_id", "rank")


# --- v16: per-group centroid medoids ---------------------------------
def v16_centroid_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-representative selection (``vector.drift
    .centroid_medoids``): each label's 3 most central vectors by
    cosine to the group mean — the exemplar-picking step after any
    clustering/grouping (SemDeDup keeps the same winner). One grouped
    mean + one broadcast-join scoring pass; ranking windows are
    per-label on the 9-dp-rounded cosine with vec_id tiebreak."""
    from dislib_spark.vector.drift import centroid_medoids

    e = load_table(spark, sf_dir, "embeddings")
    return centroid_medoids(e, k=3)


def v17_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding feature stats (``vector.drift
    .dimension_stats``): mean / variance / min / max per coordinate —
    the whitening diagnostic (dead dims, scale outliers) PCA/SQ8/PQ
    read before picking their scales. One posexplode + one map-side-
    combined agg keyed on the dim index; 7-dp DECIMAL values make
    Σx and Σx² order-exact, so the moments are engine-stable."""
    from dislib_spark.vector.drift import dimension_stats

    e = load_table(spark, sf_dir, "embeddings")
    return dimension_stats(e)


def v18_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality gate: recall@10 of the LSH (v03) and seed-IVF
    (v04) approximate indexes against the brute-force exact cosine
    top-10 (v01), per query — the eval every embedding pipeline runs
    before trusting an approximate index in production. Composes the
    three engine kernels; the eval joins are query-set-sized (k·|Q|
    rows), so the added cost over the underlying searches is nil.
    recall = |approx ∩ exact| / k with exact-integer counts, so the
    ratios are bit-replayable."""
    from dislib_spark.vector.search import cosine_topk, ivf_topk, lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    # exact feeds 3 branches, lsh 2 — pin both (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    lsh = _pin(lsh_topk(q, e, k=10).select("q_id", "c_id"))
    ivf = ivf_topk(q, e, k=10, centers="seed").select("q_id", "c_id")

    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    nl = lsh.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_lsh"))
    hl = (
        exact.join(lsh, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_lsh"))
    )
    hi = (
        exact.join(ivf, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_ivf"))
    )
    return (
        base.join(nl, "q_id", "left")
        .join(hl, "q_id", "left")
        .join(hi, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_lsh", F.lit(0)).alias("n_lsh"),
            (F.coalesce("hits_lsh", F.lit(0)) / 10.0).alias("recall_lsh"),
            (F.coalesce("hits_ivf", F.lit(0)) / 10.0).alias("recall_ivf"),
        )
        .orderBy("q_id")
    )


def v19_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-search quality gate, the compression twin of v18:
    recall@10 of PQ ADC search (v06's seed codebooks) and 60-bit
    sign-Hamming search (v15) against the exact cosine top-10 — the
    number that decides whether a memory-compressed index is usable.
    Eval joins are query-set-sized; recalls are exact-int/10
    divisions, bit-replayable."""
    from dislib_spark.vector.quantize import hamming_topk
    from dislib_spark.vector.search import cosine_topk, pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    # exact feeds 3 branches — pin (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    pq = pq_topk(q, e, k=10, n_centroids=16, codebooks="seed").select(
        "q_id", "c_id"
    )
    hm = hamming_topk(q, e, dim=64, k=10).select("q_id", "c_id")
    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hp = (
        exact.join(pq, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_pq"))
    )
    hh = (
        exact.join(hm, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_ham"))
    )
    return (
        base.join(hp, "q_id", "left")
        .join(hh, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            (F.coalesce("hits_pq", F.lit(0)) / 10.0).alias("recall_pq"),
            (F.coalesce("hits_ham", F.lit(0)) / 10.0).alias(
                "recall_ham"
            ),
        )
        .orderBy("q_id")
    )



def v20_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold tuning curve: pair counts at a ladder of
    cosine thresholds from ONE pair-generation pass (the number every
    dedup rollout is tuned on — how aggressive can the threshold get
    before the dup rate explodes). Reuses v02's exact block-pair
    kernel at the lowest rung, then one conditional rollup over the
    already-bounded pair set; 6-dp-rounded sims make every rung an
    exact boundary on both engines."""
    from dislib_spark.vector.search import neardup_pairs

    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < 300
    )
    pairs = neardup_pairs(e, threshold=0.1)
    ths = [0.1, 0.15, 0.2, 0.25, 0.3]
    return (
        pairs.select(
            F.explode(
                F.array(*[F.lit(float(t)) for t in ths])
            ).alias("threshold"),
            "sim",
        )
        .where(F.col("sim") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("threshold")
    )



def v21_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN: top-k under a metadata predicate (label % 2 = 0
    — the "only English docs" / "only this tenant" constraint every
    production vector store supports), comparing the two standard
    strategies per query against the exact filtered top-10:

    - PRE-filter: the predicate is pushed into the index — the IVF
      quantizer/cell lists are built over the FILTERED corpus only,
      so every probed candidate already satisfies the predicate and
      the probe always yields k valid results.
    - POST-filter: probe the unfiltered index wider (k'=30), then
      apply the predicate and keep the first 10 survivors — the
      cheap strategy that loses recall when the predicate is
      selective (survivor count can fall under k).

    Scale shape: both paths are the bucketed v04 probe (no all-pairs
    anywhere); the predicate reaches the corpus scan in the pre-filter
    path (Catalyst pushdown), and the eval joins are |Q|·k-sized.
    Deterministic seed centers (16 lowest-id vectors of each path's
    corpus) make the whole probe value-replayable."""
    from dislib_spark.vector.search import cosine_topk, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    filt = e.where(F.col("label") % 2 == 0)
    # exact feeds 3 branches, pre and post 2 each — pin all three
    # (see _pin; before: 285-node plan, 32 parquet scans, 98 Windows)
    exact = _pin(cosine_topk(q, filt, k=10).select("q_id", "c_id"))
    pre = _pin(
        ivf_topk(q, filt, k=10, centers="seed").select("q_id", "c_id")
    )
    from pyspark.sql import Window

    lab = e.select(F.col("vec_id").alias("c_id"), "label")
    wpost = Window.partitionBy("q_id").orderBy("rank")
    post = _pin(
        ivf_topk(q, e, k=30, centers="seed")
        .join(lab, "c_id")
        .where(F.col("label") % 2 == 0)
        .withColumn("rn", F.row_number().over(wpost))
        .where(F.col("rn") <= 10)
        .select("q_id", "c_id")
    )
    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    np_ = pre.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_pre"))
    ns = post.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_post"))
    hp = (
        exact.join(pre, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_pre"))
    )
    hs = (
        exact.join(post, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("hits_post"))
    )
    return (
        base.join(np_, "q_id", "left")
        .join(ns, "q_id", "left")
        .join(hp, "q_id", "left")
        .join(hs, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_pre", F.lit(0)).alias("n_pre"),
            F.coalesce("n_post", F.lit(0)).alias("n_post"),
            (F.coalesce("hits_pre", F.lit(0)) / 10.0).alias("recall_pre"),
            (F.coalesce("hits_post", F.lit(0)) / 10.0).alias(
                "recall_post"
            ),
        )
        .orderBy("q_id")
    )


def v22_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health report: per-cell inverted-list sizes and each
    cell's share of the corpus — the balance check run before
    trusting an ANN index (a whale cell means its probes scan far
    more than corpus/n_cells vectors; empty cells waste probes).
    ONE assignment pass (the same broadcast-centers argmin v04 runs),
    one 16-group count. Exact integer counts; shares are exact
    int-over-int divisions."""
    from dislib_spark.vector.search import ivf_index

    e = load_table(spark, sf_dir, "embeddings")
    _, assigned = ivf_index(e, centers="seed")
    # both consumers only count — pin the cell column, not the vectors
    assigned = _pin(assigned.select("cell"))
    tot = F.broadcast(assigned.agg(F.count(F.lit(1)).alias("_n")))
    return (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .crossJoin(tot)
        .select(
            F.col("cell").cast("int").alias("cell"),
            "n_vecs",
            F.round(
                F.col("n_vecs") / F.col("_n").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("cell")
    )


def v23_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs ``n_probe`` ladder (1, 2, 4, 8) for the seed-IVF
    index — the tuning curve that picks the probe budget (v18 reports
    ONE operating point; this sweeps the knob). The candidate lists
    and cosine scores are computed ONCE at the widest rung (pr ≤ 8,
    each candidate tagged with its cell's probe rank); every narrower
    rung is a filter + re-rank of that same scored set, so the sweep
    costs one probe pass, not one per rung. Fully value-replayed
    (seed centers, exact integer hit counts)."""
    from pyspark.sql import Window

    from dislib_spark.vector.search import (
        cosine_similarity,
        cosine_topk,
        ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    ctrs, assigned = ivf_index(e, centers="seed")
    qd = q.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("center"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = (
        qd.crossJoin(F.broadcast(ctrs))
        .select("q_id", "q_vec", "cell", d2.alias("d2"))
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= 8)
        .select("q_id", "q_vec", "cell", "pr")
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .select(
            "q_id",
            "pr",
            "c_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("sim"),
        )
    )
    rungs = scored.select(
        "q_id",
        "pr",
        "c_id",
        "sim",
        F.explode(F.array(*[F.lit(n) for n in (1, 2, 4, 8)])).alias(
            "np"
        ),
    ).where(F.col("pr") <= F.col("np"))
    wr = Window.partitionBy("np", "q_id").orderBy(
        F.desc("sim"), "c_id"
    )
    topk = (
        rungs.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 10)
        .select("np", "q_id", "c_id")
    )
    # exact feeds 2 branches (nq, hits) — pin (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    nq = F.broadcast(
        exact.agg(F.countDistinct("q_id").alias("_nq"))
    )
    hits = topk.join(exact, ["q_id", "c_id"]).groupBy("np").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    # every rung must appear even at 0 hits (the oracle's LEFT JOIN)
    ladder = spark.range(1).select(
        F.explode(F.array(*[F.lit(n) for n in (1, 2, 4, 8)])).alias(
            "np"
        )
    )
    return (
        ladder.join(hits, "np", "left")
        .crossJoin(nq)
        .select(
            F.col("np").cast("int").alias("n_probe"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0))
                / (10.0 * F.col("_nq")),
                6,
            ).alias("recall"),
        )
        .orderBy("n_probe")
    )


def v24_ivf_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF index MAINTENANCE end-to-end (``vector.search
    .ivf_index_maintain``): build the seed-quantizer index on the
    even-id corpus, persist it partitionBy(cell), apply one
    maintenance batch — re-embed ids ≡4 (mod 10) with their REVERSED
    vectors (an update that can move a vector between cells), insert
    the odd ids < 40, delete ids ≡0 (mod 10) — with cell-scoped
    copy-on-write, then probe the maintained STORED index with odd
    queries 41..49 against the stale centers (the maintenance
    contract: quantizer retrains on rebuild, never on append).
    The oracle replays the LOGICAL post-maintenance corpus state
    (survivors ∪ reversed updates ∪ inserts), the stale-center
    assignment, probing, and scoring value-exactly — parquet
    round-trips are value no-ops. Currency and partition-scoped
    rewrite are pytest-gated (tests/test_ivf_index.py)."""
    import tempfile

    from dislib_spark.vector.search import (
        ivf_index,
        ivf_index_maintain,
        ivf_query_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    corpus = e.where(vid % 2 == 0)
    centers, assigned = ivf_index(corpus, n_cells=16, centers="seed")
    tmp = tempfile.mkdtemp(prefix="ivf_maint_")
    path = f"{tmp}/assignments"
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)
    updates = e.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = e.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = e.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    ivf_index_maintain(
        spark, path, centers, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)
    queries = e.where((vid % 2 == 1) & (vid >= 41) & (vid < 50))
    return ivf_query_index(
        queries, centers, stored, k=5, n_probe=4
    ).orderBy("q_id", "rank")



def v25_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN reciprocity audit: for a bounded 100-vector slice,
    each vector takes its exact cosine top-10 (self excluded) and
    every directed edge is checked for its reverse — is my rank-r
    neighbor someone whose own top-10 contains me? The per-rank
    mutuality curve is the standard diagnostic for hubness and
    asymmetric neighborhoods (hubs collect edges they do not return)
    that decides whether a reciprocal-edge filter is worth it before
    kNN-graph clustering. Bounded slice here; at corpus scale the
    same audit runs per IVF cell (v04/v22) so the pair work stays
    cell-local. One broadcast pair scoring + one self-join on the
    directed edge set."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") < 100
    )
    t = (
        cosine_topk(e, e, k=11)
        .where(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id", "c_id", (F.col("rank") - 1).alias("rank")
        )
    )
    rev = t.select(
        F.col("q_id").alias("rq"), F.col("c_id").alias("rc")
    )
    j = t.join(
        rev,
        (t["q_id"] == rev["rc"]) & (t["c_id"] == rev["rq"]),
        "left",
    )
    return (
        j.groupBy("rank")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.sum(
                F.when(F.col("rq").isNotNull(), 1).otherwise(0)
            ).alias("n_mutual"),
            F.round(
                F.sum(
                    F.when(F.col("rq").isNotNull(), 1.0).otherwise(
                        0.0
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("mutual_rate"),
        )
        .orderBy("rank")
    )



def v26_stratified_cell_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cell-stratified deterministic corpus sampling: every vector
    lands in its seed-IVF cell (the v04/v22 assignment), and each
    cell contributes its ⌈√n⌉ lowest-md5 members — square-root
    allocation, the classic stratified compromise that over-samples
    small strata so rare clusters survive subsampling (uniform
    sampling at the same budget would nearly empty them). The ledger
    reports per-cell kept counts and label diversity before vs after
    — the coverage evidence a training-data diet needs. Seedless
    md5-order determinism (the t10/t44 recipe); ranking is a per-cell
    window (WindowGroupLimit-friendly), everything else one
    assignment pass plus a 16-group rollup."""
    from pyspark.sql import Window

    from dislib_spark.vector.search import ivf_index

    e = load_table(spark, sf_dir, "embeddings")
    _, assigned = ivf_index(e, centers="seed")
    a = assigned.select("c_id", "cell").join(
        e.select(F.col("vec_id").alias("c_id"), "label"), "c_id"
    )
    w = Window.partitionBy("cell").orderBy(
        F.md5(F.col("c_id").cast("string")), "c_id"
    )
    wc = Window.partitionBy("cell")
    t = a.select(
        "cell",
        "label",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_c"),
    )
    keep = F.col("rn") <= F.ceil(
        F.sqrt(F.col("n_c").cast("double"))
    )
    return (
        t.groupBy(F.col("cell").cast("int").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
            F.countDistinct("label").alias("n_labels"),
            F.countDistinct(F.when(keep, F.col("label"))).alias(
                "n_labels_sampled"
            ),
        )
        .orderBy("cell")
    )



def v27_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability audit: exact per-label centroids (7-dp
    decimal component sums, order-exact) and the cosine between every
    label pair — near-parallel centroids mean the classes are not
    linearly separated in embedding space, the screen run before
    trusting v13's hard negatives or any label-conditioned retrieval.
    One posexplode feeds a (label × dim)-keyed map-side aggregate
    (640 cells at any corpus size); the 45 centroid pairs are grid
    algebra, never touching the corpus again."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "label", F.posexplode(F.col("embedding")).alias("dim", "xf")
    ).select(
        "label",
        "dim",
        F.round(F.col("xf").cast("double"), 7)
        .cast("decimal(18,7)")
        .alias("x"),
    )
    g = v.groupBy("label", "dim").agg(
        F.sum("x").alias("s1"), F.count(F.lit(1)).alias("n")
    )
    c = g.select(
        "label",
        "dim",
        "n",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias(
            "m"
        ),
    )
    nrm = c.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sqrt(F.sum(F.col("m") * F.col("m"))).alias("nrm"),
    )
    a = c.select(
        F.col("label").alias("la"),
        F.col("dim").alias("dim"),
        F.col("m").alias("ma"),
    )
    b = c.select(
        F.col("label").alias("lb"),
        F.col("dim").alias("dim_b"),
        F.col("m").alias("mb"),
    )
    dots = (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b"))
            & (F.col("la") < F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("dot"))
    )
    na = nrm.select(
        F.col("label").alias("la"),
        F.col("n_vecs").alias("n_a"),
        F.col("nrm").alias("nrm_a"),
    )
    nb = nrm.select(
        F.col("label").alias("lb"),
        F.col("n_vecs").alias("n_b"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        dots.join(F.broadcast(na), "la")
        .join(F.broadcast(nb), "lb")
        .select(
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )



def v28_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook health audit: per-subspace quantization MSE and
    code-usage balance (codes used of 16, heaviest-code share) for
    the v06 seed codebooks — rising subspace MSE or a collapsed code
    histogram is the retrain signal for any PQ index, read BEFORE
    trusting ADC scores (v06) or quantized recall (v19). One
    BLAS-under-mapInArrow distortion pass
    (``vector.search.pq_distortion``, checkpointed once for its two
    rollups); the oracle replays slice/normalize/argmin
    value-exactly like v06."""
    from dislib_spark.vector.search import pq_codebooks, pq_distortion

    e = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(e, method="seed")
    d = pq_distortion(e, books).localCheckpoint(eager=False)
    g2 = d.groupBy("m", "code").agg(F.count(F.lit(1)).alias("cnt"))
    use = g2.groupBy("m").agg(
        F.sum("cnt").alias("n_vecs"),
        F.count(F.lit(1)).alias("n_codes_used"),
        F.round(
            F.max("cnt").cast("double")
            / F.sum("cnt").cast("double"),
            6,
        ).alias("top_code_share"),
    )
    mse = d.groupBy("m").agg(
        F.round(F.avg("min_d2"), 6).alias("mse")
    )
    return (
        use.join(mse, "m")
        .select(
            F.col("m").cast("int").alias("m"),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            "mse",
            F.col("n_codes_used").cast("bigint").alias(
                "n_codes_used"
            ),
            "top_code_share",
        )
        .orderBy("m")
    )


def v29_pq_index_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PQ index MAINTENANCE with a codebook-staleness drift audit —
    the v24 upsert/delete lifecycle applied to the PQ codes table,
    with v28's distortion metric as the retrain trigger: the seed
    codebooks are trained on the even-id corpus and its codes
    persisted partitionBy(cell = first subspace code); one
    maintenance batch re-encodes ids ≡4 (mod 10) with REVERSED
    vectors, inserts the odd ids < 40 and deletes ids ≡0 (mod 10) —
    all encoded with the STALE codebooks (the maintenance contract:
    codebooks retrain on rebuild, never on append), cell-scoped
    copy-on-write. The report compares per-subspace MSE before vs
    after from the codes the MAINTAINED STORED index actually serves
    (``pq_stored_residuals`` — hash-equal to a fresh argmin exactly
    when maintenance wrote the right codes, which is what the oracle
    value-checks); mse_drift > 1 quantifies how much the data drift
    degraded the frozen codebooks. Currency and partition-scoped
    rewrite are pytest-gated (tests/test_ivf_index.py)."""
    import tempfile

    from dislib_spark.vector.search import (
        pq_codebooks,
        pq_distortion,
        pq_encode,
        pq_index_maintain,
        pq_stored_residuals,
    )

    e = load_table(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    corpus = e.where(vid % 2 == 0)
    books = pq_codebooks(corpus, method="seed")
    codes = pq_encode(corpus, books).withColumn(
        "cell", F.col("codes")[0]
    )
    tmp = tempfile.mkdtemp(prefix="pq_maint_")
    path = f"{tmp}/codes"
    codes.write.partitionBy("cell").mode("overwrite").parquet(path)
    updates = e.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = e.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = e.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    pq_index_maintain(
        spark, path, books, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)
    post = (
        e.where(
            (vid % 2 == 0) & (vid % 10 != 0) & (vid % 10 != 4)
        )
        .select("vec_id", "embedding")
        .unionByName(updates)
        .unionByName(inserts)
    )
    before = (
        pq_distortion(corpus, books)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.round(F.avg("min_d2"), 6).alias("mse_before"),
        )
    )
    after = (
        pq_stored_residuals(post, stored, books)
        .groupBy("m")
        .agg(
            F.count(F.lit(1)).alias("n_after"),
            F.round(F.avg("d2"), 6).alias("mse_after"),
        )
    )
    return (
        before.join(after, "m")
        .select(
            F.col("m").cast("int").alias("m"),
            F.col("n_before").cast("bigint").alias("n_before"),
            "mse_before",
            F.col("n_after").cast("bigint").alias("n_after"),
            "mse_after",
            F.round(
                F.col("mse_after") / F.col("mse_before"), 6
            ).alias("mse_drift"),
        )
        .orderBy("m")
    )


def v30_maintained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality regression gate for index MAINTENANCE — the
    question v24 (does the index serve the right rows?) and v18
    (recall of a fresh index) leave open: after an upsert/delete
    batch lands on STALE centers, how much recall does the SERVING
    index still deliver? The exact v24 maintenance (update ids ≡4
    mod 10 reversed, insert odds < 40, delete ids ≡0 mod 10,
    cell-scoped copy-on-write) is applied, the maintained STORED
    index is probed (k=5, n_probe=4, stale centers), and each probe
    list is scored against the brute-force exact cosine top-5 over
    the logical post-maintenance corpus. recall@5 per query is an
    exact hit-count division — the number an operator alerts on
    before scheduling the quantizer rebuild v29's drift metric
    motivates."""
    import tempfile

    from dislib_spark.vector.search import (
        cosine_topk,
        ivf_index,
        ivf_index_maintain,
        ivf_query_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    corpus = e.where(vid % 2 == 0)
    centers, assigned = ivf_index(corpus, n_cells=16, centers="seed")
    tmp = tempfile.mkdtemp(prefix="ivf_recall_")
    path = f"{tmp}/assignments"
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)
    updates = e.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = e.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = e.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    ivf_index_maintain(
        spark, path, centers, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)
    queries = e.where((vid % 2 == 1) & (vid >= 41) & (vid < 50))
    got = ivf_query_index(
        queries, centers, stored, k=5, n_probe=4
    ).select("q_id", F.col("c_id").alias("i_id"))
    post = (
        e.where((vid % 2 == 0) & (vid % 10 != 0) & (vid % 10 != 4))
        .select("vec_id", "embedding")
        .unionByName(updates)
        .unionByName(inserts)
    )
    exact = cosine_topk(queries, post, k=5).select("q_id", "c_id")
    return (
        exact.join(
            got,
            (exact["q_id"] == got["q_id"])
            & (exact["c_id"] == got["i_id"]),
            "left",
        )
        .groupBy(exact["q_id"].alias("q_id"))
        .agg(
            F.count("i_id").cast("bigint").alias("n_hits"),
            F.round(F.count("i_id") / 5.0, 6).alias("recall_at_5"),
        )
        .orderBy("q_id")
    )


def v31_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (``vector.search.ivfpq_topk``) — the
    production FAISS IVFPQ shape v04 (IVF pruning, exact scoring) and
    v06 (PQ scoring, full corpus) each cover half of: candidates come
    only from the query's 4 probed cells, are scored by 8 ADC table
    lookups on the compressed codes, and exact cosine touches only
    the top-50 shortlist. Deterministic seed quantizers end to end
    (cells = 16 lowest-id raw vectors, codebooks = the same vectors
    unit-normalized and sliced), so assignment, probing, encode, ADC
    and re-rank are all value-replayed by the DuckDB oracle."""
    from dislib_spark.vector.search import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ivfpq_topk(
        q, e, k=10, n_cells=16, n_probe=4, n_subvectors=8,
        n_centroids=16, rerank=50, centers="seed", codebooks="seed",
    ).orderBy("q_id", "rank")


def v32_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the COMPOSED IVF-PQ index (v30's harness
    applied to v31): recall@10 of the ivfpq pipeline against the
    brute-force exact cosine top-10 per query — quantifying the
    compounded loss of cell pruning (v18 measures it alone) plus
    code quantization (v19 measures it alone). Exact-integer hit
    counts over /10.0, bit-replayable."""
    from dislib_spark.vector.search import cosine_topk, ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    # exact feeds 2 branches (base, hits) — pin (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    ap = ivfpq_topk(
        q, e, k=10, n_cells=16, n_probe=4, n_subvectors=8,
        n_centroids=16, rerank=50, centers="seed", codebooks="seed",
    ).select("q_id", "c_id")
    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        exact.join(ap, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.join(hits, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / 10.0).alias("recall_at_10"),
        )
        .orderBy("q_id")
    )


def v33_ivfsq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 composed ANN (``vector.search.ivfsq_topk``) — the FAISS
    ``IVF,SQ8`` shape: candidates come only from the query's 4 probed
    cells (v04's pruning), are scored by cosine against the int8
    scalar-quantized RECONSTRUCTION (v14's grid — asymmetric distance
    on 4×-compressed codes, never the raw floats), and exact cosine
    touches only the top-50 shortlist. Deterministic end to end (seed
    cells = 16 lowest-id vectors; the SQ8 grid is per-dimension
    min/max — no trained state at all), so assignment, probing,
    encode, decode, asymmetric scoring and re-rank are all
    value-replayed by the DuckDB oracle."""
    from dislib_spark.vector.search import ivfsq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    return ivfsq_topk(
        q, e, k=10, n_cells=16, n_probe=4, rerank=50, centers="seed"
    ).orderBy("q_id", "rank")


def v35_ivfsq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the composed IVF-SQ8 index (v32's harness
    applied to v33): recall@10 of the ivfsq pipeline against the
    brute-force exact cosine top-10 per query — quantifying the
    compounded loss of cell pruning plus scalar quantization, the
    acceptance number that decides whether the 4× code compression
    is free at this corpus shape (compare with v32's IVF-PQ recall
    at 8× to pick the storage/recall operating point). Exact-integer
    hit counts over /10.0, bit-replayable."""
    from dislib_spark.vector.search import cosine_topk, ivfsq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    # exact feeds 2 branches (base, hits) — pin (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    ap = ivfsq_topk(
        q, e, k=10, n_cells=16, n_probe=4, rerank=50, centers="seed"
    ).select("q_id", "c_id")
    base = exact.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_exact"))
    hits = (
        exact.join(ap, ["q_id", "c_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        base.join(hits, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) / 10.0).alias("recall_at_10"),
        )
        .orderBy("q_id")
    )


def v34_ann_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving-cost frontier: per probe budget (n_probe = 1, 2,
    4, 8), the COST of a query — coarse cells read, candidate codes
    scanned (Σ probed-list sizes over the query batch, v22's sizes),
    exact-rerank rows (min(50, candidates) per query) and the scan
    fraction of the corpus — joined with the RECALL@10 that budget
    buys (v23's rung harness). The capacity-planning table an ANN
    service reads to pick its operating point: at 100 TB the
    codes_scanned column IS the per-query IO bill. One widest-rung
    probe pass, candidate lists scored once, every narrower rung a
    filter — the sweep costs one probe pass, not one per rung."""
    from pyspark.sql import Window

    from dislib_spark.vector.search import (
        cosine_similarity,
        cosine_topk,
        ivf_index,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    ctrs, assigned = ivf_index(e, centers="seed")
    # assigned feeds 2 branches (sizes, scored) — pin the one
    # assignment pass (see _pin)
    assigned = _pin(assigned)
    sizes = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    qd = q.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("center"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = Window.partitionBy("q_id").orderBy("d2", "cell")
    # probes feeds 2 branches (cost per_q, recall scored) — pin
    probes = _pin(
        qd.crossJoin(F.broadcast(ctrs))
        .select("q_id", "q_vec", "cell", d2.alias("d2"))
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= 8)
        .select("q_id", "q_vec", "cell", "pr")
    )
    rung = F.explode(F.array(*[F.lit(n) for n in (1, 2, 4, 8)])).alias(
        "n_probe"
    )
    # cost side: probed-list sizes only — never touches the vectors
    per_q = (
        probes.select("q_id", "cell", "pr", rung)
        .where(F.col("pr") <= F.col("n_probe"))
        .join(F.broadcast(sizes), "cell")
        .groupBy("n_probe", "q_id")
        .agg(F.sum("n_vecs").alias("cand"))
    )
    corpus_n = F.broadcast(e.agg(F.count(F.lit(1)).alias("_n")))
    cost = (
        per_q.groupBy("n_probe")
        .agg(
            F.count(F.lit(1)).alias("_nq"),
            F.sum("cand").alias("codes_scanned"),
            F.sum(F.least(F.col("cand"), F.lit(50))).alias(
                "rerank_rows"
            ),
        )
        .crossJoin(corpus_n)
    )
    # recall side: v23's shared scored set, filtered per rung
    scored = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .select(
            "q_id",
            "pr",
            "c_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("sim"),
        )
    )
    rungs = scored.select("q_id", "pr", "c_id", "sim", rung).where(
        F.col("pr") <= F.col("n_probe")
    )
    wr = Window.partitionBy("n_probe", "q_id").orderBy(
        F.desc("sim"), "c_id"
    )
    topk = (
        rungs.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 10)
        .select("n_probe", "q_id", "c_id")
    )
    # exact feeds 2 branches (nq, hits) — pin (see _pin)
    exact = _pin(cosine_topk(q, e, k=10).select("q_id", "c_id"))
    nq = F.broadcast(exact.agg(F.countDistinct("q_id").alias("_tq")))
    hits = topk.join(exact, ["q_id", "c_id"]).groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        cost.join(hits, "n_probe", "left")
        .crossJoin(nq)
        .select(
            F.col("n_probe").cast("int").alias("n_probe"),
            F.col("n_probe").cast("bigint").alias("cells_read_per_q"),
            F.col("codes_scanned").cast("bigint").alias(
                "codes_scanned"
            ),
            F.col("rerank_rows").cast("bigint").alias("rerank_rows"),
            F.round(
                F.col("codes_scanned")
                / (F.col("_nq") * F.col("_n").cast("double")),
                6,
            ).alias("scan_frac"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce("n_hits", F.lit(0))
                / (10.0 * F.col("_tq")),
                6,
            ).alias("recall_at_10"),
        )
        .orderBy("n_probe")
    )


def v36_ivfsq_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ8 stored-index MAINTENANCE audit (the v24/v29 discipline
    on the quantized index): build the index on the even half (seed
    cells, even-half SQ8 grid), persist partitionBy(cell), apply the
    standard maintenance batch (updates = reversed embeddings of
    ≡4 mod 10, inserts = odds < 40, deletes = ≡0 mod 10) with
    ``ivfsq_index_maintain`` — upserts assigned with STALE centers
    and encoded against the STALE grid (both are index format) — and
    report per cell of the STORED post-index: membership count and
    the exact-decimal SQ8 reconstruction error of the stored codes
    against the logical post-corpus raw vectors. Currency is the
    check: stored codes ≡ encode(logical vectors, stale grid) per
    cell, or the MSE diverges. The audit join is index-sized; the
    rewrite itself was cell-scoped copy-on-write."""
    import tempfile

    from dislib_spark.vector.search import (
        ivfsq_index,
        ivfsq_index_maintain,
    )

    e = load_table(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    corpus = e.where(vid % 2 == 0)
    ctrs, stats, codes = ivfsq_index(corpus, n_cells=16, centers="seed")
    tmp = tempfile.mkdtemp(prefix="ivfsq_maint_")
    path = f"{tmp}/codes"
    codes.write.partitionBy("cell").parquet(path)

    updates = e.where((vid % 2 == 0) & (vid % 10 == 4)).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    inserts = e.where((vid % 2 == 1) & (vid < 40)).select(
        "vec_id", "embedding"
    )
    deletes = e.where((vid % 2 == 0) & (vid % 10 == 0)).select(
        "vec_id"
    )
    ivfsq_index_maintain(
        spark, path, ctrs, stats, updates.unionByName(inserts), deletes
    )
    stored = spark.read.parquet(path)

    survivors = corpus.where((vid % 10 != 0) & (vid % 10 != 4)).select(
        "vec_id", "embedding"
    )
    logical = survivors.unionByName(updates).unionByName(inserts)
    joined = stored.join(
        logical.select(
            F.col("vec_id").alias("c_id"),
            F.col("embedding").cast("array<double>").alias("_raw"),
        ),
        "c_id",
    ).crossJoin(F.broadcast(stats))

    def term(c: "F.Column", i: "F.Column"):
        mn = F.element_at("mins", i + F.lit(1))
        mx = F.element_at("maxs", i + F.lit(1))
        x = F.element_at("_raw", i + F.lit(1))
        recon = F.when(mx == mn, mn).otherwise(
            mn + c.cast("double") * (mx - mn) / F.lit(255.0)
        )
        return ((x - recon) * (x - recon)).cast("decimal(28,15)")

    err = F.aggregate(
        F.transform(F.col("codes"), term),
        F.lit(0).cast("decimal(28,15)"),
        lambda a, t: (a + t).cast("decimal(28,15)"),
    )
    per_vec = joined.select("cell", err.alias("err"))
    return (
        per_vec.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(
                F.sum("err").cast("double")
                / (F.count(F.lit(1)) * F.lit(64)),
                6,
            ).alias("mse"),
            F.round(F.max("err").cast("double"), 6).alias("max_err"),
        )
        .select(F.col("cell").cast("int").alias("cell"), "n_vecs",
                "mse", "max_err")
        .orderBy("cell")
    )


QUERIES = {
    "v01_cosine_topk": v01_cosine_topk,
    "v02_neardup_pairs": v02_neardup_pairs,
    "v03_lsh_topk": v03_lsh_topk,
    "v04_ivf_topk": v04_ivf_topk,
    "v05_random_projection": v05_random_projection,
    "v06_pq_topk": v06_pq_topk,
    "v07_semantic_dedup": v07_semantic_dedup,
    "v08_mips_topk": v08_mips_topk,
    "v09_hybrid_rrf": v09_hybrid_rrf,
    "v10_ivf_stored_index": v10_ivf_stored_index,
    "v11_centroid_drift": v11_centroid_drift,
    "v12_mmr_rerank": v12_mmr_rerank,
    "v13_hard_negatives": v13_hard_negatives,
    "v14_sq8_error": v14_sq8_error,
    "v15_hamming_topk": v15_hamming_topk,
    "v16_centroid_medoids": v16_centroid_medoids,
    "v17_dimension_stats": v17_dimension_stats,
    "v18_ann_recall": v18_ann_recall,
    "v19_quant_recall": v19_quant_recall,
    "v20_threshold_sweep": v20_threshold_sweep,
    "v21_filtered_ann": v21_filtered_ann,
    "v22_ivf_cell_balance": v22_ivf_cell_balance,
    "v23_probe_recall_curve": v23_probe_recall_curve,
    "v24_ivf_index_maintenance": v24_ivf_index_maintenance,
    "v25_mutual_knn": v25_mutual_knn,
    "v26_stratified_cell_sample": v26_stratified_cell_sample,
    "v27_label_separability": v27_label_separability,
    "v28_pq_distortion": v28_pq_distortion,
    "v29_pq_index_maintenance": v29_pq_index_maintenance,
    "v30_maintained_recall": v30_maintained_recall,
    "v31_ivfpq_topk": v31_ivfpq_topk,
    "v32_ivfpq_recall": v32_ivfpq_recall,
    "v33_ivfsq_topk": v33_ivfsq_topk,
    "v34_ann_cost_frontier": v34_ann_cost_frontier,
    "v35_ivfsq_recall": v35_ivfsq_recall,
    "v36_ivfsq_maintenance": v36_ivfsq_maintenance,
}

# cells CTE: (vec_id, k, v) in double; norms CTE: per-vector L2 norm.
_CELLS = """
    SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
           CAST(UNNEST(embedding) AS DOUBLE) AS v
    FROM embeddings
"""

ORACLE = {
    "v01_cosine_topk": f"""
        WITH cells AS ({_CELLS}),
        norms AS (
            SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
        ),
        dots AS (
            SELECT a.vec_id AS q_id, b.vec_id AS c_id, SUM(a.v * b.v) AS dot
            FROM cells a JOIN cells b ON a.k = b.k
            WHERE a.vec_id < 5
            GROUP BY a.vec_id, b.vec_id
        ),
        scored AS (
            SELECT d.q_id, d.c_id,
                   ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        )
        SELECT q_id, c_id, sim, rank FROM (
            SELECT q_id, c_id, sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, c_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= 10 ORDER BY q_id, rank
    """,
    "v02_neardup_pairs": f"""
        WITH cells AS (
            SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings WHERE vec_id < 300
        ),
        norms AS (
            SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
        ),
        dots AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.v * b.v) AS dot
            FROM cells a JOIN cells b ON a.k = b.k AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id
        )
        SELECT a_id, b_id, sim FROM (
            SELECT d.a_id, d.b_id,
                   ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
            FROM dots d
            JOIN norms na ON na.vec_id = d.a_id
            JOIN norms nb ON nb.vec_id = d.b_id
        ) WHERE sim >= 0.2 ORDER BY a_id, b_id
    """,
    # v03/v04/v06 oracles are generated below: the declared queries
    # use seed-deterministic hyperplanes / centers / codebooks, so the
    # whole approximate pipeline is value-replayed in DuckDB.
    "v07_semantic_dedup": f"""
        WITH cells AS ({_CELLS}),
        norms AS (
            SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
        ),
        cdots AS (
            SELECT a.vec_id AS vid, b.vec_id AS ctr, SUM(a.v * b.v) AS dot
            FROM cells a JOIN cells b ON a.k = b.k AND b.vec_id < 8
            GROUP BY a.vec_id, b.vec_id
        ),
        assigned AS (
            SELECT vid, ctr AS cluster FROM (
                SELECT c.vid, c.ctr,
                       ROW_NUMBER() OVER (
                           PARTITION BY c.vid
                           ORDER BY c.dot / (na.nrm * nb.nrm) DESC, c.ctr
                       ) AS rn
                FROM cdots c
                JOIN norms na ON na.vec_id = c.vid
                JOIN norms nb ON nb.vec_id = c.ctr
            ) WHERE rn = 1
        ),
        pdots AS (
            SELECT x.cluster, a.vec_id AS a_id, b.vec_id AS b_id,
                   SUM(a.v * b.v) AS dot
            FROM assigned x
            JOIN assigned y ON x.cluster = y.cluster AND x.vid < y.vid
            JOIN cells a ON a.vec_id = x.vid
            JOIN cells b ON b.vec_id = y.vid AND a.k = b.k
            GROUP BY x.cluster, a.vec_id, b.vec_id
        )
        SELECT cluster, a_id, b_id, sim FROM (
            SELECT CAST(p.cluster AS INTEGER) AS cluster,
                   CAST(p.a_id AS BIGINT) AS a_id,
                   CAST(p.b_id AS BIGINT) AS b_id,
                   ROUND(p.dot / (na.nrm * nb.nrm), 6) AS sim
            FROM pdots p
            JOIN norms na ON na.vec_id = p.a_id
            JOIN norms nb ON nb.vec_id = p.b_id
        ) WHERE sim >= 0.3 ORDER BY a_id, b_id
    """,
}


def _v05_oracle() -> str:
    """Embed the seed-7 plane literals in DuckDB SQL so the whole
    projection is value-replayed off-cluster."""
    planes = projection_planes(64, 8, seed=7)
    dot_sq = " + ".join(
        "POW(list_inner_product(e, ["
        + ", ".join(repr(v) for v in row)
        + "]), 2)"
        for row in planes
    )
    return f"""
        WITH s AS (
            SELECT label,
                   SQRT({dot_sq}) AS pnrm,
                   SQRT(list_inner_product(e, e)) AS onrm
            FROM (
                SELECT label,
                       list_transform(embedding, v -> v::DOUBLE) AS e
                FROM embeddings
            )
        )
        SELECT label, COUNT(*) AS n,
               ROUND(AVG(pnrm / onrm), 6) AS avg_ratio,
               ROUND(MIN(pnrm / onrm), 6) AS min_ratio,
               ROUND(MAX(pnrm / onrm), 6) AS max_ratio
        FROM s GROUP BY label ORDER BY label
    """


ORACLE["v05_random_projection"] = _v05_oracle()

ORACLE["v08_mips_topk"] = f"""
    WITH cells AS ({_CELLS}),
    dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               ROUND(SUM(a.v * b.v), 6) AS dot
        FROM cells a JOIN cells b ON a.k = b.k
        WHERE a.vec_id < 5
        GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
        SELECT q_id, c_id, dot,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY dot DESC, c_id) AS rank
        FROM dots
    )
    SELECT q_id, c_id, dot, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    ORDER BY q_id, rank
"""

ORACLE["v09_hybrid_rrf"] = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN ('spark', 'query', 'stream') GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    lens AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               AVG(len(string_split(text, ' '))) AS avgdl
        FROM documents
    ),
    bm25 AS (
        SELECT tf.doc_id AS doc_id,
               ROUND(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfreq USING (term)
        JOIN lens ON lens.doc_id = tf.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
            FROM bm25
        ) WHERE rank <= 100
    ),
    cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    dots AS (
        SELECT b.vec_id AS c_id, SUM(a.v * b.v) AS dot
        FROM cells a JOIN cells b ON a.k = b.k
        WHERE a.vec_id = 0
        GROUP BY b.vec_id
    ),
    dense AS (
        SELECT c_id AS doc_id, rank FROM (
            SELECT d.c_id,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6) DESC,
                                d.c_id
                   ) AS rank
            FROM dots d
            JOIN norms na ON na.vec_id = 0
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 100
    ),
    unioned AS (
        SELECT doc_id, 1.0 / (60 + rank) AS term FROM lex
        UNION ALL
        SELECT doc_id, 1.0 / (60 + rank) AS term FROM dense
    )
    SELECT doc_id, ROUND(SUM(term), 6) AS rrf,
           COUNT(*) AS n_lists
    FROM unioned GROUP BY doc_id
    ORDER BY rrf DESC, doc_id LIMIT 15
"""

ORACLE["v11_centroid_drift"] = """
    WITH cents AS (
        SELECT label, k, AVG(v) AS c FROM (
            SELECT label, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings WHERE label < 5
        ) GROUP BY label, k
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(SUM(a.c * b.c)
                 / (SQRT(SUM(a.c * a.c)) * SQRT(SUM(b.c * b.c))), 6) AS cos
    FROM cents a JOIN cents b ON a.k = b.k AND a.label < b.label
    GROUP BY a.label, b.label
    ORDER BY label_a, label_b
"""

ORACLE["v13_hard_negatives"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id, SUM(a.v * b.v) AS dot
        FROM cells a JOIN cells b ON a.k = b.k
        WHERE a.vec_id < 5
        GROUP BY a.vec_id, b.vec_id
    ),
    scored AS (
        SELECT d.q_id, eq.label AS q_label, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
        JOIN embeddings eq ON eq.vec_id = d.q_id
        JOIN embeddings ec ON ec.vec_id = d.c_id
        WHERE ec.label <> eq.label
    )
    SELECT q_id, q_label, c_id, sim, rank FROM (
        SELECT q_id, q_label, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""

# v14: quantize/reconstruct is pure double IEEE arithmetic (identical
# bits in any engine); per-dim squared errors go through
# DECIMAL(28,15) so every sum is order-exact — the replay is
# bit-for-bit, not tolerance-based.
ORACLE["v14_sq8_error"] = """
    WITH flat AS (
        SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    stats AS (SELECT k, MIN(v) AS mn, MAX(v) AS mx FROM flat GROUP BY k),
    terms AS (
        SELECT f.vec_id, f.label,
               CAST(CASE WHEN s.mx = s.mn THEN 0.0 ELSE
                   (f.v - (s.mn + FLOOR((f.v - s.mn) * 255.0 / (s.mx - s.mn)
                                        + 0.5)
                                  * (s.mx - s.mn) / 255.0))
                   * (f.v - (s.mn + FLOOR((f.v - s.mn) * 255.0 / (s.mx - s.mn)
                                          + 0.5)
                                    * (s.mx - s.mn) / 255.0))
               END AS DECIMAL(28,15)) AS t
        FROM flat f JOIN stats s USING (k)
    ),
    per_vec AS (
        SELECT vec_id, label, SUM(t) AS err
        FROM terms GROUP BY vec_id, label
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(err) AS DOUBLE) / (COUNT(*) * 64), 6) AS mse,
           ROUND(CAST(MAX(err) AS DOUBLE), 6) AS max_err
    FROM per_vec GROUP BY label ORDER BY label
"""

# v15: packing and Hamming distance are pure integer arithmetic —
# POWER(2, j) for j <= 31 is double-exact, everything after is
# BIGINT/bit ops, so both engines agree bit-for-bit by construction.
ORACLE["v15_hamming_topk"] = """
    WITH flat AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    bits AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN v > 0 AND k <= 32
                             THEN CAST(POWER(2, k - 1) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w0,
               CAST(SUM(CASE WHEN v > 0 AND k > 32
                             THEN CAST(POWER(2, k - 33) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS w1
        FROM flat GROUP BY vec_id
    ),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               CAST(bit_count(xor(q.w0, c.w0))
                    + bit_count(xor(q.w1, c.w1)) AS INT) AS hamming
        FROM bits q JOIN bits c ON q.vec_id < 5
    )
    SELECT q_id, c_id, hamming, CAST(rank AS INT) AS rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY hamming, c_id) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""

# v16: centroids are grouped means (summation-order drift ~1e-15);
# the ranking key rounds to 9 dp -- six orders above that drift --
# with a vec_id tiebreak, so the top-3 membership is engine-stable.
ORACLE["v16_centroid_medoids"] = """
    WITH cells AS (
        SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    cents AS (
        SELECT label, k, AVG(v) AS c FROM cells GROUP BY label, k
    ),
    cn AS (SELECT label, SUM(c * c) AS c2 FROM cents GROUP BY label),
    pv AS (
        SELECT a.label, a.vec_id, SUM(a.v * c.c) AS dot,
               SUM(a.v * a.v) AS v2
        FROM cells a JOIN cents c ON a.label = c.label AND a.k = c.k
        GROUP BY a.label, a.vec_id
    ),
    s AS (
        SELECT p.label, p.vec_id,
               p.dot / (SQRT(p.v2) * SQRT(cn.c2)) AS cosr
        FROM pv p JOIN cn USING (label)
    )
    SELECT label, vec_id, ROUND(cosr, 6) AS cos, rank FROM (
        SELECT label, vec_id, cosr,
               ROW_NUMBER() OVER (
                   PARTITION BY label
                   ORDER BY ROUND(cosr, 9) DESC, vec_id
               ) AS rank
        FROM s
    ) WHERE rank <= 3 ORDER BY label, rank
"""

# v17: 7-dp DECIMAL coordinates make both power sums exact on either
# engine; mean/variance are IEEE algebra on those exact sums. DuckDB
# list indexing is 1-based -> ord-1 matches posexplode.
ORACLE["v17_dimension_stats"] = """
    WITH v AS (
        SELECT s.ord - 1 AS dim,
               CAST(ROUND(CAST(embedding[s.ord] AS DOUBLE), 7)
                    AS DECIMAL(18,7)) AS x
        FROM embeddings,
             (SELECT UNNEST(range(1, 65)) AS ord) s
    ),
    g AS (
        SELECT dim, COUNT(*) AS n, SUM(x) AS s1,
               SUM(CAST(x AS DECIMAL(19,7)) * x) AS s2,
               MIN(x) AS mn, MAX(x) AS mx
        FROM v GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
           ROUND(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
               AS variance,
           CAST(mn AS DOUBLE) AS min_v, CAST(mx AS DOUBLE) AS max_v
    FROM g ORDER BY dim
"""


def _v03_oracle() -> str:
    """DuckDB replay of v03's hyperplane LSH: the seed-13 plane
    literals are embedded verbatim, each signature bit is the sign of
    an explicit left-associated 64-term dot product (the exact IEEE
    order of Spark's zip_with/aggregate fold), then bucket-join +
    exact cosine + rank — the full approximate pipeline, not a
    rows-only check."""
    from dislib_spark.vector.search import _hyperplanes

    planes = _hyperplanes(64, 8, seed=13)
    bit_cases = ",\n                   ".join(
        "CASE WHEN "
        + " + ".join(f"e[{i + 1}] * {w!r}" for i, w in enumerate(row))
        + " >= 0 THEN '1' ELSE '0' END"
        for row in planes
    )
    return f"""
    WITH ev AS (
        SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS e
        FROM embeddings
    ),
    sigs AS (
        SELECT vec_id,
               concat({bit_cases}) AS bucket
        FROM ev
    ),
    cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    cand AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id
        FROM sigs q JOIN sigs c ON q.bucket = c.bucket
        WHERE q.vec_id < 5
    ),
    dots AS (
        SELECT cd.q_id, cd.c_id, SUM(a.v * b.v) AS dot
        FROM cand cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    )
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
    """


ORACLE["v03_lsh_topk"] = _v03_oracle()


# v04: seed-center IVF replay — centers are the 16 lowest-id vectors,
# assignment/probing are argmin-L2 with (d2, cell) tie order, scoring
# is exact cosine on the probed lists only (same as the Spark plan).
ORACLE["v04_ivf_topk"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS pr
            FROM d2 WHERE vid < 5
        ) WHERE pr <= 4
    ),
    cand AS (
        SELECT p.q_id, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    dots AS (
        SELECT cd.q_id, cd.c_id, SUM(a.v * b.v) AS dot
        FROM cand cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    )
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""


# v06: seed-codebook PQ replay. Codebook (m, c) = subspace slice m of
# the unit-normalized c-th lowest-id vector; encode = per-(vec, m)
# argmin L2 with (d2, c) tie order; ADC = sum over m of the query's
# distance to the assigned centroid; shortlist = 100 lowest (adc,
# c_id); final = exact cosine top-10 on the shortlist.
ORACLE["v06_pq_topk"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    unit AS (
        -- zero-norm guard mirrors pq_codebooks' seed path (nrm==0 → 1.0)
        SELECT c.vec_id, c.k,
               c.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END AS u
        FROM cells c JOIN norms n USING (vec_id)
    ),
    ctrids AS (
        SELECT vec_id AS cvid,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    book AS (
        SELECT ct.c, CAST((u.k - 1) // 8 AS INT) AS m, (u.k - 1) % 8 AS j,
               u.u AS w
        FROM unit u JOIN ctrids ct ON u.vec_id = ct.cvid
    ),
    sub AS (
        SELECT vec_id, CAST((k - 1) // 8 AS INT) AS m, (k - 1) % 8 AS j, u
        FROM unit
    ),
    d2 AS (
        SELECT s.vec_id, s.m, b.c, SUM((s.u - b.w) * (s.u - b.w)) AS d2
        FROM sub s JOIN book b ON b.m = s.m AND b.j = s.j
        GROUP BY s.vec_id, s.m, b.c
    ),
    codes AS (
        SELECT vec_id, m, c FROM (
            SELECT vec_id, m, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, m ORDER BY d2, c
                   ) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    adc AS (
        SELECT q.vec_id AS q_id, cd.vec_id AS c_id, SUM(q.d2) AS adc
        FROM codes cd
        JOIN d2 q ON q.m = cd.m AND q.c = cd.c AND q.vec_id < 5
        GROUP BY q.vec_id, cd.vec_id
    ),
    short AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adc, c_id
                   ) AS r
            FROM adc
        ) WHERE r <= 100
    ),
    dots AS (
        SELECT sh.q_id, sh.c_id, SUM(a.v * b.v) AS dot
        FROM short sh
        JOIN cells a ON a.vec_id = sh.q_id
        JOIN cells b ON b.vec_id = sh.c_id AND a.k = b.k
        GROUP BY sh.q_id, sh.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    )
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""


# v18 composes the already-value-replayed v01/v03/v04 oracles as CTEs
# (nested WITH in parenthesized subqueries is ANSI); the recall math
# is exact-integer counts over a /10.0 division — bit-stable.
ORACLE["v18_ann_recall"] = f"""
    WITH exact AS ({ORACLE["v01_cosine_topk"]}),
    lsh AS ({ORACLE["v03_lsh_topk"]}),
    ivf AS ({ORACLE["v04_ivf_topk"]}),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id),
    nl AS (SELECT q_id, COUNT(*) AS n_lsh FROM lsh GROUP BY q_id),
    hl AS (
        SELECT e.q_id, COUNT(*) AS hits_lsh
        FROM exact e JOIN lsh l ON e.q_id = l.q_id AND e.c_id = l.c_id
        GROUP BY e.q_id
    ),
    hi AS (
        SELECT e.q_id, COUNT(*) AS hits_ivf
        FROM exact e JOIN ivf i ON e.q_id = i.q_id AND e.c_id = i.c_id
        GROUP BY e.q_id
    )
    SELECT b.q_id, b.n_exact,
           COALESCE(nl.n_lsh, 0) AS n_lsh,
           COALESCE(hl.hits_lsh, 0) / 10.0 AS recall_lsh,
           COALESCE(hi.hits_ivf, 0) / 10.0 AS recall_ivf
    FROM base b
    LEFT JOIN nl ON b.q_id = nl.q_id
    LEFT JOIN hl ON b.q_id = hl.q_id
    LEFT JOIN hi ON b.q_id = hi.q_id
    ORDER BY b.q_id
"""


# v19 composes the value-replayed v01/v06/v15 oracles; recall math is
# exact-int/10 divisions.
ORACLE["v19_quant_recall"] = f"""
    WITH exact AS ({ORACLE["v01_cosine_topk"]}),
    pq AS ({ORACLE["v06_pq_topk"]}),
    hm AS ({ORACLE["v15_hamming_topk"]}),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id),
    hp AS (
        SELECT e.q_id, COUNT(*) AS hits_pq
        FROM exact e JOIN pq p ON e.q_id = p.q_id AND e.c_id = p.c_id
        GROUP BY e.q_id
    ),
    hh AS (
        SELECT e.q_id, COUNT(*) AS hits_ham
        FROM exact e JOIN hm h ON e.q_id = h.q_id AND e.c_id = h.c_id
        GROUP BY e.q_id
    )
    SELECT b.q_id, b.n_exact,
           COALESCE(hp.hits_pq, 0) / 10.0 AS recall_pq,
           COALESCE(hh.hits_ham, 0) / 10.0 AS recall_ham
    FROM base b
    LEFT JOIN hp ON b.q_id = hp.q_id
    LEFT JOIN hh ON b.q_id = hh.q_id
    ORDER BY b.q_id
"""


# v20: v02's exact pair replay at the 0.1 rung + one rollup; rungs
# compare against the 6-dp-rounded sim on both engines.
ORACLE["v20_threshold_sweep"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings WHERE vec_id < 300
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, SUM(a.v * b.v) AS dot
        FROM cells a JOIN cells b ON a.k = b.k AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    p AS (
        SELECT ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.a_id
        JOIN norms nb ON nb.vec_id = d.b_id
    )
    SELECT CAST(threshold AS DOUBLE) AS threshold, COUNT(*) AS n_pairs
    FROM p, UNNEST([0.1, 0.15, 0.2, 0.25, 0.3]) AS t(threshold)
    WHERE sim >= CAST(threshold AS DOUBLE)
    GROUP BY threshold
    ORDER BY threshold
"""

# v21: the filtered-ANN oracle replays BOTH strategies end-to-end —
# pre-filter rebuilds the seed quantizer over the filtered corpus
# (16 lowest-id vectors WITH label%2=0); post-filter reuses the v04
# index shape at k'=30 and re-ranks survivors by probe rank.
ORACLE["v21_filtered_ann"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    keep AS (SELECT vec_id FROM embeddings WHERE label % 2 = 0),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    dots_e AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, SUM(q.v * c.v) AS dot
        FROM cells q JOIN cells c ON q.k = c.k
        WHERE q.vec_id < 5
          AND c.vec_id IN (SELECT vec_id FROM keep)
        GROUP BY q.vec_id, c.vec_id
    ),
    exact AS (
        SELECT q_id, c_id FROM (
            SELECT d.q_id, d.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.q_id
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6)
                                DESC, d.c_id
                   ) AS rank
            FROM dots_e d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 10
    ),
    ctr_pre AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM keep ORDER BY vec_id LIMIT 16)
    ),
    d2_pre AS (
        SELECT a.vec_id AS vid, ctr_pre.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr_pre ON TRUE
        JOIN cells b ON b.vec_id = ctr_pre.cvid AND b.k = a.k
        WHERE a.vec_id < 5
           OR a.vec_id IN (SELECT vec_id FROM keep)
        GROUP BY a.vec_id, ctr_pre.cell
    ),
    assigned_pre AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2_pre
            WHERE vid IN (SELECT vec_id FROM keep)
        ) WHERE rn = 1
    ),
    probes_pre AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS pr
            FROM d2_pre WHERE vid < 5
        ) WHERE pr <= 4
    ),
    dots_pre AS (
        SELECT cd.q_id, cd.c_id, SUM(a.v * b.v) AS dot
        FROM (
            SELECT p.q_id, a.vid AS c_id
            FROM probes_pre p JOIN assigned_pre a ON a.cell = p.cell
        ) cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.c_id
    ),
    pre AS (
        SELECT q_id, c_id FROM (
            SELECT d.q_id, d.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.q_id
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6)
                                DESC, d.c_id
                   ) AS rank
            FROM dots_pre d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 10
    ),
    ctr_all AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2_all AS (
        SELECT a.vec_id AS vid, ctr_all.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr_all ON TRUE
        JOIN cells b ON b.vec_id = ctr_all.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr_all.cell
    ),
    assigned_all AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2_all
        ) WHERE rn = 1
    ),
    probes_all AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS pr
            FROM d2_all WHERE vid < 5
        ) WHERE pr <= 4
    ),
    dots_all AS (
        SELECT cd.q_id, cd.c_id, SUM(a.v * b.v) AS dot
        FROM (
            SELECT p.q_id, a.vid AS c_id
            FROM probes_all p JOIN assigned_all a ON a.cell = p.cell
        ) cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.c_id
    ),
    wide AS (
        SELECT q_id, c_id, rank FROM (
            SELECT d.q_id, d.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.q_id
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6)
                                DESC, d.c_id
                   ) AS rank
            FROM dots_all d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 30
    ),
    post AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY rank) AS rn
            FROM wide
            WHERE c_id IN (SELECT vec_id FROM keep)
        ) WHERE rn <= 10
    ),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id),
    np AS (SELECT q_id, COUNT(*) AS n_pre FROM pre GROUP BY q_id),
    ns AS (SELECT q_id, COUNT(*) AS n_post FROM post GROUP BY q_id),
    hp AS (
        SELECT e.q_id, COUNT(*) AS hits_pre
        FROM exact e JOIN pre p ON e.q_id = p.q_id AND e.c_id = p.c_id
        GROUP BY e.q_id
    ),
    hs AS (
        SELECT e.q_id, COUNT(*) AS hits_post
        FROM exact e JOIN post s ON e.q_id = s.q_id AND e.c_id = s.c_id
        GROUP BY e.q_id
    )
    SELECT b.q_id, b.n_exact,
           COALESCE(np.n_pre, 0) AS n_pre,
           COALESCE(ns.n_post, 0) AS n_post,
           COALESCE(hp.hits_pre, 0) / 10.0 AS recall_pre,
           COALESCE(hs.hits_post, 0) / 10.0 AS recall_post
    FROM base b
    LEFT JOIN np ON b.q_id = np.q_id
    LEFT JOIN ns ON b.q_id = ns.q_id
    LEFT JOIN hp ON b.q_id = hp.q_id
    LEFT JOIN hs ON b.q_id = hs.q_id
    ORDER BY b.q_id
"""

# v22: the v04 assignment replay -> 16-group count + exact shares.
ORACLE["v22_ivf_cell_balance"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    g AS (SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell),
    tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n FROM g)
    SELECT g.cell, g.n_vecs,
           ROUND(g.n_vecs / CAST(tot.n AS DOUBLE), 6) AS share
    FROM g CROSS JOIN tot
    ORDER BY g.cell
"""

# v23: one widest-rung probe pass scored once; each rung filters and
# re-ranks the same candidate set (pr kept through scoring).
ORACLE["v23_probe_recall_curve"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vid AS q_id, cell, pr FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS pr
            FROM d2 WHERE vid < 5
        ) WHERE pr <= 8
    ),
    cand AS (
        SELECT p.q_id, p.pr, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    dots AS (
        SELECT cd.q_id, cd.pr, cd.c_id, SUM(a.v * b.v) AS dot
        FROM cand cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.pr, cd.c_id
    ),
    scored AS (
        SELECT d.q_id, d.pr, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    ),
    rungs AS (
        SELECT q_id, c_id, sim, CAST(np AS INTEGER) AS np
        FROM scored, UNNEST([1, 2, 4, 8]) AS t(np)
        WHERE pr <= np
    ),
    topk AS (
        SELECT np, q_id, c_id FROM (
            SELECT np, q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY np, q_id
                       ORDER BY sim DESC, c_id) AS rank
            FROM rungs
        ) WHERE rank <= 10
    ),
    dots_e AS (
        SELECT qq.vec_id AS q_id, cells.vec_id AS c_id,
               SUM(qq.v * cells.v) AS dot
        FROM (SELECT * FROM cells WHERE vec_id < 5) qq
        JOIN cells ON qq.k = cells.k
        GROUP BY qq.vec_id, cells.vec_id
    ),
    exact AS (
        SELECT q_id, c_id FROM (
            SELECT d.q_id, d.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.q_id
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6)
                                DESC, d.c_id
                   ) AS rank
            FROM dots_e d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 10
    ),
    hits AS (
        SELECT t.np, COUNT(*) AS n_hits
        FROM topk t JOIN exact e
          ON t.q_id = e.q_id AND t.c_id = e.c_id
        GROUP BY t.np
    ),
    nq AS (SELECT COUNT(DISTINCT q_id) AS nq FROM exact)
    SELECT CAST(r.np AS INTEGER) AS n_probe,
           COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / (10.0 * nq.nq), 6) AS recall
    FROM UNNEST([1, 2, 4, 8]) AS r(np)
    LEFT JOIN hits h ON h.np = r.np
    CROSS JOIN nq
    ORDER BY n_probe
"""

# v24: the v04 seed-quantizer replay against the LOGICAL post-
# maintenance corpus — survivors (even, not deleted/updated) ∪
# reversed updates (≡4 mod 10) ∪ inserted odds < 40 — with STALE
# centers (16 lowest even ids, ORIGINAL vectors) and odd 41..49
# queries. Storage mechanics are value no-ops. The CTE chain (ending
# at `scored`) is a named constant because v30's recall oracle reuses
# it verbatim and appends its own exact-top-5 comparison.
_V24_CTE_CHAIN = """
    WITH orig AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    cur_rows AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 NOT IN (0, 4)
        UNION ALL
        SELECT vec_id, list_reverse(embedding) FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 = 4
        UNION ALL
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 1 AND vec_id < 40
    ),
    cur AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM cur_rows
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT 16)
    ),
    d2a AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cur a
        JOIN ctr ON TRUE
        JOIN orig b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2a
        ) WHERE rn = 1
    ),
    d2q AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM orig a
        JOIN ctr ON TRUE
        JOIN orig b ON b.vec_id = ctr.cvid AND b.k = a.k
        WHERE a.vec_id % 2 = 1 AND a.vec_id >= 41 AND a.vec_id < 50
        GROUP BY a.vec_id, ctr.cell
    ),
    probes AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS pr
            FROM d2q
        ) WHERE pr <= 4
    ),
    cand AS (
        SELECT p.q_id, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    norms_q AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm
        FROM orig GROUP BY vec_id
    ),
    norms_c AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm
        FROM cur GROUP BY vec_id
    ),
    dots AS (
        SELECT cd.q_id, cd.c_id, SUM(a.v * b.v) AS dot
        FROM cand cd
        JOIN orig a ON a.vec_id = cd.q_id
        JOIN cur b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM dots d
        JOIN norms_q nq ON nq.vec_id = d.q_id
        JOIN norms_c nc ON nc.vec_id = d.c_id
    )"""

ORACLE["v24_ivf_index_maintenance"] = (
    _V24_CTE_CHAIN
    + """
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 5 ORDER BY q_id, rank
"""
)


# v25: v01's cells/norms recipe on the <100 slice, rank<=11 with the
# self row dropped and ranks shifted down one; reverse-edge flag via
# LEFT JOIN on the (unique) directed pair.
ORACLE["v25_mutual_knn"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings WHERE vec_id < 100
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id, SUM(a.v * b.v) AS dot
        FROM cells a JOIN cells b ON a.k = b.k
        GROUP BY a.vec_id, b.vec_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    ),
    topk AS (
        SELECT q_id, c_id, rank - 1 AS rank FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, c_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= 11 AND q_id <> c_id
    )
    SELECT t.rank,
           COUNT(*) AS n_edges,
           CAST(SUM(CASE WHEN r.q_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mutual,
           ROUND(SUM(CASE WHEN r.q_id IS NOT NULL THEN 1.0
                          ELSE 0.0 END) / COUNT(*), 6) AS mutual_rate
    FROM topk t
    LEFT JOIN topk r ON r.q_id = t.c_id AND r.c_id = t.q_id
    GROUP BY t.rank
    ORDER BY t.rank
"""


# v26: v22's assignment replay + md5-order sqrt allocation per cell.
ORACLE["v26_stratified_cell_sample"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    t AS (
        SELECT a.cell, e.label,
               ROW_NUMBER() OVER (
                   PARTITION BY a.cell
                   ORDER BY md5(CAST(a.vid AS VARCHAR)), a.vid
               ) AS rn,
               COUNT(*) OVER (PARTITION BY a.cell) AS n_c
        FROM assigned a JOIN embeddings e ON e.vec_id = a.vid
    )
    SELECT CAST(cell AS INT) AS cell,
           COUNT(*) AS n_vecs,
           CAST(SUM(CASE WHEN rn <= CEIL(SQRT(CAST(n_c AS DOUBLE)))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           COUNT(DISTINCT label) AS n_labels,
           COUNT(DISTINCT CASE WHEN rn <= CEIL(SQRT(CAST(n_c
                                                         AS DOUBLE)))
                               THEN label END) AS n_labels_sampled
    FROM t GROUP BY cell ORDER BY cell
"""


# v27: the v17 rounded-decimal trick makes centroids engine-stable;
# pairwise centroid algebra on the 10x64 grid.
ORACLE["v27_label_separability"] = """
    WITH v AS (
        SELECT label, s.ord - 1 AS dim,
               CAST(ROUND(CAST(embedding[s.ord] AS DOUBLE), 7)
                    AS DECIMAL(18,7)) AS x
        FROM embeddings,
             (SELECT UNNEST(range(1, 65)) AS ord) s
    ),
    g AS (
        SELECT label, dim, SUM(x) AS s1, COUNT(*) AS n
        FROM v GROUP BY label, dim
    ),
    c AS (
        SELECT label, dim, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m
        FROM g
    ),
    nrm AS (
        SELECT label, MAX(n) AS n_vecs, SQRT(SUM(m * m)) AS nrm
        FROM c GROUP BY label
    ),
    dots AS (
        SELECT a.label AS la, b.label AS lb, SUM(a.m * b.m) AS dot
        FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT d.la AS label_a, d.lb AS label_b,
           CAST(na.n_vecs AS BIGINT) AS n_a,
           CAST(nb.n_vecs AS BIGINT) AS n_b,
           ROUND(d.dot / (na.nrm * nb.nrm), 6) AS centroid_cosine
    FROM dots d
    JOIN nrm na ON na.label = d.la
    JOIN nrm nb ON nb.label = d.lb
    ORDER BY label_a, label_b
"""


# v28: the v06 encode replay (slice/normalize/argmin) without the
# query restriction; per-subspace MSE and code-usage rollups.
ORACLE["v28_pq_distortion"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    unit AS (
        SELECT c.vec_id, c.k,
               c.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END AS u
        FROM cells c JOIN norms n USING (vec_id)
    ),
    ctrids AS (
        SELECT vec_id AS cvid,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    book AS (
        SELECT ct.c, CAST((u.k - 1) // 8 AS INT) AS m, (u.k - 1) % 8 AS j,
               u.u AS w
        FROM unit u JOIN ctrids ct ON u.vec_id = ct.cvid
    ),
    sub AS (
        SELECT vec_id, CAST((k - 1) // 8 AS INT) AS m, (k - 1) % 8 AS j, u
        FROM unit
    ),
    d2 AS (
        SELECT s.vec_id, s.m, b.c, SUM((s.u - b.w) * (s.u - b.w)) AS d2
        FROM sub s JOIN book b ON b.m = s.m AND b.j = s.j
        GROUP BY s.vec_id, s.m, b.c
    ),
    pick AS (
        SELECT vec_id, m, c AS code, d2 AS min_d2 FROM (
            SELECT vec_id, m, c, d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, m ORDER BY d2, c
                   ) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    g2 AS (
        SELECT m, code, COUNT(*) AS cnt FROM pick GROUP BY m, code
    ),
    use AS (
        SELECT m, SUM(cnt) AS n_vecs, COUNT(*) AS n_codes_used,
               ROUND(CAST(MAX(cnt) AS DOUBLE)
                     / CAST(SUM(cnt) AS DOUBLE), 6) AS top_code_share
        FROM g2 GROUP BY m
    ),
    mse AS (
        SELECT m, ROUND(AVG(min_d2), 6) AS mse FROM pick GROUP BY m
    )
    SELECT CAST(use.m AS INT) AS m,
           CAST(use.n_vecs AS BIGINT) AS n_vecs,
           mse.mse,
           CAST(use.n_codes_used AS BIGINT) AS n_codes_used,
           use.top_code_share
    FROM use JOIN mse ON use.m = mse.m
    ORDER BY m
"""

# v29: the v28 distortion replay run twice — "before" over the even
# corpus, "after" over the logical post-maintenance corpus (survivors
# ∪ reversed updates ∪ inserts) — with codebooks seeded from the 16
# lowest EVEN ids in both; the stored-code residual equals the fresh
# argmin min-d2 exactly when maintenance wrote argmin codes (tie
# codes share the same d2 value, so the MSE is tie-proof); parquet
# round-trips and the cell-scoped rewrite are value no-ops. Drift is
# a ratio of the two ROUNDED MSEs (deterministic on both engines).
_V29_POST = """
        SELECT vec_id, embedding AS emb FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 <> 0 AND vec_id % 10 <> 4
        UNION ALL
        SELECT vec_id, list_reverse(embedding) FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 = 4
        UNION ALL
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 1 AND vec_id < 40
"""


def _v29_side(name: str, src: str) -> str:
    """One distortion pass (cells → unit → per-subspace argmin d2 →
    per-m count + rounded MSE) over ``src`` rows (vec_id, emb)."""
    return f"""
    {name}_cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(emb, 1) AS k,
               CAST(UNNEST(emb) AS DOUBLE) AS v
        FROM ({src})
    ),
    {name}_norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm
        FROM {name}_cells GROUP BY vec_id
    ),
    {name}_unit AS (
        SELECT c.vec_id, c.k,
               c.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END AS u
        FROM {name}_cells c JOIN {name}_norms n USING (vec_id)
    ),
    {name}_sub AS (
        SELECT vec_id, CAST((k - 1) // 8 AS INT) AS m,
               (k - 1) % 8 AS j, u
        FROM {name}_unit
    ),
    {name}_d2 AS (
        SELECT s.vec_id, s.m, b.c,
               SUM((s.u - b.w) * (s.u - b.w)) AS d2
        FROM {name}_sub s JOIN book b ON b.m = s.m AND b.j = s.j
        GROUP BY s.vec_id, s.m, b.c
    ),
    {name}_pick AS (
        SELECT vec_id, m, MIN(d2) AS min_d2
        FROM {name}_d2 GROUP BY vec_id, m
    ),
    {name}_mse AS (
        SELECT m, COUNT(*) AS n, ROUND(AVG(min_d2), 6) AS mse
        FROM {name}_pick GROUP BY m
    )"""


ORACLE["v29_pq_index_maintenance"] = f"""
    WITH bc AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings WHERE vec_id % 2 = 0
    ),
    bn AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM bc GROUP BY vec_id
    ),
    bu AS (
        SELECT c.vec_id, c.k,
               c.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END AS u
        FROM bc c JOIN bn n USING (vec_id)
    ),
    ctrids AS (
        SELECT vec_id AS cvid,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS c
        FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT 16)
    ),
    book AS (
        SELECT ct.c, CAST((u.k - 1) // 8 AS INT) AS m,
               (u.k - 1) % 8 AS j, u.u AS w
        FROM bu u JOIN ctrids ct ON u.vec_id = ct.cvid
    ),
    {_v29_side("bef", "SELECT vec_id, embedding AS emb FROM embeddings WHERE vec_id % 2 = 0")},
    {_v29_side("aft", _V29_POST)}
    SELECT CAST(b.m AS INT) AS m,
           CAST(b.n AS BIGINT) AS n_before,
           b.mse AS mse_before,
           CAST(a.n AS BIGINT) AS n_after,
           a.mse AS mse_after,
           ROUND(a.mse / b.mse, 6) AS mse_drift
    FROM bef_mse b JOIN aft_mse a ON b.m = a.m
    ORDER BY m
"""

# v31: v04's seed-cell assignment/probe chain (RAW vectors, `cd2`)
# composed with v06's seed-codebook encode/ADC chain (UNIT vectors,
# `sd2`): ADC runs only on candidates from the probed cells, the
# shortlist is the 50 lowest (adc, c_id), and the exact cosine top-10
# re-rank runs on the shortlist alone — each stage value-identical to
# its parent oracle.
ORACLE["v31_ivfpq_topk"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    cd2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS rn
            FROM cd2
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS pr
            FROM cd2 WHERE vid < 5
        ) WHERE pr <= 4
    ),
    cand AS (
        SELECT p.q_id, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    unit AS (
        SELECT c.vec_id, c.k,
               c.v / CASE WHEN n.nrm = 0 THEN 1 ELSE n.nrm END AS u
        FROM cells c JOIN norms n USING (vec_id)
    ),
    ctrids AS (
        SELECT vec_id AS cvid,
               CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS c
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    book AS (
        SELECT ct.c, CAST((u.k - 1) // 8 AS INT) AS m, (u.k - 1) % 8 AS j,
               u.u AS w
        FROM unit u JOIN ctrids ct ON u.vec_id = ct.cvid
    ),
    sub AS (
        SELECT vec_id, CAST((k - 1) // 8 AS INT) AS m, (k - 1) % 8 AS j, u
        FROM unit
    ),
    sd2 AS (
        SELECT s.vec_id, s.m, b.c, SUM((s.u - b.w) * (s.u - b.w)) AS d2
        FROM sub s JOIN book b ON b.m = s.m AND b.j = s.j
        GROUP BY s.vec_id, s.m, b.c
    ),
    codes AS (
        SELECT vec_id, m, c FROM (
            SELECT vec_id, m, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, m ORDER BY d2, c
                   ) AS rn
            FROM sd2
        ) WHERE rn = 1
    ),
    adc AS (
        SELECT ca.q_id, ca.c_id, SUM(q.d2) AS adc
        FROM cand ca
        JOIN codes cd ON cd.vec_id = ca.c_id
        JOIN sd2 q ON q.vec_id = ca.q_id AND q.m = cd.m AND q.c = cd.c
        GROUP BY ca.q_id, ca.c_id
    ),
    short AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adc, c_id
                   ) AS r
            FROM adc
        ) WHERE r <= 50
    ),
    dots AS (
        SELECT sh.q_id, sh.c_id, SUM(a.v * b.v) AS dot
        FROM short sh
        JOIN cells a ON a.vec_id = sh.q_id
        JOIN cells b ON b.vec_id = sh.c_id AND a.k = b.k
        GROUP BY sh.q_id, sh.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    )
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""

# v32 composes the value-replayed v01 and v31 oracles; recall math is
# exact-int counts over /10.0.
ORACLE["v32_ivfpq_recall"] = f"""
    WITH exact AS ({ORACLE["v01_cosine_topk"]}),
    ivfpq AS ({ORACLE["v31_ivfpq_topk"]}),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id),
    h AS (
        SELECT e.q_id, COUNT(*) AS n_hits
        FROM exact e JOIN ivfpq i ON e.q_id = i.q_id AND e.c_id = i.c_id
        GROUP BY e.q_id
    )
    SELECT b.q_id, b.n_exact,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) / 10.0 AS recall_at_10
    FROM base b LEFT JOIN h ON b.q_id = h.q_id
    ORDER BY b.q_id
"""

# v30: the full v24 CTE chain (same maintenance, same stale-center
# probe — the shared `_V24_CTE_CHAIN` constant), plus an exact
# brute-force top-5 over the post corpus and a per-query hit fold;
# both rankings order by the ROUNDED sim with c_id tiebreaks (the
# cosine_topk contract).
ORACLE["v30_maintained_recall"] = (
    _V24_CTE_CHAIN
    + """,
    idx AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, c_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= 5
    ),
    exact_dots AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               SUM(a.v * b.v) AS dot
        FROM orig a JOIN cur b ON a.k = b.k
        WHERE a.vec_id % 2 = 1 AND a.vec_id >= 41 AND a.vec_id < 50
        GROUP BY 1, 2
    ),
    exact_scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (nq.nrm * nc.nrm), 6) AS sim
        FROM exact_dots d
        JOIN norms_q nq ON nq.vec_id = d.q_id
        JOIN norms_c nc ON nc.vec_id = d.c_id
    ),
    exact_top AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim DESC, c_id
                   ) AS r
            FROM exact_scored
        ) WHERE r <= 5
    )
    SELECT e.q_id,
           CAST(COUNT(i.c_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(i.c_id) / 5.0, 6) AS recall_at_5
    FROM exact_top e
    LEFT JOIN idx i ON i.q_id = e.q_id AND i.c_id = e.c_id
    GROUP BY e.q_id ORDER BY e.q_id
"""
)

# v33: v04's seed-cell assignment/probe chain (RAW vectors) composed
# with v14's SQ8 grid: candidates decode to `mn + code·(mx−mn)/255`
# per dimension, are ranked by the 9-dp-rounded cosine(q, recon) with
# c_id tiebreaks (engine-stable shortlist cut), and the exact cosine
# top-10 re-rank runs on the 50-candidate shortlist alone — each
# stage value-identical to its parent oracle.
ORACLE["v33_ivfsq_topk"] = f"""
    WITH cells AS ({_CELLS}),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    cd2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS rn
            FROM cd2
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vid AS q_id, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (PARTITION BY vid ORDER BY d2, cell)
                       AS pr
            FROM cd2 WHERE vid < 5
        ) WHERE pr <= 4
    ),
    stats AS (SELECT k, MIN(v) AS mn, MAX(v) AS mx FROM cells GROUP BY k),
    recon AS (
        SELECT c.vec_id, c.k,
               CASE WHEN s.mx = s.mn THEN s.mn
                    ELSE s.mn + FLOOR((c.v - s.mn) * 255.0
                                      / (s.mx - s.mn) + 0.5)
                                * (s.mx - s.mn) / 255.0
               END AS rv
        FROM cells c JOIN stats s USING (k)
    ),
    rnorms AS (
        SELECT vec_id, SQRT(SUM(rv * rv)) AS rnrm
        FROM recon GROUP BY vec_id
    ),
    cand AS (
        SELECT p.q_id, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    qdots AS (
        SELECT ca.q_id, ca.c_id, SUM(q.v * r.rv) AS dot
        FROM cand ca
        JOIN cells q ON q.vec_id = ca.q_id
        JOIN recon r ON r.vec_id = ca.c_id AND r.k = q.k
        GROUP BY ca.q_id, ca.c_id
    ),
    qsims AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (nq.nrm * nr.rnrm), 9) AS sim_q
        FROM qdots d
        JOIN norms nq ON nq.vec_id = d.q_id
        JOIN rnorms nr ON nr.vec_id = d.c_id
    ),
    short AS (
        SELECT q_id, c_id FROM (
            SELECT q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY sim_q DESC, c_id
                   ) AS r
            FROM qsims
        ) WHERE r <= 50
    ),
    dots AS (
        SELECT sh.q_id, sh.c_id, SUM(a.v * b.v) AS dot
        FROM short sh
        JOIN cells a ON a.vec_id = sh.q_id
        JOIN cells b ON b.vec_id = sh.c_id AND a.k = b.k
        GROUP BY sh.q_id, sh.c_id
    ),
    scored AS (
        SELECT d.q_id, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    )
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT q_id, c_id, sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY sim DESC, c_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10 ORDER BY q_id, rank
"""

# v34: v22's list sizes × v23's rung recall composed into one
# frontier — cost columns are exact integer sums over the probed
# lists; recall reuses v23's scored-once chain; scan_frac is an
# int-over-int division rounded at 6 dp.
ORACLE["v34_ann_cost_frontier"] = """
    WITH cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM cells GROUP BY vec_id
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)
    ),
    d2 AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cells a
        JOIN ctr ON TRUE
        JOIN cells b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2
        ) WHERE rn = 1
    ),
    sizes AS (SELECT cell, COUNT(*) AS n_vecs FROM assigned GROUP BY cell),
    corpus AS (SELECT COUNT(*) AS n FROM embeddings),
    probes AS (
        SELECT vid AS q_id, cell, pr FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS pr
            FROM d2 WHERE vid < 5
        ) WHERE pr <= 8
    ),
    per_q AS (
        SELECT CAST(np AS INTEGER) AS n_probe, p.q_id,
               SUM(s.n_vecs) AS cand
        FROM probes p
        JOIN sizes s ON s.cell = p.cell,
        UNNEST([1, 2, 4, 8]) AS t(np)
        WHERE p.pr <= np
        GROUP BY np, p.q_id
    ),
    cost AS (
        SELECT n_probe, COUNT(*) AS nq, SUM(cand) AS codes_scanned,
               SUM(LEAST(cand, 50)) AS rerank_rows
        FROM per_q GROUP BY n_probe
    ),
    cand AS (
        SELECT p.q_id, p.pr, a.vid AS c_id
        FROM probes p JOIN assigned a ON a.cell = p.cell
    ),
    dots AS (
        SELECT cd.q_id, cd.pr, cd.c_id, SUM(a.v * b.v) AS dot
        FROM cand cd
        JOIN cells a ON a.vec_id = cd.q_id
        JOIN cells b ON b.vec_id = cd.c_id AND a.k = b.k
        GROUP BY cd.q_id, cd.pr, cd.c_id
    ),
    scored AS (
        SELECT d.q_id, d.pr, d.c_id,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        FROM dots d
        JOIN norms na ON na.vec_id = d.q_id
        JOIN norms nb ON nb.vec_id = d.c_id
    ),
    rungs AS (
        SELECT q_id, c_id, sim, CAST(np AS INTEGER) AS np
        FROM scored, UNNEST([1, 2, 4, 8]) AS t(np)
        WHERE pr <= np
    ),
    topk AS (
        SELECT np, q_id, c_id FROM (
            SELECT np, q_id, c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY np, q_id
                       ORDER BY sim DESC, c_id) AS rank
            FROM rungs
        ) WHERE rank <= 10
    ),
    dots_e AS (
        SELECT qq.vec_id AS q_id, cells.vec_id AS c_id,
               SUM(qq.v * cells.v) AS dot
        FROM (SELECT * FROM cells WHERE vec_id < 5) qq
        JOIN cells ON qq.k = cells.k
        GROUP BY qq.vec_id, cells.vec_id
    ),
    exact AS (
        SELECT q_id, c_id FROM (
            SELECT d.q_id, d.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.q_id
                       ORDER BY ROUND(d.dot / (na.nrm * nb.nrm), 6)
                                DESC, d.c_id
                   ) AS rank
            FROM dots_e d
            JOIN norms na ON na.vec_id = d.q_id
            JOIN norms nb ON nb.vec_id = d.c_id
        ) WHERE rank <= 10
    ),
    hits AS (
        SELECT t.np, COUNT(*) AS n_hits
        FROM topk t JOIN exact e
          ON t.q_id = e.q_id AND t.c_id = e.c_id
        GROUP BY t.np
    ),
    nq_t AS (SELECT COUNT(DISTINCT q_id) AS tq FROM exact)
    SELECT c.n_probe,
           CAST(c.n_probe AS BIGINT) AS cells_read_per_q,
           CAST(c.codes_scanned AS BIGINT) AS codes_scanned,
           CAST(c.rerank_rows AS BIGINT) AS rerank_rows,
           ROUND(c.codes_scanned
                 / (c.nq * CAST(corpus.n AS DOUBLE)), 6) AS scan_frac,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / (10.0 * nq_t.tq), 6)
               AS recall_at_10
    FROM cost c
    LEFT JOIN hits h ON h.np = c.n_probe
    CROSS JOIN corpus CROSS JOIN nq_t
    ORDER BY c.n_probe
"""

# v35 composes the value-replayed v01 and v33 oracles; recall math is
# exact-int counts over /10.0.
ORACLE["v35_ivfsq_recall"] = f"""
    WITH exact AS ({ORACLE["v01_cosine_topk"]}),
    ivfsq AS ({ORACLE["v33_ivfsq_topk"]}),
    base AS (SELECT q_id, COUNT(*) AS n_exact FROM exact GROUP BY q_id),
    h AS (
        SELECT e.q_id, COUNT(*) AS n_hits
        FROM exact e JOIN ivfsq i ON e.q_id = i.q_id AND e.c_id = i.c_id
        GROUP BY e.q_id
    )
    SELECT b.q_id, b.n_exact,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           COALESCE(h.n_hits, 0) / 10.0 AS recall_at_10
    FROM base b LEFT JOIN h ON b.q_id = h.q_id
    ORDER BY b.q_id
"""

# v36: the v24 logical-post-corpus recipe with the SQ8 layer — stats
# (the grid) from the even-half BUILD corpus only, assignment of the
# logical rows against STALE original center vectors, codes from the
# stale grid WITH edge clamping (out-of-grid update/insert values),
# per-cell exact-decimal reconstruction error (the v14 term form).
ORACLE["v36_ivfsq_maintenance"] = """
    WITH orig AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    stats AS (
        SELECT k, MIN(v) AS mn, MAX(v) AS mx
        FROM orig WHERE vec_id % 2 = 0 GROUP BY k
    ),
    cur_rows AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 NOT IN (0, 4)
        UNION ALL
        SELECT vec_id, list_reverse(embedding) FROM embeddings
        WHERE vec_id % 2 = 0 AND vec_id % 10 = 4
        UNION ALL
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % 2 = 1 AND vec_id < 40
    ),
    cur AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM cur_rows
    ),
    ctr AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               vec_id AS cvid
        FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT 16)
    ),
    d2a AS (
        SELECT a.vec_id AS vid, ctr.cell,
               SUM((a.v - b.v) * (a.v - b.v)) AS d2
        FROM cur a
        JOIN ctr ON TRUE
        JOIN orig b ON b.vec_id = ctr.cvid AND b.k = a.k
        GROUP BY a.vec_id, ctr.cell
    ),
    assigned AS (
        SELECT vid, cell FROM (
            SELECT vid, cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY vid ORDER BY d2, cell) AS rn
            FROM d2a
        ) WHERE rn = 1
    ),
    terms AS (
        SELECT c.vec_id,
               CAST(CASE WHEN s.mx = s.mn
                    THEN (c.v - s.mn) * (c.v - s.mn)
                    ELSE
                        (c.v - (s.mn
                                + LEAST(GREATEST(
                                      FLOOR((c.v - s.mn) * 255.0
                                            / (s.mx - s.mn) + 0.5),
                                      0.0), 255.0)
                                  * (s.mx - s.mn) / 255.0))
                        * (c.v - (s.mn
                                  + LEAST(GREATEST(
                                        FLOOR((c.v - s.mn) * 255.0
                                              / (s.mx - s.mn) + 0.5),
                                        0.0), 255.0)
                                    * (s.mx - s.mn) / 255.0))
               END AS DECIMAL(28,15)) AS t
        FROM cur c JOIN stats s USING (k)
    ),
    per_vec AS (
        SELECT vec_id, SUM(t) AS err FROM terms GROUP BY vec_id
    )
    SELECT CAST(a.cell AS INTEGER) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(p.err) AS DOUBLE) / (COUNT(*) * 64), 6)
               AS mse,
           ROUND(CAST(MAX(p.err) AS DOUBLE), 6) AS max_err
    FROM per_vec p JOIN assigned a ON a.vid = p.vec_id
    GROUP BY a.cell
    ORDER BY cell
"""
