"""Text/vector pipeline scale smoke (beyond the sf parquet tables).

Generates a synthetic corpus JVM-side (no driver materialization,
no Python row hops) and runs the LLM-pipeline heavy hitters — the
operators whose 100 TB viability the bench can't show at sf0.1:

- 500k docs (~60 tokens each, zipf-ish vocab with planted dup pairs)
  through exact dedup, MinHash-LSH pair generation, repetition
  metrics, and winnowed fingerprints;
- 500k x 64 embeddings through hyperplane-LSH ANN bucket join.

Everything stays JVM-side: the corpus is built from
``sequence``/``transform``/``xxhash64`` expressions, so generation
itself is a distributed kernel. Timings land in BASELINE.md.

Usage: python tools/text_scale_smoke.py [n_docs]
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import tempfile
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
# per-run scratch dir, removed at exit (concurrent runs don't clobber)
_SMOKE_DIR = tempfile.mkdtemp(prefix="text_smoke_")
atexit.register(lambda: shutil.rmtree(_SMOKE_DIR, ignore_errors=True))
TOKENS_PER_DOC = 60
VOCAB = 50_000


def timed(label, fn):
    t = time.time()
    out = fn()
    print(f"{label:40s} {time.time() - t:6.2f} s")
    return out


def main():
    sys.path.insert(0, "/root/repo")
    # One JVM runs every item back-to-back and the eager
    # localCheckpoints (minhash/winnow) stay pinned until GC — with
    # the default 16g heap the later items measure GC churn, not the
    # operator. 48g on the 128 GiB box keeps the heap quiet.
    import os
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from dislib_spark.session import get_spark
    from dislib_spark.text.dedup import exact_dedup, minhash_lsh_pairs
    from dislib_spark.text.repetition import with_repetition_features
    from dislib_spark.text.lm import bpe_pair_counts, lm_doc_scores
    from dislib_spark.text.winnow import with_fingerprints
    from dislib_spark.vector.search import lsh_topk
    from dislib_spark.vector.semantic import semantic_dedup_pairs

    spark = get_spark(app_name="text-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def gen_docs():
        # doc_id range distributed across the cluster; every planted
        # duplicate shares its text with doc_id - 1 (1% of docs).
        base = spark.range(0, N, 1, par)
        eff = F.when(
            (F.col("id") % 100 == 1) & (F.col("id") > 0),
            F.col("id") - 1,
        ).otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(1), F.lit(TOKENS_PER_DOC)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(eff * TOKENS_PER_DOC + i), F.lit(VOCAB)),
            ),
        )
        # Write-then-scan parquet: operators are measured off a real
        # parquet scan (the production shape). A .cache() here reads
        # 3-10x slower than the scan for wide string columns — the
        # InMemoryRelation columnar decompression dominated the old
        # timings and mis-charged ~35 s to the LM item.
        base.select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", words).alias("text"),
        ).write.mode("overwrite").parquet(_SMOKE_DIR + "/docs.parquet")
        return spark.read.parquet(_SMOKE_DIR + "/docs.parquet")

    docs = timed(f"generate {N} docs (JVM expr)", gen_docs)

    timed(
        "exact dedup (md5 groupBy)",
        lambda: exact_dedup(docs).where(F.col("n_copies") > 1).count(),
    )
    timed(
        "MinHash-LSH pair gen (32 perms, 8 bands)",
        lambda: minhash_lsh_pairs(docs, threshold=0.5).count(),
    )
    def containment_item():
        from dislib_spark.text.dedup import containment_pairs

        # the t72 kernel at scale runs with the same posting caps as
        # jaccard_pairs' documented 100 TB setting
        return containment_pairs(
            docs, c_threshold=0.6, j_max=0.3,
            max_posting=10_000, max_df=N // 10,
        ).count()

    timed("containment pairs (inverted index, capped)", containment_item)
    timed(
        "repetition metrics (per-row folds)",
        lambda: with_repetition_features(docs)
        .agg(F.avg("dup3_frac"), F.avg("top2_share"))
        .collect(),
    )
    timed(
        "winnow fingerprints (md5 grams, w=4)",
        lambda: with_fingerprints(docs)
        .agg(F.sum(F.size("fingerprints")))
        .collect(),
    )
    timed(
        "unigram-LM doc scores (count + token join)",
        lambda: lm_doc_scores(docs)
        .agg(F.avg("lm_score"), F.min("lm_score"))
        .collect(),
    )
    timed(
        "BPE pair counts (vocab-sized explosion)",
        lambda: bpe_pair_counts(docs, top_k=20).collect(),
    )

    def index_probe_item():
        from dislib_spark.text.dedup import (
            dedup_against_index,
            minhash_index,
        )

        ix = minhash_index(docs.where(F.col("doc_id") % 2 == 0))
        return dedup_against_index(
            docs.where(F.col("doc_id") % 2 == 1), ix, threshold=0.5
        ).count()

    timed(
        "archive index build + batch probe (band equi-join)",
        index_probe_item,
    )

    def recall_grade_item():
        # t75/t76's dedup-grading shape at scale: a capped truth set
        # (inverted-index Jaccard, the 100 TB posting caps) joined
        # against TWO banding configurations of the same signature —
        # three full signature/pair builds, the priciest thing the
        # self-grading dedup pass adds. Grade joins are truth-sized.
        from dislib_spark.text.dedup import jaccard_pairs

        truth = jaccard_pairs(
            docs, threshold=0.3,
            max_posting=10_000, max_df=N // 10,
        ).select("a_id", "b_id", "jaccard")

        def caught(bands, name):
            return (
                minhash_lsh_pairs(docs, threshold=0.3, bands=bands)
                .select("a_id", "b_id")
                .withColumn(name, F.lit(1))
            )

        j = truth.join(
            caught(8, "hit8"), ["a_id", "b_id"], "left"
        ).join(caught(4, "hit4"), ["a_id", "b_id"], "left")
        return (
            j.groupBy(
                F.floor(F.col("jaccard") * 10).cast("int").alias("d")
            )
            .agg(
                F.count(F.lit(1)),
                F.sum(F.coalesce("hit8", F.lit(0))),
                F.sum(F.coalesce("hit4", F.lit(0))),
            )
            .collect()
        )

    timed(
        "banding recall grade (truth + 2 configs, t75/t76 shape)",
        recall_grade_item,
    )

    def k_core_item():
        from dislib_spark.graph import k_core

        pairs = minhash_lsh_pairs(docs, threshold=0.5)
        return k_core(pairs, k=2, rounds=4).count()

    timed("k-core peel on the LSH dup graph (4 rounds)", k_core_item)

    def nb_fit_score():
        from dislib_spark.classification.naive_bayes import MultinomialNB

        labeled = docs.withColumn(
            "lang", F.concat(F.lit("c"), (F.col("doc_id") % 4))
        )
        nb = MultinomialNB(alpha=1.0).fit(labeled, label_col="lang")
        return (
            nb.score_documents(docs)
            .agg(F.count(F.lit(1)), F.avg("joint"))
            .collect()
        )

    timed("NB classifier fit + full-corpus score", nb_fit_score)

    def pmi_item():
        from dislib_spark.text.features import pmi_collocations

        return (
            pmi_collocations(docs, min_count=50)
            .agg(F.count(F.lit(1)), F.max("pmi"))
            .collect()
        )

    timed("PMI collocations (bigram count + marginals)", pmi_item)

    def vocab_item():
        from dislib_spark.text.features import vocab_coverage

        labeled = docs.withColumn(
            "source", F.concat(F.lit("s"), (F.col("doc_id") % 20))
        )
        return vocab_coverage(labeled, vocab_size=10).collect()

    timed("vocab coverage / OOV rate (top-10 vocab)", vocab_item)

    def gen_vecs():
        base = spark.range(0, N, 1, par)
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(2000)).cast(
                    "double"
                )
                - 1000.0
            )
            / 1000.0,
        )
        base.select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        ).write.mode("overwrite").parquet(_SMOKE_DIR + "/vecs.parquet")
        return spark.read.parquet(_SMOKE_DIR + "/vecs.parquet")

    vecs = timed(f"generate {N}x64 embeddings", gen_vecs)
    queries = vecs.limit(10)
    timed(
        "LSH ANN top-10 (10 queries, bucket join)",
        lambda: lsh_topk(queries, vecs, k=10).count(),
    )

    def ivf_item():
        from dislib_spark.vector.search import ivf_topk

        return ivf_topk(queries, vecs, k=10, n_cells=64, n_probe=4).count()

    timed("IVF ANN top-10 (64 cells, probe 4)", ivf_item)

    def pq_item():
        from dislib_spark.vector.search import (
            pq_codebooks, pq_encode, pq_topk,
        )

        return pq_topk(queries, vecs, k=10).count()

    timed("PQ ANN top-10 (ADC scoring + re-rank)", pq_item)

    # IVF-PQ: build (amortized once per index lifetime) and probe
    # (the per-batch cost) timed separately — the composed build pays
    # both quantizer trainings + the encode pass + the index join,
    # while a probe touches n_probe lists + rerank rows per query.
    from dislib_spark.vector.search import ivfpq_index, ivfpq_query_index

    built = {}

    def ivfpq_build_item():
        ctrs, books, cell_codes = ivfpq_index(
            vecs, n_cells=64, n_subvectors=8, n_centroids=16
        )
        cell_codes = cell_codes.localCheckpoint(eager=True)
        built.update(ctrs=ctrs, books=books, cell_codes=cell_codes)
        return cell_codes.count()

    timed("IVF-PQ index build (64 cells, 8x16 codebooks)", ivfpq_build_item)
    timed(
        "IVF-PQ probe top-10 (10 queries, cell-pruned ADC + re-rank)",
        lambda: ivfpq_query_index(
            queries, built["ctrs"], built["books"],
            built["cell_codes"], vecs, k=10, n_probe=4, rerank=100,
        ).count(),
    )
    # IVF-SQ8 (v33): same build/probe split — the build pays the
    # coarse assignment + one stats scan + the SQ8 encode; a probe
    # decodes only n_probe lists' codes (dim multiply-adds per
    # candidate, no trained codebook) + the rerank-row exact fetch.
    from dislib_spark.vector.search import ivfsq_index, ivfsq_query_index

    sq_built = {}

    def ivfsq_build_item():
        ctrs, stats, codes = ivfsq_index(vecs, n_cells=64)
        codes = codes.localCheckpoint(eager=True)
        sq_built.update(ctrs=ctrs, stats=stats, codes=codes)
        return codes.count()

    timed("IVF-SQ8 index build (64 cells, 8-bit grid)", ivfsq_build_item)
    timed(
        "IVF-SQ8 probe top-10 (10 queries, cell-pruned ADC + re-rank)",
        lambda: ivfsq_query_index(
            queries, sq_built["ctrs"], sq_built["stats"],
            sq_built["codes"], vecs, k=10, n_probe=4,
        ).count(),
    )
    timed(
        "semantic dedup (256 cells, 5-iter kmeans)",
        lambda: semantic_dedup_pairs(
            vecs, n_clusters=256, threshold=0.95, centers="kmeans",
            kmeans_max_iter=5,
        ).count(),
    )


if __name__ == "__main__":
    main()
