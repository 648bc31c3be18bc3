"""Text-pipeline extension queries over ``documents`` with DuckDB
oracles (exact-replayable: single-space tokenization + md5 + lambda
list ops — no engine-specific tokenizer/regex divergence).

MinHash-LSH (t05) and SimHash (t06) run with ``hash_fn="md5"`` so
their signatures, band/block keys and candidate sets are integer-
exact replays of the generated DuckDB oracles — the approximate
pipelines are value-checked end to end, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dislib_spark.packing import pack_sequences, packing_stats
from dislib_spark.sampling import stratified_hash_sample, weighted_mix
from dislib_spark.tables import load_table
from dislib_spark.utils.base import fan_out
from dislib_spark.text.analysis import (
    normalize_text,
    token_count,
    with_text_features,
)
from dislib_spark.text.contamination import contamination_check
from dislib_spark.graph import connected_components, dedup_canonical, pagerank
from dislib_spark.text.repetition import with_repetition_features
from dislib_spark.text.tfidf import bm25_scores, tfidf_topk
from dislib_spark.text.winnow import with_fingerprints
from dislib_spark.text.pii import with_pii_stats
from dislib_spark.text.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)


def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_text_features(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )


def t02_lang_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_text_features(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pred_lang")
    )


def t03_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d).orderBy("fp")


def t04_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, threshold=0.3, n=3).orderBy("a_id", "b_id")


def t05_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with ``hash_fn="md5"``: the affine
    permutation minima, band keys and bucket candidates are integer-
    exact replays of the DuckDB oracle (same constants from
    ``minhash_perms``), so the WHOLE approximate pipeline — not just
    the exact-Jaccard verify — is value-checked."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5").orderBy(
        "a_id", "b_id"
    )


def t06_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the 60-bit md5 token hash: votes,
    sign bits and the 45 pigeonhole block keys are integer arithmetic,
    replayed bit-exactly by the DuckDB oracle."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, max_hamming=8, bits=60, hash_fn="md5").orderBy(
        "a_id", "b_id"
    )


def t07_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_text_features(load_table(spark, sf_dir, "documents"))
    return (
        d.where(F.col("quality") >= 0.7)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
    )


# --- t08: canonical normalization pipeline ---------------------------
def t08_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    norm = normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.size(F.split(norm, " ", -1)).cast("long").alias("n_tokens"),
    ).orderBy("doc_id")


# --- t09: benchmark-contamination check (4-gram overlap; real
#          pipelines use 8-13 but the synthetic vocab is tiny) --------
def t09_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bench = d.where(F.col("source") == "src0")
    corpus = d.where(F.col("source") != "src0")
    return contamination_check(corpus, bench, n=4).orderBy("doc_id")


# --- t10: deterministic stratified hash sampling ---------------------
def t10_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = stratified_hash_sample(
        d,
        strata_col="lang",
        rates={"en": 0.2, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5},
        key_col="doc_id",
    )
    return s.select("doc_id", "lang").orderBy("doc_id")


# --- t11: Gopher-style repetition metrics, shuffle-free per row ------
def t11_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_repetition_features(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup3_frac"), 6).alias("avg_dup3"),
            F.round(F.avg("top2_share"), 6).alias("avg_top2"),
            F.round(F.max("dup3_frac"), 6).alias("max_dup3"),
            F.sum(
                (F.col("top2_share") > 0.08).cast("long")
            ).alias("n_flagged"),
        )
        .orderBy("source")
    )


# --- t12: concat-then-chunk sequence packing, per-source shards ------
def t12_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    packed = pack_sequences(
        d, "n_tokens", budget=512, order_col="doc_id", shard_col="source"
    )
    return packing_stats(packed, "n_tokens", 512, "source").orderBy(
        "source", "seq_id"
    )


# --- t13: deterministic epoch-weighted domain mixing -----------------
def t13_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    mixed = weighted_mix(
        d,
        strata_col="lang",
        weights={"en": 0.5, "de": 2.0, "fr": 1.5, "es": 1.0, "zh": 3.0},
        key_col="doc_id",
    )
    return mixed.select(
        "doc_id", "lang", F.col("copy_idx").cast("long").alias("copy_idx")
    ).orderBy("doc_id", "copy_idx")


# --- t14/t15: pairs → transitive clusters → canonical survivors ------
def t14_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    edges = jaccard_pairs(d, threshold=0.3)
    cc = connected_components(edges)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("component").alias("comp_id"), "n_docs")
        .orderBy("comp_id")
    )


def t15_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    kept = dedup_canonical(d, jaccard_pairs(d, threshold=0.3))
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


# --- t16/t17: retrieval-style scoring (TF-IDF / BM25) ----------------
def t16_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = tfidf_topk(d, k=3)
    return out.where(F.col("doc_id") < 30).orderBy("doc_id", "rank")


def t17_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return bm25_scores(d, ["spark", "query", "stream"]).orderBy("doc_id")


# --- t18: rolling-hash winnowing fingerprints ------------------------
def t18_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winnowed fingerprint-index stats (k=8 char grams,
    w=4 windows — dislib_spark.text.winnow)."""
    d = load_table(spark, sf_dir, "documents")
    fp = with_fingerprints(d)
    tot = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("fingerprints")).cast("bigint").alias("n_fp_total"),
    )
    dis = (
        fp.select("source", F.explode("fingerprints").alias("f"))
        .groupBy("source")
        .agg(F.countDistinct("f").alias("n_fp_distinct"))
    )
    return tot.join(dis, "source").orderBy("source")


# --- t21: PageRank centrality over the dedup pair graph --------------
def t21_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank on the near-dup graph (rank the hub
    documents of boilerplate clusters — dislib_spark.graph.pagerank).
    Oracle unrolls the same 10 iterations as chained CTEs."""
    d = load_table(spark, sf_dir, "documents")
    pr = pagerank(jaccard_pairs(d, threshold=0.3), n_iter=10)
    return pr.select(
        "node", F.round("rank", 6).alias("rank")
    ).orderBy("node")


# --- t22: per-document n-gram novelty (corpus-uniqueness) ------------
def t22_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-curation diversity metric: per source, the mean fraction
    of each doc's distinct 3-grams that occur in NO other document.
    One corpus-wide gram count (md5-keyed, map-side combined) joined
    back to the per-doc gram list — no self-join of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    grams = (
        fan_out(d)
        .select("doc_id", "source", F.col("text"))
        .select(
            "doc_id",
            "source",
            # sequence(1, 0) is DESCENDING [1,0], not empty — guard
            # short docs explicitly (shingles_from_tokens contract)
            F.explode(
                F.array_distinct(
                    F.expr(
                        "CASE WHEN size(split(text, ' ')) >= 3 THEN"
                        " transform(sequence(1, size(split(text, ' ')) - 2),"
                        " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
                        " ELSE array() END"
                    )
                )
            ).alias("gram"),
        )
        .select("doc_id", "source", F.md5("gram").alias("gk"))
        .localCheckpoint(eager=False)
    )
    counts = grams.groupBy("gk").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    per_doc = (
        grams.join(counts, "gk")
        .groupBy("doc_id", "source")
        .agg(
            (
                F.sum((F.col("n_docs_with") == 1).cast("long"))
                / F.count(F.lit(1))
            ).alias("novelty")
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
            F.round(F.min("novelty"), 6).alias("min_novelty"),
        )
        .orderBy("source")
    )


# --- t20: composed corpus-prep pipeline ------------------------------
def t20_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end prep: quality filter → exact dedup (keep lowest
    doc_id per fingerprint) → per-source doc/token stats. Exercises
    operator COMPOSITION — each stage is individually oracled
    (t07, t03, t01); this query checks they compose correctly."""
    d = with_text_features(load_table(spark, sf_dir, "documents"))
    q = d.where(F.col("quality") >= 0.5)
    keep = q.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept = q.join(keep, ["fingerprint", "doc_id"], "left_semi")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )


# --- t19: PII redaction (regex masking + match counts) ---------------
def t19_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mask long digit-run identifiers in customer names; count
    matches per segment (dislib_spark.text.pii)."""
    c = load_table(spark, sf_dir, "customer")
    s = with_pii_stats(c, text_col="c_name", kinds=("email", "id_digits"))
    return (
        s.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_id_digits").cast("bigint").alias("n_ids"),
            F.min("redacted").alias("sample_redacted"),
        )
        .orderBy("c_mktsegment")
    )


def t23_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal, self-trained: per-doc mean
    token log-prob under the corpus unigram LM, aggregated per
    source. One explode+count for the LM, one token hash join back
    (stopword skew = AQE skew-join territory)."""
    from dislib_spark.text.lm import lm_doc_scores

    d = load_table(spark, sf_dir, "documents")
    s = lm_doc_scores(d)
    return (
        d.select("doc_id", "source")
        .join(s, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("lm_score"), 6).alias("avg_lm"),
            F.round(F.min("lm_score"), 6).alias("min_lm"),
        )
        .orderBy("source")
    )


def t24_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction kernel: one BPE merge-selection step —
    frequency-weighted adjacent char-pair counts over the vocabulary
    (corpus-sized work is ONE word-count agg; pair explosion runs on
    the vocab-sized distinct-word table). Top-20 merge candidates."""
    from dislib_spark.text.lm import bpe_pair_counts

    d = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(d, top_k=20)


def t25_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style overlapping token-window chunking (50-token chunks,
    10-token overlap) — per-chunk md5 fingerprints make the oracle a
    full content check, not just counts."""
    from dislib_spark.text.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=50, overlap=10).select(
        "doc_id", "chunk_id", "n_tokens", "fp"
    ).orderBy("doc_id", "chunk_id")


def t26_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs on 80-char prefixes, candidates
    bucketed by the md5 of the first two tokens (levenshtein is
    O(len^2) per pair — the bucket join and bounded prefix are the
    scale levers). Fully oracle-checkable unlike the hash-sketch
    dedup paths."""
    from dislib_spark.text.chunking import fuzzy_pairs

    d = load_table(spark, sf_dir, "documents")
    return fuzzy_pairs(d, prefix_len=80, bucket_tokens=2, max_dist=20).orderBy(
        "a_id", "b_id"
    )


def t27_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index build: doc-sorted posting arrays per term
    (df >= 3 bounds the output; stopword-sized postings are the
    documented 100 TB skew risk). Oracle compares the ARRAYS."""
    from dislib_spark.text.chunking import inverted_index

    d = load_table(spark, sf_dir, "documents")
    out = inverted_index(d, min_df=3)
    # postings serialized to a CSV string: array cells are
    # unhashable/unsortable in pandas-based compare harnesses, and a
    # string carries the same exact content check
    return out.select(
        "term",
        "df",
        F.array_join(F.col("postings"), ",").alias("postings"),
    ).orderBy("term")


def t28_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the fuzzy-dedup graph (lev<=60 edges):
    wedge join + closure join on canonically oriented edges — the
    clique-density signal for boilerplate clusters."""
    from dislib_spark.graph import triangle_count
    from dislib_spark.text.chunking import fuzzy_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = fuzzy_pairs(d, prefix_len=80, bucket_tokens=2, max_dist=60)
    return triangle_count(edges)


def t29_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring spans (suffix-array-style substring
    dedup via k-gram blocking + gaps-and-islands merge): per-doc count
    / total / max of maximal ≥8-token spans shared verbatim with
    another document — the boilerplate-fraction curation signal."""
    from dislib_spark.text.spans import span_stats

    d = load_table(spark, sf_dir, "documents")
    return span_stats(d, k=8).orderBy("doc_id")


def t31_token_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by mutual information with the language label
    (classifier-vocabulary selection). One corpus-sized count; the
    contingency/marginal algebra is vocab-sized. Ordered on the
    ROUNDED score so the top-k set is engine-stable."""
    from dislib_spark.text.features import token_label_mi

    d = load_table(spark, sf_dir, "documents")
    mi = token_label_mi(d, label_col="lang", min_count=5)
    return (
        mi.select("token", "n", F.round("mi", 6).alias("mi"))
        .orderBy(F.desc("mi"), "token")
        .limit(20)
    )


def t30_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY: train 8 BPE merges on the corpus (driver loop
    over the vocab-sized table), then encode every document with an
    Arrow-batched mapInPandas — per-source subtoken compression
    stats. Procedural merge application isn't ANSI-replayable →
    rows-only here; exactness is pytest-gated against a pure-python
    encoder (tests/test_lm_bpe.py)."""
    from dislib_spark.text.lm import bpe_encode, bpe_train

    d = load_table(spark, sf_dir, "documents")
    merges = bpe_train(d, n_merges=8, return_pairs=True)
    enc = bpe_encode(d, merges)
    return (
        d.select("doc_id", "source")
        .join(enc, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_subtokens").alias("subtokens"),
            F.sum("n_words").alias("words"),
            F.round(
                F.sum("n_subtokens") / F.sum("n_words"), 6
            ).alias("subtok_per_word"),
        )
        .orderBy("source")
    )


def t32_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL divergence of each source's
    unigram distribution from the corpus distribution — the
    template-spam / scrape-regression alarm. Rounded to 6dp (the KL
    sum over the vocab is the only cross-engine float-order term)."""
    from dislib_spark.text.features import source_kl_divergence

    d = load_table(spark, sf_dir, "documents")
    out = source_kl_divergence(d)
    return out.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("kl", 6).alias("kl"),
    ).orderBy("source")


def t33_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM doc scoring (Jelinek-Mercer lam=0.7),
    aggregated per source — the context-sensitive quality signal
    unigram t23 can't see (catches scrambled/boilerplate text with
    normal word frequencies)."""
    from dislib_spark.text.lm import lm2_doc_scores

    d = load_table(spark, sf_dir, "documents")
    sc = lm2_doc_scores(d)
    return (
        d.select("doc_id", "source")
        .join(sc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("lm2_score"), 6).alias("avg_lm2"),
            F.round(F.min("lm2_score"), 6).alias("min_lm2"),
        )
        .orderBy("source")
    )


def t34_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance-weighted selection (Xie et al., NeurIPS
    2023): score every document by how much more likely its tokens
    are under the target distribution (English docs) than the raw
    corpus, then report per-source selection rates — the
    distribution-matching data-selection step of a pretraining
    pipeline. Selection flag compares the SAME rounded value both
    engines sort/aggregate on."""
    from dislib_spark.text.features import dsir_importance

    d = load_table(spark, sf_dir, "documents")
    w = dsir_importance(d, F.col("lang") == "en")
    return (
        d.select("doc_id", "source")
        .join(w, "doc_id")
        .select(
            "source",
            F.round("weight", 6).alias("rw"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("rw") > 0).cast("long")).alias("n_selected"),
            # + 0.0 canonicalizes IEEE negative zero (a source whose
            # mean rounds to -0.0 must hash like 0.0 on both engines)
            (F.round(F.avg("rw"), 6) + F.lit(0.0)).alias("avg_weight"),
        )
        .orderBy("source")
    )


def t35_snm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup: prefix-key sort + 5-row sliding
    window + exact Jaccard verification — the skew-immune blocking
    family (every row pairs with ≤ 8 neighbors, no hot buckets).
    Fully oracle-replayable: sort key, ranks, and the integer-ratio
    Jaccard are all deterministic."""
    from dislib_spark.text.dedup import snm_pairs

    d = load_table(spark, sf_dir, "documents")
    return snm_pairs(d, window=5, threshold=0.3, n=3).orderBy(
        "a_id", "b_id"
    )


def t36_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-entropy profile (Shannon entropy of each
    doc's own unigram distribution, nats): the scalar
    diversity/boilerplate signal next to the Gopher repetition
    ratios. Fully oracle-replayed."""
    from dislib_spark.text.features import token_entropy

    d = load_table(spark, sf_dir, "documents")
    ent = token_entropy(d)
    return (
        d.select("doc_id", "source")
        .join(ent, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
            F.round(F.min("entropy"), 6).alias("min_entropy"),
        )
        .orderBy("source")
    )


def t37_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup-against-index: the daily-crawl-vs-archive
    shape — band the odd-id batch against the even-id corpus' stored
    LSH index; candidates are batch-sized, the archive is touched
    only through the band-hash join. Rows-only in the driver
    (xxhash64 banding isn't ANSI-replayable); exact-equality-vs-
    one-shot-batch-dedup is pytest-gated
    (tests/test_incremental_dedup.py)."""
    from dislib_spark.text.dedup import dedup_against_index, minhash_index

    d = load_table(spark, sf_dir, "documents")
    ix = minhash_index(d.where(F.col("doc_id") % 2 == 0))
    batch = d.where(F.col("doc_id") % 2 == 1)
    return dedup_against_index(batch, ix, threshold=0.3).orderBy(
        "new_id", "index_id"
    )


def t38_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram collocation mining by pointwise mutual
    information (word2vec-phrases step, Mikolov et al. 2013) through
    ``text.features.pmi_collocations`` — one corpus-sized bigram
    count, vocab-sized marginal joins, 1-row total broadcast."""
    from dislib_spark.text.features import pmi_collocations

    d = load_table(spark, sf_dir, "documents")
    return pmi_collocations(d, min_count=5).orderBy("w1", "w2")


def t39_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocab-coverage check: OOV rate per source for the
    top-10 corpus vocabulary (``text.features.vocab_coverage``) —
    which sources fragment into unknowns under a candidate vocab."""
    from dislib_spark.text.features import vocab_coverage

    d = load_table(spark, sf_dir, "documents")
    return vocab_coverage(d, vocab_size=10).orderBy("source")


def t40_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-QA confusion: declared ``lang`` column vs the
    engine's marker-count language prediction (t02's classifier) —
    the check that catches mislabeled scrape metadata before it
    poisons per-language sampling weights. One narrow map + one
    grouped count."""
    d = with_text_features(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "is_match", (F.col("lang") == F.col("pred_lang")).cast("int")
        )
        .orderBy("lang", "pred_lang")
    )


def t41_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation gate with per-rule reject accounting: every
    document is evaluated against the three filter families in ONE
    pass (length, composite quality score, Gopher dup-3-gram
    repetition) and each source reports how many docs each rule would
    reject plus the all-rules pass count — the "why was my data
    dropped" report every pipeline needs before committing a filter
    config. Signals come from the engine's real feature columns
    (with_text_features + with_repetition_features)."""
    from dislib_spark.text.repetition import with_repetition_features

    d = with_repetition_features(
        with_text_features(load_table(spark, sf_dir, "documents"))
    )
    r_short = F.col("n_tokens") < 25
    r_quality = F.col("quality") < 0.6
    r_rep = F.col("dup3_frac") > 0.02
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(r_short.cast("long")).alias("n_reject_short"),
            F.sum(r_quality.cast("long")).alias("n_reject_quality"),
            F.sum(r_rep.cast("long")).alias("n_reject_rep"),
            F.sum(
                (~(r_short | r_quality | r_rep)).cast("long")
            ).alias("n_pass"),
        )
        .orderBy("source")
    )


def t42_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (α=0.5) language re-balancing, the mC4/XLM-R rule:
    per-language keep-rates derived from ONE corpus count
    (``sampling.temperature_rates`` — p_s ∝ √n_s, rare languages
    boosted), then the deterministic md5-hash keep decision applied
    through the broadcast-JOIN form (``sampling.sample_by_rates`` —
    no CASE-chain ceiling, any strata cardinality). α=0.5 on purpose:
    SQRT is IEEE-correctly-rounded on both engines, so the whole rate
    derivation is value-replayable. Reports per-language original vs
    kept counts and the effective threshold."""
    from dislib_spark.sampling import sample_by_rates, temperature_rates

    d = load_table(spark, sf_dir, "documents")
    rates = temperature_rates(d, "lang", alpha=0.5)
    kept = (
        sample_by_rates(d, rates, "lang", "doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.select(
            F.col("stratum").alias("lang"),
            F.col("n").alias("n_orig"),
            F.round(F.col("rate") * 100).cast("int").alias("rate_pct"),
        )
        .join(kept, "lang", "left")
        .select(
            "lang",
            "n_orig",
            "rate_pct",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("lang")
    )


def t43_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the token frequency distribution: OLS slope
    of log(freq) on log(rank) over the vocabulary (a healthy natural
    corpus slopes ≈ −1; template spam / synthetic junk bends it) —
    ONE corpus-sized word count, then ranking + regression algebra on
    the vocab-sized table. The distribution-shape QA scalar next to
    t36's per-doc entropy.

    The vocab rank uses ``utils.base.with_global_index`` (range
    partition + per-partition offsets, same as x19/x48/v09) — vocab
    is sublinear in corpus size but unbounded (web junk tokens), so a
    global ``row_number`` Window (one-partition sort of the whole
    vocabulary) is exactly the plan that dies at 100×; the
    distributed rank is plan-pinned in tests/test_plans.py."""
    from dislib_spark.utils.base import with_global_index

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = with_global_index(
        vocab, order_by=[F.desc("freq"), "w"], idx_col="_r"
    ).select(
        F.log((F.col("_r") + 1).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return s.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )



# --- t44: deterministic weighted sampling (Efraimidis-Spirakis) ------
def t44_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sample without replacement: top-5 docs per
    source by the A-ES key ln(u)/w (u = stable md5 uniform of doc_id,
    w = n_chars) — ``sampling.weighted_sample_topk``. The curation
    step "keep the k best docs per source, weighted by score" with
    rerun/engine/partitioning-stable output; the md5-uniform + 12-dp
    key rounding make the oracle replay exact."""
    from dislib_spark.sampling import weighted_sample_topk

    d = load_table(spark, sf_dir, "documents")
    out = weighted_sample_topk(
        d, weight_col="n_chars", key_col="doc_id", k=5, by="source"
    )
    return out.select(
        "source",
        "doc_id",
        F.round("es_key", 6).alias("es_key"),
        "rank",
    ).orderBy("source", "rank")


def t45_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty report from ``text.features.ngram_novelty``
    (word-trigram first-seen share, min-doc_id ownership): the
    dedup-aware contribution score that orders crawl batches —
    boilerplate scores ~0, new text ~1. Corpus work is one exploded
    distinct (doc, trigram) table + one co-shuffled equi-join back on
    the trigram key; per-doc ratios are exact integer divisions, the
    per-source mean is rounded 6 dp."""
    from dislib_spark.text.features import ngram_novelty

    d = load_table(spark, sf_dir, "documents")
    nov = ngram_novelty(d, n=3)
    return (
        d.select("doc_id", "source")
        .join(nov, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
            F.sum(
                (F.col("novelty") < 0.5).cast("long")
            ).alias("n_stale"),
        )
        .orderBy("source")
    )


def t46_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-&-Gale term burstiness (``text.features
    .term_burstiness``): variance-to-mean ratio of per-doc counts —
    zeros included via the sufficient-statistics identity, never
    materialized — for the 20 highest-frequency terms. VMR≈1 =
    Poisson function words, VMR≫1 = clumping template/topic terms;
    the evidence behind stopword and boilerplate lists."""
    from dislib_spark.text.features import term_burstiness

    d = load_table(spark, sf_dir, "documents")
    return term_burstiness(d, top_k=20)


def t47_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc type-token ratio + hapax share
    (``text.features.lexical_diversity``): the vocabulary-richness
    quality signals — low TTR flags template/boilerplate pages,
    hapax-heavy docs flag keyword stuffing. One doc_id-co-shuffled
    explode→count→aggregate chain; 20 least-diverse docs (the
    dedup/filter candidates) with a full deterministic ordering."""
    from dislib_spark.text.features import lexical_diversity

    d = load_table(spark, sf_dir, "documents")
    return (
        lexical_diversity(d, min_tokens=10)
        .orderBy("ttr", "doc_id")
        .limit(20)
    )


def t48_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character entropy on the 512-char prefix
    (``text.features.char_entropy``) — the tokenizer-free
    gibberish/template screen. Prefix cap bounds the explode per doc;
    report the 20 LOWEST-entropy docs (repeated-char / template junk
    floats to the top of a cleanup queue), fully ordered."""
    from dislib_spark.text.features import char_entropy

    d = load_table(spark, sf_dir, "documents")
    return (
        char_entropy(d, prefix_len=512)
        .orderBy("entropy", "doc_id")
        .limit(20)
    )


def t49_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host dedup keys (``text.urls``): the
    crawl-curation staple — the same page arrives under scheme-case /
    ``www.`` / default-port / param-order / tracking-param / trailing-
    slash variants, and the dedup key is the CANONICAL form. URLs are
    built deterministically from real table columns so every
    normalization branch is exercised (mixed-case scheme+host, ``www.``
    prefix, default :443 vs explicit :8080 port, ``//`` path runs,
    trailing slash, utm/ref tracking params, unsorted params, fragment).
    Per host: fetch count, distinct canonical pages, and an md5-prefix
    sum over the canonical strings — a byte-exact witness of the whole
    string pipeline. Pure JVM projection + one grouped aggregate."""
    from dislib_spark.text.urls import canonicalize_url, url_host

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 3 == 0, F.lit("HTTPS://WWW."))
        .when(did % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("HTTP://")),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(did % 4 == 0, F.lit(":443"))
        .when(did % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Docs//"),
        (did % 97).cast("string"),
        F.when(did % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&ref=rss&b="),
        (did % 5).cast("string"),
        F.lit("&a="),
        (did % 7).cast("string"),
        F.when(did % 6 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    c = d.select(
        url_host(url).alias("host"),
        canonicalize_url(url).alias("canon"),
    )
    sig = F.conv(F.substring(F.md5(F.col("canon")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        c.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("canon").alias("n_canon"),
            F.sum(sig).alias("canon_sig"),
        )
        .orderBy("host")
    )


def t50_jaro_winkler_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler similarity join (``text.similarity``):
    fuzzy prefix matching for near-identical document heads — the
    transposition-tolerant cousin of t26's edit-distance dedup.
    Candidates come from (lang, source) blocking with the
    deterministic ``max_block=40`` whale cap (pair count bounded at
    any corpus size); the JW score is a vectorized Arrow UDF applied
    ONLY to blocked candidates. Keys are ASCII-stripped 32-char
    prefixes (DuckDB's jaro_winkler walks bytes, ours walks
    codepoints — identical on ASCII, pinned in tests). Top-100 pairs
    at 6-dp-rounded sim ≥ 0.78 (no fixture pair sits within 2e-3 of
    the threshold), fully ordered."""
    from dislib_spark.text.similarity import jaro_winkler_pairs

    d = load_table(spark, sf_dir, "documents")
    key = F.regexp_replace(
        F.substring(F.col("text"), 1, 32), r"[^\x20-\x7E]", ""
    )
    pairs = jaro_winkler_pairs(
        d.select("doc_id", "lang", "source", key.alias("k")),
        "k",
        "doc_id",
        ["lang", "source"],
        threshold=0.78,
        max_block=40,
    )
    return pairs.orderBy(F.desc("sim"), "a_id", "b_id").limit(100)


def t51_idf_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted SimHash near-dup pairs
    (``text.dedup.idf_simhash_signatures`` +
    ``simhash_pairs_from_sigs``): rare content terms dominate the
    signature, so boilerplate/stopword churn stops flipping bits —
    the production refinement of t06's uniform-vote SimHash. Vote
    sums are integer (order-exact, round(idf·1e9) quantized), so
    signatures — and therefore every candidate key and Hamming
    distance — are value-replayed in DuckDB. Same Manku 2-of-10
    pigeonhole blocking as t06 (completeness for hamming ≤ 8)."""
    from dislib_spark.text.dedup import (
        idf_simhash_signatures,
        simhash_pairs_from_sigs,
    )

    d = load_table(spark, sf_dir, "documents")
    sigs = idf_simhash_signatures(d, "text", "doc_id", bits=60)
    return simhash_pairs_from_sigs(
        sigs, max_hamming=8, bits=60
    ).orderBy("a_id", "b_id")


def t52_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END dedup pipeline as ONE declared query: MinHash+
    LSH candidate pairs (t05's md5-replayable kernel) → connected
    components (min-label propagation) → canonical keep (smallest id
    per cluster survives) → per-source keep/drop report. This is the
    exact chain a production crawl-dedup job runs; t05/t14/t15 test
    the stages, this query pins their COMPOSITION under one oracle.
    Scale: pair volume is LSH-bucket-bounded, CC iterates over the
    duplicate-proportional edge set only, the drop set anti-joins
    back (duplicate-proportional, never corpus-sized)."""
    from dislib_spark.graph import dedup_canonical
    from dislib_spark.text.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5")
    kept = dedup_canonical(d, pairs)
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    k = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        tot.join(k, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_docs") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
        )
        .orderBy("source")
    )


def t53_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage (boilerplate) detection: split
    every doc into non-overlapping 20-token chunks
    (``text.chunking.chunk_documents``), fingerprint each chunk
    (md5), and rank fingerprints by how many DISTINCT docs repeat
    them — headers/footers/templates float to the top; the intra-
    corpus passage-level companion of t09's cross-corpus
    contamination check (public crawl-curation practice: C4/Gopher
    strip repeated boilerplate passages before training). One explode
    + one map-side-combined (fp) aggregate — reduce state is
    |distinct chunks|, never pairs. Top-20, fully ordered."""
    from dislib_spark.text.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(d, chunk_tokens=20, overlap=0)
    return (
        ch.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), "fp")
        .limit(20)
    )


def t54_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language duplicate contamination: documents sharing the
    same 10-token-prefix fingerprint but carrying DIFFERENT ``lang``
    metadata — the mislabeled-scrape audit (same content crawled
    twice, tagged twice; per-language quotas and lang-ID training
    both silently skew if these survive). Fingerprint equi-join with
    a whale-prefix guard: fingerprints shared by > 64 docs are
    template prefixes, not contamination, and are dropped BEFORE the
    pair join so pair volume is bounded at 64²·|fps| regardless of
    corpus size. Counts are exact; md5 keys byte-replayable."""
    d = load_table(spark, sf_dir, "documents")
    f = d.select(
        "doc_id",
        "lang",
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " "), 1, 10)
            )
        ).alias("fp"),
    )
    # groupBy+join, NOT a per-fp window: a windowed count would
    # buffer a whale prefix's whole group in one task; the aggregate
    # streams and the join back is a plain shuffle equi-join.
    small = (
        f.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= 64)
        .select("fp")
    )
    ok = f.join(small, "fp")
    a = ok.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("lang_a"),
        "fp",
    )
    b = ok.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("lang_b"),
        "fp",
    )
    return (
        a.join(b, "fp")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("lang_a") != F.col("lang_b"))
        )
        .select(
            F.least("lang_a", "lang_b").alias("lang_lo"),
            F.greatest("lang_a", "lang_b").alias("lang_hi"),
        )
        .groupBy("lang_lo", "lang_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("lang_lo", "lang_hi")
    )


def t55_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth per source: V = K·N^β fitted as
    β = ln V / ln N from the exact token and distinct-term totals —
    the corpus-planning number (how fast does the vocab grow as a
    source scales?) complementing t43's Zipf rank-frequency fit. One
    explode → two grouped counts per source; β is one IEEE division
    of two LNs on exact integers."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    g = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("w").alias("n_vocab"),
    )
    return g.select(
        "source",
        "n_tokens",
        "n_vocab",
        F.round(
            F.log(F.col("n_vocab").cast("double"))
            / F.log(F.col("n_tokens").cast("double")),
            6,
        ).alias("heaps_beta"),
    ).orderBy("source")


def t57_dup_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTER-SIZE profile: t05's MinHash+LSH pairs →
    connected components → histogram of component sizes — the dedup
    yield report (how many pairs vs whale clusters; ``n_duplicates``
    = docs a canonical-keep pass would drop per size class). A big
    mass in large clusters means template spam; mass at size 2 means
    organic near-dups — the number that decides the dedup rollout.
    Scale: CC iterates over the duplicate-proportional edge set only
    (never the corpus); the histogram is |distinct sizes| rows."""
    from dislib_spark.graph import connected_components
    from dislib_spark.text.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5")
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_duplicates"),
        )
        .orderBy("cluster_size")
    )


def t59_minhash_estimator_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash estimator-quality audit: on every LSH candidate pair,
    compare the classical signature estimator (matching minima / 32 —
    an exact multiple of 1/32) against the exact shingle Jaccard, and
    histogram the signed error in 0.01 bins — the v18-style quality
    gate for the DEDUP index (is 32 hashes enough? is the estimator
    biased near the 0.3 threshold?). Zero extra passes: the
    signatures ride the candidate re-check join t05 already does.
    Binned error is deterministic (exact-dyadic estimator minus a
    6-dp-rounded ratio of exact integers; -0.0 normalized)."""
    from dislib_spark.text.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d, threshold=0.0, hash_fn="md5", with_estimate=True
    )
    r = F.round(F.col("minhash_est") - F.col("jaccard"), 2)
    err = F.when(r == 0, F.lit(0.0)).otherwise(r)
    return (
        pairs.groupBy(err.alias("err_bin"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("err_bin")
    )


def t60_source_length_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source document-length P50/P90/P99 via the GROUPED
    deterministic rank sketch (``sketches.grouped_stride_quantiles``)
    — the length-profile report a data-mix design reads per source,
    carrying each group's worst-case rank-error bound alongside the
    estimates (x82's contract, per group). Every window is (source,
    shard)- or source-grained — the shape that holds when one source
    is 100 TB."""
    from dislib_spark.sketches import grouped_stride_quantiles
    from dislib_spark.text.analysis import token_count

    d = load_table(spark, sf_dir, "documents").withColumn(
        "toklen", token_count(F.col("text")).cast("double")
    )
    return grouped_stride_quantiles(
        d, "toklen", F.col("doc_id"), "source",
        qs=(0.5, 0.9, 0.99), k=64, shards=8,
    )


def t61_source_vocab_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source vocabulary overlap: Jaccard of the distinct-token
    vocabularies for every source pair — the corpus-mix design signal
    (two sources with near-identical vocabularies add redundancy, not
    coverage; near-zero overlap flags a domain outlier). One (source,
    token) distinct collapse (vocab-sized, sublinear in the corpus),
    one token-keyed self-join for the intersection counts, exact
    integer set algebra — never a doc-level pair join."""
    d = load_table(spark, sf_dir, "documents")
    st = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = st.select(F.col("source").alias("src_a"), "w")
    b = st.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("src_a"), F.col("nv").alias("nv_a")
    )
    sb = sizes.select(
        F.col("source").alias("src_b"), F.col("nv").alias("nv_b")
    )
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "nv_a",
            "nv_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (
                    F.col("nv_a") + F.col("nv_b") - F.col("n_common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def t62_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer FERTILITY per (lang, source): subwords-per-word,
    bytes-per-subword and chars-per-subword under the BPE-ish regex
    pre-tokenizer (``text.analysis.SUBWORD_RE`` — greedy ≤4-letter /
    ≤3-digit chunks) — the per-slice cost model a training pipeline
    reads before fixing a tokenizer budget (high fertility on a slice
    means more sequence positions per word there; t30's trained-BPE
    apply is the procedural sibling, this is its full-oracle face).

    Scale shape: four pure-JVM expressions per row (regexp_count,
    octet_length, length, split-size) folded in ONE map-side-combined
    aggregate — no explode, no UDF; group cardinality is
    |langs|×|sources|. Counts are exact longs; the ratios are
    long/long IEEE divisions both engines."""
    from dislib_spark.text.analysis import SUBWORD_RE

    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(t)).alias("chars"),
        F.sum(F.octet_length(t)).alias("bytes"),
        F.sum(F.size(F.split(t, " ", -1))).alias("words"),
        F.sum(F.regexp_count(t, F.lit(SUBWORD_RE))).alias("subwords"),
    )
    return per.select(
        "lang",
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("words").cast("bigint").alias("words"),
        F.col("subwords").cast("bigint").alias("subwords"),
        F.round(F.col("subwords") / F.col("words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("bytes") / F.col("subwords"), 6).alias(
            "bytes_per_subword"
        ),
        F.round(F.col("chars") / F.col("subwords"), 6).alias(
            "chars_per_subword"
        ),
    ).orderBy("lang", "source")


def t63_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 8-gram NOVELTY rate: the fraction of a source's
    distinct 8-gram occurrences that are FIRST-SEEN there (the gram's
    minimum doc_id across the corpus is the doc's own). The long-span
    occurrence-pooled sibling of t45 (which means per-DOC trigram
    ratios): 8-grams catch verbatim boilerplate reuse (t29's grain)
    rather than phrase reuse, and pooling by occurrence weights big
    documents by their actual contribution — the two rates diverge
    exactly on sources mixing short fresh docs with long mirrored
    ones, which is the case a crawl-scheduling decision cares about.

    Scale shape: ONE explode to (doc, distinct-gram-md5) rows feeds a
    single map-side-combined (gram, source) aggregate, eagerly
    checkpointed so the corpus explode never reruns (the multi-
    consumer-lineage rule); a gram's novel source is the source of
    its minimum doc_id (doc ids are unique, so min(struct(min_doc,
    source)) is exact), and both per-source rollups run over the
    gram×source frame — gram-cardinality everywhere, no pair joins,
    no corpus re-scan. Counts are exact longs; the rate is a
    long/long IEEE division."""
    from dislib_spark.text.analysis import tokens
    from dislib_spark.text.dedup import shingles_from_tokens

    d = load_table(spark, sf_dir, "documents")
    g = d.select(
        "doc_id", "source", tokens(F.col("text")).alias("_toks")
    ).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                shingles_from_tokens(F.col("_toks"), 8),
                lambda s: F.md5(s),
            )
        ).alias("gram"),
    )
    gs = (
        g.groupBy("gram", "source")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("doc_id").alias("md"),
        )
        .localCheckpoint(eager=False)
    )
    totals = gs.groupBy("source").agg(F.sum("c").alias("n_grams"))
    novel = (
        gs.groupBy("gram")
        .agg(F.min(F.struct("md", "source")).alias("f"))
        .groupBy(F.col("f.source").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        totals.join(novel, "source", "left")
        .select(
            "source",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) / F.col("n_grams"), 6
            ).alias("novelty"),
        )
        .orderBy("source")
    )


def t64_split_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-split DECONTAMINATION audit: after the standard
    deterministic 90/10 hash split (t10's md5 bucket on doc_id), how
    many TRAIN documents share a verbatim 8-gram with any TEST
    document — the train→test leakage every eval pipeline must scrub
    before trusting its held-out numbers (t09 checks leakage against
    an EXTERNAL benchmark; this is the internal-split counterpart).

    Scale shape: one explode to (doc, distinct-gram-md5, is_test)
    rows; the test side collapses to its distinct gram set
    (test-sized, sublinear) and the train side probes it with ONE
    gram-keyed semi-join — never a doc×doc comparison. Per-source
    counts are exact longs; leak_rate is a long/long division."""
    from dislib_spark.sampling import hash_bucket
    from dislib_spark.text.analysis import tokens
    from dislib_spark.text.dedup import shingles_from_tokens

    d = load_table(spark, sf_dir, "documents").withColumn(
        "is_test", hash_bucket(F.col("doc_id"), 100) < 10
    )
    g = d.select(
        "doc_id",
        "is_test",
        F.explode(
            F.transform(
                shingles_from_tokens(
                    tokens(F.col("text")), 8
                ),
                lambda s: F.md5(s),
            )
        ).alias("gram"),
    ).localCheckpoint(eager=False)
    test_grams = (
        g.where(F.col("is_test")).select("gram").distinct()
    )
    leaky = (
        g.where(~F.col("is_test"))
        .join(test_grams, "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    base = d.groupBy("source").agg(
        F.sum((~F.col("is_test")).cast("long")).alias("n_train"),
        F.sum(F.col("is_test").cast("long")).alias("n_test"),
    )
    lk = (
        d.join(leaky, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_leaky"))
    )
    return (
        base.join(lk, "source", "left")
        .select(
            "source",
            "n_train",
            "n_test",
            F.coalesce("n_leaky", F.lit(0))
            .cast("bigint")
            .alias("n_leaky"),
            F.round(
                F.coalesce("n_leaky", F.lit(0)) / F.col("n_train"), 6
            ).alias("leak_rate"),
        )
        .orderBy("source")
    )


def t58_dedup_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup SURVIVORSHIP-BIAS audit: does canonical-keep dedup (the
    t52 pipeline) skew the per-source length profile? Compares doc
    count and mean token length before vs after the keep pass — the
    check a curation team signs before shipping a dedup config
    (templates are short: stripping them silently lengthens a source;
    mirrored crawls are long: the opposite). Mean token counts are
    exact integer-sum ratios, so both engines divide identical
    integers; the drop set stays duplicate-proportional."""
    from dislib_spark.graph import dedup_canonical
    from dislib_spark.text.analysis import token_count
    from dislib_spark.text.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5")
    kept = dedup_canonical(d, pairs)
    tok = token_count(F.col("text"))
    before = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.round(F.avg(tok), 6).alias("avg_tok_before"),
    )
    after = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.round(F.avg(tok), 6).alias("avg_tok_after"),
    )
    return (
        before.join(after, "source")
        .select(
            "source",
            "n_before",
            "avg_tok_before",
            "n_after",
            "avg_tok_after",
        )
        .orderBy("source")
    )


def t56_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4/Gopher boilerplate-STRIP step as one remove-and-keep
    pipeline query (t53 DETECTS repeated passages; this applies the
    removal and accounts for what survives): chunk every doc into
    non-overlapping 20-token passages, mark every chunk whose md5
    fingerprint appears in ≥2 distinct docs, and report per source
    how much text the strip removes vs keeps — the curation ledger a
    training-data pipeline signs off on before tokenization.

    Scale shape: one chunk explode → one (fp, distinct-doc) count →
    one fp equi-join back (no broadcast of the SF-growing dup-fp set,
    no pairs anywhere) → doc-level then source-level aggregates.
    Counts are exact integers; the removed fraction is one IEEE
    division, 6-dp rounded."""
    from dislib_spark.text.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    # the chunk explode feeds TWO consumers (the dup-fp count and the
    # mark join) — pin it once so the tokenize+md5 pass runs one scan
    # (the t51 rule); only the three needed columns are checkpointed
    ch = chunk_documents(d, chunk_tokens=20, overlap=0).select(
        "doc_id", "n_tokens", "fp"
    ).localCheckpoint(eager=False)
    bad = (
        ch.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("fp")
    )
    marked = ch.join(bad.withColumn("rm", F.lit(1)), "fp", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("rm", F.lit(0)).alias("rm"),
    )
    doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("rm").alias("n_rem"),
        F.sum(
            F.when(F.col("rm") == 0, F.col("n_tokens")).otherwise(0)
        ).alias("kept_toks"),
    )
    return (
        doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
            F.sum("n_rem").cast("bigint").alias("n_removed"),
            F.round(
                F.sum("n_rem") / F.sum("n_chunks").cast("double"), 6
            ).alias("removed_frac"),
            F.sum("kept_toks").cast("bigint").alias("kept_tokens"),
        )
        .orderBy("source")
    )



def t65_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-priority exact dedup ledger (``text.dedup
    .priority_dedup``): identical documents collapse to the copy from
    the most-curated source (rank = the numeric source suffix, lower
    = better; ties to lowest doc id), and each source reports what it
    kept, dropped, and ceded to a better source plus the characters
    saved — the cross-dump curation rule applied when the same page
    arrives from several crawls. Winner selection is one md5-keyed
    struct-min aggregate (no corpus window), replayed in the oracle
    as the equivalent per-group ROW_NUMBER pick."""
    from dislib_spark.text.dedup import priority_dedup

    d = load_table(spark, sf_dir, "documents")
    prio = F.substring(F.col("source"), 4, 10).cast("int")
    return priority_dedup(d, prio)



def t66_crossmodal_dedup_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal dedup agreement audit: do the TEXT near-dup
    candidates (t05's md5-mode MinHash+LSH pairs) look like
    duplicates in EMBEDDING space too? Every candidate pair joins its
    two vectors and scores exact cosine; pairs bucket by Jaccard
    decile with the mean cosine and the fraction above 0.9 — the
    estimator-disagreement surface that tells a pipeline owner when
    lexical and semantic dedup diverge (paraphrases: high cosine, low
    Jaccard; boilerplate: the reverse). Work is candidate-bounded:
    the LSH bucket join emits the pairs, and only those pairs touch
    the embedding table (broadcast of the small pair set against the
    id-keyed scan)."""
    from dislib_spark.text.dedup import minhash_lsh_pairs
    from dislib_spark.vector.search import cosine_similarity

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    pairs = minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5")
    j = (
        pairs.join(
            e.select(
                F.col("vec_id").alias("a_id"), F.col("v").alias("va")
            ),
            "a_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("b_id"), F.col("v").alias("vb")
            ),
            "b_id",
        )
        .select(
            "jaccard",
            F.round(
                cosine_similarity(F.col("va"), F.col("vb")), 6
            ).alias("cos"),
        )
    )
    dec = F.least(
        F.floor(F.col("jaccard") * 10).cast("int"), F.lit(9)
    )
    return (
        j.groupBy(dec.alias("jacc_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos"), 6).alias("avg_cosine"),
            F.round(
                F.avg(
                    F.when(F.col("cos") >= 0.9, 1.0).otherwise(0.0)
                ),
                6,
            ).alias("frac_cos_high"),
        )
        .orderBy("jacc_decile")
    )



def t67_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding tuning curve (``text.dedup.lsh_band_sweep``): one
    MinHash signature pass re-banded as 4×8 / 8×4 / 16×2 and each
    configuration scored on its own candidates — candidate volume,
    confirmed-pair count at the 0.3 Jaccard bar, precision, and the
    mean candidate Jaccard. The counterpart of v23's probe-recall
    curve for the TEXT index: it prices recall (more bands catch
    lower-similarity pairs) in candidate volume, which IS the cost
    that explodes at 100 TB. Signature build is shared; the sweep
    adds only band-key bucket passes."""
    from dislib_spark.text.dedup import lsh_band_sweep

    d = load_table(spark, sf_dir, "documents")
    p = lsh_band_sweep(d)
    return (
        p.groupBy("bands")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                F.when(F.col("jaccard") >= 0.3, 1).otherwise(0)
            ).alias("n_confirmed"),
            F.round(
                F.sum(
                    F.when(F.col("jaccard") >= 0.3, 1.0).otherwise(
                        0.0
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("precision"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("bands")
    )



def t68_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate contamination matrix: t05's
    MinHash+LSH pairs grouped by the (unordered) source pair of
    their endpoints — which dumps are copying which, the diagnostic
    that decides whether a source is additive or a re-crawl of one
    you already have (same-source pairs are internal dup rate;
    cross-source mass is redundancy you pay twice for). Candidate-
    bounded: the source lookup joins ONLY the LSH pair set back to
    the id→source projection."""
    from dislib_spark.text.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, threshold=0.3, hash_fn="md5")
    src = d.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("a_id"),
                F.col("source").alias("src_a"),
            ),
            "a_id",
        )
        .join(
            src.select(
                F.col("doc_id").alias("b_id"),
                F.col("source").alias("src_b"),
            ),
            "b_id",
        )
        .select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
            "jaccard",
        )
    )
    return (
        j.groupBy("source_lo", "source_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
            F.round(F.max("jaccard"), 6).alias("max_jaccard"),
        )
        .orderBy("source_lo", "source_hi")
    )



def t69_quality_lm_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Do the cheap heuristic quality gate (t07's length+diversity
    rule at 0.7) and the LM-based gate (t23's unigram cross-entropy
    at a fixed −3.402 nats) keep the same documents? The 2×2
    agreement table with Cohen's κ — the filter-triage audit run
    before replacing an expensive signal with a cheap one (κ ≈ 0
    means the heuristic is NOT a substitute for perplexity
    filtering, whatever the raw agreement rate says). Per-doc scores
    are 6-dp rounded BEFORE thresholding so the gate decisions are
    engine-stable; one corpus scan per signal, one broadcast-joined
    2×2 fold."""
    from dislib_spark.text.analysis import quality_score
    from dislib_spark.text.lm import lm_doc_scores

    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        (quality_score(F.col("text")) >= 0.7).cast("int").alias("h"),
    )
    s = lm_doc_scores(d).select(
        "doc_id",
        (F.round(F.col("lm_score"), 6) >= -3.402)
        .cast("int")
        .alias("l"),
    )
    j = q.join(s, "doc_id")
    w = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("h") == 1) & (F.col("l") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("h") == 1) & (F.col("l") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("h") == 0) & (F.col("l") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("h") == 0) & (F.col("l") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("a") + F.col("d")).cast("double") / nd
    pe = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        + (F.col("c") + F.col("d")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    ) / (nd * nd)
    return w.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("a").cast("bigint").alias("n_both"),
        F.col("b").cast("bigint").alias("n_heur_only"),
        F.col("c").cast("bigint").alias("n_lm_only"),
        F.col("d").cast("bigint").alias("n_neither"),
        F.round(po, 6).alias("agreement"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6)).alias(
            "kappa"
        ),
    )


def t70_archive_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Decontamination against a PERSISTED corpus index — the
    operational form of t09: the training corpus's LSH band index is
    built once and stored partitionBy(band_idx) (s13's storage
    shape), and each BENCHMARK suite (src0 here) probes the stored
    index — candidates are benchmark-sized, the corpus is touched
    only through the partition-pruned (band_idx, band_hash)
    equi-join, exact Jaccard re-check on candidates only. Reported
    per corpus source: how many documents must be DROPPED as
    near-dups (jaccard ≥ 0.3) of any benchmark doc — t09 flags
    verbatim 4-gram overlap per document; this catches whole-document
    paraphrase-level leakage and scales to a corpus that is never
    rescanned when a new benchmark arrives."""
    import tempfile

    from dislib_spark.text.dedup import dedup_against_index, minhash_index

    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("source") != "src0")
    bench = d.where(F.col("source") == "src0")
    ix = minhash_index(corpus, hash_fn="md5")
    tmp = tempfile.mkdtemp(prefix="decontam_index_")
    ix.write.partitionBy("band_idx").mode("overwrite").parquet(tmp)
    stored = spark.read.parquet(tmp)
    hits = dedup_against_index(
        bench, stored, threshold=0.3, hash_fn="md5"
    )
    flagged = hits.select(F.col("index_id").alias("doc_id")).distinct()
    base = corpus.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    fl = (
        corpus.join(flagged, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )
    return (
        base.join(fl, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_flagged"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.coalesce(F.col("n_flagged"), F.lit(0)).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


def t71_length_quality_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-vs-quality calibration curve: corpus documents ranked
    into EXACT length deciles (x19's distributed-rank NTILE — global
    rank from ``with_global_index``'s range-sort + per-partition
    offsets, bucket arithmetic from (rank, n); never a global
    Window), each decile reporting its char-length bounds, mean
    heuristic quality (t07's score) and quality-gate pass rate. The
    diagnostic that decides whether a pipeline's length floor and
    quality threshold are REDUNDANT (pass rate saturating with
    length means one of the two filters does nothing) — read before
    tuning either. Gate rate is an exact long/long division; decile
    semantics mirror SQL NTILE row-position exactly."""
    from dislib_spark.text.analysis import quality_score
    from dislib_spark.utils.base import with_global_index

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", quality_score(F.col("text")).alias("q")
    )
    ranked = with_global_index(d, ["n_chars", "doc_id"], "_r")
    tot = F.broadcast(d.agg(F.count(F.lit(1)).alias("_n")))
    decile = F.expr(
        "CAST(CASE WHEN _r < (_n % 10) * (_n DIV 10 + 1) "
        "THEN _r DIV (_n DIV 10 + 1) + 1 "
        "ELSE (_n % 10) + (_r - (_n % 10) * (_n DIV 10 + 1)) "
        "DIV (_n DIV 10) + 1 END AS INT)"
    ).alias("decile")
    return (
        ranked.crossJoin(tot)
        .select(decile, "n_chars", "q")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("len_lo"),
            F.max("n_chars").alias("len_hi"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.round(
                F.sum((F.col("q") >= 0.7).cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("gate_pass_rate"),
        )
        .orderBy("decile")
    )


def t72_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-CONTAINMENT audit (``text.dedup
    .containment_pairs``): every pair where one document's shingle
    set is ≥60% contained in the other's, flagged by whether t04's
    symmetric Jaccard pass at 0.3 would ALSO catch it — a short doc
    embedded in a long one has Jaccard ≈ |short|/|long| but
    containment ≈ 1, the quote-expansion / template-wrapping gap
    every Jaccard- or MinHash-based dedup (t04/t05) structurally
    misses (caught_by_jaccard = 0 rows are that gap, measured). Same
    inverted-index kernel and caps as t04; one extra LEAST() per
    candidate."""
    from dislib_spark.text.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        d, c_threshold=0.6, j_max=0.3
    ).orderBy("a_id", "b_id")


def t73_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIELD-LEVEL survivorship (golden-record construction) per
    near-dup cluster — the MDM step after t14's clustering that t15's
    keep-min-id rule skips: the surviving record's fields come from
    DIFFERENT members (id from the earliest member, text from the
    LONGEST one, language by majority vote, provenance = distinct
    source count), because the earliest copy is rarely the most
    complete one. Per-cluster windows run over member-cardinality
    rows (clusters, not corpus); every rule is deterministic
    (length/count ties break on doc_id / lang order). Returns one
    row per multi-member cluster."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    edges = jaccard_pairs(d, threshold=0.3)
    cc = connected_components(edges)
    m = cc.join(d, cc["node"] == d["doc_id"]).select(
        "component", "doc_id", "lang", "source", "n_chars"
    )
    base = m.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keep_id"),
        F.count_distinct("source").alias("n_sources"),
    )
    wl = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    longest = (
        m.withColumn("_rn", F.row_number().over(wl))
        .where(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("longest_doc_id"),
            F.col("n_chars").alias("longest_chars"),
        )
    )
    lc = m.groupBy("component", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("component").orderBy(
        F.col("c").desc(), F.col("lang")
    )
    majority = (
        lc.withColumn("_rn", F.row_number().over(wv))
        .where(F.col("_rn") == 1)
        .select("component", F.col("lang").alias("majority_lang"))
    )
    return (
        base.join(longest, "component")
        .join(majority, "component")
        .select(
            F.col("component").alias("comp_id"),
            "n_members",
            "keep_id",
            "longest_doc_id",
            "longest_chars",
            "majority_lang",
            F.col("n_sources").cast("bigint").alias("n_sources"),
        )
        .orderBy("comp_id")
    )


def t74_containment_golden_record(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """t73's field-level survivorship run over the UNION of the
    symmetric Jaccard edges (t04/t14) and the asymmetric containment
    edges (t72) — merging the quote-expansion / template-wrap dups
    t73 never merges because Jaccard structurally misses them. Each
    output row also carries ``n_jaccard_subclusters``: how many
    previously-separate Jaccard components (singletons included) the
    containment edges fused into this cluster — >1 rows are exactly
    the merges only the asymmetric pass finds. Same bounded-candidate
    kernels (one inverted-index scan feeds both edge sets) and
    member-cardinality windows as t73."""
    from dislib_spark.text.dedup import containment_pairs

    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    ej = jaccard_pairs(d, threshold=0.3).select("a_id", "b_id")
    ec = containment_pairs(d, c_threshold=0.6, j_max=0.3).select(
        "a_id", "b_id"
    )
    edges = ej.unionByName(ec).distinct()
    cc = connected_components(edges)
    jcc = connected_components(ej).select(
        F.col("node").alias("jnode"), F.col("component").alias("jcomp")
    )
    m = (
        cc.join(d, cc["node"] == d["doc_id"])
        .join(jcc, cc["node"] == F.col("jnode"), "left")
        .select(
            "component",
            "doc_id",
            "lang",
            "source",
            "n_chars",
            # a member with no Jaccard edge is its own subcluster
            F.coalesce("jcomp", "doc_id").alias("jsub"),
        )
    )
    base = m.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("doc_id").alias("keep_id"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("jsub").alias("n_jaccard_subclusters"),
    )
    wl = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    longest = (
        m.withColumn("_rn", F.row_number().over(wl))
        .where(F.col("_rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("longest_doc_id"),
            F.col("n_chars").alias("longest_chars"),
        )
    )
    lc = m.groupBy("component", "lang").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("component").orderBy(
        F.col("c").desc(), F.col("lang")
    )
    majority = (
        lc.withColumn("_rn", F.row_number().over(wv))
        .where(F.col("_rn") == 1)
        .select("component", F.col("lang").alias("majority_lang"))
    )
    return (
        base.join(longest, "component")
        .join(majority, "component")
        .select(
            F.col("component").alias("comp_id"),
            "n_members",
            "keep_id",
            "longest_doc_id",
            "longest_chars",
            "majority_lang",
            F.col("n_sources").cast("bigint").alias("n_sources"),
            F.col("n_jaccard_subclusters")
            .cast("bigint")
            .alias("n_jaccard_subclusters"),
        )
        .orderBy("comp_id")
    )


def t75_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall GRADE for the MinHash+LSH banding (the quality metric
    t67 sweeps parameters for but never scores): t04's exact
    inverted-index Jaccard pairs at ≥0.3 are the ground truth, and
    TWO banding configurations of the same 32-hash signature are
    graded per true-Jaccard decile — the production 8 bands × 4 rows
    (P(candidate) ≈ 1−(1−s⁴)⁸, near-1 on real dups) and the cheaper
    4 bands × 8 rows (≈ 1−(1−s⁸)⁴ ≈ 0.9 at s=0.9 — measurably lossy
    on this corpus), so the empirical S-curve tradeoff t67 sweeps is
    value-graded, not just parameterized. Pair volume is
    candidate-bounded on both sides; the grade joins are
    truth-set-sized."""
    from dislib_spark.text.dedup import minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    truth = jaccard_pairs(d, threshold=0.3)
    # ONE signature build shared by both banding configs (the two
    # configs re-band the same 32-hash signature; per-call rebuild
    # was the dominant cost of the second grade)
    sig = minhash_signatures(d, hash_fn="md5")

    def caught(bands, name):
        return (
            minhash_lsh_pairs(
                d, threshold=0.3, bands=bands, hash_fn="md5", sig=sig
            )
            .select("a_id", "b_id")
            .withColumn(name, F.lit(1))
        )

    j = truth.join(caught(8, "hit8"), ["a_id", "b_id"], "left").join(
        caught(4, "hit4"), ["a_id", "b_id"], "left"
    )
    return (
        j.groupBy(
            F.floor(F.col("jaccard") * 10)
            .cast("int")
            .alias("jacc_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.coalesce(F.sum("hit8"), F.lit(0))
            .cast("bigint")
            .alias("n_caught_8x4"),
            F.coalesce(F.sum("hit4"), F.lit(0))
            .cast("bigint")
            .alias("n_caught_4x8"),
        )
        .select(
            "jacc_decile",
            "n_true_pairs",
            "n_caught_8x4",
            F.round(
                F.col("n_caught_8x4") / F.col("n_true_pairs"), 6
            ).alias("recall_8x4"),
            "n_caught_4x8",
            F.round(
                F.col("n_caught_4x8") / F.col("n_true_pairs"), 6
            ).alias("recall_4x8"),
        )
        .orderBy("jacc_decile")
    )


def t76_dedup_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How aggressive should the dedup pass be? The cluster-structure
    curve across Jaccard thresholds {0.3, 0.95, 0.98}: the candidate
    pairs are computed ONCE (the t04 inverted-index kernel at the
    loosest threshold — higher-threshold edge sets are subsets, so no
    re-scan), then each threshold's transitive clusters are labeled
    and summarized (components, clustered docs, largest component,
    surviving edge count). The curve is the evidence for choosing
    t14/t15's production threshold: too loose chains unrelated docs
    into mega-components (largest_component explodes), too tight
    leaves near-dups unmerged (n_clustered_docs collapses)."""
    d = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, threshold=0.3).localCheckpoint(eager=False)
    outs = []
    for thr in (0.3, 0.95, 0.98):
        e = pairs.where(F.col("jaccard") >= thr)
        sizes = connected_components(e).groupBy("component").agg(
            F.count(F.lit(1)).alias("sz")
        )
        outs.append(
            sizes.agg(
                F.count(F.lit(1)).alias("_nc"),
                F.sum("sz").alias("_nd"),
                F.max("sz").alias("_lg"),
            )
            .crossJoin(
                e.agg(F.count(F.lit(1)).alias("_ne"))
            )
            .select(
                F.lit(thr).alias("threshold"),
                F.coalesce("_ne", F.lit(0))
                .cast("bigint")
                .alias("n_edges"),
                F.coalesce("_nc", F.lit(0))
                .cast("bigint")
                .alias("n_components"),
                F.coalesce("_nd", F.lit(0))
                .cast("bigint")
                .alias("n_clustered_docs"),
                F.coalesce("_lg", F.lit(0))
                .cast("bigint")
                .alias("largest_component"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("threshold")


def t77_containment_direction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Containment DIRECTION matrix — who quotes whom, the directed
    complement of t68's symmetric cross-source dup counts: t72's
    asymmetric edges oriented by shingle-set size (the smaller set is
    the contained side, the larger the container; equal-size pairs
    are symmetric dups with no direction and are excluded), then
    aggregated by (container_source, contained_source). Each cell
    reports the pair count, how many of them symmetric Jaccard at
    0.3 is BLIND to (the quote-expansion gap, per direction), the
    mean containment strength, and the distinct quoted documents.
    Same bounded inverted-index kernel as t72 (`with_sizes=True`
    only forwards two columns already in the pair fold); the source
    joins are edge-bounded broadcast lookups."""
    from dislib_spark.text.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = containment_pairs(
        d, c_threshold=0.6, j_max=0.3, with_sizes=True
    )
    bigger_a = F.col("a_size") > F.col("b_size")
    directed = edges.where(F.col("a_size") != F.col("b_size")).select(
        F.when(bigger_a, F.col("a_id"))
        .otherwise(F.col("b_id"))
        .alias("container_id"),
        F.when(bigger_a, F.col("b_id"))
        .otherwise(F.col("a_id"))
        .alias("contained_id"),
        "containment",
        "caught_by_jaccard",
    )
    src = d.select("doc_id", "source")
    j = directed.join(
        F.broadcast(
            src.select(
                F.col("doc_id").alias("container_id"),
                F.col("source").alias("container_source"),
            )
        ),
        "container_id",
    ).join(
        F.broadcast(
            src.select(
                F.col("doc_id").alias("contained_id"),
                F.col("source").alias("contained_source"),
            )
        ),
        "contained_id",
    )
    return (
        j.groupBy("container_source", "contained_source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum((F.col("caught_by_jaccard") == 0).cast("long"))
            .cast("bigint")
            .alias("n_jaccard_blind"),
            F.round(F.avg("containment"), 6).alias("avg_containment"),
            F.countDistinct("contained_id")
            .cast("bigint")
            .alias("n_contained_docs"),
        )
        .orderBy("container_source", "contained_source")
    )


def t79_containment_chains(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TWO-HOP quote chains in t77's containment digraph — A contains
    B contains C (sizes strictly decrease along an edge, so chains
    are acyclic and the three documents distinct): the transitive
    structure a pairwise dedup report hides, with
    ``has_direct_edge`` flagging whether the A⊃C relation was ALSO
    found directly (0 rows are transitive-only relations — C's text
    survives in A through B, invisible to every pairwise pass at
    these thresholds). The chain join is edge-on-edge (edge-bounded,
    never corpus-sized); output is the 20 lexicographically first
    chains — deterministic."""
    from dislib_spark.text.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = containment_pairs(
        d, c_threshold=0.6, j_max=0.3, with_sizes=True
    )
    bigger_a = F.col("a_size") > F.col("b_size")
    # the directed edge set feeds THREE consumers (e1, e2, direct);
    # a lazy checkpoint computes the containment pair kernel once
    # inside the query's own action instead of once per consumer
    # (edge-bounded rows, tiny to cache)
    directed = edges.where(F.col("a_size") != F.col("b_size")).select(
        F.when(bigger_a, F.col("a_id"))
        .otherwise(F.col("b_id"))
        .alias("container_id"),
        F.when(bigger_a, F.col("b_id"))
        .otherwise(F.col("a_id"))
        .alias("contained_id"),
        "containment",
    ).localCheckpoint(eager=False)
    e1 = directed.select(
        F.col("container_id").alias("top_id"),
        F.col("contained_id").alias("mid_id"),
        F.col("containment").alias("c_top_mid"),
    )
    e2 = directed.select(
        F.col("container_id").alias("mid_id"),
        F.col("contained_id").alias("bottom_id"),
        F.col("containment").alias("c_mid_bottom"),
    )
    direct = directed.select(
        F.col("container_id").alias("top_id"),
        F.col("contained_id").alias("bottom_id"),
        F.lit(1).alias("has_direct_edge"),
    )
    return (
        e1.join(e2, "mid_id")
        .join(direct, ["top_id", "bottom_id"], "left")
        .select(
            "top_id",
            "mid_id",
            "bottom_id",
            "c_top_mid",
            "c_mid_bottom",
            F.coalesce("has_direct_edge", F.lit(0))
            .cast("int")
            .alias("has_direct_edge"),
        )
        .orderBy("top_id", "mid_id", "bottom_id")
        .limit(20)
    )


def t78_quote_hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote-graph HUB report: per document, its degrees in t77's
    containment digraph — how many other documents it CONTAINS
    (out-degree: templates, aggregator pages) and how many documents
    it is CONTAINED IN (in-degree: the viral quote / boilerplate
    block every crawler keeps re-ingesting). The top-20 by total
    degree is the review queue a dedup operator actually reads:
    hubs are where one curation decision (keep the template once,
    drop the wrappers) removes the most redundancy. Degrees fold
    over the edge set (edge-bounded, never corpus-sized); ordering
    is (degree DESC, doc_id) — deterministic."""
    from dislib_spark.text.dedup import containment_pairs

    d = load_table(spark, sf_dir, "documents")
    edges = containment_pairs(
        d, c_threshold=0.6, j_max=0.3, with_sizes=True
    )
    bigger_a = F.col("a_size") > F.col("b_size")
    # two consumers (out-degree, in-degree) — lazy checkpoint runs
    # the containment kernel once inside the timed action (see t79)
    directed = edges.where(F.col("a_size") != F.col("b_size")).select(
        F.when(bigger_a, F.col("a_id"))
        .otherwise(F.col("b_id"))
        .alias("container_id"),
        F.when(bigger_a, F.col("b_id"))
        .otherwise(F.col("a_id"))
        .alias("contained_id"),
    ).localCheckpoint(eager=False)
    out_deg = directed.groupBy(
        F.col("container_id").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_contains"))
    in_deg = directed.groupBy(
        F.col("contained_id").alias("doc_id")
    ).agg(F.count(F.lit(1)).alias("n_contained_in"))
    deg = (
        out_deg.join(in_deg, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("n_contains", F.lit(0)).alias("n_contains"),
            F.coalesce("n_contained_in", F.lit(0)).alias(
                "n_contained_in"
            ),
        )
    )
    src = d.select("doc_id", "source", "n_chars")
    return (
        deg.join(F.broadcast(src), "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("n_contains").cast("bigint").alias("n_contains"),
            F.col("n_contained_in")
            .cast("bigint")
            .alias("n_contained_in"),
            (F.col("n_contains") + F.col("n_contained_in"))
            .cast("bigint")
            .alias("degree"),
        )
        .orderBy(F.desc("degree"), "doc_id")
        .limit(20)
    )


QUERIES = {
    "t01_text_stats": t01_text_stats,
    "t02_lang_predict": t02_lang_predict,
    "t03_dedup_exact": t03_dedup_exact,
    "t04_dedup_jaccard": t04_dedup_jaccard,
    "t05_dedup_minhash": t05_dedup_minhash,
    "t06_dedup_simhash": t06_dedup_simhash,
    "t07_quality_filter": t07_quality_filter,
    "t08_normalize": t08_normalize,
    "t09_contamination": t09_contamination,
    "t10_stratified_sample": t10_stratified_sample,
    "t11_repetition": t11_repetition,
    "t12_sequence_pack": t12_sequence_pack,
    "t13_domain_mix": t13_domain_mix,
    "t14_dedup_clusters": t14_dedup_clusters,
    "t15_dedup_keep": t15_dedup_keep,
    "t16_tfidf_topk": t16_tfidf_topk,
    "t17_bm25": t17_bm25,
    "t18_winnow": t18_winnow,
    "t19_pii_redact": t19_pii_redact,
    "t20_pipeline": t20_pipeline,
    "t21_pagerank": t21_pagerank,
    "t22_novelty": t22_novelty,
    "t23_lm_score": t23_lm_score,
    "t24_bpe_pairs": t24_bpe_pairs,
    "t25_chunking": t25_chunking,
    "t26_fuzzy_dedup": t26_fuzzy_dedup,
    "t27_inverted_index": t27_inverted_index,
    "t28_triangles": t28_triangles,
    "t29_dup_spans": t29_dup_spans,
    "t30_bpe_encode": t30_bpe_encode,
    "t31_token_mi": t31_token_mi,
    "t32_source_drift": t32_source_drift,
    "t33_bigram_lm": t33_bigram_lm,
    "t34_dsir_select": t34_dsir_select,
    "t35_snm_dedup": t35_snm_dedup,
    "t36_token_entropy": t36_token_entropy,
    "t37_incremental_dedup": t37_incremental_dedup,
    "t38_pmi_collocations": t38_pmi_collocations,
    "t39_vocab_coverage": t39_vocab_coverage,
    "t40_lang_mismatch": t40_lang_mismatch,
    "t41_quality_gate": t41_quality_gate,
    "t42_temperature_sample": t42_temperature_sample,
    "t43_zipf_fit": t43_zipf_fit,
    "t44_weighted_sample": t44_weighted_sample,
    "t45_ngram_novelty": t45_ngram_novelty,
    "t46_burstiness": t46_burstiness,
    "t47_lexical_diversity": t47_lexical_diversity,
    "t48_char_entropy": t48_char_entropy,
    "t49_url_canonicalize": t49_url_canonicalize,
    "t50_jaro_winkler_join": t50_jaro_winkler_join,
    "t51_idf_simhash": t51_idf_simhash,
    "t52_dedup_pipeline": t52_dedup_pipeline,
    "t53_boilerplate_chunks": t53_boilerplate_chunks,
    "t54_crosslang_dups": t54_crosslang_dups,
    "t55_heaps_law": t55_heaps_law,
    "t56_boilerplate_strip": t56_boilerplate_strip,
    "t57_dup_cluster_profile": t57_dup_cluster_profile,
    "t58_dedup_bias_audit": t58_dedup_bias_audit,
    "t59_minhash_estimator_error": t59_minhash_estimator_error,
    "t60_source_length_profile": t60_source_length_profile,
    "t61_source_vocab_overlap": t61_source_vocab_overlap,
    "t62_tokenizer_fertility": t62_tokenizer_fertility,
    "t63_ngram_novelty": t63_ngram_novelty,
    "t64_split_decontamination": t64_split_decontamination,
    "t65_priority_dedup": t65_priority_dedup,
    "t66_crossmodal_dedup_audit": t66_crossmodal_dedup_audit,
    "t67_lsh_band_sweep": t67_lsh_band_sweep,
    "t68_cross_source_dups": t68_cross_source_dups,
    "t69_quality_lm_agreement": t69_quality_lm_agreement,
    "t70_archive_decontamination": t70_archive_decontamination,
    "t71_length_quality_calibration": t71_length_quality_calibration,
    "t72_containment_dedup": t72_containment_dedup,
    "t73_golden_record": t73_golden_record,
    "t74_containment_golden_record": t74_containment_golden_record,
    "t75_minhash_recall": t75_minhash_recall,
    "t76_dedup_threshold_curve": t76_dedup_threshold_curve,
    "t77_containment_direction": t77_containment_direction,
    "t78_quote_hubs": t78_quote_hubs,
    "t79_containment_chains": t79_containment_chains,
}

# DuckDB fragments mirroring dislib_spark.text.analysis exactly.
_TOKENS = "string_split(text, ' ')"
_N_TOK = f"len({_TOKENS})"
_DIV = f"(len(list_distinct({_TOKENS}))::DOUBLE / len({_TOKENS})::DOUBLE)"
_QUALITY = (
    f"ROUND((least({_N_TOK}::DOUBLE / 50.0, 1.0) + {_DIV}) / 2.0, 6)"
)


def _lang_score(words: list[str]) -> str:
    cond = " OR ".join(f"x = '{w}'" for w in words)
    return f"len(list_filter({_TOKENS}, x -> {cond}))"


_SCORES = {
    "en": _lang_score(["the", "a", "of"]),
    "de": _lang_score(["der", "die", "das"]),
    "fr": _lang_score(["le", "la", "les"]),
    "es": _lang_score(["el", "los", "una"]),
    "zh": _lang_score(["de", "shi", "le"]),
}
_BEST = "GREATEST(" + ", ".join(f"s_{k}" for k in _SCORES) + ")"
_PRED_LANG_CASE = (
    "CASE WHEN " + _BEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{k} = {_BEST} THEN '{k}'" for k in sorted(_SCORES)
    )
    + " ELSE 'und' END"
)

ORACLE = {
    "t01_text_stats": f"""
        SELECT source, COUNT(*) AS n,
               ROUND(AVG({_N_TOK}), 6) AS avg_tokens,
               ROUND(AVG({_QUALITY}), 6) AS avg_quality
        FROM documents GROUP BY source ORDER BY source
    """,
    "t02_lang_predict": f"""
        SELECT pred_lang, COUNT(*) AS n FROM (
            SELECT {_PRED_LANG_CASE} AS pred_lang FROM (
                SELECT {", ".join(f"{v} AS s_{k}" for k, v in _SCORES.items())}
                FROM documents
            )
        ) GROUP BY pred_lang ORDER BY pred_lang
    """,
    "t03_dedup_exact": """
        SELECT md5(lower(text)) AS fp, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY fp ORDER BY fp
    """,
    "t04_dedup_jaccard": f"""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        ),
        inv AS (
            SELECT doc_id, len(shingles) AS set_size,
                   UNNEST(shingles) AS shingle
            FROM sh
        ),
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   ANY_VALUE(a.set_size) AS a_size,
                   ANY_VALUE(b.set_size) AS b_size,
                   COUNT(*) AS n_inter
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT a_id, b_id, jaccard FROM (
            SELECT a_id, b_id,
                   ROUND(n_inter::DOUBLE / (a_size + b_size - n_inter)::DOUBLE, 6)
                       AS jaccard
            FROM pairs
        ) WHERE jaccard >= 0.3 ORDER BY a_id, b_id
    """,
    "t07_quality_filter": f"""
        SELECT COUNT(*) AS n_kept, ROUND(AVG({_N_TOK}), 6) AS avg_tokens
        FROM documents WHERE {_QUALITY} >= 0.7
    """,
    # t05/t06 oracles are generated below (_t05_oracle/_t06_oracle):
    # the declared queries use hash_fn="md5", whose signature and
    # band-key arithmetic is integer-exact in ANSI SQL.
    "t08_normalize": """
        SELECT doc_id,
               md5(norm) AS norm_md5,
               CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                       ' +', ' ', 'g')) AS norm
            FROM documents
        ) ORDER BY doc_id
    """,
    "t09_contamination": """
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents
        ),
        g AS (
            SELECT doc_id, source,
                   md5(array_to_string(w[i:i+3], ' ')) AS gk
            FROM toks, UNNEST(range(1, len(w) - 2)) AS t(i)
        ),
        cg AS (SELECT DISTINCT doc_id, gk FROM g WHERE source <> 'src0'),
        bg AS (SELECT DISTINCT gk FROM g WHERE source = 'src0'),
        tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY doc_id),
        sh AS (
            SELECT doc_id, COUNT(*) AS n_shared FROM cg
            WHERE gk IN (SELECT gk FROM bg) GROUP BY doc_id
        )
        SELECT t.doc_id AS doc_id, n_grams, n_shared,
               ROUND(n_shared::DOUBLE / n_grams, 6) AS share_ratio
        FROM tot t JOIN sh s ON t.doc_id = s.doc_id
        ORDER BY doc_id
    """,
    "t10_stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                   AS INTEGER) % 100
              < CASE lang WHEN 'en' THEN 20 ELSE 50 END
        ORDER BY doc_id
    """,
    "t11_repetition": """
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents
        ),
        g2 AS (
            SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gk
            FROM w, UNNEST(range(1, len(w))) AS t(i)
        ),
        g3 AS (
            SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gk
            FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)
        ),
        dup3 AS (
            SELECT doc_id,
                   ROUND(1 - COUNT(DISTINCT gk)::DOUBLE / COUNT(*), 6)
                       AS dup3_frac
            FROM g3 GROUP BY doc_id
        ),
        g2c AS (
            SELECT doc_id, gk, COUNT(*) AS c FROM g2 GROUP BY 1, 2
        ),
        top2 AS (
            SELECT doc_id,
                   ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top2_share
            FROM g2c GROUP BY doc_id
        )
        SELECT d.source AS source, COUNT(*) AS n_docs,
               ROUND(AVG(COALESCE(dup3_frac, 0)), 6) AS avg_dup3,
               ROUND(AVG(COALESCE(top2_share, 0)), 6) AS avg_top2,
               ROUND(MAX(COALESCE(dup3_frac, 0)), 6) AS max_dup3,
               CAST(SUM(CASE WHEN COALESCE(top2_share, 0) > 0.08
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM documents d
        LEFT JOIN dup3 USING (doc_id) LEFT JOIN top2 USING (doc_id)
        GROUP BY d.source ORDER BY source
    """,
    "t12_sequence_pack": """
        WITH t AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        p AS (
            SELECT source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS tok_offset
            FROM t
        )
        SELECT source,
               CAST(FLOOR(tok_offset / 512.0) AS BIGINT) AS seq_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
               ROUND(SUM(n_tokens) / 512.0, 6) AS fill_ratio
        FROM p GROUP BY source, seq_id ORDER BY source, seq_id
    """,
    "t14_dedup_clusters": None,  # replaced below (shared pair CTE)
    "t15_dedup_keep": None,  # replaced below (shared pair CTE)
    "t13_domain_mix": """
        WITH c AS (
            SELECT doc_id, lang,
                   CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 2.0
                             WHEN 'fr' THEN 1.5 WHEN 'es' THEN 1.0
                             WHEN 'zh' THEN 3.0 ELSE 1.0 END AS w,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                        1, 4)) AS INTEGER) % 100 AS b
            FROM documents
        ),
        n AS (
            SELECT doc_id, lang,
                   CAST(FLOOR(w) AS INTEGER)
                   + CASE WHEN b < ROUND((w - FLOOR(w)) * 100)
                          THEN 1 ELSE 0 END AS n_copies
            FROM c
        )
        SELECT doc_id, lang, CAST(copy_idx AS BIGINT) AS copy_idx
        FROM n, UNNEST(range(1, n_copies + 1)) AS t(copy_idx)
        WHERE n_copies >= 1
        ORDER BY doc_id, copy_idx
    """,
    # winnowing fingerprints: md5 char-8-gram rolling hashes, window-4
    # minima — replayed exactly (md5/substr/list ops are identical).
    "t18_winnow": """
        WITH nrm AS (
            SELECT doc_id, source,
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
            FROM documents
        ),
        g AS (
            SELECT doc_id, source,
                   CASE WHEN len(norm) >= 8 THEN
                       list_transform(range(1, len(norm) - 8 + 2),
                                      i -> md5(substr(norm, CAST(i AS INTEGER), 8)))
                   ELSE CAST([] AS VARCHAR[]) END AS grams
            FROM nrm
        ),
        sel AS (
            SELECT doc_id, source,
                   CASE WHEN len(grams) >= 1 THEN
                       list_distinct(list_transform(
                           range(1, greatest(len(grams) - 3, 1) + 1),
                           j -> list_min(grams[CAST(j AS INTEGER):CAST(j + 3 AS INTEGER)])))
                   ELSE CAST([] AS VARCHAR[]) END AS fps
            FROM g
        ),
        tot AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(len(fps)) AS BIGINT) AS n_fp_total
            FROM sel GROUP BY source
        ),
        dis AS (
            SELECT source, COUNT(DISTINCT f) AS n_fp_distinct
            FROM (SELECT source, unnest(fps) AS f FROM sel)
            GROUP BY source
        )
        SELECT tot.source AS source, n_docs, n_fp_total, n_fp_distinct
        FROM tot JOIN dis ON tot.source = dis.source
        ORDER BY source
    """,
    "t20_pipeline": f"""
        WITH f AS (
            SELECT doc_id, source, md5(lower(text)) AS fp,
                   CAST({_N_TOK} AS BIGINT) AS n_tokens,
                   {_QUALITY} AS quality
            FROM documents
        ),
        q AS (SELECT * FROM f WHERE quality >= 0.5),
        k AS (SELECT fp, MIN(doc_id) AS doc_id FROM q GROUP BY fp)
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(quality), 6) AS avg_quality
        FROM q JOIN k USING (fp, doc_id)
        GROUP BY source ORDER BY source
    """,
    "t19_pii_redact": """
        SELECT c_mktsegment,
               COUNT(*) AS n_rows,
               CAST(SUM(len(regexp_extract_all(c_name,
                    '[0-9][0-9][0-9][0-9][0-9][0-9]+'))) AS BIGINT) AS n_ids,
               MIN(regexp_replace(regexp_replace(c_name,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
                    '[PII]', 'g'),
                    '[0-9][0-9][0-9][0-9][0-9][0-9]+', '[PII]', 'g'))
                   AS sample_redacted
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
}

# Shared recursive-closure prefix for the cluster queries: Jaccard≥0.3
# pairs (same CTE as t04) → symmetric edges → transitive reachability
# (DuckDB WITH RECURSIVE) → per-node min reachable id = component.
_CLUSTER_CTE = f"""
        WITH RECURSIVE sh AS (
            SELECT doc_id,
                   list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                                  for i in range(1, len(toks) - 1)]) AS shingles
            FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        ),
        inv AS (
            SELECT doc_id, len(shingles) AS set_size,
                   UNNEST(shingles) AS shingle
            FROM sh
        ),
        pr AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   ANY_VALUE(a.set_size) AS a_size,
                   ANY_VALUE(b.set_size) AS b_size,
                   COUNT(*) AS n_inter
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        p AS (
            SELECT a_id, b_id FROM pr
            WHERE ROUND(n_inter::DOUBLE
                        / (a_size + b_size - n_inter)::DOUBLE, 6) >= 0.3
        ),
        edges AS (
            SELECT a_id AS u, b_id AS v FROM p
            UNION
            SELECT b_id, a_id FROM p
        ),
        reach(n, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT reach.n, e.v FROM reach JOIN edges e ON reach.r = e.u
        ),
        comp AS (SELECT n, MIN(r) AS comp FROM reach GROUP BY n)
"""

ORACLE["t14_dedup_clusters"] = (
    _CLUSTER_CTE
    + """
        SELECT comp AS comp_id, COUNT(*) AS n_docs
        FROM comp GROUP BY comp ORDER BY comp_id
    """
)

ORACLE["t16_tfidf_topk"] = """
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS nd FROM documents),
    scored AS (
        SELECT doc_id, term,
               ROUND(tf * (ln((nd + 1.0) / (df + 1.0)) + 1.0), 6)
                   AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score, rank FROM (
        SELECT doc_id, term, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term
               ) AS INTEGER) AS rank
        FROM scored WHERE doc_id < 30
    ) WHERE rank <= 3 ORDER BY doc_id, rank
"""

ORACLE["t17_bm25"] = """
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
    )
    SELECT tf.doc_id AS doc_id,
           ROUND(SUM(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN dfreq USING (term)
    JOIN lens ON lens.doc_id = tf.doc_id
    CROSS JOIN stats
    GROUP BY tf.doc_id ORDER BY doc_id
"""

ORACLE["t15_dedup_keep"] = (
    _CLUSTER_CTE
    + """
        SELECT source, COUNT(*) AS n_kept FROM documents
        WHERE doc_id NOT IN (SELECT n FROM comp WHERE n <> comp)
        GROUP BY source ORDER BY source
    """
)


# PageRank oracle: the pair CTE (shared with t14) up to `edges`, a
# degree table, then the SAME 10 update steps unrolled as chained
# CTEs (DuckDB recursion cannot aggregate over the recursive ref).
_PAGERANK_TAIL = """,
        deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        r0 AS (SELECT node, 1.0 AS rank FROM nodes),
        c1 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r0 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r1 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c1 c USING (node)
        ),
        c2 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r1 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r2 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c2 c USING (node)
        ),
        c3 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r2 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r3 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c3 c USING (node)
        ),
        c4 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r3 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r4 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c4 c USING (node)
        ),
        c5 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r4 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r5 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c5 c USING (node)
        ),
        c6 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r5 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r6 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c6 c USING (node)
        ),
        c7 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r6 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r7 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c7 c USING (node)
        ),
        c8 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r7 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r8 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c8 c USING (node)
        ),
        c9 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r8 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r9 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c9 c USING (node)
        ),
        c10 AS (
            SELECT e.v AS node, SUM(p.rank / dg.deg) AS in_rank
            FROM edges e JOIN r9 p ON p.node = e.u
                 JOIN deg dg ON dg.u = e.u
            GROUP BY e.v
        ),
        r10 AS (
            SELECT n.node AS node,
                   0.15 + 0.85 * COALESCE(c.in_rank, 0) AS rank
            FROM nodes n LEFT JOIN c10 c USING (node)
        )
        SELECT node, ROUND(rank, 6) AS rank FROM r10 ORDER BY node
"""

ORACLE["t21_pagerank"] = (
    _CLUSTER_CTE.split("reach(")[0].rstrip().rstrip(",") + _PAGERANK_TAIL
)


ORACLE["t22_novelty"] = """
    WITH g AS (
        SELECT doc_id, source,
               md5(UNNEST(list_distinct(
                   [concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                    for i in range(1, greatest(len(toks) - 1, 1))]))) AS gk
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents)
    ),
    c AS (SELECT gk, COUNT(DISTINCT doc_id) AS n_docs_with
          FROM g GROUP BY gk),
    pd AS (
        SELECT doc_id, source,
               SUM(CASE WHEN n_docs_with = 1 THEN 1 ELSE 0 END)::DOUBLE
                   / COUNT(*) AS novelty
        FROM g JOIN c USING (gk)
        GROUP BY doc_id, source
    )
    SELECT source, COUNT(*) AS n_docs,
           ROUND(AVG(novelty), 6) AS avg_novelty,
           ROUND(MIN(novelty), 6) AS min_novelty
    FROM pd GROUP BY source ORDER BY source
"""

ORACLE["t23_lm_score"] = """
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    toks2 AS (SELECT * FROM toks WHERE w <> ''),
    counts AS (SELECT w, COUNT(*) AS c FROM toks2 GROUP BY w),
    total AS (SELECT SUM(c)::DOUBLE AS n FROM counts),
    per_doc AS (
        SELECT t.doc_id, AVG(LN(c.c / total.n)) AS lm_score
        FROM toks2 t JOIN counts c ON t.w = c.w CROSS JOIN total
        GROUP BY t.doc_id
    )
    SELECT d.source, COUNT(*) AS n_docs,
           ROUND(AVG(p.lm_score), 6) AS avg_lm,
           ROUND(MIN(p.lm_score), 6) AS min_lm
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
"""

ORACLE["t24_bpe_pairs"] = """
    WITH words AS (
        SELECT w, COUNT(*) AS freq FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    pairs AS (
        SELECT UNNEST([SUBSTRING(w, i, 2) for i in range(1, LENGTH(w))])
                   AS pair,
               freq
        FROM words WHERE LENGTH(w) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS BIGINT) AS total
    FROM pairs GROUP BY pair
    ORDER BY total DESC, pair LIMIT 20
"""

ORACLE["t25_chunking"] = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, toks,
               [x for x in range(1, greatest(len(toks) - 10, 1) + 1, 40)]
                   AS starts
        FROM t
    ),
    c AS (
        SELECT doc_id,
               GENERATE_SUBSCRIPTS(starts, 1) AS chunk_id,
               array_to_string(
                   list_slice(toks, UNNEST(starts), UNNEST(starts) + 49),
                   ' ') AS chunk
        FROM s
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_tokens,
           md5(chunk) AS fp
    FROM c ORDER BY doc_id, chunk_id
"""

ORACLE["t26_fuzzy_dedup"] = """
    WITH d AS (
        SELECT doc_id, SUBSTRING(text, 1, 80) AS pfx,
               md5(array_to_string(
                   list_slice(string_split(text, ' '), 1, 2), ' ')) AS bk
        FROM documents
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS dist
    FROM d a JOIN d b ON a.bk = b.bk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 20
    ORDER BY a_id, b_id
"""

ORACLE["t27_inverted_index"] = """
    WITH td AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term, COUNT(*) AS df,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
    FROM td WHERE term <> ''
    GROUP BY term HAVING COUNT(*) >= 3
    ORDER BY term
"""

ORACLE["t28_triangles"] = """
    WITH d AS (
        SELECT doc_id, SUBSTRING(text, 1, 80) AS pfx,
               md5(array_to_string(
                   list_slice(string_split(text, ' '), 1, 2), ' ')) AS bk
        FROM documents
    ),
    e AS (
        SELECT a.doc_id AS a, b.doc_id AS b
        FROM d a JOIN d b ON a.bk = b.bk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.pfx, b.pfx) <= 60
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           (SELECT COUNT(*) FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
"""

ORACLE["t29_dup_spans"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, CAST(s AS INT) AS pos,
               md5(array_to_string(t[s:s+7], ' ')) AS gram
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - 7, 0))) AS r(s)
    ),
    dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT doc_id, pos FROM grams
        WHERE gram IN (SELECT gram FROM dup)
    ),
    isl AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM hits
    ),
    spans AS (
        SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 7 AS span_end
        FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id, CAST(COUNT(*) AS INT) AS n_spans,
           CAST(SUM(span_end - span_start + 1) AS INT) AS dup_tokens,
           CAST(MAX(span_end - span_start + 1) AS INT) AS max_span
    FROM spans GROUP BY doc_id ORDER BY doc_id
"""

ORACLE["t31_token_mi"] = """
    WITH toks AS (
        SELECT lang AS c, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    toks2 AS (SELECT * FROM toks WHERE w <> ''),
    wc AS (SELECT w, c, COUNT(*) AS n_wc FROM toks2 GROUP BY w, c),
    wm AS (SELECT w, SUM(n_wc) AS n_w FROM wc GROUP BY w),
    cm AS (SELECT c, SUM(n_wc) AS n_c FROM wc GROUP BY c),
    tot AS (SELECT SUM(n_wc)::DOUBLE AS n FROM wc),
    full_t AS (
        SELECT wm.w, wm.n_w, cm.c, cm.n_c, COALESCE(wc.n_wc, 0) AS n_wc
        FROM wm CROSS JOIN cm
        LEFT JOIN wc ON wc.w = wm.w AND wc.c = cm.c
        WHERE wm.n_w >= 5
    ),
    cells AS (
        SELECT w, n_w,
               (CASE WHEN n_wc > 0
                     THEN (n_wc / tot.n)
                          * LN((n_wc * tot.n) / (n_w::DOUBLE * n_c))
                     ELSE 0.0 END)
             + (CASE WHEN (n_c - n_wc) > 0
                     THEN ((n_c - n_wc) / tot.n)
                          * LN(((n_c - n_wc) * tot.n)
                               / ((tot.n - n_w) * n_c))
                     ELSE 0.0 END) AS cell
        FROM full_t, tot
    )
    SELECT w AS token, CAST(n_w AS BIGINT) AS n,
           ROUND(SUM(cell), 6) AS mi
    FROM cells GROUP BY w, n_w
    ORDER BY mi DESC, token LIMIT 20
"""

ORACLE["t32_source_drift"] = """
    WITH toks AS (
        SELECT source AS g, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    gw AS (
        SELECT g, w, COUNT(*) AS n_gw FROM toks WHERE w <> ''
        GROUP BY g, w
    ),
    wm AS (SELECT w, SUM(n_gw) AS n_w FROM gw GROUP BY w),
    gm AS (SELECT g, SUM(n_gw) AS n_g FROM gw GROUP BY g),
    tot AS (SELECT SUM(n_w)::DOUBLE AS n FROM wm),
    terms AS (
        SELECT gw.g, gm.n_g,
               (gw.n_gw / gm.n_g::DOUBLE)
               * LN((gw.n_gw / gm.n_g::DOUBLE)
                    / (wm.n_w / tot.n)) AS term
        FROM gw JOIN wm ON gw.w = wm.w
        JOIN gm ON gw.g = gm.g, tot
    )
    SELECT g AS source, CAST(n_g AS BIGINT) AS n_tokens,
           ROUND(SUM(term), 6) AS kl
    FROM terms GROUP BY g, n_g ORDER BY source
"""

ORACLE["t33_bigram_lm"] = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
        SELECT doc_id, t[s] AS w1, t[s+1] AS w2
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t)-1, 0))) AS r(s)
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
    uc AS (SELECT w1, SUM(n12) AS n1 FROM bc GROUP BY w1),
    uni AS (
        SELECT w, COUNT(*) AS cu FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT SUM(cu)::DOUBLE AS n FROM uni),
    scored AS (
        SELECT b.doc_id,
               LN(0.7 * (bc.n12::DOUBLE / uc.n1)
                  + 0.3 * (uni.cu / tot.n)) AS lp
        FROM big b
        JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        JOIN uc ON b.w1 = uc.w1
        JOIN uni ON b.w2 = uni.w, tot
    ),
    per_doc AS (
        SELECT doc_id, AVG(lp) AS lm2_score FROM scored GROUP BY doc_id
    )
    SELECT d.source, COUNT(*) AS n_docs,
           ROUND(AVG(p.lm2_score), 6) AS avg_lm2,
           ROUND(MIN(p.lm2_score), 6) AS min_lm2
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
"""

ORACLE["t34_dsir_select"] = """
    WITH toks AS (
        SELECT doc_id, CAST(lang = 'en' AS INT) AS t,
               UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    dw AS (
        SELECT doc_id, t, w, COUNT(*) AS tf FROM toks WHERE w <> ''
        GROUP BY doc_id, t, w
    ),
    vocab AS (
        SELECT w, SUM(tf) AS n_raw, SUM(tf * t) AS n_tgt
        FROM dw GROUP BY w
    ),
    tot AS (
        SELECT SUM(n_raw)::DOUBLE AS nr, SUM(n_tgt)::DOUBLE AS nt,
               COUNT(*)::DOUBLE AS v
        FROM vocab
    ),
    scored AS (
        SELECT w, LN((n_tgt + 0.5) / (nt + 0.5 * v))
                 - LN((n_raw + 0.5) / (nr + 0.5 * v)) AS lw
        FROM vocab, tot
    ),
    per_doc AS (
        SELECT doc_id, SUM(tf * lw) / SUM(tf) AS weight
        FROM dw JOIN scored USING (w) GROUP BY doc_id
    ),
    sel AS (
        SELECT d.source, ROUND(p.weight, 6) AS rw
        FROM per_doc p JOIN documents d USING (doc_id)
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rw > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_selected,
           ROUND(AVG(rw), 6) + 0.0 AS avg_weight
    FROM sel GROUP BY source ORDER BY source
"""

ORACLE["t35_snm_dedup"] = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               concat_ws(' ', toks[1], toks[2], toks[3]) AS k,
               list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t
    ),
    ranked AS (
        SELECT doc_id, sh,
               ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn
        FROM keyed
    ),
    cand AS (
        SELECT a.doc_id AS a0, b.doc_id AS b0, a.sh AS ash, b.sh AS bsh
        FROM ranked a JOIN ranked b ON b.rn - a.rn BETWEEN 1 AND 4
    ),
    scored AS (
        SELECT LEAST(a0, b0) AS a_id, GREATEST(a0, b0) AS b_id,
               ROUND(len(list_intersect(ash, bsh))::DOUBLE
                     / (len(ash) + len(bsh)
                        - len(list_intersect(ash, bsh)))::DOUBLE,
                     6) AS jaccard
        FROM cand
    )
    SELECT a_id, b_id, jaccard FROM scored
    WHERE jaccard >= 0.3 ORDER BY a_id, b_id
"""

ORACLE["t36_token_entropy"] = """
    WITH dw AS (
        SELECT doc_id, w, COUNT(*) AS c FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY doc_id, w
    ),
    ent AS (
        SELECT doc_id,
               LN(SUM(c)) - SUM(c * LN(c)) / SUM(c) AS entropy
        FROM dw GROUP BY doc_id
    )
    SELECT d.source, COUNT(*) AS n_docs,
           ROUND(AVG(e.entropy), 6) AS avg_entropy,
           ROUND(MIN(e.entropy), 6) AS min_entropy
    FROM ent e JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
"""

ORACLE["t38_pmi_collocations"] = """
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ),
    big AS (
        SELECT t[s] AS w1, t[s+1] AS w2
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t)-1, 0))) AS r(s)
        WHERE t[s] <> '' AND t[s+1] <> ''
    ),
    bc AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
    lm AS (SELECT w1, SUM(n12)::DOUBLE AS n1 FROM bc GROUP BY w1),
    rm AS (SELECT w2, SUM(n12)::DOUBLE AS n2 FROM bc GROUP BY w2),
    tot AS (SELECT SUM(n12)::DOUBLE AS n FROM bc)
    SELECT bc.w1, bc.w2, bc.n12,
           ROUND(LN(bc.n12::DOUBLE * tot.n / (lm.n1 * rm.n2)), 6) AS pmi
    FROM bc
    JOIN lm USING (w1)
    JOIN rm USING (w2), tot
    WHERE bc.n12 >= 5
    ORDER BY w1, w2
"""

ORACLE["t39_vocab_coverage"] = """
    WITH gw AS (
        SELECT source AS g, w, COUNT(*) AS n FROM (
            SELECT source, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY source, w
    ),
    wc AS (SELECT w, SUM(n) AS cw FROM gw GROUP BY w),
    vocab AS (
        SELECT w FROM wc ORDER BY cw DESC, w LIMIT 10
    ),
    per AS (
        SELECT g,
               SUM(n)::BIGINT AS n_tokens,
               SUM(CASE WHEN w NOT IN (SELECT w FROM vocab)
                        THEN n ELSE 0 END)::BIGINT AS n_oov
        FROM gw GROUP BY g
    )
    SELECT g AS source, n_tokens, n_oov,
           ROUND(n_oov::DOUBLE / n_tokens, 6) AS oov_rate
    FROM per ORDER BY source
"""

ORACLE["t40_lang_mismatch"] = f"""
    SELECT lang, pred_lang, COUNT(*) AS n,
           CASE WHEN lang = pred_lang THEN 1 ELSE 0 END AS is_match
    FROM (
        SELECT lang, {_PRED_LANG_CASE} AS pred_lang FROM (
            SELECT lang,
                   {", ".join(f"{v} AS s_{k}" for k, v in _SCORES.items())}
            FROM documents
        )
    ) GROUP BY lang, pred_lang ORDER BY lang, pred_lang
"""

ORACLE["t41_quality_gate"] = f"""
    WITH w AS (
        SELECT doc_id, source, {_TOKENS} AS w,
               {_N_TOK} AS n_tok, {_QUALITY} AS quality
        FROM documents
    ),
    g3 AS (
        SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gk
        FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)
    ),
    dup3 AS (
        SELECT doc_id,
               ROUND(1 - COUNT(DISTINCT gk)::DOUBLE / COUNT(*), 6)
                   AS dup3_frac
        FROM g3 GROUP BY doc_id
    ),
    feat AS (
        SELECT w.source, w.n_tok, w.quality,
               COALESCE(d.dup3_frac, 0) AS dup3_frac
        FROM w LEFT JOIN dup3 d USING (doc_id)
    )
    SELECT source, COUNT(*) AS n_docs,
           SUM(CASE WHEN n_tok < 25 THEN 1 ELSE 0 END)::BIGINT AS n_reject_short,
           SUM(CASE WHEN quality < 0.6 THEN 1 ELSE 0 END)::BIGINT AS n_reject_quality,
           SUM(CASE WHEN dup3_frac > 0.02 THEN 1 ELSE 0 END)::BIGINT AS n_reject_rep,
           SUM(CASE WHEN n_tok >= 25 AND quality >= 0.6
                     AND dup3_frac <= 0.02 THEN 1 ELSE 0 END)::BIGINT AS n_pass
    FROM feat GROUP BY source ORDER BY source
"""

ORACLE["t42_temperature_sample"] = """
    WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    m AS (SELECT lang, n, SQRT(n::DOUBLE) AS mass FROM c),
    t AS (SELECT SUM(mass) AS tm, SUM(n) AS tn FROM m),
    r AS (
        SELECT lang, n,
               CAST(ROUND(LEAST(1.0,
                    tn::DOUBLE * (mass / tm) / n::DOUBLE) * 100)
                    AS INTEGER) AS rate_pct
        FROM m, t
    ),
    kept AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN r USING (lang)
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                   AS INTEGER) % 100 < r.rate_pct
        GROUP BY d.lang
    )
    SELECT r.lang, r.n AS n_orig, r.rate_pct,
           COALESCE(kept.n_kept, 0) AS n_kept
    FROM r LEFT JOIN kept ON kept.lang = r.lang
    ORDER BY r.lang
"""

ORACLE["t43_zipf_fit"] = """
    WITH vocab AS (
        SELECT w, COUNT(*) AS freq FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    ranked AS (
        SELECT LN(ROW_NUMBER() OVER (ORDER BY freq DESC, w)::DOUBLE) AS x,
               LN(freq::DOUBLE) AS y
        FROM vocab
    ),
    s AS (
        SELECT COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM ranked
    )
    SELECT n::BIGINT AS vocab_size,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS zipf_intercept
    FROM s
"""

# t44: '0x'||hex → BIGINT replays Spark's conv(hex,16,10); the A-ES
# key is rounded to 1e-12 (7 orders above cross-engine LN ulp noise)
# BEFORE ranking, ties break on doc_id — the selected set and ranks
# are bit-stable on both engines.
ORACLE["t44_weighted_sample"] = """
    WITH keyed AS (
        SELECT source, doc_id,
               ROUND(LN((CAST(('0x' || substr(
                              md5(CAST(doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) + 1.0) / 4294967296.0)
                     / n_chars, 12) AS es_key
        FROM documents
    )
    SELECT source, doc_id, ROUND(es_key, 6) AS es_key,
           CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY es_key DESC, doc_id) AS rank
        FROM keyed
    ) WHERE rank <= 5 ORDER BY source, rank
"""

# t45: per-doc novelty is an exact integer ratio; only the per-source
# mean's summation order differs across engines -> ROUND(...,6).
ORACLE["t45_ngram_novelty"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), w -> w <> '') AS t
        FROM documents
    ),
    tris AS (
        SELECT DISTINCT doc_id,
               UNNEST([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS g
        FROM toks WHERE len(t) >= 3
    ),
    first AS (SELECT g, MIN(doc_id) AS first_id FROM tris GROUP BY g),
    per_doc AS (
        SELECT t.doc_id,
               SUM(CASE WHEN t.doc_id = f.first_id THEN 1 ELSE 0 END)
                   ::DOUBLE / COUNT(*) AS novelty
        FROM tris t JOIN first f USING (g)
        GROUP BY t.doc_id
    )
    SELECT d.source, COUNT(*) AS n_docs,
           ROUND(AVG(p.novelty), 6) AS avg_novelty,
           CAST(SUM(CASE WHEN p.novelty < 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stale
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
"""

# t46: C/S/df/N are exact integers; VMR = (S/N - (C/N)^2)/(C/N) is
# deterministic double algebra on both engines.
ORACLE["t46_burstiness"] = """
    WITH dw AS (
        SELECT doc_id, w, COUNT(*) AS c FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY doc_id, w
    ),
    per AS (
        SELECT w AS term, SUM(c) AS ct, SUM(c * c) AS s2,
               COUNT(*) AS df
        FROM dw GROUP BY w
    ),
    nd AS (SELECT COUNT(*) AS n FROM documents)
    SELECT term, CAST(ct AS BIGINT) AS total, CAST(df AS BIGINT) AS df,
           ROUND((s2::DOUBLE / n - (ct::DOUBLE / n) * (ct::DOUBLE / n))
                 / (ct::DOUBLE / n), 6) AS vmr
    FROM per CROSS JOIN nd
    ORDER BY total DESC, term LIMIT 20
"""

# t47: every ratio is a division of exact integer counts; the
# (ttr, doc_id) ordering is fully deterministic.
ORACLE["t47_lexical_diversity"] = """
    WITH tok AS (
        SELECT doc_id, w, COUNT(*) AS tf FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY doc_id, w
    ),
    per AS (
        SELECT doc_id, SUM(tf) AS n_tokens, COUNT(*) AS n_types,
               SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS n_hapax
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(n_hapax AS BIGINT) AS n_hapax,
           ROUND(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
           ROUND(n_hapax / CAST(n_types AS DOUBLE), 6) AS hapax_ratio
    FROM per WHERE n_tokens >= 10
    ORDER BY ttr, doc_id LIMIT 20
"""

# t48: H sums <= |alphabet| IEEE-exact-ratio terms per doc, so LN's
# 1-ulp drift sits ten orders under ROUND(,6); (entropy, doc_id)
# ordering is deterministic.
ORACLE["t48_char_entropy"] = """
    WITH ch AS (
        SELECT doc_id, c, COUNT(*) AS n FROM (
            SELECT doc_id,
                   UNNEST(string_split(SUBSTRING(text, 1, 512), ''))
                       AS c
            FROM documents
        ) WHERE c <> '' GROUP BY doc_id, c
    ),
    tot AS (
        SELECT doc_id, SUM(n) AS nt, COUNT(*) AS nd
        FROM ch GROUP BY doc_id
    )
    SELECT ch.doc_id, CAST(MAX(nt) AS BIGINT) AS n_chars_used,
           CAST(MAX(nd) AS BIGINT) AS n_distinct,
           ROUND(-SUM((n / CAST(nt AS DOUBLE))
                      * LN(n / CAST(nt AS DOUBLE))), 6) AS entropy
    FROM ch JOIN tot USING (doc_id)
    GROUP BY ch.doc_id
    ORDER BY entropy, doc_id LIMIT 20
"""


def _t05_oracle(with_est: bool = False, tail_sql: str | None = None) -> str:
    """DuckDB replay of t05's md5-mode MinHash+LSH: identical affine
    constants (shared ``minhash_perms``), md5-prefix shingle hashes,
    md5 band keys — pure integer arithmetic, so the candidate set and
    the exact-Jaccard verify are both bit-deterministic.
    ``with_est=True`` adds the signature-match estimator column
    (t59's estimator-quality audit); default output is unchanged.
    ``tail_sql`` replaces the final SELECT (and may append further
    CTEs before it) — t75's recall grade reuses the whole chain."""
    from dislib_spark.text.dedup import _MERSENNE as M, minhash_perms

    sig_items = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {M}))"
        for a, b in minhash_perms(32, seed=7)
    )
    band_structs = ",\n                   ".join(
        "{'bi': %d, 'bh': md5(concat_ws(',', %s))}"
        % (
            b,
            ", ".join(
                f"CAST(sig[{b * 4 + j + 1}] AS VARCHAR)" for j in range(4)
            ),
        )
        for b in range(8)
    )
    est_col = (
        ",\n               ROUND(len([i for i in range(1, 33)"
        " if x.sig[i] = y.sig[i]])::DOUBLE / 32.0, 6) AS minhash_est"
        if with_est
        else ""
    )
    if tail_sql is not None:
        tail = tail_sql
    elif with_est:
        tail = "SELECT a_id, b_id, jaccard, minhash_est FROM scored"
    else:
        tail = (
            "SELECT a_id, b_id, jaccard FROM scored\n"
            "    WHERE jaccard >= 0.3 ORDER BY a_id, b_id"
        )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t
    ),
    hashed AS (
        SELECT doc_id, sh,
               list_transform(sh, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % {M}) AS hs
        FROM sh WHERE len(sh) > 0
    ),
    sig AS (
        SELECT doc_id, sh,
               [{sig_items}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, u.bi AS band_idx, u.bh AS band_hash FROM (
            SELECT doc_id,
                   UNNEST([{band_structs}]) AS u
            FROM sig
        )
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT c.a_id, c.b_id,
               ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
                     / (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh)))::DOUBLE,
                     6) AS jaccard{est_col}
        FROM cand c
        JOIN sig x ON x.doc_id = c.a_id
        JOIN sig y ON y.doc_id = c.b_id
    )
    {tail}
    """


ORACLE["t05_dedup_minhash"] = _t05_oracle()


def _t06_oracle() -> str:
    """DuckDB replay of t06's md5-mode SimHash: 60-bit token hashes,
    per-bit vote sums, sign-bit signature assembly, and the 45
    pigeonhole 2-of-10 block keys — all integer ops, bit-exact."""
    from itertools import combinations

    bits, k, max_h = 60, 10, 8
    width = bits // k  # 6
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(bits)
    )
    sig_sum = "\n                + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)
    )
    mask = (1 << width) - 1

    def block(i: int) -> str:
        return f"((sig >> {i * width}) & {mask})"

    combo_structs = ",\n                   ".join(
        "{'ci': %d, 'key': (%s << %d) + %s}"
        % (ci, block(c0), width, block(c1))
        for ci, (c0, c1) in enumerate(combinations(range(k), 2))
    )
    return f"""
    WITH tokh AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
        FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        )
    ),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM tokh GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               CAST({sig_sum} AS BIGINT) AS sig
        FROM votes
    ),
    keyed AS (
        SELECT doc_id, sig, u.ci AS ci, u.key AS key FROM (
            SELECT doc_id, sig,
                   UNNEST([{combo_structs}]) AS u
            FROM sig
        )
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM keyed a JOIN keyed b
      ON a.ci = b.ci AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_h}
    ORDER BY a_id, b_id
    """


ORACLE["t06_dedup_simhash"] = _t06_oracle()


# t49: full byte-level replay of the URL canonicalizer. DuckDB
# regexp_replace needs the explicit 'g' flag where Spark's is always
# global (the '/'-run collapse); every other rewrite matches at most
# once. md5-prefix conv replay gives the byte-exact witness.
ORACLE["t49_url_canonicalize"] = r"""
    WITH b AS (
        SELECT
            CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.'
                 WHEN doc_id % 3 = 1 THEN 'https://'
                 ELSE 'HTTP://' END
            || source || '.Example.COM'
            || CASE WHEN doc_id % 4 = 0 THEN ':443'
                    WHEN doc_id % 4 = 1 THEN ':8080'
                    ELSE '' END
            || '/Docs//' || CAST(doc_id % 97 AS VARCHAR)
            || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
            || '?utm_source=feed&ref=rss&b=' || CAST(doc_id % 5 AS VARCHAR)
            || '&a=' || CAST(doc_id % 7 AS VARCHAR)
            || CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END AS url
        FROM documents
    ),
    p AS (
        SELECT regexp_replace(trim(url), '#.*$', '') AS u FROM b
    ),
    parts AS (
        SELECT u,
            lower(regexp_extract(u,
                '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
            regexp_extract(u,
                '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)', 1) AS auth,
            regexp_extract(u,
                '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*([^?]*)', 1) AS path0,
            regexp_extract(u, '\?(.*)$', 1) AS query0
        FROM p
    ),
    norm AS (
        SELECT
            regexp_replace(regexp_replace(
                lower(regexp_extract(auth, '^([^:]*)', 1)),
                '^www\.', ''), '\.$', '') AS host,
            scheme,
            regexp_extract(auth, ':([0-9]*)$', 1) AS port,
            regexp_replace(regexp_replace(path0, '/{2,}', '/', 'g'),
                           '/$', '') AS path,
            array_to_string(list_sort(list_filter(
                str_split(query0, '&'),
                q -> q <> '' AND NOT regexp_matches(q,
                    '^(utm_[^=]*|fbclid|gclid|msclkid|igshid|ref)(=|$)')
            )), '&') AS qs
        FROM parts
    ),
    canon AS (
        SELECT host,
            scheme || '://' || host
            || CASE WHEN port = ''
                      OR (scheme = 'http' AND port = '80')
                      OR (scheme = 'https' AND port = '443')
                    THEN '' ELSE ':' || port END
            || path
            || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canon
        FROM norm
    )
    SELECT host,
           COUNT(*) AS n_urls,
           COUNT(DISTINCT canon) AS n_canon,
           CAST(SUM(CAST(('0x' || substr(md5(canon), 1, 8)) AS BIGINT))
                AS BIGINT) AS canon_sig
    FROM canon
    GROUP BY host
    ORDER BY host
"""


# t50: DuckDB's built-in jaro_winkler_similarity matches the engine's
# codepoint implementation bit-for-bit on ASCII (byte==codepoint;
# verified <1e-9 on fixtures, threshold sits >2e-3 from any pair).
ORACLE["t50_jaro_winkler_join"] = r"""
    WITH side AS (
        SELECT doc_id, lang, source,
               regexp_replace(substr(text, 1, 32),
                              '[^\x20-\x7E]', '', 'g') AS k,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY doc_id) AS bn
        FROM documents
    ),
    c AS (SELECT * FROM side WHERE bn <= 40),
    p AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               ROUND(jaro_winkler_similarity(a.k, b.k), 6) AS sim
        FROM c a JOIN c b
          ON a.lang = b.lang AND a.source = b.source
         AND a.doc_id < b.doc_id
    )
    SELECT a_id, b_id, sim FROM p WHERE sim >= 0.78
    ORDER BY sim DESC, a_id, b_id LIMIT 100
"""


def _t51_oracle() -> str:
    """DuckDB replay of the IDF-weighted SimHash: per-(doc, term)
    counts, integer idf weights (round(LN·1e9) — absorbs the libm
    1-ulp), order-exact integer vote sums, sign-bit assembly,
    and the same 45 pigeonhole 2-of-10 block keys as t06."""
    from itertools import combinations

    bits, k, max_h = 60, 10, 8
    width = bits // k
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN wt ELSE -wt END) AS v{j}"
        for j in range(bits)
    )
    sig_sum = "\n                + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)
    )
    mask = (1 << width) - 1

    def block(i: int) -> str:
        return f"((sig >> {i * width}) & {mask})"

    combo_structs = ",\n                   ".join(
        "{'ci': %d, 'key': (%s << %d) + %s}"
        % (ci, block(c0), width, block(c1))
        for ci, (c0, c1) in enumerate(combinations(range(k), 2))
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, w, COUNT(*) AS cnt FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) GROUP BY doc_id, w
    ),
    meta AS (SELECT COUNT(*) AS nd FROM documents),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
    wtd AS (
        SELECT t.doc_id,
               CAST(('0x' || substr(md5(t.w), 1, 15)) AS BIGINT) AS h,
               CAST(ROUND(LN((SELECT nd FROM meta)::DOUBLE
                             / f.df::DOUBLE) * 1e9)
                    AS BIGINT) * t.cnt AS wt
        FROM tok t JOIN dfreq f ON t.w = f.w
    ),
    votes AS (
        SELECT doc_id,
               {votes}
        FROM wtd GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id,
               CAST({sig_sum} AS BIGINT) AS sig
        FROM votes
    ),
    keyed AS (
        SELECT doc_id, sig, u.ci AS ci, u.key AS key FROM (
            SELECT doc_id, sig,
                   UNNEST([{combo_structs}]) AS u
            FROM sig
        )
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM keyed a JOIN keyed b
      ON a.ci = b.ci AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_h}
    ORDER BY a_id, b_id
    """


ORACLE["t51_idf_simhash"] = _t51_oracle()


# t52: t05's fully-replayed pair kernel feeding the recursive-CTE
# transitive closure (t14's comp pattern) and the canonical anti-join
# — the whole pipeline value-checked end to end.
ORACLE["t52_dedup_pipeline"] = f"""
    WITH RECURSIVE p AS ({_t05_oracle()}),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM p
        UNION
        SELECT b_id, a_id FROM p
    ),
    reach(n, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT reach.n, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT n, MIN(r) AS comp FROM reach GROUP BY n),
    dropids AS (SELECT n AS doc_id FROM comp WHERE n <> comp),
    tot AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    kept AS (
        SELECT d.source, COUNT(*) AS n_kept
        FROM documents d LEFT JOIN dropids x ON d.doc_id = x.doc_id
        WHERE x.doc_id IS NULL GROUP BY d.source
    )
    SELECT t.source, t.n_docs,
           COALESCE(k.n_kept, 0) AS n_kept,
           t.n_docs - COALESCE(k.n_kept, 0) AS n_dropped
    FROM tot t LEFT JOIN kept k ON t.source = k.source
    ORDER BY t.source
"""


# t53: t25's chunk replay (20-token, no overlap) + one fp rollup;
# md5 fingerprints make the chunk identity byte-exact.
ORACLE["t53_boilerplate_chunks"] = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, toks,
               [x for x in range(1, greatest(len(toks), 1) + 1, 20)]
                   AS starts
        FROM t
    ),
    c AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(toks, UNNEST(starts), UNNEST(starts) + 19),
                   ' ')) AS fp
        FROM s
    )
    SELECT fp, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
    FROM c
    GROUP BY fp
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occ DESC, fp
    LIMIT 20
"""


# t54: DuckDB 1-based list slicing [1:10] == Spark slice(.,1,10);
# the >64-doc whale-prefix drop replays as a windowed count filter.
ORACLE["t54_crosslang_dups"] = """
    WITH f AS (
        SELECT doc_id, lang,
               md5(array_to_string(string_split(text, ' ')[1:10], ' '))
                   AS fp
        FROM documents
    ),
    ok AS (
        SELECT doc_id, lang, fp FROM (
            SELECT doc_id, lang, fp,
                   COUNT(*) OVER (PARTITION BY fp) AS n
            FROM f
        ) WHERE n <= 64
    ),
    p AS (
        SELECT LEAST(a.lang, b.lang) AS lang_lo,
               GREATEST(a.lang, b.lang) AS lang_hi
        FROM ok a JOIN ok b
          ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.lang <> b.lang
    )
    SELECT lang_lo, lang_hi, COUNT(*) AS n_pairs
    FROM p GROUP BY lang_lo, lang_hi
    ORDER BY lang_lo, lang_hi
"""


# t55: exact integer token/vocab counts; beta is one LN/LN division
# (libm 1-ulp absorbed by 6-dp rounding on an O(0.x) value).
ORACLE["t55_heaps_law"] = """
    WITH tok AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    g AS (
        SELECT source, COUNT(*) AS n_tokens,
               COUNT(DISTINCT w) AS n_vocab
        FROM tok GROUP BY source
    )
    SELECT source, n_tokens, n_vocab,
           ROUND(LN(CAST(n_vocab AS DOUBLE))
                 / LN(CAST(n_tokens AS DOUBLE)), 6) AS heaps_beta
    FROM g ORDER BY source
"""

# t56: the t53 chunk CTE plus the strip ledger — the two UNNESTs in c
# zip in lockstep (same source array), matching Spark's posexplode.
ORACLE["t56_boilerplate_strip"] = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, toks,
               [x for x in range(1, greatest(len(toks), 1) + 1, 20)]
                   AS starts
        FROM t
    ),
    c AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(toks, UNNEST(starts), UNNEST(starts) + 19),
                   ' ')) AS fp,
               len(list_slice(toks, UNNEST(starts), UNNEST(starts) + 19))
                   AS n_tokens
        FROM s
    ),
    bad AS (
        SELECT fp FROM c GROUP BY fp
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    mk AS (
        SELECT doc_id, n_tokens,
               CASE WHEN fp IN (SELECT fp FROM bad) THEN 1 ELSE 0 END
                   AS rm
        FROM c
    ),
    doc AS (
        SELECT doc_id, COUNT(*) AS n_chunks, SUM(rm) AS n_rem,
               SUM(CASE WHEN rm = 0 THEN n_tokens ELSE 0 END)
                   AS kept_toks
        FROM mk GROUP BY doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(doc.n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(doc.n_rem) AS BIGINT) AS n_removed,
           ROUND(SUM(doc.n_rem) / CAST(SUM(doc.n_chunks) AS DOUBLE), 6)
               AS removed_frac,
           CAST(SUM(doc.kept_toks) AS BIGINT) AS kept_tokens
    FROM doc JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
"""

# t57: t05's replayed pair set -> the same recursive min-label CC as
# t52 -> component-size histogram.
ORACLE["t57_dup_cluster_profile"] = f"""
    WITH RECURSIVE p AS ({_t05_oracle()}),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM p
        UNION
        SELECT b_id, a_id FROM p
    ),
    reach(n, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT reach.n, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT n, MIN(r) AS comp FROM reach GROUP BY n),
    sizes AS (
        SELECT comp, COUNT(*) AS cluster_size FROM comp GROUP BY comp
    )
    SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT)
               AS n_duplicates
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""

# t58: the t52 drop-set replay + per-source exact token-mean ratios.
ORACLE["t58_dedup_bias_audit"] = f"""
    WITH RECURSIVE p AS ({_t05_oracle()}),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM p
        UNION
        SELECT b_id, a_id FROM p
    ),
    reach(n, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT reach.n, e.v FROM reach JOIN edges e ON reach.r = e.u
    ),
    comp AS (SELECT n, MIN(r) AS comp FROM reach GROUP BY n),
    dropids AS (SELECT n AS doc_id FROM comp WHERE n <> comp),
    b AS (
        SELECT source, COUNT(*) AS n_before,
               ROUND(AVG(len(string_split(text, ' '))), 6)
                   AS avg_tok_before
        FROM documents GROUP BY source
    ),
    a AS (
        SELECT d.source, COUNT(*) AS n_after,
               ROUND(AVG(len(string_split(d.text, ' '))), 6)
                   AS avg_tok_after
        FROM documents d LEFT JOIN dropids x ON d.doc_id = x.doc_id
        WHERE x.doc_id IS NULL GROUP BY d.source
    )
    SELECT b.source, b.n_before, b.avg_tok_before,
           a.n_after, a.avg_tok_after
    FROM b JOIN a ON b.source = a.source
    ORDER BY b.source
"""

# t59: the t05 replay WITH the signature-match estimator column,
# un-thresholded, folded to a signed 0.01-bin error histogram.
ORACLE["t59_minhash_estimator_error"] = f"""
    WITH p AS ({_t05_oracle(with_est=True)})
    SELECT CASE WHEN r = 0 THEN 0.0 ELSE r END AS err_bin,
           COUNT(*) AS n_pairs
    FROM (SELECT ROUND(minhash_est - jaccard, 2) AS r FROM p)
    GROUP BY 1 ORDER BY err_bin
"""

# t60: the x82 integer replay with (source) as a leading partition key.
ORACLE["t60_source_length_profile"] = """
    WITH src AS (
        SELECT source AS grp,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS val,
               CAST(doc_id AS VARCHAR) AS kstr
        FROM documents
    ),
    sh AS (
        SELECT grp, val, kstr,
               CAST('0x' || substr(md5(kstr), 1, 4) AS INTEGER) % 8
                   AS shard
        FROM src
    ),
    st AS (
        SELECT grp, shard, val, kstr,
               ROW_NUMBER() OVER (
                   PARTITION BY grp, shard ORDER BY val, kstr) AS rn,
               COUNT(*) OVER (PARTITION BY grp, shard) AS m
        FROM sh
    ),
    st2 AS (SELECT *, (m + 63) // 64 AS stride FROM st),
    kept AS (
        SELECT grp, shard, val, kstr, stride,
               LEAST(stride, m - (rn - 1)) AS wt
        FROM st2 WHERE (rn - 1) % stride = 0
    ),
    tot AS (
        SELECT grp, CAST(SUM(wt) AS BIGINT) AS n,
               COUNT(*) AS summary_rows
        FROM kept GROUP BY grp
    ),
    bnd AS (
        SELECT grp, CAST(SUM(stride - 1) AS BIGINT) AS rank_err_bound
        FROM (SELECT grp, shard, MAX(stride) AS stride
              FROM kept GROUP BY grp, shard)
        GROUP BY grp
    ),
    cum AS (
        SELECT grp, val,
               CAST(SUM(wt) OVER (PARTITION BY grp ORDER BY val, kstr
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
        FROM kept
    ),
    qs AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    SELECT c.grp AS source, q, ROUND(MIN(val), 6) AS est,
           n, summary_rows, rank_err_bound
    FROM cum c
    JOIN tot USING (grp)
    JOIN bnd USING (grp)
    CROSS JOIN qs
    WHERE cumw >= CAST(CEIL(q * n) AS BIGINT)
    GROUP BY c.grp, q, n, summary_rows, rank_err_bound
    ORDER BY source, q
"""

ORACLE["t61_source_vocab_overlap"] = """
    WITH st AS (
        SELECT DISTINCT source, w FROM (
            SELECT source, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        )
    ),
    sizes AS (SELECT source, COUNT(*) AS nv FROM st GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               COUNT(*) AS n_common
        FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, sa.nv AS nv_a, sb.nv AS nv_b,
           i.n_common,
           ROUND(i.n_common
                 / CAST(sa.nv + sb.nv - i.n_common AS DOUBLE), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    ORDER BY i.src_a, i.src_b
"""

# t62: regexp_extract_all under RE2 chunks greedily left-to-right
# exactly like Java's regexp_count; all counts are exact longs and
# the fertility ratios are long/long float divisions both engines.
ORACLE["t62_tokenizer_fertility"] = """
    WITH per AS (
        SELECT lang, source,
               COUNT(*) AS n_docs,
               SUM(LENGTH(text)) AS chars,
               SUM(STRLEN(text)) AS bytes,
               SUM(LEN(STRING_SPLIT(text, ' '))) AS words,
               SUM(LEN(REGEXP_EXTRACT_ALL(
                   text, '[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9 ]')))
                   AS subwords
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(words AS BIGINT) AS words,
           CAST(subwords AS BIGINT) AS subwords,
           ROUND(subwords / words, 6) AS fertility,
           ROUND(bytes / subwords, 6) AS bytes_per_subword,
           ROUND(chars / subwords, 6) AS chars_per_subword
    FROM per ORDER BY lang, source
"""

# t63: per-doc-distinct 8-gram md5s (the t29 gram recipe + DISTINCT),
# gram-keyed MIN(doc_id), exact integer counts, long/long rate.
ORACLE["t63_ngram_novelty"] = """
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT DISTINCT doc_id, source,
               md5(array_to_string(t[s:s+7], ' ')) AS gram
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - 7, 0)))
                 AS r(s)
    ),
    firsts AS (
        SELECT gram, MIN(doc_id) AS first_id FROM grams GROUP BY gram
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS novelty
    FROM grams JOIN firsts USING (gram)
    GROUP BY source ORDER BY source
"""

# t64: t10's md5-bucket split + the t29 gram recipe; test gram set is
# DISTINCT, train probes it with a semi-join; counts exact longs.
ORACLE["t64_split_decontamination"] = """
    WITH d AS (
        SELECT doc_id, source, text,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                     1, 4)) AS INTEGER) % 100) < 10
                   AS is_test
        FROM documents
    ),
    toks AS (SELECT doc_id, is_test, string_split(text, ' ') AS t
             FROM d),
    grams AS (
        SELECT DISTINCT doc_id, is_test,
               md5(array_to_string(t[s:s+7], ' ')) AS gram
        FROM toks,
             UNNEST(generate_series(1, greatest(len(t) - 7, 0)))
                 AS r(s)
    ),
    test_grams AS (
        SELECT DISTINCT gram FROM grams WHERE is_test
    ),
    leaky AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE NOT is_test
          AND gram IN (SELECT gram FROM test_grams)
    ),
    base AS (
        SELECT source,
               CAST(SUM(CASE WHEN is_test THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN is_test THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_test
        FROM d GROUP BY source
    ),
    lk AS (
        SELECT d.source, COUNT(*) AS n_leaky
        FROM d JOIN leaky USING (doc_id)
        GROUP BY d.source
    )
    SELECT base.source, n_train, n_test,
           CAST(COALESCE(n_leaky, 0) AS BIGINT) AS n_leaky,
           ROUND(COALESCE(n_leaky, 0) / n_train, 6) AS leak_rate
    FROM base LEFT JOIN lk ON base.source = lk.source
    ORDER BY base.source
"""


# t65: winner = first row per fingerprint ordered by (prio, id) —
# the windowed replay of the engine's struct-min; ledgers integer-
# exact.
ORACLE["t65_priority_dedup"] = """
    WITH base AS (
        SELECT doc_id AS id, source AS src,
               CAST(SUBSTR(source, 4) AS INTEGER) AS prio,
               n_chars,
               md5(LOWER(text)) AS fp
        FROM documents
    ),
    ranked AS (
        SELECT fp, id, src,
               ROW_NUMBER() OVER (PARTITION BY fp
                                  ORDER BY prio, id) AS rn
        FROM base
    ),
    win AS (
        SELECT fp, id AS w_id, src AS w_src FROM ranked WHERE rn = 1
    ),
    j AS (
        SELECT base.src, base.n_chars,
               CASE WHEN base.id = win.w_id THEN 1 ELSE 0 END AS kept,
               CASE WHEN base.id <> win.w_id
                         AND win.w_src <> base.src
                    THEN 1 ELSE 0 END AS lost_x
        FROM base JOIN win ON base.fp = win.fp
    )
    SELECT src AS source,
           COUNT(*) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(1 - kept) AS BIGINT) AS n_dropped,
           CAST(SUM(lost_x) AS BIGINT) AS n_lost_cross_source,
           CAST(SUM(CASE WHEN kept = 0 THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_dropped
    FROM j
    GROUP BY src
    ORDER BY src
"""


# t66: t05's full MinHash replay feeds the pair set; cosine follows
# the proven v01 cells/norms recipe; deciles FLOOR-pinned.
ORACLE["t66_crossmodal_dedup_audit"] = f"""
    WITH pairs AS ({_t05_oracle()}),
    cells AS (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS k,
               CAST(UNNEST(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, SQRT(SUM(v * v)) AS nrm
        FROM cells GROUP BY vec_id
    ),
    dots AS (
        SELECT p.a_id, p.b_id, p.jaccard, SUM(ca.v * cb.v) AS dot
        FROM pairs p
        JOIN cells ca ON ca.vec_id = p.a_id
        JOIN cells cb ON cb.vec_id = p.b_id AND cb.k = ca.k
        GROUP BY p.a_id, p.b_id, p.jaccard
    ),
    scored AS (
        SELECT d.jaccard,
               ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cos
        FROM dots d
        JOIN norms na ON na.vec_id = d.a_id
        JOIN norms nb ON nb.vec_id = d.b_id
    )
    SELECT LEAST(CAST(FLOOR(jaccard * 10) AS INTEGER), 9)
               AS jacc_decile,
           COUNT(*) AS n_pairs,
           ROUND(AVG(cos), 6) AS avg_cosine,
           ROUND(AVG(CASE WHEN cos >= 0.9 THEN 1.0 ELSE 0.0 END), 6)
               AS frac_cos_high
    FROM scored
    GROUP BY 1 ORDER BY 1
"""


def _t67_config_sql(bands: int) -> str:
    """One banding configuration's aggregate row for the t67 sweep —
    _t05_oracle's replay with a parameterized (bands × rows) split
    and no confirm filter (the sweep scores ALL candidates)."""
    from dislib_spark.text.dedup import _MERSENNE as M, minhash_perms

    rows = 32 // bands
    sig_items = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {M}))"
        for a, b in minhash_perms(32, seed=7)
    )
    band_structs = ",\n                   ".join(
        "{'bi': %d, 'bh': md5(concat_ws(',', %s))}"
        % (
            b,
            ", ".join(
                f"CAST(sig[{b * rows + j + 1}] AS VARCHAR)"
                for j in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
    SELECT CAST({bands} AS INTEGER) AS bands,
           COUNT(*) AS n_candidates,
           CAST(SUM(CASE WHEN jaccard >= 0.3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_confirmed,
           ROUND(SUM(CASE WHEN jaccard >= 0.3 THEN 1.0
                          ELSE 0.0 END) / COUNT(*), 6) AS precision,
           ROUND(AVG(jaccard), 6) AS avg_jaccard
    FROM (
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                   FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct([concat_ws(' ', toks[i], toks[i+1],
                                            toks[i+2])
                                  for i in range(1, len(toks) - 1)])
                       AS sh
            FROM t
        ),
        hashed AS (
            SELECT doc_id, sh,
                   list_transform(sh, s ->
                       CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
                       % {M}) AS hs
            FROM sh WHERE len(sh) > 0
        ),
        sig AS (
            SELECT doc_id, sh,
                   [{sig_items}] AS sig
            FROM hashed
        ),
        banded AS (
            SELECT doc_id, u.bi AS band_idx, u.bh AS band_hash FROM (
                SELECT doc_id,
                       UNNEST([{band_structs}]) AS u
                FROM sig
            )
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        )
        SELECT ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
                     / (len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh)))::DOUBLE,
                     6) AS jaccard
        FROM cand c
        JOIN sig x ON x.doc_id = c.a_id
        JOIN sig y ON y.doc_id = c.b_id
    )
    """


ORACLE["t67_lsh_band_sweep"] = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"({_t67_config_sql(b)})" for b in (4, 8, 16)
    )
    + ") ORDER BY bands"
)


# t68: t05's full replay feeds the pair set; unordered source pair
# via LEAST/GREATEST, counts integer-exact.
ORACLE["t68_cross_source_dups"] = f"""
    WITH pairs AS ({_t05_oracle()})
    SELECT LEAST(sa.source, sb.source) AS source_lo,
           GREATEST(sa.source, sb.source) AS source_hi,
           COUNT(*) AS n_pairs,
           ROUND(AVG(p.jaccard), 6) AS avg_jaccard,
           ROUND(MAX(p.jaccard), 6) AS max_jaccard
    FROM pairs p
    JOIN documents sa ON sa.doc_id = p.a_id
    JOIN documents sb ON sb.doc_id = p.b_id
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


# t69: t07's quality fragment + t23's LM replay, both gates on 6-dp
# rounded scores; kappa algebra mirrored on exact integer cells.
ORACLE["t69_quality_lm_agreement"] = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    toks2 AS (SELECT * FROM toks WHERE w <> ''),
    counts AS (SELECT w, COUNT(*) AS c FROM toks2 GROUP BY w),
    total AS (SELECT SUM(c)::DOUBLE AS n FROM counts),
    per_doc AS (
        SELECT t.doc_id,
               ROUND(AVG(LN(c.c / total.n)), 6) AS lm6
        FROM toks2 t JOIN counts c ON t.w = c.w CROSS JOIN total
        GROUP BY t.doc_id
    ),
    flags AS (
        SELECT d.doc_id,
               CASE WHEN {_QUALITY} >= 0.7 THEN 1 ELSE 0 END AS h,
               CASE WHEN p.lm6 >= -3.402 THEN 1 ELSE 0 END AS l
        FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
    ),
    w AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN h = 1 AND l = 1 THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN h = 1 AND l = 0 THEN 1 ELSE 0 END) AS b,
               SUM(CASE WHEN h = 0 AND l = 1 THEN 1 ELSE 0 END) AS c,
               SUM(CASE WHEN h = 0 AND l = 0 THEN 1 ELSE 0 END) AS d
        FROM flags
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(a AS BIGINT) AS n_both,
           CAST(b AS BIGINT) AS n_heur_only,
           CAST(c AS BIGINT) AS n_lm_only,
           CAST(d AS BIGINT) AS n_neither,
           ROUND(CAST(a + d AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS agreement,
           CASE WHEN (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                      + CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                THEN ROUND((CAST(a + d AS DOUBLE) / CAST(n AS DOUBLE)
                            - (CAST(a + b AS DOUBLE)
                               * CAST(a + c AS DOUBLE)
                               + CAST(c + d AS DOUBLE)
                               * CAST(b + d AS DOUBLE))
                              / (CAST(n AS DOUBLE)
                                 * CAST(n AS DOUBLE)))
                           / (1.0 - (CAST(a + b AS DOUBLE)
                                     * CAST(a + c AS DOUBLE)
                                     + CAST(c + d AS DOUBLE)
                                     * CAST(b + d AS DOUBLE))
                                    / (CAST(n AS DOUBLE)
                                       * CAST(n AS DOUBLE))), 6)
           END AS kappa
    FROM w
"""


def _t70_oracle() -> str:
    """DuckDB replay of t70's stored-index probe — the t05/s13 md5
    recipe with candidates restricted to benchmark (src0) × corpus
    (non-src0), flagged corpus docs folded per source; the parquet
    round-trip of the index is a value no-op."""
    from dislib_spark.text.dedup import _MERSENNE as M, minhash_perms

    sig_items = ",\n               ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {M}))"
        for a, b in minhash_perms(32, seed=7)
    )
    band_structs = ",\n                   ".join(
        "{'bi': %d, 'bh': md5(concat_ws(',', %s))}"
        % (
            b,
            ", ".join(
                f"CAST(sig[{b * 4 + j + 1}] AS VARCHAR)" for j in range(4)
            ),
        )
        for b in range(8)
    )
    return f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    sh AS (
        SELECT doc_id, source,
               list_distinct([concat_ws(' ', toks[i], toks[i+1],
                                        toks[i+2])
                              for i in range(1, len(toks) - 1)]) AS sh
        FROM t
    ),
    hashed AS (
        SELECT doc_id, source, sh,
               list_transform(sh, s ->
                   CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
                   % {M}) AS hs
        FROM sh WHERE len(sh) > 0
    ),
    sig AS (
        SELECT doc_id, source, sh,
               [{sig_items}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, source, u.bi AS band_idx, u.bh AS band_hash
        FROM (
            SELECT doc_id, source,
                   UNNEST([{band_structs}]) AS u
            FROM sig
        )
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS bench_id, b.doc_id AS corpus_id
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
        WHERE a.source = 'src0' AND b.source <> 'src0'
    ),
    flagged AS (
        SELECT DISTINCT c.corpus_id AS doc_id
        FROM cand c
        JOIN sig x ON x.doc_id = c.bench_id
        JOIN sig y ON y.doc_id = c.corpus_id
        WHERE ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (len(x.sh) + len(y.sh)
                       - len(list_intersect(x.sh, y.sh)))::DOUBLE,
                    6) >= 0.3
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           ROUND(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                 ::DOUBLE / COUNT(*), 6) AS contamination_rate
    FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
    WHERE d.source <> 'src0'
    GROUP BY d.source ORDER BY d.source
    """


ORACLE["t70_archive_decontamination"] = _t70_oracle()

# t71: decile bounds/counts and the gate rate are exact integers;
# only the 6-dp-rounded per-doc quality mean depends on summation
# order -> ROUND(,6). NTILE's row-position semantics are replayed
# by the engine's (rank, n) bucket arithmetic exactly.
ORACLE["t71_length_quality_calibration"] = f"""
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS len_lo,
           MAX(n_chars) AS len_hi,
           ROUND(AVG(q), 6) AS avg_quality,
           ROUND(SUM(CASE WHEN q >= 0.7 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS gate_pass_rate
    FROM (
        SELECT n_chars, {_QUALITY} AS q,
               CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id)
                    AS INTEGER) AS decile
        FROM documents
    )
    GROUP BY decile ORDER BY decile
"""

# t72: the t04 inverted-index replay with the containment ratio
# added; both scores are exact integer divisions rounded to 6.
ORACLE["t72_containment_dedup"] = """
    WITH sh AS (
        SELECT doc_id,
               list_distinct([concat_ws(' ', toks[i], toks[i+1],
                                        toks[i+2])
                              for i in range(1, len(toks) - 1)])
                   AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
    ),
    inv AS (
        SELECT doc_id, len(shingles) AS set_size,
               UNNEST(shingles) AS shingle
        FROM sh
    ),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               ANY_VALUE(a.set_size) AS a_size,
               ANY_VALUE(b.set_size) AS b_size,
               COUNT(*) AS n_inter
        FROM inv a JOIN inv b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id, jaccard, containment,
           CAST(CASE WHEN jaccard >= 0.3 THEN 1 ELSE 0 END
                AS INTEGER) AS caught_by_jaccard
    FROM (
        SELECT a_id, b_id,
               ROUND(n_inter::DOUBLE
                     / (a_size + b_size - n_inter)::DOUBLE, 6)
                   AS jaccard,
               ROUND(n_inter::DOUBLE
                     / LEAST(a_size, b_size)::DOUBLE, 6)
                   AS containment
        FROM pairs
    ) WHERE containment >= 0.6
    ORDER BY a_id, b_id
"""

# t73: the shared t14 recursive-closure prefix + member joins; every
# survivorship rule replayed with the same deterministic tiebreaks.
ORACLE["t73_golden_record"] = (
    _CLUSTER_CTE
    + """,
        m AS (
            SELECT c.comp AS component, d.doc_id, d.lang, d.source,
                   d.n_chars
            FROM comp c JOIN documents d ON c.n = d.doc_id
        ),
        base AS (
            SELECT component, COUNT(*) AS n_members,
                   MIN(doc_id) AS keep_id,
                   COUNT(DISTINCT source) AS n_sources
            FROM m GROUP BY component
        ),
        longest AS (
            SELECT component, doc_id AS longest_doc_id,
                   n_chars AS longest_chars
            FROM (
                SELECT component, doc_id, n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY component
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM m
            ) WHERE rn = 1
        ),
        majority AS (
            SELECT component, lang AS majority_lang FROM (
                SELECT component, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY component
                           ORDER BY COUNT(*) DESC, lang
                       ) AS rn
                FROM m GROUP BY component, lang
            ) WHERE rn = 1
        )
        SELECT b.component AS comp_id, b.n_members, b.keep_id,
               l.longest_doc_id, l.longest_chars, j.majority_lang,
               CAST(b.n_sources AS BIGINT) AS n_sources
        FROM base b
        JOIN longest l ON l.component = b.component
        JOIN majority j ON j.component = b.component
        ORDER BY comp_id
    """
)

# t74: the shared t14 recursive closure (Jaccard comp) EXTENDED with a
# second closure over Jaccard ∪ containment edges (both edge sets read
# off the same `pr` pair counts); survivorship rules identical to t73;
# n_jaccard_subclusters counts distinct Jaccard components (members
# with no Jaccard edge are their own) fused per union-component.
ORACLE["t74_containment_golden_record"] = (
    _CLUSTER_CTE
    + """,
        pc AS (
            SELECT a_id, b_id FROM pr
            WHERE ROUND(n_inter::DOUBLE
                        / LEAST(a_size, b_size)::DOUBLE, 6) >= 0.6
        ),
        uedges AS (
            SELECT a_id AS u, b_id AS v FROM p
            UNION
            SELECT b_id, a_id FROM p
            UNION
            SELECT a_id, b_id FROM pc
            UNION
            SELECT b_id, a_id FROM pc
        ),
        ureach(n, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM uedges)
            UNION
            SELECT ureach.n, e.v FROM ureach JOIN uedges e
              ON ureach.r = e.u
        ),
        ucomp AS (SELECT n, MIN(r) AS comp FROM ureach GROUP BY n),
        m AS (
            SELECT uc.comp AS component, d.doc_id, d.lang, d.source,
                   d.n_chars,
                   COALESCE(c.comp, d.doc_id) AS jsub
            FROM ucomp uc
            JOIN documents d ON uc.n = d.doc_id
            LEFT JOIN comp c ON c.n = d.doc_id
        ),
        base AS (
            SELECT component, COUNT(*) AS n_members,
                   MIN(doc_id) AS keep_id,
                   COUNT(DISTINCT source) AS n_sources,
                   COUNT(DISTINCT jsub) AS n_jaccard_subclusters
            FROM m GROUP BY component
        ),
        longest AS (
            SELECT component, doc_id AS longest_doc_id,
                   n_chars AS longest_chars
            FROM (
                SELECT component, doc_id, n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY component
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM m
            ) WHERE rn = 1
        ),
        majority AS (
            SELECT component, lang AS majority_lang FROM (
                SELECT component, lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY component
                           ORDER BY COUNT(*) DESC, lang
                       ) AS rn
                FROM m GROUP BY component, lang
            ) WHERE rn = 1
        )
        SELECT b.component AS comp_id, b.n_members, b.keep_id,
               l.longest_doc_id, l.longest_chars, j.majority_lang,
               CAST(b.n_sources AS BIGINT) AS n_sources,
               CAST(b.n_jaccard_subclusters AS BIGINT)
                   AS n_jaccard_subclusters
        FROM base b
        JOIN longest l ON l.component = b.component
        JOIN majority j ON j.component = b.component
        ORDER BY comp_id
    """
)

# t76: the shared t14 recursive closure evaluated at three thresholds
# (the ≥0.5/≥0.7 pair sets filter the same `pr` counts; one closure
# per threshold); per-threshold aggregates are exact integer counts.
ORACLE["t76_dedup_threshold_curve"] = (
    _CLUSTER_CTE
    + """,
        p5 AS (
            SELECT a_id, b_id FROM pr
            WHERE ROUND(n_inter::DOUBLE
                        / (a_size + b_size - n_inter)::DOUBLE, 6) >= 0.95
        ),
        p7 AS (
            SELECT a_id, b_id FROM pr
            WHERE ROUND(n_inter::DOUBLE
                        / (a_size + b_size - n_inter)::DOUBLE, 6) >= 0.98
        ),
        e5 AS (
            SELECT a_id AS u, b_id AS v FROM p5
            UNION SELECT b_id, a_id FROM p5
        ),
        e7 AS (
            SELECT a_id AS u, b_id AS v FROM p7
            UNION SELECT b_id, a_id FROM p7
        ),
        reach5(n, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e5)
            UNION
            SELECT reach5.n, e.v FROM reach5 JOIN e5 e ON reach5.r = e.u
        ),
        comp5 AS (SELECT n, MIN(r) AS comp FROM reach5 GROUP BY n),
        reach7(n, r) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM e7)
            UNION
            SELECT reach7.n, e.v FROM reach7 JOIN e7 e ON reach7.r = e.u
        ),
        comp7 AS (SELECT n, MIN(r) AS comp FROM reach7 GROUP BY n),
        s3 AS (SELECT comp, COUNT(*) AS sz FROM comp GROUP BY comp),
        s5 AS (SELECT comp, COUNT(*) AS sz FROM comp5 GROUP BY comp),
        s7 AS (SELECT comp, COUNT(*) AS sz FROM comp7 GROUP BY comp)
        SELECT * FROM (
            SELECT CAST(0.3 AS DOUBLE) AS threshold,
                   CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_edges,
                   CAST(COALESCE(COUNT(*), 0) AS BIGINT)
                       AS n_components,
                   CAST(COALESCE(SUM(sz), 0) AS BIGINT)
                       AS n_clustered_docs,
                   CAST(COALESCE(MAX(sz), 0) AS BIGINT)
                       AS largest_component
            FROM s3
            UNION ALL
            SELECT CAST(0.95 AS DOUBLE),
                   CAST((SELECT COUNT(*) FROM p5) AS BIGINT),
                   CAST(COALESCE(COUNT(*), 0) AS BIGINT),
                   CAST(COALESCE(SUM(sz), 0) AS BIGINT),
                   CAST(COALESCE(MAX(sz), 0) AS BIGINT)
            FROM s5
            UNION ALL
            SELECT CAST(0.98 AS DOUBLE),
                   CAST((SELECT COUNT(*) FROM p7) AS BIGINT),
                   CAST(COALESCE(COUNT(*), 0) AS BIGINT),
                   CAST(COALESCE(SUM(sz), 0) AS BIGINT),
                   CAST(COALESCE(MAX(sz), 0) AS BIGINT)
            FROM s7
        ) ORDER BY threshold
    """
)

# t75: the full t05 chain (8×4 candidates + exact verify) graded
# against the t04-style exhaustive inverted-index truth, per true-
# Jaccard decile, alongside a second 4×8 banding of the SAME 32-hash
# signature (its band keys assembled the same way); counts are exact
# integers, recalls /n divisions.
def _t75_oracle() -> str:
    band4 = ",\n                   ".join(
        "{'bi': %d, 'bh': md5(concat_ws(',', %s))}"
        % (
            b,
            ", ".join(
                f"CAST(sig[{b * 8 + j + 1}] AS VARCHAR)" for j in range(8)
            ),
        )
        for b in range(4)
    )
    return _t05_oracle(
        tail_sql=f"""
    , banded4 AS (
        SELECT doc_id, u.bi AS band_idx, u.bh AS band_hash FROM (
            SELECT doc_id,
                   UNNEST([{band4}]) AS u
            FROM sig
        )
    ),
    cand4 AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM banded4 a JOIN banded4 b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    caught4 AS (
        SELECT c.a_id, c.b_id
        FROM cand4 c
        JOIN sig x ON x.doc_id = c.a_id
        JOIN sig y ON y.doc_id = c.b_id
        WHERE ROUND(len(list_intersect(x.sh, y.sh))::DOUBLE
                    / (len(x.sh) + len(y.sh)
                       - len(list_intersect(x.sh, y.sh)))::DOUBLE,
                    6) >= 0.3
    ),
    inv AS (
        SELECT doc_id, len(sh) AS set_size, UNNEST(sh) AS shingle
        FROM sh
    ),
    truth AS (
        SELECT a_id, b_id, jaccard FROM (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   ROUND(COUNT(*)::DOUBLE
                         / (ANY_VALUE(a.set_size) + ANY_VALUE(b.set_size)
                            - COUNT(*))::DOUBLE, 6) AS jaccard
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) WHERE jaccard >= 0.3
    ),
    caught AS (
        SELECT a_id, b_id FROM scored WHERE jaccard >= 0.3
    ),
    binned AS (
        SELECT CAST(FLOOR(t.jaccard * 10) AS INT) AS jacc_decile,
               CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
               CAST(SUM(CASE WHEN c.a_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_caught_8x4,
               CAST(SUM(CASE WHEN c4.a_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_caught_4x8
        FROM truth t
        LEFT JOIN caught c ON t.a_id = c.a_id AND t.b_id = c.b_id
        LEFT JOIN caught4 c4 ON t.a_id = c4.a_id AND t.b_id = c4.b_id
        GROUP BY 1
    )
    SELECT jacc_decile, n_true_pairs,
           n_caught_8x4,
           ROUND(n_caught_8x4::DOUBLE / n_true_pairs, 6) AS recall_8x4,
           n_caught_4x8,
           ROUND(n_caught_4x8::DOUBLE / n_true_pairs, 6) AS recall_4x8
    FROM binned ORDER BY jacc_decile
    """
    )


ORACLE["t75_minhash_recall"] = _t75_oracle()

# t77/t78: the t72 inverted-index chain with sizes kept, edges
# oriented by strict size inequality (smaller set = contained side;
# equal-size pairs are direction-less symmetric dups, excluded),
# then folded to the source matrix / per-doc degrees.
_T77_DIRECTED_CTE = """
    WITH sh AS (
        SELECT doc_id,
               list_distinct([concat_ws(' ', toks[i], toks[i+1],
                                        toks[i+2])
                              for i in range(1, len(toks) - 1)])
                   AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents)
    ),
    inv AS (
        SELECT doc_id, len(shingles) AS set_size,
               UNNEST(shingles) AS shingle
        FROM sh
    ),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               ANY_VALUE(a.set_size) AS a_size,
               ANY_VALUE(b.set_size) AS b_size,
               COUNT(*) AS n_inter
        FROM inv a JOIN inv b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
        SELECT a_id, b_id, a_size, b_size,
               ROUND(n_inter::DOUBLE
                     / (a_size + b_size - n_inter)::DOUBLE, 6)
                   AS jaccard,
               ROUND(n_inter::DOUBLE
                     / LEAST(a_size, b_size)::DOUBLE, 6)
                   AS containment
        FROM pairs
    ),
    directed AS (
        SELECT CASE WHEN a_size > b_size THEN a_id ELSE b_id END
                   AS container_id,
               CASE WHEN a_size > b_size THEN b_id ELSE a_id END
                   AS contained_id,
               containment,
               CASE WHEN jaccard >= 0.3 THEN 1 ELSE 0 END
                   AS caught_by_jaccard
        FROM scored
        WHERE containment >= 0.6 AND a_size <> b_size
    )"""

ORACLE["t77_containment_direction"] = (
    _T77_DIRECTED_CTE
    + """
    SELECT dc.source AS container_source,
           dd.source AS contained_source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN e.caught_by_jaccard = 0 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_jaccard_blind,
           ROUND(AVG(e.containment), 6) AS avg_containment,
           CAST(COUNT(DISTINCT e.contained_id) AS BIGINT)
               AS n_contained_docs
    FROM directed e
    JOIN documents dc ON dc.doc_id = e.container_id
    JOIN documents dd ON dd.doc_id = e.contained_id
    GROUP BY dc.source, dd.source
    ORDER BY container_source, contained_source
"""
)

ORACLE["t78_quote_hubs"] = (
    _T77_DIRECTED_CTE
    + """,
    od AS (
        SELECT container_id AS doc_id, COUNT(*) AS n_contains
        FROM directed GROUP BY container_id
    ),
    idg AS (
        SELECT contained_id AS doc_id, COUNT(*) AS n_contained_in
        FROM directed GROUP BY contained_id
    ),
    deg AS (
        SELECT COALESCE(od.doc_id, idg.doc_id) AS doc_id,
               COALESCE(od.n_contains, 0) AS n_contains,
               COALESCE(idg.n_contained_in, 0) AS n_contained_in
        FROM od FULL OUTER JOIN idg ON od.doc_id = idg.doc_id
    )
    SELECT deg.doc_id, d.source,
           CAST(d.n_chars AS BIGINT) AS n_chars,
           CAST(deg.n_contains AS BIGINT) AS n_contains,
           CAST(deg.n_contained_in AS BIGINT) AS n_contained_in,
           CAST(deg.n_contains + deg.n_contained_in AS BIGINT)
               AS degree
    FROM deg JOIN documents d ON d.doc_id = deg.doc_id
    ORDER BY degree DESC, deg.doc_id
    LIMIT 20
"""
)

# t79: the shared directed CTE self-joined edge-on-edge; sizes
# strictly decrease along an edge so chains are acyclic.
ORACLE["t79_containment_chains"] = (
    _T77_DIRECTED_CTE
    + """
    SELECT e1.container_id AS top_id,
           e1.contained_id AS mid_id,
           e2.contained_id AS bottom_id,
           e1.containment AS c_top_mid,
           e2.containment AS c_mid_bottom,
           CAST(CASE WHEN d.container_id IS NOT NULL THEN 1 ELSE 0
                END AS INTEGER) AS has_direct_edge
    FROM directed e1
    JOIN directed e2 ON e2.container_id = e1.contained_id
    LEFT JOIN directed d
      ON d.container_id = e1.container_id
     AND d.contained_id = e2.contained_id
    ORDER BY top_id, mid_id, bottom_id
    LIMIT 20
"""
)
