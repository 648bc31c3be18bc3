"""TF-IDF and BM25 relevance scoring over a document corpus —
retrieval-style quality/curation signals for training-data pipelines
(e.g. scoring documents against a target-domain query set). N/A in
the reference (no text layer).

Scale design:
- term frequencies: one explode + one shuffle on (doc, term) with
  map-side combine;
- document frequencies: an aggregation OVER the tf table (already
  one row per (doc, term), so df = plain count) producing a
  vocabulary-sized table that broadcasts back onto tf — the corpus
  is shuffled once, never joined corpus×corpus;
- corpus scalars (doc count, avg length) ride along as 1-row
  broadcast joins, not driver collects, so the whole score is one
  lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.text.analysis import tokens
from dislib_spark.utils.base import fan_out


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf) — one row per document-term."""
    return (
        fan_out(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) from a term-frequency table."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    ``tf * (ln((N+1)/(df+1)) + 1)``. Scores are rounded to 6 decimals
    BEFORE ranking with a term tiebreak, so the ranking is identical
    across engines (raw doubles can differ by 1 ulp in ``ln``).

    Scale note: ``dfreq`` is vocab-sized — sublinear in the corpus
    (Heaps' law) but unbounded; the broadcast is sized by the
    tokenizer's vocabulary, and pipelines feeding web-scale corpora
    should apply a ``min_df`` prune (drop df==1 hapaxes, typically
    40-60% of the vocab) or swap the hint for a plain shuffle join —
    the query is hash-identical either way."""
    from pyspark.sql import Window

    tf = term_frequencies(df, text_col, id_col)
    dfreq = doc_frequencies(tf, id_col)
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 score of every document against a bag of query terms.
    Returns (id, bm25) for documents matching ≥1 term. The query set
    is a tiny literal filter pushed into the tf table before any
    join — corpus-side work is proportional to MATCHING doc-terms.
    Here ``dfreq`` is bounded by |query_terms| (built from the
    already-filtered tf), so its broadcast is O(query size), not
    vocab-sized."""
    tf = term_frequencies(df, text_col, id_col).where(
        F.col("term").isin(*query_terms)
    )
    dfreq = doc_frequencies(tf, id_col)
    lens = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )
