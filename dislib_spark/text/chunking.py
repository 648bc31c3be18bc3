"""Document chunking + edit-distance fuzzy dedup.

Two more curation/RAG-pipeline operators, both pure JVM expressions:

- :func:`chunk_documents` — overlapping token-window chunking (the
  standard RAG / context-window packing shape: chunks of
  ``chunk_tokens`` tokens advancing by ``chunk_tokens - overlap``).
  Emits one row per chunk with an md5 content fingerprint, so
  downstream dedup/indexing can treat chunks as first-class docs.
  Per-row ``sequence``/``slice``/``transform`` + ``posexplode`` —
  a narrow map, no shuffle; output size = Σ ceil(doc_len/step).
- :func:`fuzzy_pairs` — near-duplicate pairs by *edit distance* on a
  document prefix, candidate-bounded by an md5 bucket of the first
  ``bucket_tokens`` tokens. Levenshtein is O(prefix²) per pair, so
  the bucket join (not an all-pairs join) and the bounded prefix are
  both load-bearing at scale; ``F.levenshtein`` exists in both Spark
  and DuckDB with identical semantics → fully oracle-checkable
  (unlike the hash-based MinHash/SimHash paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, chunk_id, chunk, n_tokens, fp) — 1-based chunk ids in
    document order; the last chunk may be short (slice caps at the
    end of the token list)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    # starts: 1, 1+step, ... up to len-overlap (inclusive — matches
    # the oracle's end-exclusive range(1, greatest(n-o,1)+1, step))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - overlap, F.lit(1)),
        F.lit(step),
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens)),
    )
    return (
        fan_out(docs)
        .select(F.col(id_col), F.posexplode(chunks).alias("pos", "chunk"))
        .select(
            id_col,
            (F.col("pos") + 1).alias("chunk_id"),
            "chunk",
            F.size(F.split(F.col("chunk"), " ")).alias("n_tokens"),
            F.md5(F.col("chunk")).alias("fp"),
        )
    )


def fuzzy_pairs(
    docs: DataFrame,
    prefix_len: int = 80,
    bucket_tokens: int = 2,
    max_dist: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a_id, b_id, dist) with a_id < b_id: pairs whose ``prefix_len``
    character prefixes are within ``max_dist`` edits, candidates
    limited to docs sharing the md5 of their first ``bucket_tokens``
    tokens. Recall bound is explicit: pairs differing inside the
    bucket key are missed — raise ``bucket_tokens`` recall via
    multiple keys (MinHash-band style) if needed."""
    d = fan_out(docs).select(
        F.col(id_col).alias("a_id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("a_pfx"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.split(F.col(text_col), " "), 1, bucket_tokens)
            )
        ).alias("bk"),
    )
    rhs = d.select(
        F.col("a_id").alias("b_id"),
        F.col("a_pfx").alias("b_pfx"),
        "bk",
    )
    return (
        d.join(rhs, "bk")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.levenshtein(F.col("a_pfx"), F.col("b_pfx")).alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Search-index export: (term, df, postings) with doc-sorted
    posting arrays — the build step for retrieval over the corpus
    (contamination checks, quality audits, eval lookups).

    One explode + distinct + groupBy: the shuffle key is the term,
    so stopword postings are the skew/size risk at 100 TB — filter
    by ``min_df``/max-df or cap posting arrays with ``slice`` for a
    bounded index; AQE skew-split handles the groupBy itself."""
    td = (
        fan_out(docs)
        .select(
            F.col(id_col).alias("did"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    return (
        td.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(F.collect_list("did")).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )
