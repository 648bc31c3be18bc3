"""Real Python UDTFs (SQL table functions): LATERAL-join usability
and exact parity with the vectorized/JVM fast paths they adapt."""

from __future__ import annotations

from pyspark.sql import functions as F

from dislib_spark.functions import register_udtfs
from dislib_spark.tables import load_table
from dislib_spark.text.chunking import chunk_documents
from dislib_spark.text.contamination import word_ngrams

SF = "/root/testdata/sf0.001"


def test_chunk_text_udtf_matches_fast_path(spark):
    register_udtfs(spark)
    d = load_table(spark, SF, "documents").where(F.col("doc_id") < 20)
    d.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx + 1 AS chunk_id, c.chunk,
               c.n_tokens
        FROM _udtf_docs d, LATERAL chunk_text(d.text, 50, 10) c
        ORDER BY d.doc_id, chunk_id
        """
    ).collect()
    want = (
        chunk_documents(d, chunk_tokens=50, overlap=10)
        .select("doc_id", "chunk_id", "chunk", "n_tokens")
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 20  # expansion actually happened


def test_word_ngrams_udtf_matches_jvm_expression(spark):
    register_udtfs(spark)
    d = load_table(spark, SF, "documents").where(F.col("doc_id") < 10)
    d.createOrReplaceTempView("_udtf_docs2")
    got = spark.sql(
        """
        SELECT d.doc_id, g.ngram
        FROM _udtf_docs2 d, LATERAL word_ngrams(d.text, 5) g
        ORDER BY d.doc_id, g.ngram
        """
    ).collect()
    want = (
        d.select(
            "doc_id", F.explode(word_ngrams(F.col("text"), 5)).alias("ngram")
        )
        .orderBy("doc_id", "ngram")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_chunk_text_udtf_edge_cases(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c', 5, 1)"
    ).collect()
    assert [(r.chunk_idx, r.chunk, r.n_tokens) for r in rows] == [
        (0, "a b c", 3)
    ]
    assert spark.sql("SELECT * FROM chunk_text(NULL, 5, 1)").count() == 0
    assert spark.sql("SELECT * FROM chunk_text('a b', 3, 3)").count() == 0
