"""SQL-registrable Python table functions (real UDTFs).

Spark 4's ``@udtf`` gives the 1→N expansion shape
(``multimodal.frame_sample`` does it via mapInPandas) a first-class
SQL surface: registered once, the function is callable from any
``spark.sql`` query with LATERAL joins, so pure-SQL users get the
engine's text expansion operators too.

UDTFs run row-at-a-time in a Python worker — the SLOW path by this
repo's own rules — so these are interface adapters for SQL
ergonomics, not hot-path operators: every one of them has a
vectorized/JVM equivalent in the library (noted per function), and
the parity tests assert the UDTF output matches that fast path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Overlapping token-window chunker as a SQL table function —
    the ``text.chunking.chunk_documents`` kernel (RAG chunking) in
    LATERAL-join form. JVM fast path: ``text.chunking``."""

    def eval(self, text: str, size: int, overlap: int):  # noqa: D102
        if text is None or size <= 0 or overlap >= size:
            return
        toks = text.split()
        step = size - overlap
        i = 0
        idx = 0
        while i < len(toks):
            window = toks[i : i + size]
            yield idx, " ".join(window), len(window)
            if i + size >= len(toks):
                break
            i += step
            idx += 1


@udtf(returnType="ngram string")
class WordNgrams:
    """Word n-grams of a string (dedup/contamination shingles) in
    LATERAL form. JVM fast path: the ``transform(sequence(...))``
    shingle expression in ``text.dedup``."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n <= 0:
            return
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]),)


def register_udtfs(spark: SparkSession) -> None:
    """Register every UDTF for SQL use: ``chunk_text(text, size,
    overlap)`` and ``word_ngrams(text, n)``."""
    spark.udtf.register("chunk_text", ChunkText)
    spark.udtf.register("word_ngrams", WordNgrams)
