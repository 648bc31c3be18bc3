"""Benchmark-contamination detection: flag corpus documents sharing
word n-grams with a benchmark/eval set.

The standard decontamination step in LLM training-data pipelines
(e.g. GPT-3 appendix C / Dolma: 8-13 word n-gram overlap). N/A in the
reference (dislib has no text layer); part of this engine's
training-pipeline surface.

Scale design (100 TB corpus, benchmark ≪ corpus):
- grams are keyed by md5 (128-bit → collision-free in practice,
  deterministic across engines) so the shuffle carries 32-byte keys
  instead of arbitrarily long gram strings;
- the benchmark gram set is distinct-ed BEFORE the join — for a real
  benchmark (thousands of docs) it lands under the broadcast
  threshold and Catalyst/AQE plans a broadcast semi-join, so the
  corpus is never shuffled;
- the corpus side explodes to (doc_id, gram_key) pairs — linear in
  corpus token count, no per-doc state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def word_ngrams(text: Column, n: int = 8) -> Column:
    """All ``n``-word grams of single-space-tokenized ``text`` (empty
    array when the doc has fewer than ``n`` words — guards the
    Spark ``sequence(1, 0)`` descending trap)."""
    w = F.split(text, " ", -1)
    k = F.size(w) - F.lit(n - 1)
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus doc: how many of its distinct ``n``-grams appear
    anywhere in ``benchmark``. Returns (id_col, n_grams, n_shared,
    share_ratio) for contaminated docs only (n_shared > 0).

    Join keys are ``md5(gram)`` — cross-engine deterministic and
    fixed-width; the benchmark side is distinct-ed first so it
    broadcasts when small.
    """
    grams = F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    c = (
        fan_out(corpus).select(F.col(id_col), grams)
        .select(id_col, F.md5(F.col("gram")).alias("gk"))
        .distinct()
    )
    b = (
        benchmark.select(grams)
        .select(F.md5(F.col("gram")).alias("gk"))
        .distinct()
    )
    totals = c.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        c.join(b, "gk", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        totals.join(shared, id_col)
        .select(
            id_col,
            "n_grams",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_grams"), 6).alias(
                "share_ratio"
            ),
        )
    )
