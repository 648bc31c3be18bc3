"""Exact duplicated-substring span detection.

The substring-level complement to the document-level dedup family
(text/dedup.py): find the *maximal token spans* that occur verbatim
in more than one document — the "exact substring deduplication"
operation used on LLM training corpora (suffix-array dedup à la
"Deduplicating Training Data Makes Language Models Better"),
re-expressed relationally so it distributes:

1. per-doc word ``k``-grams with positions — a narrow map
   (``sequence``/``transform``/``posexplode``), no shuffle;
2. grams occurring in ≥2 distinct docs — one hash aggregation on the
   gram key (the only corpus-wide shuffle; md5-keyed so the shuffle
   rows are fixed-width, not text-width);
3. a semi-join back to (doc, pos) hits;
4. adjacent hit positions merged into maximal spans with the
   gaps-and-islands trick (``pos - row_number()`` is constant within
   a run) — a per-doc window, partitioned by doc_id.

A true suffix array finds duplicated substrings of ANY length ≥ L
in O(n log n) total; k-gram blocking finds exactly those of length
≥ k tokens (a span of m ≥ k duplicated tokens is m-k+1 overlapping
duplicated k-grams, which merge back into the maximal span in step
4) — same answer for the "≥ threshold" policy every pipeline
actually ships, and every step is a standard distributed primitive.

Scale: the gram table is ~tokens×1 rows of (md5, id, pos); the
groupBy is map-side combinable; boilerplate grams (hot keys) cap at
doc-count cardinality and AQE splits skewed reducers. No driver
materialization anywhere.

Reference: no counterpart in bsc-wdc/dislib (north-star surface,
SURVEY.md §2.12 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dislib_spark.utils.base import fan_out


def duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal cross-document duplicated spans of ≥ ``k`` tokens.

    Returns (id_col, span_start, span_end) with 1-based inclusive
    token positions; a row means ``tokens[span_start..span_end]`` of
    that document also appears verbatim somewhere in another document
    (every k-window of the span does, which for the ≥k policy is the
    same statement).
    """
    toks = F.split(F.col(text_col), " ")
    # ANSI gotcha: sequence(1, n) with n < 1 is DESCENDING, not empty.
    starts = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = fan_out(docs).select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.md5(F.concat_ws(" ", F.slice(toks, s, k))),
            )
        ).alias("off", "gram"),
    ).select("id", (F.col("off") + 1).alias("pos"), "gram")
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("df"))
        .where(F.col("df") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    return (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            F.col("span_end").cast("int").alias("span_end"),
        )
    )


def span_stats(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-substring summary: (id, n_spans,
    dup_tokens, max_span) over :func:`duplicated_spans` — the
    "fraction of this doc that is boilerplate" curation signal."""
    spans = duplicated_spans(docs, k=k, id_col=id_col, text_col=text_col)
    length = F.col("span_end") - F.col("span_start") + 1
    return spans.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_spans"),
        F.sum(length).cast("int").alias("dup_tokens"),
        F.max(length).cast("int").alias("max_span"),
    )
