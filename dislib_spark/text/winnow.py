"""Rolling-hash document fingerprinting (winnowing).

The Schleimer/Wilkerson/Aiken winnowing scheme (SIGMOD 2003, public):
hash every character k-gram, slide a window of w consecutive gram
hashes, keep the minimum per window; the distinct kept hashes are the
document's fingerprint set. Guarantees: any shared substring of
length >= k + w - 1 between two documents yields at least one shared
fingerprint, so fingerprint overlap is a plagiarism/near-dup signal
with bounded density (~2/(w+1) of grams kept).

N/A in the reference (no text layer); part of this engine's
training-pipeline surface (SURVEY.md north-star ops).

Scale design: per-row JVM expressions only — gram hashing is one
``transform`` over positions, window minima one ``transform`` +
``slice``/``array_min``; O(n·k + n·w) per doc, zero shuffle, no
Python. Hashes are md5 hex strings (identical across engines, so the
DuckDB oracle replays them exactly); the window minimum is the
lexicographic string min.

Every intermediate is projected to a NAMED column before a
higher-order function touches it — Catalyst performs no CSE inside
lambda bodies, so inline expressions would be re-evaluated per
element (see text/dedup.py, measured blowups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dislib_spark.text.analysis import normalize_text
from dislib_spark.utils.base import fan_out


def gram_hashes(norm: Column, k: int = 8, hash_fn: str = "md5") -> Column:
    """Hash of every char ``k``-gram of an ALREADY-NORMALIZED named
    text column. Empty array when the text is shorter than ``k``.

    ``hash_fn='md5'`` (default) is cross-engine replayable — the
    DuckDB oracle recomputes identical fingerprints. ``'xxhash64'``
    yields 8-byte fingerprints instead of 32-char hex (4x less
    checkpoint/shuffle volume downstream — the cost driver at corpus
    scale is materializing the gram arrays, not the hash itself;
    measured equal hash-stage time at 500k docs). Same winnowing
    semantics either way."""
    n_grams = F.length(norm) - F.lit(k - 1)
    if hash_fn == "md5":
        one = lambda i: F.md5(norm.substr(i, F.lit(k)))  # noqa: E731
    elif hash_fn == "xxhash64":
        one = lambda i: F.xxhash64(  # noqa: E731
            norm.substr(i, F.lit(k))
        ).cast("string")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return F.when(
        n_grams >= 1,
        F.transform(F.sequence(F.lit(1), n_grams), one),
    ).otherwise(F.array().cast("array<string>"))


def winnow_select(grams: Column, w: int = 4) -> Column:
    """Distinct window-minimum hashes of a MATERIALIZED gram-hash
    array column: one window per start position (a doc with fewer
    than ``w`` grams contributes its single overall min).

    The per-window min is ``least`` over ``w`` direct element
    accesses — 2x faster than ``array_min(slice(...))``, which
    allocates a w-element array per window (measured at sf0.1)."""
    return (
        F.when(
            F.size(grams) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(grams) - F.lit(w - 1)),
                    lambda j: F.least(*[grams[j + i - 1] for i in range(w)]),
                )
            ),
        )
        .when(F.size(grams) >= 1, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<string>"))
    )


def with_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    out_col: str = "fingerprints",
    hash_fn: str = "md5",
) -> DataFrame:
    """Add a winnowed fingerprint-set column (array<string> of md5
    hex).

    The gram-hash array is pinned with a localCheckpoint barrier
    before the window pass: ``_grams`` is referenced exactly once, so
    CollapseProject would otherwise inline the whole md5-transform
    into the window lambda, re-evaluating the full gram array per
    window — O(n²) md5 calls per document (observed as a hang).
    eager=False: materializes inside the caller's first action."""
    staged = (
        fan_out(df)
        .withColumn("_norm", normalize_text(F.col(text_col)))
        .withColumn("_grams", gram_hashes(F.col("_norm"), k, hash_fn))
        .drop("_norm")
        .localCheckpoint(eager=False)
    )
    return staged.withColumn(
        out_col, winnow_select(F.col("_grams"), w)
    ).drop("_grams")


def fingerprint_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints
    (the classic MOSS-style match report). Inverted-index bucket join
    on the fingerprint hash — identical shuffle architecture to
    ``text.dedup.jaccard_pairs``: pairs are enumerated inside each
    fingerprint's bucket, never via a corpus self-join.
    """
    fp = with_fingerprints(df, text_col, k, w).select(
        F.col(id_col).alias("id"), F.explode("fingerprints").alias("fp")
    )
    buckets = fp.groupBy("fp").agg(F.collect_list("id").alias("ids"))
    pair_col = F.filter(
        F.flatten(
            F.transform(
                F.col("ids"),
                lambda x: F.transform(
                    F.col("ids"), lambda y: F.struct(x.alias("a"), y.alias("b"))
                ),
            )
        ),
        lambda p: p["a"] < p["b"],
    )
    return (
        buckets.select(F.explode(pair_col).alias("p"))
        .groupBy(F.col("p.a").alias("a_id"), F.col("p.b").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
