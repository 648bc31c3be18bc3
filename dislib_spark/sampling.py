"""Deterministic hash-based sampling and splitting for training-data
pipelines.

Unlike ``DataFrame.sample`` (seeded per-partition RNG → resample on
repartition), these key every decision on a content hash of a stable
id, so the SAME rows are selected on any cluster layout, any engine,
any rerun — the property a 100 TB pipeline needs for reproducible
train/val splits and quota sampling. N/A in the reference.

The bucket hash is ``md5`` (first 4 hex chars → 0..65535 → mod
``buckets``): byte-identical in Spark, DuckDB, Python — so sampling
decisions can be audited off-cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket 0..buckets-1 from md5 of the key's string form.
    Pure JVM (md5 + conv), engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(k), 1, 4) AS INTEGER) % buckets``)."""
    hx = F.substring(F.md5(key.cast("string")), 1, 4)
    return (F.conv(hx, 16, 10).cast("int") % buckets).alias("bucket")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    buckets: int = 100,
) -> DataFrame:
    """Keep a per-stratum fraction of rows, deterministically.

    ``rates`` maps stratum value → fraction in [0, 1]; a row is kept
    iff ``hash_bucket(key) < rate * buckets``. One scan, no shuffle,
    filter-pushdown friendly. This is how pipelines rebalance e.g.
    per-language quotas over web-scale corpora."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(
            F.col(strata_col) == value, F.lit(float(r))
        ).otherwise(rate)
    b = hash_bucket(F.col(key_col), buckets)
    # round before the int cast: 0.29 * 100 is 28.999999… in floating
    # point and a bare cast would truncate to 28
    return df.where(b < F.round(rate * buckets).cast("int"))


def weighted_mix(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    buckets: int = 100,
) -> DataFrame:
    """Epoch-style domain mixing: replicate/drop rows so each stratum
    appears with its target weight (e.g. upsample code 2×, downsample
    web 0.5×). A row with weight ``w`` is emitted ``floor(w)`` times,
    plus once more iff ``hash_bucket(key) < frac(w) * buckets`` — so
    expected multiplicity is exactly ``w`` and the decision is
    deterministic per row (same mix on every rerun / engine).

    Output adds ``copy_idx`` (1..n_copies). Scale: a narrow
    ``explode(sequence(...))`` — no shuffle, no RNG state; row
    expansion is the only cost, which is the point of the operator."""
    w_expr = F.lit(float(default_weight))
    for value, w in sorted(weights.items()):
        w_expr = F.when(
            F.col(strata_col) == value, F.lit(float(w))
        ).otherwise(w_expr)
    whole = F.floor(w_expr).cast("int")
    frac_keep = (
        hash_bucket(F.col(key_col), buckets)
        < F.round((w_expr - whole) * buckets).cast("int")
    ).cast("int")
    n_copies = (whole + frac_keep).alias("n_copies")
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — guard
    return (
        df.withColumn("_n", n_copies)
        .where(F.col("_n") >= 1)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(1), F.col("_n"))),
        )
        .drop("_n")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: list[float],
    buckets: int = 100,
) -> list[DataFrame]:
    """Deterministic disjoint splits (e.g. train/val/test 0.8/0.1/0.1)
    by hash bucket range — stable across reruns and repartitioning,
    unlike ``randomSplit``. Returns one DataFrame per weight."""
    total = sum(weights)
    b = hash_bucket(F.col(key_col), buckets)
    out, lo = [], 0.0
    for w in weights:
        hi = lo + (w / total) * buckets
        out.append(
            df.where((b >= int(round(lo))) & (b < int(round(hi))))
        )
        lo = hi
    return out


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
) -> DataFrame:
    """Per-stratum keep-rates from temperature sampling (the
    mC4/XLM-R language-balancing rule): sampling mass p_s ∝ n_s^alpha,
    so rare strata are boosted and head strata suppressed as alpha→0.

    Returns (stratum, n, rate): ``rate = min(1, target·p_s / n_s)``
    with ``target`` defaulting to the corpus size (pure re-balance,
    no shrink). ONE grouped count over the corpus; the normalization
    runs on the |strata|-sized table (1-row total broadcast).

    Unlike :func:`stratified_hash_sample`'s literal dict (a CASE
    chain — fine for a handful of strata), the returned DataFrame is
    meant for :func:`sample_by_rates`'s broadcast JOIN, which is the
    scale form when strata count is large (domains, languages×source
    pairs)."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    mass = counts.select(
        "stratum",
        "n",
        F.pow(F.col("n").cast("double"), float(alpha)).alias("m"),
    )
    tot = mass.agg(
        F.sum("m").alias("tm"), F.sum("n").alias("tn")
    )
    target = (
        F.lit(float(target_total))
        if target_total is not None
        else F.col("tn").cast("double")
    )
    return (
        mass.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n",
            F.least(
                F.lit(1.0),
                target
                * (F.col("m") / F.col("tm"))
                / F.col("n").cast("double"),
            ).alias("rate"),
        )
    )


def sample_by_rates(
    df: DataFrame,
    rates: DataFrame,
    strata_col: str,
    key_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic per-stratum hash sampling with rates supplied as
    a (stratum, rate) DataFrame — broadcast-joined onto the scan, so
    any strata cardinality works (no CASE-chain ceiling). Keep rule
    is identical to :func:`stratified_hash_sample`:
    ``hash_bucket(key) < round(rate·buckets)``."""
    r = rates.select(
        F.col("stratum").alias(strata_col), "rate"
    )
    b = hash_bucket(F.col(key_col), buckets)
    return (
        df.join(F.broadcast(r), strata_col, "left")
        .where(
            b
            < F.round(F.coalesce(F.col("rate"), F.lit(0.0)) * buckets).cast(
                "int"
            )
        )
        .drop("rate")
    )


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    by: str | None = None,
    key_decimals: int = 12,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row gets the key
    ``ln(u) / w`` with ``u`` a stable md5-derived uniform of
    ``key_col`` and ``w`` its positive weight; the top-``k`` rows by
    key (optionally per ``by`` group) are EXACTLY a weighted sample
    without replacement. The quality-weighted subset selection every
    curation pipeline runs ("keep the best 5 docs per source,
    weighted by score"), with none of the non-determinism of
    ``rand()``: same corpus → same sample on any engine, any
    partitioning, any rerun.

    The key is rounded to ``key_decimals`` (1e-12 resolution, ~7
    orders above double-ulp noise from cross-engine ``ln``) and ties
    break on ``key_col``, so the selected set is bit-stable. Adds
    ``es_key`` (rounded) and ``rank``.

    Rows with ``weight <= 0`` are DROPPED before keying (documented
    A-ES precondition): w=0 would yield a -inf/null key and a
    NEGATIVE weight flips ln(u)/w positive, sorting ABOVE every valid
    row and silently corrupting the sample.

    Scale: one scan; the top-k is a per-group window (hash shuffle on
    ``by``) or, ungrouped, ``orderBy().limit(k)`` — TakeOrdered, no
    global window."""
    from pyspark.sql.window import Window

    df = df.where(F.col(weight_col) > 0)

    # u in (0, 1]: 8 md5 hex chars → (v+1) / 2^32
    u = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    key = F.round(F.log(u) / F.col(weight_col), key_decimals)
    staged = df.withColumn("es_key", key)
    if by is None:
        return (
            staged.orderBy(F.desc("es_key"), key_col)
            .limit(k)
            .withColumn("rank", F.lit(None).cast("int"))
        )
    w = Window.partitionBy(by).orderBy(F.desc("es_key"), key_col)
    return (
        staged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
