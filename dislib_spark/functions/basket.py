"""Market-basket co-occurrence with deterministic basket capping.

The candidate-pair step of frequent-itemset mining (the x42 query).
Extension surface (no reference counterpart — dislib has no
relational layer); the skew lever mirrors ``text.dedup``'s
``max_bucket_size`` / ``max_posting`` caps.

Scale design: ONE shuffle (groupBy basket), pairs exploded from the
per-basket sorted item array inside the aggregation output — never a
self-join (the join form shuffles the exploded lines twice and cannot
cap before the fan-out). Fan-out is Σ basket_size², so a single giant
basket (a wholesale order, a crawler session) is the skew risk: with
``max_basket`` set, each basket keeps its ``max_basket`` smallest
item ids (deterministic sorted-prefix truncation), bounding the
per-basket fan-out at max_basket² regardless of input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None,
) -> DataFrame:
    """One (basket → sorted distinct items) aggregate behind both the
    pair explode and the rule-metric item counts.

    The input is projected to the two key columns and explicitly
    repartitioned on the basket key at the session's parallelism
    (user-numbered → never AQE-coalesced; satisfies the groupBy's
    distribution, so still exactly ONE shuffle): the collect_set and
    the pair explode that follows it are compute-heavy relative to
    their shuffle bytes, and on an under-split scan they otherwise
    serialize on the scan's 1-3 tasks. No-op change at real scale —
    the count derives from the cluster's parallelism."""
    items = F.sort_array(F.collect_set(F.col(item_col)))
    if max_basket is not None:
        items = F.slice(items, 1, max_basket)
    dp = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(basket_col), F.col(item_col))
        .repartition(dp, F.col(basket_col))
        .groupBy(F.col(basket_col))
        .agg(items.alias("items"))
    )


def copurchase_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """(p1, p2, n) for distinct item pairs co-occurring in ≥
    ``min_support`` baskets, p1 < p2. Duplicate (basket, item) lines
    count once (collect_set)."""
    baskets = _baskets(df, basket_col, item_col, max_basket)
    return _pairs_from_baskets(baskets, min_support)


def _pairs_from_baskets(
    baskets: DataFrame, min_support: int
) -> DataFrame:
    """The in-basket pair explode + support count over a prepared
    (basket, items) aggregate."""
    pair_col = F.filter(
        F.flatten(
            F.transform(
                F.col("items"),
                lambda x: F.transform(
                    F.col("items"),
                    lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                ),
            )
        ),
        lambda p: p["p1"] < p["p2"],
    )
    return (
        baskets.select(F.explode(pair_col).alias("p"))
        .select("p.p1", "p.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_support)
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Pairwise association rules over ``copurchase_pairs``'s
    candidate pairs: for each co-occurring pair (p1 < p2) with
    ``n_ab`` joint baskets, attach the per-item basket counts
    ``n_a``/``n_b`` and the classic rule metrics —
    ``conf_ab = n_ab/n_a`` (a⇒b), ``conf_ba = n_ab/n_b`` (b⇒a) and
    the symmetric ``lift = n_ab·N / (n_a·n_b)`` (>1 ⇔ positive
    association). All metrics are exact integer ratios surfaced as
    doubles.

    Scale: the pair kernel is the capped single-shuffle explode
    (see ``copurchase_pairs``); item counts are one groupBy on the
    item key; the two enrichment joins hash-partition on p1/p2 (the
    item-count side is |items|, orders of magnitude under |pairs| —
    Catalyst/AQE broadcasts it when it fits); the basket total
    arrives as a 1-row broadcast, never a driver collect.
    """
    if max_basket is None:
        # ONE basket aggregate (lazily checkpointed — materialized at
        # the query's own first action, then shared) feeds the pair
        # explode, the item counts AND the basket total, instead of
        # one fact-table shuffle per consumer: with no cap,
        # explode(items) enumerates exactly the distinct
        # (basket, item) lines, and each basket row is one distinct
        # non-empty basket — identical integers by construction.
        base = _baskets(df, basket_col, item_col, None).localCheckpoint(
            eager=False
        )
        pairs = _pairs_from_baskets(base, min_support).withColumnRenamed(
            "n", "n_ab"
        )
        item_counts = (
            base.select(F.explode("items").alias("i"))
            .groupBy("i")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        total = F.broadcast(
            base.agg(F.count(F.lit(1)).alias("n_bask"))
        )
    else:
        pairs = copurchase_pairs(
            df, basket_col, item_col, min_support=min_support,
            max_basket=max_basket,
        ).withColumnRenamed("n", "n_ab")
        # capped pairs: rule denominators must still be the TRUE
        # per-item basket counts, so they come from the uncapped lines
        lines = df.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        ).dropDuplicates(["b", "i"])
        item_counts = lines.groupBy("i").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        total = F.broadcast(
            lines.select("b")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_bask"))
        )
    ca = item_counts.select(
        F.col("i").alias("p1"), F.col("cnt").alias("n_a")
    )
    cb = item_counts.select(
        F.col("i").alias("p2"), F.col("cnt").alias("n_b")
    )
    return (
        pairs.join(ca, "p1")
        .join(cb, "p2")
        .crossJoin(total)
        .select(
            "p1",
            "p2",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("conf_ab"),
            F.round(F.col("n_ab") / F.col("n_b"), 6).alias("conf_ba"),
            F.round(
                (F.col("n_ab") * F.col("n_bask"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
