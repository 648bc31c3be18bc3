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
    items = F.sort_array(F.collect_set(F.col(item_col)))
    if max_basket is not None:
        items = F.slice(items, 1, max_basket)
    baskets = df.groupBy(F.col(basket_col)).agg(items.alias("items"))
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
