"""Weighted-multiset (Bag) operations — the general-purpose port of
simplir/src/SimplIR/Bag.hs:1-80 (previously only the RM1 use-case in
operators/feedback.py exercised the pattern).

A bag is a DataFrame of (group..., item, weight) rows, one row per
distinct item per group — the HashMap item->weight with an optional
grouping dimension (the reference folds many bags in a Map; here the
group columns ARE that map key).  Every operation is a Catalyst
aggregation/projection: map-side partial aggregation gives the monoid's
`mconcat` shape for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bag_from_items(
    items: DataFrame, item_col: str = "item", group_cols: list[str] | None = None
) -> DataFrame:
    """Bag.fromList: weight 1 per occurrence -> (group..., item, weight)."""
    gc = group_cols or []
    return items.groupBy(*gc, item_col).agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def bag_from_items_normed(
    items: DataFrame, item_col: str = "item", group_cols: list[str] | None = None
) -> DataFrame:
    """Bag.fromListNormed: each occurrence weighs 1/n of its group
    (Bag.hs:75-80) — the bag sums to 1 when items are distinct."""
    gc = group_cols or []
    if not gc:
        # no empty window (single-task funnel): group counts first (the
        # distributed aggregation), scalar total via agg + literal
        counts = items.groupBy(item_col).agg(F.count(F.lit(1)).alias("_c"))
        row = counts.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_t")).collect()[0]
        total = int(row["_t"])
        if total == 0:
            return counts.select(item_col, F.lit(0.0).alias("weight")).filter(F.lit(False))
        return counts.select(
            item_col, (F.col("_c") / F.lit(float(total))).alias("weight")
        )
    w = Window.partitionBy(*gc)
    with_n = items.withColumn("_n", F.count(F.lit(1)).over(w))
    return with_n.groupBy(*gc, item_col).agg(
        F.sum(F.lit(1.0) / F.col("_n")).alias("weight")
    )


def bag_scale(bag: DataFrame, s, weight_col: str = "weight") -> DataFrame:
    """Bag.scale (Bag.hs:58-60)."""
    return bag.withColumn(weight_col, F.col(weight_col) * F.lit(s))


def bag_normalize(
    bag: DataFrame, group_cols: list[str] | None = None, weight_col: str = "weight"
) -> DataFrame:
    """Bag.normalize: per-group L1 normalization (Bag.hs:50-55)."""
    gc = group_cols or []
    if not gc:
        # an empty window (partitionBy()) would funnel the whole bag
        # through ONE task; a scalar aggregate + literal divide keeps the
        # normalization fully distributed
        row = bag.agg(F.sum(weight_col).alias("_t")).collect()[0]
        total = row["_t"]
        if total is None:
            return bag
        return bag.withColumn(weight_col, F.col(weight_col) / F.lit(float(total)))
    w = Window.partitionBy(*gc)
    return bag.withColumn(weight_col, F.col(weight_col) / F.sum(weight_col).over(w))


def bag_weighted_union(
    bags: list[tuple[float, DataFrame]],
    item_col: str = "item",
    group_cols: list[str] | None = None,
    weight_col: str = "weight",
) -> DataFrame:
    """Bag.weightedUnion (Bag.hs:39-47): union of scaled bags,
    `HM.fromListWith (+)` == groupBy(item).sum — one shuffle total."""
    gc = group_cols or []
    scaled = None
    for w0, b in bags:
        part = b.select(*gc, item_col, (F.col(weight_col) * F.lit(float(w0))).alias(weight_col))
        scaled = part if scaled is None else scaled.unionByName(part)
    if scaled is None:
        raise ValueError("no bags")
    return scaled.groupBy(*gc, item_col).agg(F.sum(weight_col).alias(weight_col))


def bag_by_frequency(
    bag: DataFrame,
    item_col: str = "item",
    group_cols: list[str] | None = None,
    weight_col: str = "weight",
) -> DataFrame:
    """Bag.byFrequency: rank items highest weight first (ties by item for
    determinism — the reference's sort is weight-only, SURVEY.md §4.4)."""
    gc = group_cols or []
    # NOTE: with no group_cols this is a TOTAL order — a global ranking
    # is inherently a single sorted stream; at scale rank within groups
    # or take a bounded top-k (orderBy + limit) instead
    w = (Window.partitionBy(*gc) if gc else Window.partitionBy()).orderBy(
        F.desc(weight_col), F.col(item_col)
    )
    return bag.withColumn("rank", F.row_number().over(w))
