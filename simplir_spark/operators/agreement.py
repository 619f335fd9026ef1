"""Inter-annotator agreement — Cohen's kappa and Fleiss' kappa
(port of simplir/src/SimplIR/Assessment/Agreement.hs:13-60+).

Both are single-aggregation DataFrame computations: observed agreement and
chance agreement come from grouped counts (monoidal partial aggregation,
exactly the reference's fold shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(a: DataFrame, b: DataFrame, item_col: str = "item", label_col: str = "label") -> DataFrame:
    """Cohen's kappa between two assessors over shared items.

    a/b: (item, label).  kappa = (po - pe) / (1 - pe) with po = observed
    agreement rate, pe = sum_k pA(k)·pB(k) (Agreement.hs `cohenKappa`).
    Returns one row (n_items, po, pe, kappa).
    """
    j = a.select(item_col, F.col(label_col).alias("_la")).join(
        b.select(item_col, F.col(label_col).alias("_lb")), item_col
    )
    j = j.cache()
    n = j.count()
    if n == 0:
        spark = a.sparkSession
        return spark.createDataFrame(
            [(0, 0.0, 0.0, 0.0)], "n_items long, po double, pe double, kappa double"
        )
    po_row = j.agg(
        (F.sum(F.when(F.col("_la") == F.col("_lb"), 1).otherwise(0)) / F.lit(float(n))).alias("po")
    ).collect()[0]
    po = float(po_row["po"])
    ma = {r["_la"]: r["c"] for r in j.groupBy("_la").agg(F.count(F.lit(1)).alias("c")).collect()}
    mb = {r["_lb"]: r["c"] for r in j.groupBy("_lb").agg(F.count(F.lit(1)).alias("c")).collect()}
    pe = sum((ma.get(k, 0) / n) * (mb.get(k, 0) / n) for k in set(ma) | set(mb))
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 1.0
    j.unpersist()
    spark = a.sparkSession
    return spark.createDataFrame(
        [(n, po, pe, kappa)], "n_items long, po double, pe double, kappa double"
    )


def fleiss_kappa(assessments: DataFrame, item_col: str = "item", label_col: str = "label") -> DataFrame:
    """Fleiss' kappa over (item, label) rows, one row per (assessor, item)
    vote; requires the same number of assessors n per item
    (Agreement.hs `fleissKappa`).  Returns one row (n_items, n_raters,
    p_bar, p_e, kappa).
    """
    counts = assessments.groupBy(item_col, label_col).agg(F.count(F.lit(1)).alias("nij"))
    per_item = counts.groupBy(item_col).agg(
        F.sum("nij").alias("n"),
        F.sum(F.col("nij") * F.col("nij")).alias("sq"),
    )
    row = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.first("n").alias("n_raters"),
        F.avg((F.col("sq") - F.col("n")) / (F.col("n") * (F.col("n") - 1))).alias("p_bar"),
    ).collect()[0]
    n_items, n_raters, p_bar = int(row["n_items"]), int(row["n_raters"]), float(row["p_bar"])
    total = assessments.count()
    pj = [
        (r["c"] / total)
        for r in assessments.groupBy(label_col).agg(F.count(F.lit(1)).alias("c")).collect()
    ]
    p_e = sum(p * p for p in pj)
    kappa = (p_bar - p_e) / (1.0 - p_e) if p_e < 1.0 else 1.0
    spark = assessments.sparkSession
    return spark.createDataFrame(
        [(n_items, n_raters, p_bar, p_e, kappa)],
        "n_items long, n_raters long, p_bar double, p_e double, kappa double",
    )
