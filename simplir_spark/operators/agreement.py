"""Inter-annotator agreement — Cohen's kappa and Fleiss' kappa
(port of simplir/src/SimplIR/Assessment/Agreement.hs:13-60+).

Both are single-aggregation DataFrame computations: observed agreement and
chance agreement come from grouped counts (monoidal partial aggregation,
exactly the reference's fold shape).

Cross-engine exactness: every probability is formed as ONE division of
exact integer aggregates (agree counts, squared label counts), so a SQL
oracle computing the same integer sums produces bit-identical doubles —
no dependence on float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    a: DataFrame, b: DataFrame, item_col: str = "item", label_col: str = "label"
) -> DataFrame:
    """Cohen's kappa between two assessors over shared items.

    a/b: (item, label), one label per item per side.  An item carrying
    several labels on one side keeps the MINIMUM label — a deterministic
    choice independent of partitioning (dropDuplicates would keep an
    arbitrary row).  kappa = (po - pe) / (1 - pe) with
    po = observed agreement rate, pe = sum_k pA(k)·pB(k)
    (Agreement.hs `cohenKappa`).  Returns one row (n_items, po, pe, kappa).
    """
    a1 = a.groupBy(item_col).agg(F.min(label_col).alias("_la"))
    b1 = b.groupBy(item_col).agg(F.min(label_col).alias("_lb"))
    j = a1.join(b1, item_col)
    # ONE job: the (label_a, label_b) contingency table is label-cardinality-
    # sized; n / agree / marginals all derive from it driver-side with the
    # same exact integer arithmetic (was: cache + 4 separate jobs)
    cells = {
        (r["_la"], r["_lb"]): int(r["c"])
        for r in j.groupBy("_la", "_lb").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(cells.values())
    spark = a.sparkSession
    if n == 0:
        return spark.createDataFrame(
            [(0, 0.0, 0.0, 0.0)], "n_items long, po double, pe double, kappa double"
        )
    agree = sum(c for (la, lb), c in cells.items() if la == lb)
    ma: dict = {}
    mb: dict = {}
    for (la, lb), c in cells.items():
        ma[la] = ma.get(la, 0) + c
        mb[lb] = mb.get(lb, 0) + c
    # exact integer sums -> single divisions (deterministic doubles)
    cross = sum(ma[k] * mb.get(k, 0) for k in sorted(ma))
    po = agree / n
    pe = cross / (n * n)
    kappa = (po - pe) / (1.0 - pe) if pe < 1.0 else 1.0
    return spark.createDataFrame(
        [(n, po, pe, kappa)], "n_items long, po double, pe double, kappa double"
    )


def fleiss_kappa(
    assessments: DataFrame, item_col: str = "item", label_col: str = "label"
) -> DataFrame:
    """Fleiss' kappa over (item, label) rows, one row per (assessor, item)
    vote; requires the same number of assessors n per item
    (Agreement.hs `fleissKappa`) — validated, not silently assumed.
    Returns one row (n_items, n_raters, p_bar, p_e, kappa).
    """
    counts = assessments.groupBy(item_col, label_col).agg(F.count(F.lit(1)).alias("nij"))
    counts = counts.cache()
    per_item = counts.groupBy(item_col).agg(
        F.sum("nij").alias("n"),
        F.sum(F.col("nij") * F.col("nij")).alias("sq"),
    )
    row = per_item.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.max("n").alias("n_max"),
        F.min("n").alias("n_min"),
        F.sum("sq").alias("s_sq"),
        F.sum("n").alias("s_n"),
    ).collect()[0]
    n_items = int(row["n_items"])
    if n_items == 0:
        raise ValueError("fleiss_kappa: no assessments")
    n_raters = int(row["n_max"])
    if n_raters != int(row["n_min"]):
        raise ValueError(
            f"fleiss_kappa requires equal raters per item; saw "
            f"min={row['n_min']} max={row['n_max']}"
        )
    if n_raters < 2:
        raise ValueError("fleiss_kappa requires >= 2 raters per item")
    s_sq, s_n = int(row["s_sq"]), int(row["s_n"])
    # sum over labels of (total votes for label)^2, as ONE exact integer
    sc_row = (
        counts.groupBy(label_col)
        .agg(F.sum("nij").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("sc"))
        .collect()[0]
    )
    counts.unpersist()
    sc = int(sc_row["sc"])
    # single divisions of exact integers: bit-identical across engines
    p_bar = (s_sq - s_n) / (n_items * n_raters * (n_raters - 1))
    p_e = sc / (s_n * s_n)
    kappa = (p_bar - p_e) / (1.0 - p_e) if p_e < 1.0 else 1.0
    spark = assessments.sparkSession
    return spark.createDataFrame(
        [(n_items, n_raters, p_bar, p_e, kappa)],
        "n_items long, n_raters long, p_bar double, p_e double, kappa double",
    )
