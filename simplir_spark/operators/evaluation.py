"""Ranking evaluation — port of simplir-eval
(simplir-eval/src/SimplIR/Ranking/Evaluation.hs:24-96: meanAvgPrec /
naiveAvgPrec; the reference also differential-tests against trec_eval,
simplir-eval/tests/VersusTrecEval.hs:65-110).

Average precision over a ranked run against binary qrels:
  AP(q) = (1/R_q) * sum over relevant retrieved docs of Precision@rank
with R_q = total relevant documents for q in the qrels (retrieved or not).
Queries with R_q = 0 are excluded from the mean (trec_eval convention).

Everything is windows + joins — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def average_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """Per-query AP.  run: (qid, doc, rank); qrels: (qid, doc, relevance)."""
    rel = qrels.filter(F.col("relevance") > 0).select("qid", "doc", F.lit(1).alias("_rel"))
    totals = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))
    joined = run.join(rel, ["qid", "doc"], "left").withColumn(
        "is_rel", F.coalesce(F.col("_rel"), F.lit(0))
    )
    w = Window.partitionBy("qid").orderBy("rank")
    prec = F.sum("is_rel").over(w) / F.col("rank")
    per_doc = joined.withColumn("contrib", F.col("is_rel") * prec)
    ap = per_doc.groupBy("qid").agg(F.sum("contrib").alias("sum_prec"))
    return (
        ap.join(totals, "qid")
        .withColumn("ap", F.col("sum_prec") / F.col("n_rel"))
        .select("qid", "ap", "n_rel")
    )


def mean_average_precision(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """One row: (map, n_queries). Queries without relevant docs excluded."""
    ap = average_precision(run, qrels)
    return ap.agg(
        F.avg("ap").alias("map"), F.count(F.lit(1)).cast("long").alias("n_queries")
    )


def precision_at_k(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    rel = qrels.filter(F.col("relevance") > 0).select("qid", "doc", F.lit(1).alias("_rel"))
    topk = run.filter(F.col("rank") <= k)
    joined = topk.join(rel, ["qid", "doc"], "left")
    return joined.groupBy("qid").agg(
        (F.sum(F.coalesce(F.col("_rel"), F.lit(0))) / F.lit(float(k))).alias(f"p_at_{k}")
    )


def reciprocal_rank(run: DataFrame, qrels: DataFrame) -> DataFrame:
    """Per-query RR = 1/rank of first relevant result, 0 when no relevant
    document was retrieved — trec_eval's recip_rank reports those topics
    as 0 rather than dropping them, and downstream per-query folds
    (rank_metrics) must not lose the query row."""
    rel = qrels.filter(F.col("relevance") > 0).select("qid", "doc", F.lit(1).alias("_rel"))
    first = (
        run.join(rel, ["qid", "doc"], "inner")
        .groupBy("qid")
        .agg(F.min("rank").alias("first_rel"))
    )
    qids = run.select("qid").distinct()
    return qids.join(first, "qid", "left").select(
        "qid",
        F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)).alias("rr"),
    )


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Per-query nDCG@k with graded relevance (trec_eval `ndcg_cut.k`
    semantics, the standard log2 gain form):

      DCG@k  = sum over retrieved docs at rank<=k of rel / log2(rank+1)
      IDCG@k = same sum over the qrels' relevances sorted descending
      nDCG@k = DCG@k / IDCG@k

    Queries with no positively-assessed documents are excluded, matching
    the meanAvgPrec convention above.  Windows + joins only, no UDFs —
    the ideal ranking never materializes document ids, just a per-query
    sorted-relevance window over the (small) qrels side.
    """
    rel = qrels.filter(F.col("relevance") > 0).select(
        "qid", "doc", F.col("relevance").cast("double").alias("_rel")
    )
    discount = F.log2(F.col("rank").cast("double") + F.lit(1.0))
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["qid", "doc"], "inner")
        .groupBy("qid")
        .agg(F.sum(F.col("_rel") / discount).alias("dcg"))
    )
    iw = Window.partitionBy("qid").orderBy(F.desc("_rel"), F.col("doc"))
    ideal = (
        rel.withColumn("rank", F.row_number().over(iw))
        .filter(F.col("rank") <= k)
        .groupBy("qid")
        .agg(F.sum(F.col("_rel") / discount).alias("idcg"))
    )
    return (
        ideal.join(dcg, "qid", "left")
        .withColumn(
            f"ndcg_at_{k}", F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
        )
        .select("qid", f"ndcg_at_{k}")
    )


def merge_rankings(runs: list[DataFrame], k: int | None = None) -> DataFrame:
    """Merge multiple run DataFrames, re-ranking per (qid, method) by
    (-score, doc) — the MergeRankings tool
    (simplir-trec-streaming/MergeRankings.hs:39-70), including its
    non-finite-score filter (:63-67)."""
    if not runs:
        raise ValueError("merge_rankings: no runs to merge")
    merged = None
    for r in runs:
        merged = r if merged is None else merged.unionByName(r)
    merged = merged.filter(
        ~F.isnan(F.col("score")) & (F.col("score") != float("inf")) & (F.col("score") != float("-inf"))
    )
    w = Window.partitionBy("qid", "method").orderBy(F.desc("score"), F.col("doc"))
    out = merged.withColumn("rank", F.row_number().over(w))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out
