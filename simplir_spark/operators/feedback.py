"""Pseudo-relevance feedback — RM1 relevance model, port of
simplir/src/SimplIR/RetrievalModels/RelevanceModel.hs:13-22:

    rm1 docs = normalize . weightedUnion [ (score_d, normalize (bag_d)) ]

i.e. each feedback document contributes its normalized term distribution
P(t|d) = tf/doc_len weighted by its retrieval score; the mixture is
re-normalized into the relevance model P(t|R).  Expressed as two grouped
aggregations + one window normalization — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rm1(run: DataFrame, pairs: DataFrame, doc_col: str = "doc_key") -> DataFrame:
    """Relevance model per query.

    run:   (query_id, doc_col, score) — feedback docs (usually top-k; the
           reference normalizes whatever ranking slice it is given)
    pairs: (doc_col, doc_len, term, tf)
    Returns (query_id, term, weight) with Σ_t weight = 1 per query.
    """
    joined = run.select("query_id", doc_col, "score").join(pairs, doc_col)
    # P(t|d) weighted by score, summed over feedback docs
    contrib = joined.withColumn(
        "w", F.col("score") * F.col("tf") / F.col("doc_len")
    )
    agg = contrib.groupBy("query_id", "term").agg(F.sum("w").alias("w"))
    norm = Window.partitionBy("query_id")
    return agg.select(
        "query_id",
        "term",
        (F.col("w") / F.sum("w").over(norm)).alias("weight"),
    )


def rm1_expansion_terms(
    run: DataFrame,
    pairs: DataFrame,
    n_terms: int = 10,
    doc_col: str = "doc_key",
    round_dp: int | None = None,
) -> DataFrame:
    """Top-n expansion terms per query by RM1 weight (ties by term).

    ``round_dp`` rounds weights BEFORE ranking (cross-engine determinism,
    same convention as the retrieval queries)."""
    model = rm1(run, pairs, doc_col)
    weight = F.round("weight", round_dp) if round_dp is not None else F.col("weight")
    model = model.select("query_id", "term", weight.alias("weight"))
    w = Window.partitionBy("query_id").orderBy(F.desc("weight"), F.col("term"))
    return (
        model.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_terms)
        .select("query_id", "term", "rank", "weight")
    )
