"""Corpus-quality operators a training-data pipeline runs at scale,
beyond the reference's feature set (like dedup.py, mandated extensions):

 * lm_cross_entropy — per-document cross-entropy under a self-trained
   Laplace-smoothed word-bigram language model (the KenLM-style
   perplexity filter of web-corpus pipelines, with the model trained on
   the corpus itself so the operator is closed over its input — a real
   deployment swaps in counts trained elsewhere; the plan is identical).
 * decontaminate — flag documents sharing >= 1 token n-gram with a
   benchmark set (train/test contamination detection): benchmark
   n-grams are built once (small side), candidate hits come from an
   equi-join on the n-gram — the same bounded-shuffle shape as the
   MinHash candidate join.

Everything is JVM-side (shingle transforms + joins + aggregations); no
Python in either hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(tokenized: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) rows — consecutive term pairs, order-preserving."""
    bg = F.expr(
        "CASE WHEN size(terms) >= 2 THEN "
        "transform(sequence(0, size(terms) - 2),"
        " i -> struct(terms[i] AS w1, terms[i + 1] AS w2)) "
        "ELSE array() END"
    )
    return (
        tokenized.select(F.col(id_col), F.explode(bg).alias("_bg"))
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def lm_cross_entropy(
    tokenized: DataFrame, id_col: str = "doc_id", round_dp: int | None = 6
) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own Laplace-smoothed
    bigram LM:  H(d) = -(1/n) Σ ln((C(w1,w2) + 1) / (C(w1·) + V)).

    Returns (id, n_bigrams, cross_entropy); docs with < 2 terms carry
    n_bigrams = 0 and NULL entropy.  Shuffle shape: one groupBy for the
    bigram counts, one for the context counts, one join of the doc
    bigrams against the count tables.  BOTH count tables are equi-joined
    (shuffle hash), never broadcast: the context table has one row per
    vocabulary TYPE, and at web scale (10^8+ types) that exceeds any
    broadcast budget even though it looks small at test scale.
    """
    from pyspark import StorageLevel

    # bg feeds three aggregations + the scoring join: persist it once
    # (disk-backed) instead of re-deriving the exploded bigrams per pass
    bg = _bigrams(tokenized, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # vocab from the (far smaller) distinct-bigram table, not from bg
    vocab = (
        c12.select(F.col("w1").alias("w"))
        .union(c12.select("w2"))
        .distinct()
        .count()
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn(
            "_lp",
            F.log(
                (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(vocab)))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("_lp") / F.count(F.lit(1))).alias("cross_entropy"),
    )
    docs = tokenized.select(id_col)
    out = docs.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("cross_entropy"),
    )
    if round_dp is not None:
        out = out.withColumn("cross_entropy", F.round("cross_entropy", round_dp))
    return out


def decontaminate(
    shingles: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hits, contaminated) — per doc, how many of its distinct
    token n-grams appear in the benchmark set.

    ``shingles``/``benchmark_shingles``: (id, shingle) as produced by
    dedup.ngram_shingles (distinct per doc).  The benchmark side is
    distinct-projected to (shingle) and the overlap is one equi-join; at
    10^12-doc scale the benchmark n-gram set (test suites are small) is
    broadcastable, so the corpus side never shuffles.
    """
    bench = benchmark_shingles.select("shingle").distinct()
    hits = (
        shingles.join(F.broadcast(bench), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    all_ids = shingles.select(id_col).distinct()
    return all_ids.join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )
