"""Collection statistics as DataFrame aggregates.

Port of the reference's corpus-stats folds (SURVEY.md §2.4):
 * ``corpus_stats``  — foldCorpusStats (Search.hs:190-194) /
   documentTermStats's docCount+tokenCount (CorpusStats.hs:107-133)
 * ``term_stats``    — foldTermStats (Search.hs:196-208): per-term
   (cf = collection frequency, df = document frequency)

Both are single shuffle-light aggregations: ``term_stats`` consumes the
per-doc pre-aggregated (term, tf) pairs from the tokenizer (one row per
distinct (doc, term), not per occurrence), so the groupBy(term) shuffle
moves ~df rows per term with map-side partial aggregation — the Spark
analog of the reference's monoidal partial CorpusStats merge
(CorpusStats.hs:89-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplir_spark.functions.tokenize import term_tfs_udf


def doc_term_tfs(tokenized: DataFrame, doc_cols: list[str] | None = None) -> DataFrame:
    """Explode a tokenized corpus to (doc..., doc_len, term, tf) rows.

    One row per distinct (doc, term) — tf is pre-summed inside the Arrow
    batch (M.fromListWith (+), SimpleIndex.hs:94-96).
    """
    doc_cols = doc_cols or ["doc_key"]
    return (
        tokenized.withColumn("_tt", F.explode(term_tfs_udf("terms")))
        .select(*doc_cols, "doc_len", F.col("_tt.term").alias("term"), F.col("_tt.tf").alias("tf"))
    )


def corpus_stats(tokenized: DataFrame) -> DataFrame:
    """(doc_count, token_count, token_count_alnum) — one row.

    token_count = sum of normalized-term counts (corpusTokenCount in the
    SimpleIndex/BM25 path); token_count_alnum = Search.hs foldCorpusStats'
    collectionLength (sum of alnum doc lengths).
    """
    return tokenized.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("token_count"),
        F.coalesce(F.sum("doc_len_alnum"), F.lit(0)).cast("long").alias("token_count_alnum"),
    )


def term_stats(pairs: DataFrame) -> DataFrame:
    """(term, df, cf) from (doc, term, tf) pairs (Search.hs:196-208)."""
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
