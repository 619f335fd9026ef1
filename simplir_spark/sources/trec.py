"""TREC run-file / qrel I/O — port of simplir-io
(SimplIR/Format/TrecRunFile.hs:37-68, SimplIR/Format/QRel.hs:71-104).

Run files are the 6-column ``qid Q0 doc rank score method`` text format;
qrels are ``qid 0 doc rel``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_trec_run(ranked: DataFrame, method: str = "simplir_spark",
                doc_col: str = "doc_key") -> DataFrame:
    """(query_id, doc_col, rank, score) -> run-format columns."""
    return ranked.select(
        F.col("query_id").alias("qid"),
        F.lit("Q0").alias("q0"),
        F.col(doc_col).cast("string").alias("doc"),
        F.col("rank"),
        F.col("score"),
        F.lit(method).alias("method"),
    )


def write_trec_run(ranked: DataFrame, path: str, method: str = "simplir_spark",
                   doc_col: str = "doc_key") -> None:
    """Write a space-separated run file (one part per partition; coalesce(1)
    for a single file at small scale)."""
    run = to_trec_run(ranked, method, doc_col)
    line = F.concat_ws(" ", "qid", "q0", "doc", F.col("rank").cast("string"),
                       F.col("score").cast("string"), "method")
    run.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(path)


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("doc"),
        parts.getItem(3).cast("int").alias("rank"),
        parts.getItem(4).cast("double").alias("score"),
        parts.getItem(5).alias("method"),
    )


def read_qrels(spark: SparkSession, path: str) -> DataFrame:
    """qid 0 doc relevance (QRel.hs:71-88)."""
    df = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return df.select(
        parts.getItem(0).alias("qid"),
        parts.getItem(2).alias("doc"),
        parts.getItem(3).cast("int").alias("relevance"),
    )


def write_qrels(qrels: DataFrame, path: str) -> None:
    line = F.concat_ws(" ", "qid", F.lit("0"), "doc", F.col("relevance").cast("string"))
    qrels.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(path)
