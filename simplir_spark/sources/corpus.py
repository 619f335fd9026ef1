"""Corpus loading — the single document-source entry point.

Replaces the reference's per-format document producers (TREC/KBA/WARC
drivers, ``simplir-tools/Search.hs:424-447``): our input is already a table
(BASELINE.json input_hint), either the native source-code shape
``(repo, path, commit, lang, content)`` or the driver's synthetic
``documents.parquet`` shape ``(doc_id, text, lang, source, n_chars)``,
which is mapped onto the native shape deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Load a corpus table and normalize to the native schema + doc_key.

    ``path`` may be a parquet file/directory OR a catalog table
    identifier (no '/', e.g. ``iceberg_cat.db.files``) — the latter goes
    through ``spark.read.table``, which is how an Iceberg-catalog corpus
    (BASELINE.json's input shape) is read on a real cluster: snapshot
    isolation, partition pruning and column pruning all come from the
    catalog's DataSourceV2 implementation; nothing downstream changes.
    This sandbox has no Iceberg runtime jar, so tests exercise the
    read.table path with a parquet-backed catalog table.

    ``doc_key`` is the stable document identity — the analog of simplir's
    DocumentName (simplir/src/SimplIR/Types.hs:65-72):
    ``repo‖'/'‖path‖'@'‖commit`` for native corpora, a zero-padded doc_id
    for the synthetic documents table (zero-padding keeps lexicographic
    order == numeric order, which our dense-id assignment sorts by).
    """
    if os.path.exists(path) and not os.path.isabs(path):
        # Spark resolves relative paths against the JVM's cwd, which does
        # not follow the Python process's chdir — absolutize every LOCAL
        # path branch, not just the documents.parquet one
        path = os.path.abspath(path)
    if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz", ".ndjson")):
        # JSON-lines corpora (one document object per line; Spark's JSON
        # reader splits and decompresses per-file natively, so a directory
        # of .jsonl.gz shards parallelizes like any file source)
        df = spark.read.json(path)
    elif "/" not in path and not path.endswith(".parquet") and not os.path.isdir(path):
        # slash-free AND not a local directory -> catalog identifier; a
        # bare relative directory name still reads as parquet below
        df = spark.read.table(path)
    elif path.endswith(".parquet") or path.endswith("/"):
        df = spark.read.parquet(path)
    else:
        df = spark.read.parquet(f"{path}/documents.parquet")

    cols = set(df.columns)
    if {"repo", "path", "commit", "content"} <= cols:
        if "lang" not in cols:
            df = df.withColumn("lang", F.lit(""))
        return df.select(
            F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit")).alias("doc_key"),
            "repo",
            "path",
            "commit",
            "lang",
            "content",
        )
    if {"doc_id", "text"} <= cols:
        return df.select(
            F.format_string("doc%012d", F.col("doc_id")).alias("doc_key"),
            F.coalesce(F.col("source"), F.lit("synthetic")).alias("repo")
            if "source" in cols
            else F.lit("synthetic").alias("repo"),
            F.format_string("doc/%d", F.col("doc_id")).alias("path"),
            F.lit("HEAD").alias("commit"),
            (F.col("lang") if "lang" in cols else F.lit("")).alias("lang"),
            F.col("text").alias("content"),
        )
    raise ValueError(f"unrecognized corpus schema: {sorted(cols)}")


def with_integrity(df: DataFrame) -> DataFrame:
    """Append the per-row sha256(content) integrity column (BASELINE.json)."""
    return df.withColumn("sha256", F.sha2(F.col("content"), 256))
