"""Explicit schemas for every engine table.

The reference fixes schemas at compile time via Haskell types
(``DiskIndex term doc p``, simplir-disk-index/src/SimplIR/DiskIndex.hs:41-47);
we declare the concrete instantiations here and validate on read —
SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE.json input_hint): Iceberg-style table of source code.
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

# Document metadata table — the analog of simplir's docid->meta index
# (simplir-disk-index/src/SimplIR/DiskIndex/Document.hs:34-39), with the
# per-row integrity sha256 mandated by BASELINE.json.
DOCMETA_SCHEMA = T.StructType(
    [
        T.StructField("did", T.LongType(), False),  # dense, 0-based
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("doc_len", T.IntegerType(), False),
        T.StructField("doc_len_alnum", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
    ]
)

# Posting runs — the analog of PostingsChunk (Posting2/PostingList.hs:16-21).
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("start_did", T.LongType(), False),
        T.StructField("end_did", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("max_tf", T.LongType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("deltas", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        # positional payload (null unless the index was built with
        # positions=True) — the payload-generic `p` of DiskIndex
        T.StructField("pos", T.BinaryType(), True),
    ]
)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),  # documentFrequency
        T.StructField("cf", T.LongType(), False),  # termFrequency (collection)
    ]
)

CORPUS_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("token_count", T.LongType(), False),
        T.StructField("token_count_alnum", T.LongType(), False),
    ]
)


def validate(df, schema: T.StructType, name: str) -> None:
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in schema.fields:
        if f.name not in have:
            raise ValueError(f"{name}: missing column {f.name}")
        if have[f.name] != f.dataType:
            raise ValueError(
                f"{name}: column {f.name} has type {have[f.name]}, expected {f.dataType}"
            )
