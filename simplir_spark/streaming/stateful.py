"""Custom stateful streaming operator: cross-micro-batch exact dedup.

A training-data ingest pipeline must not re-admit a document that arrived
in an earlier micro-batch.  Spark's built-in `dropDuplicates` on a stream
keys state by the dedup column itself; this operator instead demonstrates
the engine's custom-stateful extension point (`applyInPandasWithState`,
the Structured Streaming analog of the reference's fold accumulators,
SURVEY.md §2.9): state is a compact set of content hashes per key-prefix
group, updated with vectorized pandas per batch.

Partitioning: groups are the first ``prefix_len`` hex chars of
sha256(content) — 16^prefix_len state shards, uniformly distributed, so
state size per shard is bounded and the shuffle key is data-independent
of document identity (no skew from popular documents: identical docs
hash identically and land in ONE shard by construction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    prefix_len: int = 2,
) -> DataFrame:
    """First-occurrence filter over a (possibly streaming) doc source.

    Emits (id, sha256) for each content hash the FIRST time it is seen
    across the stream's lifetime; later arrivals (same or later
    micro-batch) are dropped.  State per group: the sorted list of seen
    hashes.  Works identically on static DataFrames (single "batch").
    """
    hashed = docs.select(
        F.col(id_col),
        F.sha2(F.col(content_col), 256).alias("sha256"),
    ).withColumn("_grp", F.substring("sha256", 1, prefix_len))

    out_type = T.StructType(
        [
            T.StructField("doc_id", hashed.schema[id_col].dataType, True),
            T.StructField("sha256", T.StringType(), True),
        ]
    )
    state_type = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()), True)])

    def dedup_group(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            # stable within-batch order: first row of a hash wins
            pdf = pdf.sort_values(id_col, kind="stable")
            fresh = pdf[~pdf["sha256"].duplicated() & ~pdf["sha256"].isin(seen)]
            seen.update(fresh["sha256"])
            if len(fresh):
                outs.append(fresh[[id_col, "sha256"]].rename(columns={id_col: "doc_id"}))
        state.update((sorted(seen),))
        if outs:
            yield pd.concat(outs)

    if not docs.isStreaming:
        # same semantics, batch engine: window over hash
        from pyspark.sql import Window

        w = Window.partitionBy("sha256").orderBy(id_col)
        return (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col).alias("doc_id"), "sha256")
        )

    return hashed.groupBy("_grp").applyInPandasWithState(
        dedup_group, out_type, state_type, "append", GroupStateTimeout.NoTimeout
    )
