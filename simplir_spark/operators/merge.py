"""Index merge — the Spark re-expression of ``DiskIndex.merge``
(simplir-disk-index/src/SimplIR/DiskIndex.hs:121-139):

1. per-source doc-id offsets = exclusive scan over source doc counts
   (mapAccumL in Document.hs:62-76) — computed driver-side from each
   source's corpus_stats.json (no job);
2. docmeta = union with ``did + offset`` re-basing;
3. postings = union with ``start_did/end_did + offset`` — the delta blobs
   are NOT rewritten (chunk-level DocIdDelta shifting, Posting2/Merge.hs:47-69);
   merged runs of a term are globally doc-sorted because source did ranges
   are disjoint and increasing, the v1 deterministic rule
   (Posting/Merge.hs:87-99, SURVEY.md §4.4);
4. term_stats = groupBy(term) re-aggregation (addCorpusStats's HashMap
   unionWith, CorpusStats.hs:89-104);
5. corpus_stats = scalar sums.

Hierarchical merging for many sources mirrors ``treeReduce`` fan-in 64
(Build.hs:41,52-77): a driver loop merges <=64 sources per level.  Union +
re-aggregation is shuffle-free for docmeta/postings (narrow union; writes
preserve source partitioning) and shuffle-light for term_stats.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from simplir_spark.operators.index_build import IndexPaths, open_index

MERGE_FAN_IN = 64  # Build.hs:41


def merge_indexes(
    spark: SparkSession, sources: list[str], out_dir: str, fan_in: int = MERGE_FAN_IN
) -> IndexPaths:
    """Merge index directories into ``out_dir`` (hierarchically if needed)."""
    if not sources:
        raise ValueError("no sources")
    level = 0
    current = list(sources)
    while len(current) > fan_in:
        next_level = []
        for gi in range(0, len(current), fan_in):
            group = current[gi : gi + fan_in]
            dst = os.path.join(out_dir, f"_level{level}", f"g{gi // fan_in}")
            next_level.append(str(_merge_group(spark, group, dst).root))
        current = next_level
        level += 1
    return _merge_group(spark, current, out_dir)


def _merge_group(spark: SparkSession, sources: list[str], out_dir: str) -> IndexPaths:
    os.makedirs(out_dir, exist_ok=True)
    handles = [open_index(spark, s) for s in sources]

    # exclusive scan of doc counts -> per-source offsets (Document.hs:62-76)
    offsets = []
    acc = 0
    for h in handles:
        offsets.append(acc)
        acc += h.doc_count

    paths = IndexPaths(out_dir)

    docmeta = None
    for h, off in zip(handles, offsets):
        part = h.docmeta.withColumn("did", F.col("did") + F.lit(off))
        docmeta = part if docmeta is None else docmeta.unionByName(part)
    # explicit dir (fresh builds serve docmeta from the tokenized checkpoint)
    docmeta.write.mode("overwrite").parquet(os.path.join(out_dir, "docmeta"))

    postings = None
    for h, off in zip(handles, offsets):
        part = h.postings.withColumn(
            "start_did", F.col("start_did") + F.lit(off)
        ).withColumn("end_did", F.col("end_did") + F.lit(off))
        postings = part if postings is None else postings.unionByName(part)
    postings.write.mode("overwrite").parquet(paths.postings)

    ts = None
    for h in handles:
        ts = h.term_stats if ts is None else ts.unionByName(h.term_stats)
    (
        ts.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .write.mode("overwrite")
        .parquet(paths.term_stats)
    )

    stats = {"doc_count": 0, "token_count": 0, "token_count_alnum": 0}
    for h in handles:
        with open(h.paths.corpus_stats) as f:
            cs = json.load(f)
        for k in stats:
            stats[k] += int(cs.get(k, 0))
    with open(paths.corpus_stats, "w") as f:
        json.dump(stats, f, indent=1)
    return paths
