"""Query-path skew evidence (VERDICT r4 #6).

The build side has hot-TERM balance tests (tests/test_index.py); this
script produces the QUERY-side artifact: a corpus where one term appears
in ~50% of all documents (a pathological high-df query term whose posting
runs overlap every did-shard), queried by a batch in which every query
contains that hot term.  It measures

  * grouping="query_shard" (default; per-(query, shard) groups — the hot
    term's runs ship once PER QUERY) vs
  * grouping="shard" (one group per did-shard, shared decode cache — each
    hot run crosses the shuffle once for the whole batch)

as interleaved pairs (min + all samples, this host's 2-4x noise rule),
and records the per-shard posting-mass balance of the hot term — the
assertion that did-range sharding keeps a 50%-df term's decode work even
across shards (runs are bounded-width did ranges, shards are even did
spans, so mass per shard stays ~uniform; the same property a 1000-executor
cluster relies on).

Writes BENCH/hot_query.json.

Run: python bench_hot_query.py
(env: HOT_BENCH_DOCS=100000, HOT_BENCH_PAIRS=3, SPARK_GRAFT_CPUS=32)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simplir_spark.session import get_spark  # noqa: E402

HOT = "hotterm"


def main() -> dict:
    from pyspark.sql import functions as F

    from simplir_spark.operators.index_build import build_index, open_index
    from simplir_spark.operators.query_indexed import bm25_indexed

    n_docs = int(os.environ.get("HOT_BENCH_DOCS", "100000"))
    pairs = int(os.environ.get("HOT_BENCH_PAIRS", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("bench_hot_query", cores=cores, shuffle_partitions=cores)

    # synthetic corpus: 8 rotating filler words + the hot term in every
    # 2nd doc (df = 50%); doc_key dense so did == key
    fill = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    fill_arr = F.array(*[F.lit(w) for w in fill])
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_key"),
        F.concat_ws(
            " ",
            F.element_at(fill_arr, (F.col("id") % 8 + 1).cast("int")),
            F.element_at(fill_arr, (F.col("id") % 5 + 1).cast("int")),
            F.element_at(fill_arr, (F.col("id") % 3 + 1).cast("int")),
            F.when(F.col("id") % 2 == 0, F.lit(HOT)).otherwise(F.lit("coldish")),
        ).alias("content"),
    )

    idx_dir = tempfile.mkdtemp(prefix="simplir_hot_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, base, idx_dir)
    idx = open_index(spark, idx_dir)

    # every query hits the hot term (plus one discriminating filler)
    queries = [(f"H{i:02d}", [HOT, w]) for i, w in enumerate(fill)]

    # per-shard posting-mass balance of the hot term at the sharding the
    # engine would pick (2*cores-ish); recompute over the postings table
    n_shards = max(2, 2 * cores)
    span = max(1, -(-idx.doc_count // n_shards))
    mass = (
        idx.postings.filter(F.col("term") == HOT)
        .select((F.col("start_did") / span).cast("long").alias("shard"), "n")
        .groupBy("shard")
        .agg(F.sum("n").alias("mass"))
        .collect()
    )
    masses = [int(r["mass"]) for r in mass]
    mean_mass = sum(masses) / len(masses)
    balance = {
        "n_shards_nonempty": len(masses),
        "n_shards": n_shards,
        "mean_mass": round(mean_mass, 1),
        "max_mass": max(masses),
        "max_over_mean": round(max(masses) / mean_mass, 3),
    }
    assert max(masses) <= 3 * mean_mass, balance  # the balance bound

    # untimed warmup of both paths, then interleaved pairs
    bm25_indexed(spark, idx, queries, k=10, grouping="query_shard").collect()
    bm25_indexed(spark, idx, queries, k=10, grouping="shard").collect()

    samples: dict[str, list[float]] = {"query_shard": [], "shard": []}
    for p in range(pairs):
        order = (
            ["query_shard", "shard"] if p % 2 == 0 else ["shard", "query_shard"]
        )
        for g in order:
            t0 = time.time()
            bm25_indexed(spark, idx, queries, k=10, grouping=g).collect()
            samples[g].append(round(time.time() - t0, 3))

    # rank identity between the two groupings on the hot batch
    a = sorted(
        tuple(r)
        for r in bm25_indexed(spark, idx, queries, k=10, grouping="query_shard")
        .select("query_id", "doc_key", "rank")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in bm25_indexed(spark, idx, queries, k=10, grouping="shard")
        .select("query_id", "doc_key", "rank")
        .collect()
    )
    assert a == b, "groupings disagree on the hot batch"

    result = {
        "bench": "hot_query_grouping",
        "n_docs": n_docs,
        "hot_df_frac": 0.5,
        "n_queries": len(queries),
        "cores": cores,
        "pairs": pairs,
        "min_sec": {g: min(v) for g, v in samples.items()},
        "all_samples": samples,
        "rank_identical": True,
        "hot_term_shard_balance": balance,
        "note": (
            "every query contains the 50%-df term; shard grouping ships+"
            "decodes each hot run once per batch instead of once per query"
        ),
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/hot_query.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
