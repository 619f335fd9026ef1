"""Validate the theta-seeding auto-gate at decode-heavy scale (r5).

r4 measured cross-shard theta0 seeding as a ~20% SLOWDOWN at 500k docs x
16 shards (BENCH/seed_threshold.json) and gated it to
n_shards >= 8 AND doc_count >= 4M (query_indexed seed auto-gate).  This
script produces the evidence AT the gate boundary: an amplified 4M-doc
corpus, seeded vs unseeded BM25 + Dirichlet-QL as interleaved pairs.

Writes BENCH/seed_threshold_4m.json.

Run: python bench_seed.py
(env: SEED_BENCH_DOCS=4000000, SEED_BENCH_PAIRS=3, SPARK_GRAFT_CPUS=32,
 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1)
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


def main() -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from simplir_spark.operators.index_build import build_index, open_index
    from simplir_spark.operators.query_indexed import bm25_indexed, ql_dirichlet_indexed
    from simplir_spark.queryset import QUERIES

    target = int(os.environ.get("SEED_BENCH_DOCS", "4000000"))
    pairs = int(os.environ.get("SEED_BENCH_PAIRS", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("bench_seed", cores=cores, shuffle_partitions=cores)
    base = entry._corpus(spark, sf_dir)
    n_base = base.count()
    replicate = max(1, target // n_base)
    copies = spark.range(replicate).select(F.col("id").alias("copy"))
    corpus = (
        base.repartition(cores * 2)
        .crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_key") * replicate + F.col("copy")).alias("doc_key"),
            "content",
        )
    )
    n_docs = n_base * replicate

    idx_dir = tempfile.mkdtemp(prefix="simplir_seed_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, corpus, idx_dir)
    build_s = round(time.time() - t0, 1)
    idx = open_index(spark, idx_dir)
    n_shards = 16

    def run(model, seeded: bool) -> float:
        fn = bm25_indexed if model == "bm25" else ql_dirichlet_indexed
        t0 = time.time()
        fn(
            spark, idx, QUERIES, k=10, n_shards=n_shards, seed_threshold=seeded
        ).collect()
        return round(time.time() - t0, 3)

    # warmup both paths untimed
    for m in ("bm25", "ql"):
        run(m, False)
        run(m, True)

    recs: list[dict] = []
    for p in range(pairs):
        rec: dict = {}
        order = [False, True] if p % 2 == 0 else [True, False]
        for seeded in order:
            for m in ("bm25", "ql"):
                rec[f"{m}_{'seeded' if seeded else 'unseeded'}"] = run(m, seeded)
        recs.append(rec)

    def mins(key):
        return min(r[key] for r in recs)

    result = {
        "n_docs": n_docs,
        "n_shards": n_shards,
        "cores": cores,
        "build_sec": build_s,
        "pairs": recs,
        "bm25_unseeded_min": mins("bm25_unseeded"),
        "bm25_seeded_min": mins("bm25_seeded"),
        "bm25_speedup": round(mins("bm25_unseeded") / mins("bm25_seeded"), 3),
        "ql_unseeded_min": mins("ql_unseeded"),
        "ql_seeded_min": mins("ql_seeded"),
        "ql_speedup": round(mins("ql_unseeded") / mins("ql_seeded"), 3),
        "gate": "auto seeding engages at n_shards>=8 AND doc_count>=4M",
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/seed_threshold_4m.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
