"""A/B artifact for the boundary-sampling pass (VERDICT r3 #1).

Compares the retired r3 form (JVM sample capped at 2M keys COLLECTED and
sorted in the driver) against the shipped distributed sketch
(`_boundary_sketch`: executor-side sort + thinning, driver merges a
corpus-size-independent weighted candidate set) on the same synthetic
key table: wall time, driver-side candidate count, and resulting bucket
balance.  Writes BENCH/boundary_sketch.json.

Run: python bench_boundary.py  (env: BOUNDARY_BENCH_ROWS,
BOUNDARY_BENCH_BUCKETS, BOUNDARY_BENCH_REPEATS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simplir_spark.session import get_spark  # noqa: E402


def main() -> dict:
    from pyspark.sql import functions as F

    from simplir_spark.operators.index_build import (
        bucket_expr,
        sample_boundaries,
    )

    n_rows = int(os.environ.get("BOUNDARY_BENCH_ROWS", "5000000"))
    bucket_counts = [
        int(x) for x in os.environ.get("BOUNDARY_BENCH_BUCKETS", "128,32768").split(",")
    ]
    repeats = int(os.environ.get("BOUNDARY_BENCH_REPEATS", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("boundary_bench", cores=cores, shuffle_partitions=cores)
    df = spark.range(n_rows).select(
        F.format_string("doc%014d", (F.col("id") * 2654435761) % n_rows).alias("doc_key")
    ).persist()
    df.count()

    def legacy(n: int, n_buckets: int) -> tuple[list[str], int]:
        """The r3 implementation, verbatim shape: capped driver collect."""
        target = min(n, max(min(n_buckets * 200, 2_000_000), 10_000))
        frac = min(1.0, target / n)
        sample = [r[0] for r in df.select("doc_key").sample(False, frac, seed=42).collect()]
        sample.sort()
        cuts = []
        for i in range(1, n_buckets):
            cuts.append(sample[min(len(sample) - 1, i * len(sample) // n_buckets)])
        return sorted(set(cuts)), len(sample)

    def balance(cuts: list[str]) -> float:
        counts = (
            df.select(bucket_expr("doc_key", cuts).alias("b")).groupBy("b").count().collect()
        )
        sizes = [int(r["count"]) for r in counts]
        return round(max(sizes) / (n_rows / len(sizes)), 3)

    out: dict = {
        "n_rows": n_rows,
        "repeats": repeats,
        "cores": cores,
        "headline_stat": "min",
        "regimes": {},
    }
    from simplir_spark.operators.index_build import (
        BOUNDARY_BUDGET_CAP,
        BOUNDARY_DIRECT_MAX,
        BOUNDARY_KEYS_PER_BUCKET,
    )

    for n_buckets in bucket_counts:
        legacy_samples, new_samples = [], []
        legacy_collected = 0
        cuts_by_form = {}
        for _ in range(repeats):
            t0 = time.time()
            cuts_l, n_coll = legacy(n_rows, n_buckets)
            legacy_samples.append(round(time.time() - t0, 3))
            legacy_collected = n_coll
            cuts_by_form["legacy"] = cuts_l

            t0 = time.time()
            cuts_s = sample_boundaries(df, "doc_key", n_buckets, n=n_rows)
            new_samples.append(round(time.time() - t0, 3))
            cuts_by_form["shipped"] = cuts_s

        budget = min(max(n_buckets * BOUNDARY_KEYS_PER_BUCKET, 10_000), BOUNDARY_BUDGET_CAP)
        out["regimes"][str(n_buckets)] = {
            "path": "direct" if budget <= BOUNDARY_DIRECT_MAX else "sketch",
            "legacy": {
                "samples": legacy_samples,
                "sec": min(legacy_samples),
                "driver_keys_collected": legacy_collected,
                "max_bucket_over_mean": balance(cuts_by_form["legacy"]),
            },
            "shipped": {
                "samples": new_samples,
                "sec": min(new_samples),
                "driver_keys_bound": budget,
                "max_bucket_over_mean": balance(cuts_by_form["shipped"]),
            },
            "speedup_vs_legacy": round(min(legacy_samples) / min(new_samples), 2),
            "driver_reduction": round(legacy_collected / max(budget, 1), 2),
        }

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/boundary_sketch.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
