"""A/B artifact for bucket routing past the literal ceiling (r5).

Compares the two (bucket, xb) assignment routes on the doc-key side —

  * literal: sqrt-decomposed array-literal scan + xkeys literal lookup
    (the default below _BUCKET_UDF_MIN)
  * udf: broadcast cuts + np.searchsorted pandas UDF (the route that
    removes the former 32k-bucket cap; plan size O(1) in bucket count)

at cut counts straddling the switch, timing the same slim aggregation
bucket_offsets performs (groupBy bucket count over keys only).  Also
records the driver-side xkeys probe wall (vectorized murmur3) at each
bucket count.  Writes BENCH/bucket_udf_route.json.

Run: python bench_route.py
(env: ROUTE_BENCH_ROWS=2000000, ROUTE_BENCH_REPEATS=3, SPARK_GRAFT_CPUS=32)
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

    from simplir_spark.operators import index_build as ib

    n_rows = int(os.environ.get("ROUTE_BENCH_ROWS", "2000000"))
    repeats = int(os.environ.get("ROUTE_BENCH_REPEATS", "3"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    key_kind = os.environ.get("ROUTE_BENCH_KEYS", "str")  # str | long
    spark = get_spark("bench_route", cores=cores, shuffle_partitions=cores)
    if key_kind == "str":
        df = spark.range(n_rows).select(
            F.format_string("doc%012d", F.col("id")).alias("doc_key")
        )
    else:
        df = spark.range(n_rows).select(F.col("id").alias("doc_key"))
    df = df.persist()
    df.count()

    def cuts_for(n_cuts: int):
        step = max(1, n_rows // (n_cuts + 1))
        if key_kind == "str":
            return [f"doc{i * step:012d}" for i in range(1, n_cuts + 1)]
        return [i * step for i in range(1, n_cuts + 1)]

    def time_route(cuts, force_udf: bool) -> float:
        prev = ib._BUCKET_UDF_MIN
        try:
            if force_udf:
                ib._BUCKET_UDF_MIN = 0
            t0 = time.time()
            (
                ib.with_bucket_and_xb(df, "doc_key", cuts, xkeys=None, bucket_col="_b")
                .groupBy("_b")
                .count()
                .count()
            )
            return round(time.time() - t0, 3)
        finally:
            ib._BUCKET_UDF_MIN = prev

    out: dict = {
        "bench": "bucket_udf_route",
        "n_rows": n_rows,
        "key_kind": key_kind,
        "cores": cores,
        "repeats": repeats,
        "cases": {},
    }
    # (n_cuts, run_literal?) — the literal form is not attempted past the
    # old cap: a 131k-element plan literal is exactly the ceiling removed
    cases = [
        (256, True), (1024, True), (4096, True), (32767, True), (131071, False),
    ]
    for n_cuts, with_literal in cases:
        cuts = cuts_for(n_cuts)
        t0 = time.time()
        xk = ib.probe_shuffle_keys(n_cuts + 1, n_cuts + 1)
        probe_s = round(time.time() - t0, 3)
        assert len(xk) == n_cuts + 1
        case: dict = {"probe_xkeys_sec": probe_s, "literal": [], "udf": []}
        # untimed warmup of each form (JIT + Python worker spin-up)
        if with_literal:
            time_route(cuts, force_udf=False)
        time_route(cuts, force_udf=True)
        for r in range(repeats):
            if with_literal:
                case["literal"].append(time_route(cuts, force_udf=False))
            case["udf"].append(time_route(cuts, force_udf=True))
        if not with_literal:
            case.pop("literal")
            case["literal_note"] = "not run: plan literal of this size is the removed ceiling"
        out["cases"][str(n_cuts)] = case

    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    suffix = "" if key_kind == "str" else f"_{key_kind}"
    with open(f"BENCH/bucket_udf_route{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
