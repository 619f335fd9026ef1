"""Window-hash A/B for repeated-substring dedup (Lee et al. 2021 spans).

The oracle-checked expr path materializes every L-token window as a STRING
and md5s it (O(corpus_tokens * L) bytes hashed + allocated); the rolling
path md5s each UNIQUE token once and builds all window hashes as L
vectorized int64 Karp-Rabin passes (O(corpus_tokens * L) register ops, no
per-window allocation).  At the paper's L=50 this is the difference
between a feasible and an infeasible 100-TB pass — this script measures
it at bench scale and asserts the two paths produce identical spans.

Writes BENCH/window_hash.json.

Run: python bench_window_hash.py
(env: WH_BENCH_DOCS=200000, WH_BENCH_PAIRS=3, WH_BENCH_N=50,
 SPARK_GRAFT_CPUS=32)
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

    from simplir_spark.operators.substring_dedup import repeated_spans

    n_docs = int(os.environ.get("WH_BENCH_DOCS", "200000"))
    pairs = int(os.environ.get("WH_BENCH_PAIRS", "3"))
    n = int(os.environ.get("WH_BENCH_N", "50"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    spark = get_spark("bench_window_hash", cores=cores, shuffle_partitions=cores)

    # 120-token docs over a ~30k vocab; the quadratic i*i term breaks the
    # stride alignment that would otherwise make linear-congruential docs
    # share accidental 50-token runs.  Every 10th doc carries a planted
    # 60-token shared block -> ~n_docs/10 genuine duplicated spans.
    filler = (
        "transform(sequence(0, 119), i -> "
        "concat('w', (id * 977 + i * i * 13) % 30011))"
    )
    shared = "transform(sequence(0, 59), i -> concat('shared', i))"
    terms = (
        f"CASE WHEN id % 10 = 0 THEN concat(slice({filler}, 1, 30), {shared}, "
        f"slice({filler}, 31, 30)) ELSE {filler} END"
    )
    data_dir = tempfile.mkdtemp(prefix="simplir_wh_bench_")
    (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"), F.expr(terms).alias("terms"))
        .repartition(cores)
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    tok = spark.read.parquet(data_dir)
    n_tokens = tok.select(F.sum(F.size("terms"))).first()[0]

    # span identity between the two hash paths (also the warmup)
    a = sorted(
        tuple(r) for r in repeated_spans(tok, n=n, method="expr").collect()
    )
    b = sorted(
        tuple(r) for r in repeated_spans(tok, n=n, method="rolling").collect()
    )
    assert a == b and a, f"paths disagree: {len(a)} vs {len(b)} spans"

    samples: dict[str, list[float]] = {"expr": [], "rolling": []}
    for p in range(pairs):
        order = ["expr", "rolling"] if p % 2 == 0 else ["rolling", "expr"]
        for m in order:
            t0 = time.time()
            repeated_spans(tok, n=n, method=m).count()
            samples[m].append(round(time.time() - t0, 3))

    mins = {m: min(v) for m, v in samples.items()}
    result = {
        "bench": "window_hash",
        "n_docs": n_docs,
        "n_tokens": int(n_tokens),
        "window_n": n,
        "cores": cores,
        "pairs": pairs,
        "n_spans": len(a),
        "min_sec": mins,
        "speedup_rolling": round(mins["expr"] / mins["rolling"], 2),
        "all_samples": samples,
        "spans_identical": True,
        "note": (
            "expr = per-window string + md5 (DuckDB-oracle-reproducible); "
            "rolling = per-unique-token md5 + vectorized dual Karp-Rabin"
        ),
    }
    shutil.rmtree(data_dir, ignore_errors=True)
    spark.stop()
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/window_hash.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
