"""Benchmark harness — run headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north-star build metric is files/sec (index-build throughput); it is
reported in the JSON alongside per-query wall times.  Scaling-efficiency
evidence (local[8] vs local[32]) is produced by bench_scaling.py →
BENCH/BASELINE.md.
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


def run_bench(sf_dir: str, cores: int, out_stream=sys.stdout) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from simplir_spark.operators.index_build import build_index, open_index
    from simplir_spark.operators.query_indexed import bm25_indexed
    from simplir_spark.queryset import QUERIES

    spark = get_spark("simplir_bench", cores=cores, shuffle_partitions=cores)
    corpus = entry._corpus(spark, sf_dir)
    n_docs = corpus.count()

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # q1: index build (cold, fresh dir) — THE north-star number
    idx_dir = tempfile.mkdtemp(prefix="simplir_bench_idx_")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, corpus, idx_dir)
    timings["index_build"] = round(time.time() - t0, 3)
    extra["files_per_sec"] = round(n_docs / timings["index_build"], 2)

    # q1b: DATA-DOMINATED build throughput — the headline.  At sf0.1's
    # 5k docs the raw build is fixed overhead (4 checkpointed stages of
    # job scheduling + parquet commits; ~2.5s regardless of cores), so
    # files/sec there measures Spark's floor, not the engine.  Replicate
    # the corpus deterministically (same trick as bench_scaling.py) so
    # the build spends its time in tokenize/encode/shuffle like a real
    # corpus would; the raw number stays in extra["files_per_sec"].
    amplify = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "100"))
    if amplify > 1:
        copies = spark.range(amplify).select(F.col("id").alias("copy"))
        amp_corpus = (
            corpus.repartition(cores * 2)
            .crossJoin(F.broadcast(copies))
            .select(
                (F.col("doc_key") * amplify + F.col("copy")).alias("doc_key"),
                "content",
            )
        )
        n_amp = n_docs * amplify
        amp_dir = tempfile.mkdtemp(prefix="simplir_bench_amp_")
        shutil.rmtree(amp_dir, ignore_errors=True)
        t0 = time.time()
        build_index(spark, amp_corpus, amp_dir)
        timings["index_build_amplified"] = round(time.time() - t0, 3)
        extra["amplify"] = amplify
        extra["n_docs_amplified"] = n_amp
        extra["files_per_sec_amplified"] = round(
            n_amp / timings["index_build_amplified"], 2
        )
        shutil.rmtree(amp_dir, ignore_errors=True)

    idx = open_index(spark, idx_dir)

    # q2: indexed BM25 top-k, full reference query set
    t0 = time.time()
    bm25_indexed(spark, idx, QUERIES, k=10).collect()
    timings["bm25_topk_indexed"] = round(time.time() - t0, 3)

    # q3: scan-mode BM25 (index-free EP1 path)
    t0 = time.time()
    entry.q_bm25_topk(spark, sf_dir).collect()
    timings["bm25_topk_scan"] = round(time.time() - t0, 3)

    # q4: term stats over the corpus
    t0 = time.time()
    entry.q_term_stats(spark, sf_dir).collect()
    timings["term_stats"] = round(time.time() - t0, 3)

    # q5: exact dedup
    t0 = time.time()
    entry.q_dedup_exact(spark, sf_dir).count()
    timings["dedup_exact"] = round(time.time() - t0, 3)

    # q6: minhash LSH candidate pairs
    try:
        from simplir_spark.functions.tokenize import with_tokens
        from simplir_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
            ngram_shingles,
        )

        t0 = time.time()
        tok = with_tokens(corpus).select(F.col("doc_key").alias("doc_id"), "terms")
        sh = ngram_shingles(tok)
        minhash_lsh_pairs(minhash_signatures(sh)).count()
        timings["minhash_lsh"] = round(time.time() - t0, 3)
    except Exception as e:  # keep bench robust while ops evolve
        extra["minhash_lsh_error"] = str(e)[:100]

    # q7: phrase matching (trie semantics, one corpus pass)
    t0 = time.time()
    entry.q_phrase_match(spark, sf_dir).count()
    timings["phrase_match"] = round(time.time() - t0, 3)

    # q8: parametric query-DSL grid (2 paramsets, one pass)
    t0 = time.time()
    entry.q_query_dsl_grid(spark, sf_dir).collect()
    timings["query_dsl_grid"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "index_build_files_per_sec",
        "value": extra.get("files_per_sec_amplified", extra["files_per_sec"]),
        "unit": "files/sec",
        "queries": timings,
        "total_sec": total,
        "sf": sf_dir,
        "cores": cores,
        "n_docs": n_docs,
        "extra": extra,
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(result), file=out_stream, flush=True)
    return result


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    run_bench(sf_dir, cores)
