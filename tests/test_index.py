"""Index build / merge / indexed-query gates (SURVEY.md §7 M2-M4).

Ports the reference's property suite: postings round-trip
(Posting2/Tests.hs:22-39), merge-contains-all (DiskIndex/Tests.hs:24-74),
plus BASELINE.json invariants: dense ids, sha256 integrity, resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import duckdb
import pytest
from pyspark.sql import functions as F

from simplir_spark.functions import codec
from simplir_spark.operators.index_build import build_index, open_index
from simplir_spark.operators.merge import merge_indexes
from simplir_spark.operators.query_indexed import bm25_indexed, score_query_runs
from simplir_spark.queryset import QUERIES
from tests.oracle import build_oracle_index, bm25_topk

SF = "/root/testdata/sf0.001"
K = 10
REL_TOL = 1e-9


@pytest.fixture(scope="module")
def oracle_idx():
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    return build_oracle_index([(f"doc{int(i):012d}", t) for i, t in rows])


@pytest.fixture(scope="module")
def index_dir(spark, corpus_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "full")
    build_index(spark, corpus_small, out, n_partitions=8, run_size=64)
    return out


def _postings_map(spark, root) -> dict[str, dict[int, int]]:
    """Decode the whole postings table to {term: {did: tf}}."""
    idx = open_index(spark, root)
    out: dict[str, dict[int, int]] = {}
    for r in idx.postings.collect():
        dids, tfs, _ = codec.decode_run(r.start_did, r.n, bytes(r.deltas), bytes(r.tfs), bytes(r.dls))
        d = out.setdefault(r.term, {})
        for did, tf in zip(dids.tolist(), tfs.tolist()):
            assert did not in d, f"duplicate did {did} for term {r.term}"
            d[did] = tf
    return out


def test_docmeta_dense_ids_and_integrity(spark, index_dir, oracle_idx):
    idx = open_index(spark, index_dir)
    rows = idx.docmeta.orderBy("did").collect()
    assert [r.did for r in rows] == list(range(len(rows)))
    assert [r.doc_key for r in rows] == sorted(r.doc_key for r in rows)
    assert len(rows) == oracle_idx.doc_count
    # per-row sha256(content) equality vs the source table (BASELINE.json)
    src = duckdb.sql(
        f"select format('doc{{:012d}}', doc_id) k, sha256(text) h"
        f" from read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    src_h = dict(src)
    for r in rows:
        assert r.sha256 == src_h[r.doc_key]
    # doc lens match oracle
    for r in rows:
        i = oracle_idx.doc_keys.index(r.doc_key)
        assert r.doc_len == oracle_idx.doc_lens[i]
        assert r.doc_len_alnum == oracle_idx.doc_lens_alnum[i]


def test_postings_contain_all(spark, index_dir, oracle_idx):
    got = _postings_map(spark, index_dir)
    # oracle: doc_keys sorted == did order
    want: dict[str, dict[int, int]] = {}
    for did, tfs in enumerate(oracle_idx.tfs):
        for t, n in tfs.items():
            want.setdefault(t, {})[did] = n
    assert got == want


def test_runs_are_doc_sorted_and_chunked(spark, index_dir):
    idx = open_index(spark, index_dir)
    for r in idx.postings.collect():
        assert r.n <= 64  # run_size passed to the build
        dids, tfs, dls = codec.decode_run(r.start_did, r.n, bytes(r.deltas), bytes(r.tfs), bytes(r.dls))
        assert (np.diff(dids) > 0).all()
        assert r.start_did == dids[0] and r.end_did == dids[-1]
        assert r.max_tf == tfs.max() and r.sum_tf == tfs.sum()


def test_term_stats_match_oracle(spark, index_dir, oracle_idx):
    idx = open_index(spark, index_dir)
    got = {r.term: (r.df, r.cf) for r in idx.term_stats.collect()}
    want = {t: (oracle_idx.df[t], oracle_idx.cf[t]) for t in oracle_idx.df}
    assert got == want
    assert idx.doc_count == oracle_idx.doc_count
    assert idx.token_count == oracle_idx.token_count


def test_bm25_indexed_rank_identical(spark, index_dir, oracle_idx):
    idx = open_index(spark, index_dir)
    got = bm25_indexed(spark, idx, QUERIES, k=K).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in QUERIES:
        want = bm25_topk(oracle_idx, terms, K)
        have = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert len(have) == len(want), qid
        for r, (rank, key, score) in zip(have, want):
            assert (r.rank, r.doc_key) == (rank, key), f"{qid} rank {rank}"
            assert abs(r.score - score) <= REL_TOL * max(1.0, abs(score))


def test_resume_skips_all_stages(spark, corpus_small, tmp_path_factory):
    from simplir_spark.plans.pipeline import PipelineRunner  # noqa: F401

    # two-stage layout pinned: this test covers ITS lineage contract;
    # the fused layout's resume skip is covered by the fused-build test
    import io, json, os
    d = str(tmp_path_factory.mktemp("resume_all") / "idx")
    build_index(spark, corpus_small, d, n_partitions=8, run_size=64, fused=False)
    # second build over the same inputs: every stage must be skipped
    paths = build_index(spark, corpus_small, d, n_partitions=8, run_size=64, fused=False)
    lineage = os.path.join(d, "_lineage")
    assert {f for f in os.listdir(lineage)} == {
        "tokenized.json", "postings.json", "term_stats.json", "corpus_stats.json",
    }
    # stage runner reported skips (wall 0) — verify via fresh runner behavior:
    # the manifests exist and build_index returned instantly reusing them.
    for f in os.listdir(lineage):
        with open(os.path.join(lineage, f)) as fh:
            m = json.load(fh)
        assert "fingerprint" in m


def test_merge_equals_full_build(spark, corpus_small, index_dir, oracle_idx, tmp_path_factory):
    """DiskIndex/Tests.hs:24-74 merge-contains-all, strengthened to exact
    equality: split the corpus into contiguous key ranges, build per-part
    indexes, merge, and compare postings + stats to the full build."""
    base = tmp_path_factory.mktemp("merge")
    keys = sorted(r.doc_key for r in corpus_small.select(
        F.format_string("doc%012d", F.col("doc_id")).alias("doc_key")).collect()
    ) if "doc_id" in corpus_small.columns else None

    from simplir_spark.sources.corpus import load_corpus
    corpus = load_corpus(spark, SF)
    all_keys = sorted(r.doc_key for r in corpus.select("doc_key").collect())
    cut1, cut2 = all_keys[len(all_keys) // 3], all_keys[2 * len(all_keys) // 3]

    parts = [
        corpus.filter(F.col("doc_key") < cut1),
        corpus.filter((F.col("doc_key") >= cut1) & (F.col("doc_key") < cut2)),
        corpus.filter(F.col("doc_key") >= cut2),
    ]
    srcs = []
    for i, p in enumerate(parts):
        d = str(base / f"part{i}")
        build_index(spark, p, d, n_partitions=4, run_size=64)
        srcs.append(d)
    merged_dir = str(base / "merged")
    merge_indexes(spark, srcs, merged_dir)

    assert _postings_map(spark, merged_dir) == _postings_map(spark, index_dir)
    mi = open_index(spark, merged_dir)
    fi = open_index(spark, index_dir)
    assert mi.doc_count == fi.doc_count and mi.token_count == fi.token_count
    got = {r.term: (r.df, r.cf) for r in mi.term_stats.collect()}
    want = {r.term: (r.df, r.cf) for r in fi.term_stats.collect()}
    assert got == want
    # docmeta identical (contiguous ranges + in-order merge -> same dids)
    a = {(r.did, r.doc_key, r.doc_len) for r in mi.docmeta.collect()}
    b = {(r.did, r.doc_key, r.doc_len) for r in fi.docmeta.collect()}
    assert a == b
    # and the merged index answers queries rank-identically
    got_q = bm25_indexed(spark, mi, QUERIES[:6], k=K).collect()
    by_q: dict[str, list] = {}
    for r in got_q:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in QUERIES[:6]:
        want_q = bm25_topk(oracle_idx, terms, K)
        have = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [(r.rank, r.doc_key) for r in have] == [(rk, key) for rk, key, _ in want_q], qid


def test_blockmax_pruning_skips_runs_and_preserves_topk():
    """Unit-level: selective query over synthetic runs — pruned result equals
    full decode, with strictly fewer runs decoded."""
    rng = np.random.RandomState(7)
    n_docs, run_size = 5000, 128
    rows = []
    # common term: every doc, tf 1..3; rare term: 20 docs, huge tf
    for term, df_sel, tf_hi in [("common", np.arange(n_docs), 3), ("rare", np.arange(0, 200, 10), 50)]:
        dids = np.asarray(df_sel, dtype=np.int64)
        tfs = rng.randint(1, tf_hi + 1, size=len(dids)).astype(np.int64)
        dls = np.full(len(dids), 100, dtype=np.int64)
        for s in range(0, len(dids), run_size):
            e = min(s + run_size, len(dids))
            run = codec.encode_run(dids[s:e], tfs[s:e], dls[s:e])
            rows.append({"term": term, "df": len(dids), **run})
    runs = pd.DataFrame(rows)

    cnt = [0, 0]
    d1, s1 = score_query_runs(runs, n_docs, 100.0, 10, decode_counter=cnt)
    # full decode baseline: force no pruning by k >= n_docs
    d2, s2 = score_query_runs(runs, n_docs, 100.0, n_docs)
    top_full = sorted(zip(-s2, d2))[:10]
    assert d1.tolist() == [int(d) for _, d in top_full]
    np.testing.assert_allclose(s1, [-s for s, _ in top_full], rtol=1e-12)
    assert cnt[0] < cnt[1], f"no pruning happened: {cnt}"


def test_murmur3_matches_spark_hash(spark):
    """probe_shuffle_keys relies on the pure-Python murmur3 equaling
    Spark's Murmur3Hash (F.hash / HashPartitioning) on int32 inputs."""
    from simplir_spark.operators.index_build import murmur3_int32, probe_shuffle_keys

    xs = list(range(0, 200)) + [2**31 - 1, -1, -2**31, 123456789]
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    got = {r["x"]: r["h"] for r in df.select("x", F.hash("x").alias("h")).collect()}
    for x in xs:
        assert murmur3_int32(x) == got[x], x
    # and the probed keys really land one bucket per partition
    keys = probe_shuffle_keys(8, 8)
    kdf = spark.createDataFrame([(k,) for k in keys], "k int").repartition(8, "k")
    parts = kdf.select(F.spark_partition_id().alias("p"), "k").collect()
    placed = {r["k"]: r["p"] for r in parts}
    assert sorted(placed.values()) == list(range(8))
    assert [placed[k] for k in keys] == list(range(8))


def test_partial_resume_rebuilds_only_downstream(spark, corpus_small, tmp_path_factory):
    """Kill/resume: wipe one stage's output, re-run the build — upstream
    stages are skipped (same fingerprints), the wiped stage and its
    dependents are rebuilt, and the index still answers correctly."""
    import json, os, shutil

    out = str(tmp_path_factory.mktemp("resume") / "idx")
    build_index(spark, corpus_small, out, n_partitions=4, run_size=64, fused=False)

    def mtimes():
        return {
            n: os.path.getmtime(os.path.join(out, "_lineage", n))
            for n in os.listdir(os.path.join(out, "_lineage"))
        }

    before = mtimes()
    shutil.rmtree(os.path.join(out, "postings"))
    build_index(spark, corpus_small, out, n_partitions=4, run_size=64, fused=False)
    after = mtimes()
    assert after["tokenized.json"] == before["tokenized.json"]  # skipped
    assert after["postings.json"] > before["postings.json"]     # rebuilt
    idx = open_index(spark, out)
    got = bm25_indexed(spark, idx, QUERIES[:3], k=K)
    assert got.count() > 0


def test_postings_scan_prunes_on_term(spark, index_dir):
    """The query path's term filter must reach the parquet scan
    (PushedFilters) — the Spark analog of the reference's term->offset
    index lookup (TermIndex.hs:26-34)."""
    idx = open_index(spark, index_dir)
    plan = idx.postings.filter(F.col("term").isin(["join", "hash"]))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_hot_term_splits_across_partitions(spark, tmp_path_factory):
    """Skew handling (BASELINE.json): a term whose postings exceed one
    partition's share is range-split into sub-runs across ADJACENT
    partition files, each run staying within run_size."""
    import os

    rows = [(i, "hot " * 5 + f"uniq{i:04d}word") for i in range(2000)]
    corpus = spark.createDataFrame(rows, "doc_key long, content string")
    out = str(tmp_path_factory.mktemp("skew") / "idx")
    build_index(spark, corpus, out, n_partitions=8, run_size=64)
    idx = open_index(spark, out)
    hot = idx.postings.filter(F.col("term") == "hot").select(
        F.input_file_name().alias("f"), "start_did", "end_did", "n"
    ).collect()
    assert sum(r.n for r in hot) == 2000
    assert all(r.n <= 64 for r in hot)
    files = {r.f for r in hot}
    assert len(files) > 1, "hot term should span multiple partition files"
    # runs are globally did-ordered and non-overlapping
    spans = sorted((r.start_did, r.end_did) for r in hot)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 < s2


def test_build_empty_corpus(spark, tmp_path_factory):
    corpus = spark.createDataFrame([], "doc_key string, content string")
    out = str(tmp_path_factory.mktemp("empty") / "idx")
    build_index(spark, corpus, out, n_partitions=4)
    idx = open_index(spark, out)
    assert idx.doc_count == 0 and idx.postings.count() == 0
    assert bm25_indexed(spark, idx, QUERIES[:2], k=5).count() == 0


def test_ql_indexed_matches_scan(spark, index_dir, corpus_small):
    """Indexed Dirichlet-QL (dense decomposition) must reproduce the
    scan-mode QL ranking (itself oracle-checked) — full ranking compared
    as rounded-score multisets per query."""
    from simplir_spark.operators.query import bm25_scan
    from simplir_spark.operators.query_indexed import ql_dirichlet_indexed

    queries = [q for q in QUERIES if q[0] not in ("Q08", "Q09", "Q14")][:8]
    idx = open_index(spark, index_dir)
    got = ql_dirichlet_indexed(spark, idx, queries, k=10_000, mu=1000.0)
    want = bm25_scan(spark, corpus_small, queries, k=10_000, model="ql_dirichlet", mu=1000.0)
    g = {}
    for r in got.collect():
        g.setdefault(r.query_id, []).append((r.doc_key, round(r.score, 6)))
    w = {}
    for r in want.collect():
        w.setdefault(r.query_id, []).append((f"doc{int(r.doc_key):012d}" if str(r.doc_key).isdigit() else r.doc_key, round(r.score, 6)))
    assert set(g) == set(w)
    for qid in g:
        assert sorted(g[qid]) == sorted(w[qid]), qid


def test_compact_postings_preserves_results(spark, corpus_small, index_dir, tmp_path_factory):
    """compactPostings (Search2.hs:104-113): short adjacent runs merge into
    full-size runs; query results and posting statistics are unchanged."""
    from simplir_spark.operators.merge import compact_index

    dst = str(tmp_path_factory.mktemp("compacted"))
    compact_index(spark, index_dir, dst, run_size=1 << 14)

    src_idx = open_index(spark, index_dir)
    dst_idx = open_index(spark, dst)

    n_src = src_idx.postings.count()
    n_dst = dst_idx.postings.count()
    assert n_dst < n_src  # run_size=64 build must have mergeable short runs

    agg = lambda df: df.agg(
        F.sum("n").alias("n"), F.sum("sum_tf").alias("s"), F.max("max_tf").alias("m")
    ).collect()[0]
    a, b = agg(src_idx.postings), agg(dst_idx.postings)
    assert (a["n"], a["s"], a["m"]) == (b["n"], b["s"], b["m"])

    before = {
        (r.query_id, r.doc_key, r.rank): round(r.score, 9)
        for r in bm25_indexed(spark, src_idx, QUERIES, k=10).collect()
    }
    after = {
        (r.query_id, r.doc_key, r.rank): round(r.score, 9)
        for r in bm25_indexed(spark, dst_idx, QUERIES, k=10).collect()
    }
    assert before == after


def test_compact_runs_are_full_size(spark, corpus_small, index_dir, tmp_path_factory):
    from simplir_spark.operators.merge import compact_postings

    src = open_index(spark, index_dir)
    compacted = compact_postings(src.postings, run_size=1 << 14).withColumn(
        "pid", F.spark_partition_id()
    )
    # within one partition a term keeps at most ONE short run (terms may
    # span adjacent range buckets — one short survivor per side, exactly
    # the reference's per-key-range behavior)
    rows = compacted.groupBy("term", "pid").agg(
        F.sum(F.when(F.col("n") < (1 << 13), 1).otherwise(0)).alias("n_short")
    ).collect()
    assert all(r["n_short"] <= 1 for r in rows)


def test_arrow_encoder_matches_pandas_encoder(spark):
    """The mapInArrow partition run encoder is a pure performance rewrite
    of the mapInPandas one — same partition input must yield the SAME runs
    (terms, boundaries, stats, and byte-identical blobs)."""
    import random

    from simplir_spark.operators.index_build import (
        make_partition_run_encoder,
        make_partition_run_encoder_arrow,
    )
    from simplir_spark.schema import POSTINGS_SCHEMA

    rng = random.Random(42)
    vocab = [f"t{i:03d}" for i in range(40)]
    rows = []
    for did in range(300):
        n_terms = rng.randint(1, 12)
        terms = sorted(rng.sample(vocab, n_terms))
        tfs = [rng.randint(1, 5) for _ in terms]
        rows.append((did, sum(tfs), terms, [int(x) for x in tfs]))
    tok = spark.createDataFrame(
        rows, "did long, doc_len int, terms array<string>, tfs array<long>"
    ).repartitionByRange(3, "did").sortWithinPartitions("did")
    run_size = 7  # tiny so multi-run terms appear

    cols = ["term", "start_did", "n", "max_tf", "sum_tf", "deltas", "tfs", "dls"]

    def canon(recs):
        return sorted(
            (r["term"], r["start_did"], r["n"], r["max_tf"], r["sum_tf"],
             bytes(r["deltas"]), bytes(r["tfs"]), bytes(r["dls"]))
            for r in recs
        )

    a = canon(
        tok.mapInArrow(make_partition_run_encoder_arrow(run_size), POSTINGS_SCHEMA)
        .select(*cols).collect()
    )
    p = canon(
        tok.mapInPandas(make_partition_run_encoder(run_size), POSTINGS_SCHEMA)
        .select(*cols).collect()
    )
    assert len(a) == len(p) > 0
    assert a == p


def test_arrow_tokenize_kernel_matches_pandas(spark):
    """The mapInArrow tokenize-assign kernel must agree with the pandas
    kernel row-for-row (dids, terms, tfs, lengths) on edge-case content:
    empty docs, NUL bytes, unicode, pure-punctuation docs."""
    from simplir_spark.functions.tokenize import jvm_raw_tokens_expr
    from simplir_spark.operators.index_build import (
        make_tokenize_assign_kernel,
        make_tokenize_assign_kernel_arrow,
    )

    docs = [
        ("d00", "Hello, World! hello"),
        ("d01", ""),
        ("d02", "   \t\n  "),
        ("d03", "a b c a b a"),
        ("d04", "nul\x00inside token\x00s here"),
        ("d05", "çağrı ÇAĞRI straße STRASSE"),
        ("d06", "!!! ??? ..."),
        ("d07", "x" * 50 + " y z"),
    ]
    df = spark.createDataFrame(docs, "doc_key string, content string").withColumn(
        "_bucket", (F.col("doc_key").substr(2, 2).cast("int") / 4).cast("int")
    ).withColumn("sha256", F.sha2("content", 256))
    offsets = {0: 0, 1: 100}
    heavy = (
        df.repartition(1)
        .sortWithinPartitions("_bucket", "doc_key")
        .withColumn("_raw", jvm_raw_tokens_expr("content"))
        .drop("content")
    )
    schema = (
        "did long, doc_key string, sha256 string, terms array<string>, "
        "tfs array<long>, doc_len int, doc_len_alnum int"
    )
    carry = ["doc_key", "sha256"]
    a = {
        r["doc_key"]: r
        for r in heavy.mapInArrow(
            make_tokenize_assign_kernel_arrow(offsets, carry), schema
        ).collect()
    }
    p = {
        r["doc_key"]: r
        for r in heavy.mapInPandas(
            make_tokenize_assign_kernel(offsets, carry, False), schema
        ).collect()
    }
    assert set(a) == set(p) == {k for k, _ in docs}
    for k in a:
        ra, rp = a[k], p[k]
        assert (ra["did"], ra["terms"], ra["tfs"], ra["doc_len"],
                ra["doc_len_alnum"], ra["sha256"]) == (
            rp["did"], rp["terms"], rp["tfs"], rp["doc_len"],
            rp["doc_len_alnum"], rp["sha256"]), k


def test_arrow_tokenize_kernel_positions_matches_pandas(spark):
    """Positional layout parity: the Arrow kernel's (terms, positions)
    occurrence stream must equal the pandas kernel's on edge-case
    content (leading/trailing whitespace shifts, killed tokens keeping
    their raw position, NULs, unicode)."""
    from simplir_spark.functions.tokenize import jvm_raw_tokens_expr
    from simplir_spark.operators.index_build import (
        make_tokenize_assign_kernel,
        make_tokenize_assign_kernel_arrow,
    )

    docs = [
        ("d00", "  leading space Word word"),
        ("d01", ""),
        ("d02", "123 456 foo2 bar"),  # digit tokens normalize to ''
        ("d03", "a b c a b a"),
        ("d04", "nul\x00inside token here"),
        ("d05", "çağrı ÇAĞRI straße"),
        ("d06", "!!! stop ??? go ..."),
        ("d07", "tail space  "),
    ]
    df = spark.createDataFrame(docs, "doc_key string, content string").withColumn(
        "_bucket", F.lit(0)
    ).withColumn("sha256", F.sha2("content", 256))
    offsets = {0: 0}
    base = df.repartition(1).sortWithinPartitions("_bucket", "doc_key")
    schema = (
        "did long, doc_key string, sha256 string, terms array<string>, "
        "positions array<int>, doc_len int, doc_len_alnum int"
    )
    carry = ["doc_key", "sha256"]
    heavy_arrow = base.withColumn("_raw", jvm_raw_tokens_expr("content")).drop("content")
    a = {
        r["doc_key"]: r
        for r in heavy_arrow.mapInArrow(
            make_tokenize_assign_kernel_arrow(offsets, carry, True), schema
        ).collect()
    }
    p = {
        r["doc_key"]: r
        for r in base.mapInPandas(
            make_tokenize_assign_kernel(offsets, carry, True), schema
        ).collect()
    }
    assert set(a) == set(p) == {k for k, _ in docs}
    for k in a:
        ra, rp = a[k], p[k]
        assert (ra["did"], ra["terms"], ra["positions"], ra["doc_len"],
                ra["doc_len_alnum"]) == (
            rp["did"], rp["terms"], rp["positions"], rp["doc_len"],
            rp["doc_len_alnum"]), k


def test_bm25_indexed_plan_broadcasts_and_prunes(spark, index_dir):
    """Plan audit for the indexed query path: the (query_id, term) side
    must broadcast (no shuffle of the postings for the join) and the
    final docmeta resolution must broadcast the bounded top-k, keeping
    the big tables shuffle-free end to end."""
    idx = open_index(spark, index_dir)
    df = bm25_indexed(spark, idx, QUERIES[:4], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    # docmeta scan keeps did pushdown (min/max row-group pruning)
    assert "PushedFilters" in plan, plan
    # the postings side must NOT be exchanged for the query join
    # (broadcast goes the other way); hash exchanges exist only for the
    # groupBy(query_id, shard) scorer and the window top-k — 2 in the
    # plan, AQE prints initial+current sections so allow the double
    assert 0 < plan.count("Exchange hashpartitioning") <= 4, plan
    assert "IN (" in plan or "In(term" in plan, plan  # term pruning reached the scan


def test_fused_build_matches_two_stage(spark, corpus_small, index_dir, oracle_idx, tmp_path_factory):
    """The fused (single-heavy-pass) build must be value-identical to the
    two-stage build: same docmeta, term stats, postings, and
    rank-identical BM25 — only the stage graph (and the absence of the
    terms/tfs intermediate) differs."""
    d = str(tmp_path_factory.mktemp("fused") / "idx")
    build_index(spark, corpus_small, d, n_partitions=8, run_size=64, fused=True)
    fi = open_index(spark, d)
    ti = open_index(spark, index_dir)
    assert fi.doc_count == ti.doc_count and fi.token_count == ti.token_count
    assert {(r.term, r.df, r.cf) for r in fi.term_stats.collect()} == {
        (r.term, r.df, r.cf) for r in ti.term_stats.collect()
    }
    assert _postings_map(spark, d) == _postings_map(spark, index_dir)
    a = {(r.did, r.doc_key, r.doc_len, r.doc_len_alnum) for r in fi.docmeta.collect()}
    b = {(r.did, r.doc_key, r.doc_len, r.doc_len_alnum) for r in ti.docmeta.collect()}
    assert a == b
    got = bm25_indexed(spark, fi, QUERIES, k=K).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in QUERIES:
        want = bm25_topk(oracle_idx, terms, K)
        have = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [(r.rank, r.doc_key) for r in have] == [(rk, ky) for rk, ky, _ in want], qid
    # resume: second run skips every stage
    import glob as _glob, json as _json, os as _os
    build_index(spark, corpus_small, d, n_partitions=8, run_size=64, fused=True)
    names = {_os.path.basename(f) for f in _glob.glob(_os.path.join(d, "_lineage", "*.json"))}
    assert names == {"chunks.json", "docmeta.json", "postings.json",
                     "term_stats.json", "corpus_stats.json"}


def test_bucket_expr_forms_agree(spark):
    """The sqrt-decomposed two-level bucket assignment (the default) and
    the nested-CASE binary-search form must agree with the O(n_cuts)
    linear-scan reference on every key, including keys equal to a cut
    (boundary inclusivity), keys outside the cut range, and cut counts
    straddling the sqrt-path threshold."""
    from simplir_spark.operators.index_build import (
        _bucket_expr_case,
        _bucket_expr_linear,
        _term_did_bucket_expr_linear,
        bucket_expr,
        term_did_bucket_expr,
    )

    rng = np.random.RandomState(7)
    keys = sorted({f"doc{int(x):012d}" for x in rng.randint(0, 10_000, 400)})
    for n_cuts in (1, 2, 3, 7, 64, 127, 128, 129, 255, 360):
        cuts = sorted(rng.choice(keys, size=min(n_cuts, len(keys)), replace=False).tolist())
        df = spark.createDataFrame([(k,) for k in keys] + [("", ), ("zzzz",)], "doc_key string")
        got = df.select(
            bucket_expr("doc_key", cuts).alias("bs"),
            _bucket_expr_case("doc_key", cuts).alias("cs"),
            _bucket_expr_linear("doc_key", cuts).alias("lin"),
        ).collect()
        for r in got:
            assert r["bs"] == r["lin"] == r["cs"], (n_cuts, r)

    # (term, did) lexicographic variant, boundary did inclusive — one
    # small-cut case and one crossing the sqrt threshold
    terms = ["alpha", "beta", "gamma", "delta"]
    rows = [(t, int(d)) for t in terms for d in rng.randint(0, 50, 30)]
    small = sorted({("beta", 10), ("beta", 25), ("delta", 0), ("gamma", 49)})
    big = sorted({(t, int(d)) for t in terms for d in rng.randint(0, 50, 40)})
    df = spark.createDataFrame(rows, "term string, did long")
    for td_cuts in (small, big):
        got = df.select(
            term_did_bucket_expr(td_cuts).alias("bs"),
            _term_did_bucket_expr_linear(td_cuts).alias("lin"),
        ).collect()
        for r in got:
            assert r["bs"] == r["lin"], (len(td_cuts), r)


def test_theta0_seed_deepens_pruning_and_preserves_topk():
    """Unit-level: an external score floor (the cross-shard seed, TopK.hs
    single-threshold analog) must decode strictly fewer runs while
    returning exactly the docs at-or-above the floor, in order."""
    rng = np.random.RandomState(11)
    n_docs, run_size = 5000, 128
    rows = []
    for term, df_sel, tf_hi in [("common", np.arange(n_docs), 3), ("rare", np.arange(0, 200, 10), 50)]:
        dids = np.asarray(df_sel, dtype=np.int64)
        tfs = rng.randint(1, tf_hi + 1, size=len(dids)).astype(np.int64)
        dls = np.full(len(dids), 100, dtype=np.int64)
        for s in range(0, len(dids), run_size):
            e = min(s + run_size, len(dids))
            run = codec.encode_run(dids[s:e], tfs[s:e], dls[s:e])
            rows.append({"term": term, "df": len(dids), **run})
    runs = pd.DataFrame(rows)

    base_cnt = [0, 0]
    d0, s0 = score_query_runs(
        runs, n_docs, 100.0, 10, decode_counter=base_cnt, did_lo=0, did_hi=n_docs
    )
    # contract 1: a floor at our own 5th score — every returned doc
    # at-or-above the floor matches the unseeded run, never more decodes
    theta0 = float(s0[4])
    seed_cnt = [0, 0]
    d1, s1 = score_query_runs(
        runs, n_docs, 100.0, 10, decode_counter=seed_cnt,
        did_lo=0, did_hi=n_docs, theta0=theta0,
    )
    keep = s0 >= theta0
    assert d1[: keep.sum()].tolist() == d0[keep].tolist()
    np.testing.assert_allclose(s1[: keep.sum()], s0[keep], rtol=1e-12)
    assert seed_cnt[0] <= base_cnt[0], (seed_cnt, base_cnt)

    # contract 2: a floor above every reachable upper bound (a denser
    # shard already holds k far better docs) must skip ALL runs — the
    # whole point of cross-shard seeding: late shards decode nothing
    high_cnt = [0, 0]
    d2, s2 = score_query_runs(
        runs, n_docs, 100.0, 10, decode_counter=high_cnt,
        did_lo=0, did_hi=n_docs, theta0=float(s0[0]) * 2.0 + 1.0,
    )
    assert high_cnt[0] == 0, high_cnt
    assert len(d2) == 0


def test_bm25_indexed_seeded_equals_unseeded(spark, index_dir, oracle_idx):
    """End-to-end: the seeded cross-shard threshold pass must be
    result-invisible — identical (rank, doc_key, score) with and without
    seeding, at several shard counts, and rank-identical to the oracle."""
    idx = open_index(spark, index_dir)
    for n_shards in (2, 5):
        a = sorted(
            (r.query_id, r.rank, r.doc_key, round(r.score, 12))
            for r in bm25_indexed(
                spark, idx, QUERIES, k=K, n_shards=n_shards, seed_threshold=True
            ).collect()
        )
        b = sorted(
            (r.query_id, r.rank, r.doc_key, round(r.score, 12))
            for r in bm25_indexed(
                spark, idx, QUERIES, k=K, n_shards=n_shards, seed_threshold=False
            ).collect()
        )
        assert a == b, n_shards
    by_q: dict[str, list] = {}
    for qid, rank, key, _ in a:
        by_q.setdefault(qid, []).append((rank, key))
    for qid, terms in QUERIES:
        want = [(rk, ky) for rk, ky, _ in bm25_topk(oracle_idx, terms, K)]
        assert sorted(by_q.get(qid, [])) == want, qid


def test_compact_postings_rejects_mixed_pos_buffers(spark):
    """A term whose short runs mix positional and non-positional blobs
    cannot be merged without misaligning positions — the kernel must
    raise, not silently assign positions to the wrong postings."""
    from simplir_spark.operators.merge import compact_postings

    dids = np.arange(4, dtype=np.int64)
    tfs = np.ones(4, dtype=np.int64)
    dls = np.full(4, 10, dtype=np.int64)
    rows = []
    for i in range(2):
        r = codec.encode_run(dids[i * 2 : i * 2 + 2], tfs[:2], dls[:2])
        pos = codec.encode_positions([np.array([1]), np.array([2])]) if i == 0 else None
        rows.append(("t", r["start_did"], r["end_did"], r["n"], r["max_tf"],
                     r["sum_tf"], r["deltas"], r["tfs"], r["dls"], pos))
    df = spark.createDataFrame(
        rows,
        "term string, start_did long, end_did long, n int, max_tf long, "
        "sum_tf long, deltas binary, tfs binary, dls binary, pos binary",
    ).coalesce(1)
    with pytest.raises(Exception, match="mixes positional"):
        compact_postings(df, run_size=64, min_run=32).collect()


def test_load_corpus_bare_relative_directory(spark, tmp_path_factory):
    """A slash-free RELATIVE directory name must read as parquet
    ({dir}/documents.parquet), not fall through to a catalog lookup."""
    import os
    import shutil

    from simplir_spark.sources.corpus import load_corpus

    base = tmp_path_factory.mktemp("barecorp")
    shutil.copyfile(
        "/root/testdata/sf0.001/documents.parquet",
        str(base / "documents.parquet"),
    )
    cwd = os.getcwd()
    os.chdir(str(base.parent))
    try:
        df = load_corpus(spark, base.name)
        assert df.count() > 0
        assert "doc_key" in df.columns
    finally:
        os.chdir(cwd)


def test_build_with_many_buckets_exercises_sqrt_path(spark, corpus_small, oracle_idx, tmp_path_factory):
    """A build whose cut count crosses the sqrt-decomposition threshold
    (>= 128 cuts) must still produce dense ids and rank-identical BM25 —
    the end-to-end gate for the two-level bucket assignment."""
    d = str(tmp_path_factory.mktemp("manybuckets") / "idx")
    build_index(spark, corpus_small, d, n_partitions=200, run_size=64)
    idx = open_index(spark, d)
    rows = idx.docmeta.orderBy("did").collect()
    assert [r.did for r in rows] == list(range(len(rows)))
    assert [r.doc_key for r in rows] == sorted(r.doc_key for r in rows)
    got = bm25_indexed(spark, idx, QUERIES[:4], k=K).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in QUERIES[:4]:
        want = bm25_topk(oracle_idx, terms, K)
        have = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [(r.rank, r.doc_key) for r in have] == [(rk, ky) for rk, ky, _ in want], qid


def test_boundary_sketch_is_corpus_size_independent(spark):
    """The distributed splitter sketch collects O(budget) weighted
    candidates no matter how large the input is (VERDICT r3 #1): for a
    corpus far bigger than budget, the driver-side candidate count stays
    <= budget, and the resulting cuts still give balanced buckets."""
    from simplir_spark.operators.index_build import (
        _boundary_sketch,
        bucket_offsets,
        sample_boundaries,
    )

    n = 50_000
    df = spark.range(n).select(
        F.format_string("key%08d", (F.col("id") * 2654435761) % n).alias("k")
    )
    budget = 256
    cand = _boundary_sketch(df, "k", budget=budget, seed=42, frac=1.0)
    assert 0 < len(cand) <= budget
    # every candidate carries positive weight and weights sum ~ n
    assert all(w > 0 for _, w in cand)
    assert abs(sum(w for _, w in cand) - n) < 1e-6 * n

    n_buckets = 16
    cuts = sample_boundaries(df, "k", n_buckets, n=n)
    assert 0 < len(cuts) <= n_buckets - 1
    offsets = bucket_offsets(df, "k", cuts)
    # derive per-bucket counts from the exclusive-scan offsets
    ordered = [offsets[b] for b in sorted(offsets)] + [n]
    sizes = [b - a for a, b in zip(ordered, ordered[1:])]
    mean = n / len(sizes)
    assert max(sizes) < 2.0 * mean, sizes

    # deterministic: same input, same cuts
    assert cuts == sample_boundaries(df, "k", n_buckets, n=n)


def test_hot_term_balance(spark, tmp_path_factory):
    """Skew gate (BASELINE.json salted skew splitting): one term in 50%
    of docs must not pile its posting mass into one partition file — the
    run-key range partitioner IS the salt, so per-file posting mass stays
    within a constant factor of the mean, and results are rank-identical
    to the scan scorer."""
    from simplir_spark.operators.query import bm25_scan

    rows = [
        (
            f"d{i:05d}",
            ("hot " if i % 2 == 0 else "") + f"filler{i % 97:03d} uniq{i:05d}",
        )
        for i in range(4000)
    ]
    corpus = spark.createDataFrame(rows, "doc_key string, content string")
    out = str(tmp_path_factory.mktemp("hotbal") / "idx")
    build_index(spark, corpus, out, n_partitions=8, run_size=64)
    idx = open_index(spark, out)
    per_file = (
        idx.postings.select(F.input_file_name().alias("f"), "n")
        .groupBy("f")
        .agg(F.sum("n").alias("mass"))
        .collect()
    )
    masses = [r.mass for r in per_file]
    assert len(masses) > 1
    mean = sum(masses) / len(masses)
    assert max(masses) <= 3.0 * mean, sorted(masses)

    got = bm25_indexed(spark, idx, [("q", ["hot", "filler042"])], k=K).collect()
    want = bm25_scan(spark, corpus, [("q", ["hot", "filler042"])], k=K).collect()
    assert [(r.doc_key, r.rank) for r in sorted(got, key=lambda r: r.rank)] == [
        (r.doc_key, r.rank) for r in sorted(want, key=lambda r: r.rank)
    ]


def test_bucket_expr_selects_sqrt_form_past_threshold(spark):
    """Past _BUCKET_SQRT_MIN cuts the default bucket expression must be
    the sqrt-decomposed two-level form (element_at over nested array
    literals), and below it the flat scan (regression guard for the
    BENCH/bucket_search.json A/B)."""
    from simplir_spark.operators.index_build import _BUCKET_SQRT_MIN, bucket_expr

    big = [f"c{i:06d}" for i in range(_BUCKET_SQRT_MIN)]
    small = big[: _BUCKET_SQRT_MIN - 1]
    assert "element_at" in repr(bucket_expr("k", big))
    assert "element_at" not in repr(bucket_expr("k", small))


def test_ql_blockmax_pruning_skips_runs_and_preserves_topk():
    """QL DAAT pruning (score_query_runs_ql): a rare high-impact term
    drives theta above the unseen-doc bound, so common-term runs not
    overlapping live candidates are skipped — result identical to full
    decode, strictly fewer runs decoded."""
    from simplir_spark.operators.query_indexed import score_query_runs_ql

    rng = np.random.RandomState(7)
    n_docs, run_size = 5000, 128
    rows = []
    for term, df_sel, tf_hi in [("common", np.arange(n_docs), 3), ("rare", np.arange(0, 200, 10), 50)]:
        dids = np.asarray(df_sel, dtype=np.int64)
        tfs = rng.randint(1, tf_hi + 1, size=len(dids)).astype(np.int64)
        dls = np.full(len(dids), 100, dtype=np.int64)
        for s in range(0, len(dids), run_size):
            e = min(s + run_size, len(dids))
            run = codec.encode_run(dids[s:e], tfs[s:e], dls[s:e])
            rows.append({"term": term, **run})
    runs = pd.DataFrame(rows)
    term_w = {"common": 1.0, "rare": 1.0}
    term_bg = {"common": 0.01, "rare": 0.0001}

    cnt = [0, 0]
    d1, s1 = score_query_runs_ql(runs, term_w, term_bg, 1000.0, 10, 0, n_docs, decode_counter=cnt)
    d2, s2 = score_query_runs_ql(runs, term_w, term_bg, 1000.0, n_docs, 0, n_docs)
    top_full = sorted(zip(-s2, d2))[:10]
    assert d1.tolist() == [int(d) for _, d in top_full]
    np.testing.assert_allclose(s1, [-s for s, _ in top_full], rtol=1e-12)
    assert cnt[0] < cnt[1], f"no pruning happened: {cnt}"


def test_ql_pruning_disabled_for_cf0_terms():
    """A query term with cf=0 makes matched docs lacking it score -inf —
    the partial-score lower bound breaks, so pruning must disable itself
    (every run decoded) and the -inf semantics hold."""
    from simplir_spark.operators.query_indexed import score_query_runs_ql

    n_docs = 1000
    rows = []
    for term, dids in [("a", np.arange(0, n_docs, 2)), ("ghost", np.arange(0, 100, 5))]:
        dids = dids.astype(np.int64)
        tfs = np.full(len(dids), 2, dtype=np.int64)
        dls = np.full(len(dids), 50, dtype=np.int64)
        run = codec.encode_run(dids, tfs, dls)
        rows.append({"term": term, **run})
    runs = pd.DataFrame(rows)
    cnt = [0, 0]
    d, s = score_query_runs_ql(
        runs, {"a": 1.0, "ghost": 1.0}, {"a": 0.02, "ghost": 0.0},
        1000.0, 10, 0, n_docs, decode_counter=cnt,
    )
    assert cnt[0] == cnt[1], "pruning must be disabled with cf=0 terms"
    # only docs containing BOTH a and ghost have finite scores; ghost dids
    # are multiples of 5, docs with a are even -> finite = multiples of 10
    finite = [int(x) for x, sc in zip(d, s) if sc > float("-inf")]
    assert finite and all(x % 10 == 0 for x in finite)


def test_ql_indexed_small_k_matches_scan(spark, index_dir, corpus_small):
    """End-to-end: the pruned indexed QL path at k=10 is rank-identical to
    scan-mode QL (pruning engaged, results invisible)."""
    from simplir_spark.operators.query import bm25_scan
    from simplir_spark.operators.query_indexed import ql_dirichlet_indexed

    queries = [q for q in QUERIES if q[0] not in ("Q08", "Q09", "Q14")][:6]
    idx = open_index(spark, index_dir)
    got = ql_dirichlet_indexed(spark, idx, queries, k=10, mu=1000.0).collect()
    want = bm25_scan(spark, corpus_small, queries, k=10, model="ql_dirichlet", mu=1000.0).collect()
    g, w = {}, {}
    for r in got:
        g.setdefault(r.query_id, []).append((r.rank, r.doc_key, round(r.score, 9)))
    for r in want:
        w.setdefault(r.query_id, []).append((r.rank, r.doc_key, round(r.score, 9)))
    assert set(g) == set(w)
    for qid in g:
        assert sorted(g[qid]) == sorted(w[qid]), qid


def test_ql_theta0_seed_deepens_pruning_and_preserves_topk():
    """An external theta0 (another shard's k-th score) must only DEEPEN
    QL run skipping, never change results."""
    from simplir_spark.operators.query_indexed import score_query_runs_ql

    rng = np.random.RandomState(11)
    n_docs, run_size = 4000, 128
    rows = []
    for term, df_sel, tf_hi in [("common", np.arange(n_docs), 3), ("rare", np.arange(0, 160, 8), 40)]:
        dids = np.asarray(df_sel, dtype=np.int64)
        tfs = rng.randint(1, tf_hi + 1, size=len(dids)).astype(np.int64)
        dls = np.full(len(dids), 80, dtype=np.int64)
        for s in range(0, len(dids), run_size):
            e = min(s + run_size, len(dids))
            rows.append({"term": term, **codec.encode_run(dids[s:e], tfs[s:e], dls[s:e])})
    runs = pd.DataFrame(rows)
    term_w = {"common": 1.0, "rare": 1.0}
    term_bg = {"common": 0.02, "rare": 0.0002}

    base_cnt = [0, 0]
    d0, s0 = score_query_runs_ql(runs, term_w, term_bg, 1000.0, 10, 0, n_docs, decode_counter=base_cnt)
    # seed theta0 with the true 10th score: valid global lower bound
    theta0 = float(s0[-1])
    cnt = [0, 0]
    d1, s1 = score_query_runs_ql(
        runs, term_w, term_bg, 1000.0, 10, 0, n_docs, decode_counter=cnt, theta0=theta0
    )
    assert d1.tolist() == d0.tolist()
    np.testing.assert_allclose(s1, s0, rtol=1e-12)
    assert cnt[0] <= base_cnt[0]
    assert cnt[0] < cnt[1]


def test_ql_indexed_seeded_equals_unseeded(spark, index_dir, corpus_small):
    """End-to-end: seeded sharded QL == unseeded == scan ranking."""
    from simplir_spark.operators.query_indexed import ql_dirichlet_indexed

    queries = [q for q in QUERIES if q[0] not in ("Q08", "Q09", "Q14")][:5]
    idx = open_index(spark, index_dir)
    unseeded = ql_dirichlet_indexed(
        spark, idx, queries, k=10, n_shards=8, seed_threshold=False
    ).collect()
    seeded = ql_dirichlet_indexed(
        spark, idx, queries, k=10, n_shards=8, seed_threshold=True
    ).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.doc_key, round(r.score, 9)) for r in rows)
    assert key(seeded) == key(unseeded)


def test_bm25_indexed_shard_grouping_rank_identical(spark, index_dir, oracle_idx):
    """grouping='shard' (one group per did-shard, shared decode cache
    across queries) must be rank-identical to the default query_shard
    grouping and to the oracle."""
    idx = open_index(spark, index_dir)
    got = bm25_indexed(spark, idx, QUERIES, k=K, grouping="shard", n_shards=4).collect()
    by_q: dict[str, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in QUERIES:
        want = bm25_topk(oracle_idx, terms, K)
        have = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [(r.rank, r.doc_key) for r in have] == [(rk, ky) for rk, ky, _ in want], qid
        for r, (_, _, sc) in zip(have, want):
            assert r.score == pytest.approx(sc, rel=REL_TOL)


def test_decode_cache_shares_across_queries():
    """The shared decode cache decodes a run once even when several
    queries' scoring passes touch it."""
    from simplir_spark.operators.query_indexed import score_query_runs

    rng = np.random.RandomState(3)
    dids = np.arange(0, 500, dtype=np.int64)
    tfs = rng.randint(1, 4, size=len(dids)).astype(np.int64)
    dls = np.full(len(dids), 60, dtype=np.int64)
    run = codec.encode_run(dids, tfs, dls)
    runs = pd.DataFrame([{"term": "shared", "df": len(dids), **run}])
    cache: dict = {}
    d1, s1 = score_query_runs(runs, 500, 60.0, 10, did_lo=0, did_hi=500, decode_cache=cache)
    assert len(cache) == 1
    key = next(iter(cache))
    first = cache[key]
    d2, s2 = score_query_runs(runs, 500, 60.0, 10, did_lo=0, did_hi=500, decode_cache=cache)
    assert cache[key] is first  # reused, not re-decoded
    assert d1.tolist() == d2.tolist()
    np.testing.assert_allclose(s1, s2, rtol=0)


def test_ql_indexed_shard_grouping_matches_query_shard(spark, index_dir, corpus_small):
    """QL grouping='shard' (shared decode cache across queries) is
    rank-identical to the default grouping and the scan scorer."""
    from simplir_spark.operators.query_indexed import ql_dirichlet_indexed

    queries = [q for q in QUERIES if q[0] not in ("Q08", "Q09", "Q14")][:6]
    idx = open_index(spark, index_dir)
    a = ql_dirichlet_indexed(spark, idx, queries, k=10).collect()
    b = ql_dirichlet_indexed(spark, idx, queries, k=10, grouping="shard", n_shards=4).collect()
    key = lambda rows: sorted((r.query_id, r.rank, r.doc_key, round(r.score, 9)) for r in rows)
    assert key(a) == key(b)


def test_cache_registry_concurrent_register(spark):
    """CacheRegistry under concurrent registration: no exceptions, bounded
    retention, every evicted frame actually unpersisted exactly once."""
    import threading

    from simplir_spark.cacheutil import CacheRegistry

    reg = CacheRegistry(retain=4)
    dfs = [spark.range(10 + i).persist() for i in range(32)]
    for d in dfs:
        d.count()
    errs = []

    def worker(chunk):
        try:
            for d in chunk:
                reg.register(d)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(dfs[i::4],)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(reg) == 4  # retention bound holds after concurrent churn
    for d in dfs:
        d.unpersist()


def test_hot_query_shard_mass_balance(spark, tmp_path):
    """Query-side skew (VERDICT r4 #6): a term with df = 50% of docs must
    spread its posting mass evenly across did-range shards (runs are
    bounded-width did ranges over a dense id space), and the two scoring
    groupings must be rank-identical on a batch where EVERY query carries
    the hot term."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.index_build import build_index, open_index
    from simplir_spark.operators.query_indexed import bm25_indexed

    n_docs = 4000
    fill = ["alpha", "bravo", "charlie", "delta"]
    arr = F.array(*[F.lit(w) for w in fill])
    corpus = spark.range(n_docs).select(
        F.col("id").alias("doc_key"),
        F.concat_ws(
            " ",
            F.element_at(arr, (F.col("id") % 4 + 1).cast("int")),
            F.element_at(arr, (F.col("id") % 3 + 1).cast("int")),
            F.when(F.col("id") % 2 == 0, F.lit("hotterm")).otherwise(F.lit("coldish")),
        ).alias("content"),
    )
    idx_dir = str(tmp_path / "hotq_idx")
    build_index(spark, corpus, idx_dir, n_partitions=8)
    idx = open_index(spark, idx_dir)

    n_shards = 8
    span = max(1, -(-idx.doc_count // n_shards))
    masses = [
        int(r["mass"])
        for r in idx.postings.filter(F.col("term") == "hotterm")
        .select(F.expr(f"start_did div {span}").alias("shard"), "n")
        .groupBy("shard")
        .agg(F.sum("n").alias("mass"))
        .collect()
    ]
    assert sum(masses) == n_docs // 2
    mean = sum(masses) / len(masses)
    assert max(masses) <= 3 * mean, masses

    queries = [(f"H{i}", ["hotterm", w]) for i, w in enumerate(fill)]
    a = sorted(
        tuple(r)
        for r in bm25_indexed(spark, idx, queries, k=10, grouping="query_shard")
        .select("query_id", "doc_key", "rank").collect()
    )
    b = sorted(
        tuple(r)
        for r in bm25_indexed(spark, idx, queries, k=10, grouping="shard")
        .select("query_id", "doc_key", "rank").collect()
    )
    assert a == b and len(a) == 40


# ---------------------------------------------------------------------------
# UDF bucket routing (>32k-bucket path)
# ---------------------------------------------------------------------------

def test_murmur3_np_matches_scalar():
    import numpy as np

    from simplir_spark.operators.index_build import _murmur3_int32_np, murmur3_int32

    xs = np.concatenate([np.arange(0, 2000, dtype=np.uint64),
                         np.array([2**31 - 1, 2**31, 2**32 - 1], dtype=np.uint64)])
    got = _murmur3_int32_np(xs)
    want = [murmur3_int32(int(x)) for x in xs]
    assert got.tolist() == want


def test_probe_shuffle_keys_matches_scalar_loop(spark):
    """The vectorized chunked probe must produce exactly the scalar
    first-x-wins assignment."""
    from simplir_spark.operators.index_build import murmur3_int32, probe_shuffle_keys

    for n_buckets, n_parts in [(7, 7), (128, 128), (1000, 1000), (5, 16)]:
        found: dict[int, int] = {}
        x = 0
        while len(found) < n_buckets:
            p = murmur3_int32(x) % n_parts
            if p < n_buckets and p not in found:
                found[p] = x
            x += 1
        want = [found[b] for b in range(n_buckets)]
        assert probe_shuffle_keys(n_buckets, n_parts) == want, (n_buckets, n_parts)


def test_udf_bucket_routing_matches_jvm(spark, monkeypatch):
    """The broadcast-searchsorted UDF route (the >32k-bucket path) must
    assign the same (bucket, xb) as the JVM array-literal route — string
    keys, long keys, boundary-equal keys, and the lexicographic
    (term, did) space with duplicate cut terms."""
    from pyspark.sql import functions as F

    from simplir_spark.operators import index_build as ib

    keys_s = ["a", "ba", "bb", "bz", "c", "dd", "zz"]
    cuts_s = ["bb", "c", "m"]
    keys_l = [0, 5, 6, 7, 99, 100, 101]
    cuts_l = [6, 100]
    for keys, cuts in [(keys_s, cuts_s), (keys_l, cuts_l)]:
        df = spark.createDataFrame([(k,) for k in keys], ["doc_key"])
        xkeys = ib.probe_shuffle_keys(len(cuts) + 1, len(cuts) + 1)
        jvm = {
            r["doc_key"]: (r["_bucket"], r["_xb"])
            for r in ib.with_bucket_and_xb(df, "doc_key", cuts, xkeys).collect()
        }
        monkeypatch.setattr(ib, "_BUCKET_UDF_MIN", 0)
        udf = {
            r["doc_key"]: (r["_bucket"], r["_xb"])
            for r in ib.with_bucket_and_xb(df, "doc_key", cuts, xkeys).collect()
        }
        monkeypatch.undo()
        assert jvm == udf, (cuts, jvm, udf)

    # (term, did): duplicate cut terms exercise the tie-group searchsorted
    rows = [("apple", 3), ("apple", 10), ("apple", 99), ("beta", 0),
            ("beta", 7), ("zeta", 1), ("aa", 5)]
    cuts_td = [("apple", 10), ("apple", 50), ("beta", 7)]
    df = spark.createDataFrame(rows, ["term", "start_did"])
    xkeys = ib.probe_shuffle_keys(len(cuts_td) + 1, len(cuts_td) + 1)
    jvm = {
        (r["term"], r["start_did"]): (r["_b"], r["_xb"])
        for r in ib.with_term_did_bucket_and_xb(df, cuts_td, xkeys).collect()
    }
    monkeypatch.setattr(ib, "_BUCKET_UDF_MIN", 0)
    udf = {
        (r["term"], r["start_did"]): (r["_b"], r["_xb"])
        for r in ib.with_term_did_bucket_and_xb(df, cuts_td, xkeys).collect()
    }
    monkeypatch.undo()
    assert jvm == udf


def test_udf_routed_build_matches_default(spark, corpus_small, index_dir, monkeypatch):
    """A full build forced onto the UDF routing path (as if >32k buckets)
    must produce a value-identical index to the default literal-routed
    build: same docmeta, postings bytes, term stats."""
    from simplir_spark.operators import index_build as ib

    monkeypatch.setattr(ib, "_BUCKET_UDF_MIN", 0)
    import tempfile

    d = tempfile.mkdtemp(prefix="udfroute_idx_")
    build_index(spark, corpus_small, d, n_partitions=8, run_size=64)
    monkeypatch.undo()
    ui = open_index(spark, d)
    ti = open_index(spark, index_dir)
    assert ui.doc_count == ti.doc_count and ui.token_count == ti.token_count
    assert {(r.term, r.df, r.cf) for r in ui.term_stats.collect()} == {
        (r.term, r.df, r.cf) for r in ti.term_stats.collect()
    }
    assert _postings_map(spark, d) == _postings_map(spark, index_dir)
    a = {(r.did, r.doc_key, r.doc_len) for r in ui.docmeta.collect()}
    b = {(r.did, r.doc_key, r.doc_len) for r in ti.docmeta.collect()}
    assert a == b
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_merge_indexes_cleans_level_temporaries(spark, tmp_path):
    """Hierarchical merge (fan_in exceeded) must not leave the _level
    intermediate index trees inside out_dir — they double the footprint
    and masquerade as sibling indexes."""
    import os

    from simplir_spark.operators.merge import merge_indexes
    from simplir_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, SF)
    keys = sorted(r.doc_key for r in corpus.select("doc_key").collect())
    cuts = [keys[len(keys) * i // 5] for i in range(1, 5)]
    bounds = [None] + cuts + [None]
    srcs = []
    for i in range(5):
        part = corpus
        if bounds[i] is not None:
            part = part.filter(F.col("doc_key") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("doc_key") < bounds[i + 1])
        d = str(tmp_path / f"src{i}")
        build_index(spark, part, d, n_partitions=2, run_size=64)
        srcs.append(d)

    out = str(tmp_path / "merged")
    merge_indexes(spark, srcs, out, fan_in=2)  # 5 -> 3 -> 2 -> 1: two levels
    leftovers = [e for e in os.listdir(out) if e.startswith("_level")]
    assert leftovers == []
    merged = open_index(spark, out)
    assert merged.doc_count == corpus.count()


def test_duplicate_query_ids_merge_not_double_score(spark, corpus_small, index_dir):
    """A repeated query_id across entries must merge into one term set —
    duplicate (query_id, term) rows would decode shared runs twice and
    silently double the term's score contribution."""
    from simplir_spark.operators.query import bm25_scan, merge_query_entries
    from simplir_spark.operators.query_indexed import bm25_indexed

    dup = [("q1", ["hash", "join"]), ("q1", ["hash", "window"]), ("q2", ["customer"])]
    assert merge_query_entries(dup) == [
        ("q1", ["hash", "join", "hash", "window"]),
        ("q2", ["customer"]),
    ]
    clean = [("q1", ["hash", "join", "window"]), ("q2", ["customer"])]

    idx = open_index(spark, index_dir)
    for fn in (
        lambda qs: bm25_indexed(spark, idx, qs, k=10),
        lambda qs: bm25_scan(spark, corpus_small, qs, k=10),
    ):
        got = {(r.query_id, r.doc_key): round(r.score, 9) for r in fn(dup).collect()}
        want = {(r.query_id, r.doc_key): round(r.score, 9) for r in fn(clean).collect()}
        assert got == want and got


def test_resolve_doc_keys_range_path_matches_isin(spark, corpus_small, index_dir, monkeypatch):
    """Above _RESOLVE_ISIN_MAX distinct dids the docmeta prune switches
    from an In-literal to a did-range filter + broadcast join; results
    must be identical."""
    import simplir_spark.operators.query_indexed as qi

    idx = open_index(spark, index_dir)
    queries = [("q1", ["hash", "join"]), ("q2", ["customer", "order"])]
    base = sorted(tuple(r) for r in qi.bm25_indexed(spark, idx, queries, k=10).collect())
    monkeypatch.setattr(qi, "_RESOLVE_ISIN_MAX", 0)
    ranged = sorted(tuple(r) for r in qi.bm25_indexed(spark, idx, queries, k=10).collect())
    assert base == ranged and base
