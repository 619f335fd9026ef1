"""Training-pipeline operators: chunking, deterministic sampling,
distributed prefix-sum sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simplir_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
    sample_deterministic,
    with_cumulative_offsets,
)


def test_chunk_documents_windows_and_overlap(spark):
    rows = [
        ("a", [f"t{i}" for i in range(10)]),   # 10 tokens
        ("b", ["x"]),                           # shorter than one stride
        ("c", []),                              # empty -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id string, terms array<string>")
    out = {
        (r.doc_id, r.chunk_ix): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk_size=4, overlap=1).collect()
    }
    # stride 3: ceil((10-1)/3) = 3 chunks cover every token
    assert out[("a", 0)] == (4, "t0 t1 t2 t3")
    assert out[("a", 1)] == (4, "t3 t4 t5 t6")
    assert out[("a", 2)] == (4, "t6 t7 t8 t9")
    assert ("a", 3) not in out
    assert out[("b", 0)] == (1, "x")
    assert not any(k[0] == "c" for k in out)
    # every token appears; adjacent chunks share exactly `overlap` tokens
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_sample_deterministic_is_partition_invariant(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    kept1 = sorted(r.doc_id for r in sample_deterministic(df, 0.3, seed=5).collect())
    kept2 = sorted(
        r.doc_id
        for r in sample_deterministic(df.repartition(13), 0.3, seed=5).collect()
    )
    assert kept1 == kept2  # pure function of the key, not the layout
    assert 0.2 < len(kept1) / 2000 < 0.4
    kept3 = sorted(r.doc_id for r in sample_deterministic(df, 0.3, seed=6).collect())
    assert kept1 != kept3  # seed-sensitive
    assert sample_deterministic(df, 0.0).count() == 0
    assert sample_deterministic(df, 1.0).count() == 2000


def test_cumulative_offsets_match_naive_prefix_sum(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    lens = rng.randint(0, 50, size=500).tolist()
    df = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(lens)], "did long, doc_len int"
    )
    # tiny range_size so many ranges + driver scan are exercised
    out = {
        r.did: r.start_offset
        for r in with_cumulative_offsets(df.repartition(7), "did", "doc_len", range_size=64).collect()
    }
    acc = 0
    for i, l in enumerate(lens):
        assert out[i] == acc, i
        acc += l


def test_pack_sequences_bins(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(40)], "did long, doc_len int"
    )
    out = {r.did: (r.start_offset, r.bin_id) for r in
           pack_sequences(df, token_budget=1000, range_size=8).collect()}
    for i in range(40):
        assert out[i] == (i * 100, (i * 100) // 1000)
    # 10 docs of 100 tokens per 1000-token bin
    bins = {}
    for _, (_, b) in out.items():
        bins[b] = bins.get(b, 0) + 1
    assert all(v == 10 for v in bins.values())


def test_chunk_documents_coverage_property(spark):
    """Property (hypothesis): for random token counts / chunk params,
    chunks tile the document — every token index covered, adjacent chunks
    share exactly `overlap` tokens except possibly the last, and no chunk
    exceeds chunk_size."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=30, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        chunk_size=st.integers(min_value=2, max_value=32),
        overlap=st.integers(min_value=0, max_value=31),
    )
    def collect(n, chunk_size, overlap):
        if overlap < chunk_size:
            cases.append((n, chunk_size, overlap))

    collect()
    rows = [
        (f"d{ci}", [f"t{ci}_{i}" for i in range(n)])
        for ci, (n, _, _) in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "doc_id string, terms array<string>")
    # group cases by identical params to batch Spark calls
    by_params: dict = {}
    for ci, (n, cs, ov) in enumerate(cases):
        by_params.setdefault((cs, ov), []).append((ci, n))
    for (cs, ov), members in by_params.items():
        ids = {f"d{ci}" for ci, _ in members}
        sub = df.filter(F.col("doc_id").isin(list(ids)))
        got: dict = {}
        for r in chunk_documents(sub, chunk_size=cs, overlap=ov).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_ix, r.chunk_text.split(" ")))
        stride = cs - ov
        for ci, n in members:
            chunks = sorted(got[f"d{ci}"])
            assert chunks, (ci, n, cs, ov)
            covered = set()
            for ix, toks in chunks:
                assert len(toks) <= cs
                assert toks == [f"t{ci}_{i}" for i in range(ix * stride, min(ix * stride + cs, n))]
                covered.update(range(ix * stride, ix * stride + len(toks)))
            assert covered == set(range(n)), (ci, n, cs, ov)


def test_sample_deterministic_rate_monotone(spark):
    """The kept set grows monotonically with rate (threshold sampling):
    kept(r1) is a subset of kept(r2) for r1 <= r2 — the property that
    makes staged corpus scaling reproducible."""
    df = spark.range(1500).select(F.col("id").alias("doc_id"))
    k10 = {r.doc_id for r in sample_deterministic(df, 0.1, seed=9).collect()}
    k30 = {r.doc_id for r in sample_deterministic(df, 0.3, seed=9).collect()}
    k60 = {r.doc_id for r in sample_deterministic(df, 0.6, seed=9).collect()}
    assert k10 <= k30 <= k60


# ---------------------------------------------------------------------------
# pack_exact
# ---------------------------------------------------------------------------

def _mk_lens(spark, lens):
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(lens)], "did long, doc_len long"
    )


def test_pack_exact_bins_never_exceed_budget(spark):
    """Every bin sums to exactly the budget except the corpus-final bin;
    includes docs longer than several budgets and zero-length docs."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.packing import pack_exact

    lens = [100, 0, 900, 3, 260, 0, 17, 513]
    out = pack_exact(_mk_lens(spark, lens), token_budget=256, range_size=4)
    bins = {
        r["bin_id"]: r["s"]
        for r in out.groupBy("bin_id").agg(F.sum("seg_len").alias("s")).collect()
    }
    total = sum(lens)
    last = max(bins)
    assert set(bins) == set(range(last + 1)), "bins must be contiguous from 0"
    for b, s in bins.items():
        if b < last:
            assert s == 256, (b, s)
        else:
            assert 0 < s <= 256
    assert sum(bins.values()) == total


def test_pack_exact_covers_every_token_once(spark):
    """Per-doc segments tile [0, doc_len) exactly: sorted by bin, they are
    contiguous, start at 0, and sum to doc_len; empty docs emit no rows."""
    from collections import defaultdict

    from simplir_spark.operators.packing import pack_exact

    lens = [5, 1000, 0, 256, 255, 257, 42]
    rows = pack_exact(_mk_lens(spark, lens), token_budget=256, range_size=2).collect()
    segs = defaultdict(list)
    for r in rows:
        segs[r["did"]].append((r["bin_id"], r["tok_start"], r["seg_len"]))
    assert 2 not in segs  # the empty doc
    for did, ss in segs.items():
        ss.sort()
        assert ss[0][1] == 0
        pos = 0
        for _, tok_start, seg_len in ss:
            assert tok_start == pos and seg_len > 0
            pos += seg_len
        assert pos == lens[did]
    assert set(segs) == {i for i, l in enumerate(lens) if l > 0}


def test_pack_exact_matches_pack_sequences_start_bin(spark):
    """A doc's FIRST segment lands in the bin pack_sequences assigns the
    whole doc to (same offset arithmetic upstream)."""
    from pyspark.sql import functions as F

    from simplir_spark.operators.packing import pack_exact, pack_sequences

    lens = [100, 300, 256, 17, 900]
    df = _mk_lens(spark, lens)
    seq = {r["did"]: r["bin_id"] for r in pack_sequences(df, 256, order_col="did").collect()}
    first = {
        r["did"]: r["mn"]
        for r in pack_exact(df, 256, order_col="did")
        .groupBy("did").agg(F.min("bin_id").alias("mn")).collect()
    }
    assert first == {d: b for d, b in seq.items() if lens[d] > 0}


def test_sample_stratified_exact_quota_matches_naive_window(spark):
    """sample_stratified's bucket-histogram selection must equal the naive
    per-group row_number() over (hash, key) reference — same rows, exactly
    min(quota, n_g) per group — and be invariant to input partitioning."""
    from simplir_spark.operators.packing import _key_hash, sample_stratified

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = 7
    got = sample_stratified(docs, "lang", q, key_col="doc_id", seed=3)
    got_rows = sorted((r["lang"], r["doc_id"]) for r in got.collect())

    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(_key_hash("doc_id", 3), "doc_id")
    want = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= q)
    )
    want_rows = sorted((r["lang"], r["doc_id"]) for r in want.collect())
    assert got_rows == want_rows

    sizes = {r["lang"]: r["c"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    per_group = {}
    for lang, _ in got_rows:
        per_group[lang] = per_group.get(lang, 0) + 1
    assert per_group == {g: min(q, n) for g, n in sizes.items()}

    reparted = sample_stratified(docs.repartition(13), "lang", q, key_col="doc_id", seed=3)
    assert sorted((r["lang"], r["doc_id"]) for r in reparted.collect()) == got_rows


def test_sample_stratified_dict_quotas_and_quota_exceeding_group(spark):
    """Dict quotas: per-group counts honored, absent groups dropped,
    quota > n_g keeps the whole group (the no-sort fast path)."""
    from simplir_spark.operators.packing import sample_stratified

    rows = [(i, "a" if i % 3 else "b") for i in range(60)] + [(100 + i, "c") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sample_stratified(df, "grp", {"a": 5, "c": 100}, key_col="doc_id", seed=1)
    counts = {r["grp"]: r["c"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts == {"a": 5, "c": 4}  # b absent from dict -> dropped


def test_sample_stratified_boolean_and_null_groups(spark):
    # regression: the quota join used to compare str(g) ("True"/"None")
    # against Spark's cast-to-string ("true"/NULL), silently dropping
    # boolean strata entirely and never matching a NULL stratum
    from simplir_spark.operators.packing import sample_stratified

    rows = [(i, i % 3 == 0) for i in range(60)] + [(1000 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, is_en boolean")
    out = sample_stratified(df, "is_en", 5, key_col="doc_id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["is_en"], []).append(r["doc_id"])
    assert sorted(len(v) for v in by_g.values()) == [5, 5, 5]
    assert set(by_g) == {True, False, None}
    # dict quotas keyed by the native values must hit the same strata
    out2 = sample_stratified(df, "is_en", {True: 3, None: 2}, key_col="doc_id").collect()
    by_g2 = {}
    for r in out2:
        by_g2.setdefault(r["is_en"], []).append(r["doc_id"])
    assert {g: len(v) for g, v in by_g2.items()} == {True: 3, None: 2}
