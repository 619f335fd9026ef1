"""RM1 relevance model + histogram operator tests (hand oracles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_rm1_hand_computed(spark):
    from simplir_spark.operators.feedback import rm1, rm1_expansion_terms

    run = spark.createDataFrame(
        [("q1", "d1", 2.0), ("q1", "d2", 1.0)],
        "query_id string, doc_key string, score double",
    )
    # d1: a:2/4, b:2/4 ; d2: b:1/2, c:1/2
    pairs = spark.createDataFrame(
        [("d1", 4, "a", 2), ("d1", 4, "b", 2), ("d2", 2, "b", 1), ("d2", 2, "c", 1)],
        "doc_key string, doc_len int, term string, tf long",
    )
    # weights: a: 2*0.5=1.0 ; b: 2*0.5 + 1*0.5 = 1.5 ; c: 0.5 ; total 3.0
    got = {r.term: r.weight for r in rm1(run, pairs).collect()}
    assert got["a"] == pytest.approx(1.0 / 3.0)
    assert got["b"] == pytest.approx(1.5 / 3.0)
    assert got["c"] == pytest.approx(0.5 / 3.0)
    top = rm1_expansion_terms(run, pairs, n_terms=2).collect()
    assert [(r.term, r.rank) for r in sorted(top, key=lambda r: r.rank)] == [("b", 1), ("a", 2)]


def test_rm1_end_to_end_expansion(spark, corpus_small):
    from simplir_spark.functions.tokenize import with_tokens
    from simplir_spark.operators.feedback import rm1_expansion_terms
    from simplir_spark.operators.query import bm25_scan
    from simplir_spark.operators.stats import doc_term_tfs

    run = bm25_scan(spark, corpus_small, [("Q05", ["dup"])], k=5)
    pairs = doc_term_tfs(with_tokens(corpus_small))
    exp = rm1_expansion_terms(run, pairs, n_terms=5).collect()
    assert len(exp) == 5
    # the seed term itself must surface among top expansion terms
    assert "dup" in {r.term for r in exp}
    s = sum(r.weight for r in exp)
    assert 0 < s <= 1.0 + 1e-9


def test_histogram_linear(spark):
    from simplir_spark.operators.stats import histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    h = {r.bucket: (r.lo, r.hi, r.n) for r in histogram(df, "x", n_bins=10).collect()}
    # 100 values over [0, 99] in 10 bins: ~10 per bin
    total = sum(v[2] for v in h.values())
    assert total == 100
    assert all(8 <= v[2] <= 12 for v in h.values())
    assert h[1][0] == pytest.approx(0.0)


def test_histogram_log(spark):
    from simplir_spark.operators.stats import histogram

    vals = [1.0, 10.0, 100.0, 1000.0, 5.0, 50.0, 500.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    h = histogram(df, "x", n_bins=3, lo=1.0, hi=1000.0, log=True).collect()
    by_bucket = {r.bucket: r.n for r in h}
    # 0.0 -> underflow bucket 0; decades split 1..10 / 10..100 / 100..1000
    assert by_bucket.get(0) == 1
    # 1000 is the inclusive top edge -> folded into the last bin via epsilon
    assert by_bucket[1] == 2 and by_bucket[2] == 2 and by_bucket[3] == 3
    assert sum(by_bucket.values()) == len(vals)
