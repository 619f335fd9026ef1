"""Quality operators: self-trained bigram-LM cross-entropy and benchmark
decontamination (operators/quality.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.dedup import ngram_shingles
from simplir_spark.operators.quality import decontaminate, lm_cross_entropy


def test_lm_cross_entropy_hand_computed(spark):
    # corpus: d1 = "aaa bbb aaa bbb", d2 = "aaa bbb ccc"
    # bigrams: d1: (a,b),(b,a),(a,b); d2: (a,b),(b,c)
    # C(a,b)=3 C(b,a)=1 C(b,c)=1 ; C(a.)=3 C(b.)=2 ; V={aaa,bbb,ccc}=3
    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa bbb"), (2, "aaa bbb ccc"), (3, "solo")],
        "doc_key long, content string",
    )
    tok = with_tokens(docs).withColumnRenamed("doc_key", "doc_id")
    out = {r.doc_id: r for r in lm_cross_entropy(tok, round_dp=None).collect()}

    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    h1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    h2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1].n_bigrams == 3 and out[1].cross_entropy == pytest.approx(h1)
    assert out[2].n_bigrams == 2 and out[2].cross_entropy == pytest.approx(h2)
    assert out[3].n_bigrams == 0 and out[3].cross_entropy is None
    # the repetitive doc is more predictable than the novel-bigram doc
    assert out[1].cross_entropy < out[2].cross_entropy


def test_decontaminate_planted_copy(spark):
    bench_text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, bench_text),                             # the benchmark doc
            (2, "prefix " + bench_text + " suffix"),     # contains it -> hit
            (3, "alpha beta nothing shared here at all"),  # partial, no 5-gram
        ],
        "doc_key long, content string",
    )
    tok = with_tokens(docs).withColumnRenamed("doc_key", "doc_id")
    sh = ngram_shingles(tok, n=5)
    bench = ngram_shingles(tok.filter(F.col("doc_id") == 1), n=5)
    out = {r.doc_id: (r.n_hits, r.contaminated) for r in decontaminate(sh, bench).collect()}
    assert out[1] == (1, True)   # self
    assert out[2] == (1, True)   # planted copy inside longer doc
    assert out[3] == (0, False)


def test_repetition_stats_hand_computed(spark):
    """Hand-checked duplicate-token / duplicate-n-gram fractions,
    including the too-short-for-n-gram edge (fraction 0)."""
    from pyspark.sql import functions as F

    from simplir_spark.functions.text import repetition_stats

    rows = [
        # terms: [aaa bbb aaa bbb] -> tokens 4 distinct 2 -> dup_tok 0.5
        # 2-grams: [aaa bbb, bbb aaa, aaa bbb] -> 3 total 2 distinct -> 1/3
        # 3-grams: [aaa bbb aaa, bbb aaa bbb] -> 2 total 2 distinct -> 0
        (1, ["aaa", "bbb", "aaa", "bbb"]),
        (2, ["unique"]),          # too short for any n-gram
        (3, []),                  # empty doc
        (4, ["xxx", "xxx", "xxx"]),  # all repeated: dup_tok 2/3, g2 1/2, g3 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, terms array<string>")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert (got[1]["n_tokens"], got[1]["dup_token_frac"]) == (4, 0.5)
    assert got[1]["dup_2gram_frac"] == round(1 / 3, 6)
    assert got[1]["dup_3gram_frac"] == 0.0
    assert (got[2]["n_tokens"], got[2]["dup_2gram_frac"]) == (1, 0.0)
    assert (got[3]["n_tokens"], got[3]["dup_token_frac"]) == (0, 0.0)
    assert got[4]["dup_token_frac"] == round(2 / 3, 6)
    assert got[4]["dup_2gram_frac"] == 0.5
    assert got[4]["dup_3gram_frac"] == 0.0
