"""Results JSON sink (Search.hs:282-313 shape) — structure and position
goldens on a tiny corpus."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import functions as F

from simplir_spark.operators.query import bm25_scan
from simplir_spark.sources.results_json import matched_positions, write_results_json

QUERIES = [("Q1", ["apple", "cherry"]), ("Q2", ["banana"])]


@pytest.fixture()
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "banana; banana!! date"),
            (3, "elderberry fig"),
        ],
        "doc_key long, content string",
    )


def test_matched_positions_golden(spark, tiny):
    run = bm25_scan(spark, tiny, QUERIES, k=10).select(
        "query_id", "doc_key", "rank", "score"
    )
    rows = {
        (r.query_id, r.doc_key, r.term, r.token_pos): r.char_pos
        for r in matched_positions(run, tiny, QUERIES).collect()
    }
    # doc 1: 'apple'@tok0 char0, 'banana'@tok1 char6, 'cherry'@tok2 char13,
    #        'apple'@tok3 char20
    assert rows[("Q1", 1, "apple", 0)] == 0
    assert rows[("Q1", 1, "cherry", 2)] == 13
    assert rows[("Q1", 1, "apple", 3)] == 20
    # doc 2: kill chars (';', '!') become spaces — 'banana'@tok0 char0,
    # 'banana'@tok1 char8 ('banana; ' is 8 chars)
    assert rows[("Q2", 2, "banana", 0)] == 0
    assert rows[("Q2", 2, "banana", 1)] == 8
    # doc 3 matches nothing
    assert not any(dk == 3 for (_, dk, _, _) in rows)


def test_write_results_json_shape(spark, tiny, tmp_path):
    run = bm25_scan(spark, tiny, QUERIES, k=10).select(
        "query_id", "doc_key", "rank", "score"
    )
    from simplir_spark.functions.tokenize import with_tokens

    meta = with_tokens(tiny).select("doc_key", "doc_len")
    out = str(tmp_path / "results.json.gz")
    doc = write_results_json(run, tiny, QUERIES, out, doc_meta=meta)

    with gzip.open(out) as f:
        loaded = json.load(f)
    assert loaded == doc
    assert [d["query_id"] for d in doc] == ["Q1", "Q2"]
    q1 = doc[0]["results"]
    # ranked order preserved; every result carries the Search.hs fields
    assert all(
        set(r) == {"doc_name", "length", "archive", "score", "postings"} for r in q1
    )
    top = q1[0]
    assert top["doc_name"] == "1" and top["length"] == 4
    terms = {p["term"]: p["positions"] for p in top["postings"]}
    assert [p["token_pos"] for p in terms["apple"]] == [0, 3]
    assert terms["cherry"] == [{"token_pos": 2, "char_pos": 13}]


def test_results_json_string_doc_keys(spark, tmp_path):
    # regression: the positions kernel and JSON assembly hard-coded
    # doc_key as int64, crashing on native corpora whose doc_key is the
    # reference's string document name (repo/path@commit)
    from simplir_spark.sources.results_json import write_results_json

    corpus = spark.createDataFrame(
        [("r/a.py@c1", "alpha beta alpha"), ("r/b.py@c2", "beta gamma")],
        "doc_key string, content string",
    )
    run = spark.createDataFrame(
        [("Q1", "r/a.py@c1", 1, 2.0), ("Q1", "r/b.py@c2", 2, 1.0)],
        "query_id string, doc_key string, rank int, score double",
    )
    out = str(tmp_path / "results.json")
    doc = write_results_json(run, corpus, [("Q1", ["alpha", "beta"])], out)
    assert doc[0]["query_id"] == "Q1"
    names = [r["doc_name"] for r in doc[0]["results"]]
    assert names == ["r/a.py@c1", "r/b.py@c2"]
    terms = {p["term"] for r in doc[0]["results"] for p in r["postings"]}
    assert terms == {"alpha", "beta"}
