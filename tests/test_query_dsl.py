"""Query-DSL compiler vs a direct pure-Python interpreter of the same
tree (ports interpretQuery semantics, Streaming.hs:253-331)."""

from __future__ import annotations

import duckdb
import pytest

from simplir_spark.plans.query_dsl import compile_query, resolve_params
from tests.oracle import bm25_term, build_oracle_index, tfidf_term

SF = "/root/testdata/sf0.001"
REL = 1e-9


@pytest.fixture(scope="module")
def oracle_idx():
    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    return build_oracle_index([(f"doc{int(i):012d}", t) for i, t in rows])


def _oracle_eval(idx, node, doc_i):
    t = node["type"]
    if t == "const":
        return float(node["value"])
    if t == "sum":
        return sum(_oracle_eval(idx, c, doc_i) for c in node["children"])
    if t == "product":
        out = 1.0
        for c in node["children"]:
            out *= _oracle_eval(idx, c, doc_i)
        return out
    if t == "scale":
        return float(node["factor"]) * _oracle_eval(idx, node["child"], doc_i)
    if t == "retrieve":
        tfs = idx.tfs[doc_i]
        terms = sorted(set(node["terms"]))
        p = node.get("params", {})
        model = node.get("model", "bm25")
        s = 0.0
        for term in terms:
            if term not in tfs:
                continue
            if model == "bm25":
                s += bm25_term(
                    tfs[term], idx.doc_lens[doc_i], idx.df[term], idx.doc_count,
                    idx.avg_doc_len, p.get("k1", 1.1), p.get("b", 0.4),
                )
            elif model == "tfidf":
                s += tfidf_term(tfs[term], idx.df[term], idx.doc_count)
        return s
    if t == "cond":
        have = all(p in idx.tfs[doc_i] for p in set(node["predicate_terms"]))
        if node.get("negated", False):
            have = not have
        return _oracle_eval(idx, node["then"] if have else node["else"], doc_i)
    raise ValueError(t)


def _collect_terms(node, acc):
    if node["type"] == "retrieve":
        acc.update(node["terms"])
    if node["type"] == "cond":
        acc.update(node["predicate_terms"])
    for key in ("children",):
        for c in node.get(key, []):
            _collect_terms(c, acc)
    if "child" in node:
        _collect_terms(node["child"], acc)
    for key in ("then", "else"):
        if key in node:
            _collect_terms(node[key], acc)


def _oracle_topk(idx, tree, k):
    terms = set()
    _collect_terms(tree, terms)
    scored = []
    for i in range(idx.doc_count):
        if not any(t in idx.tfs[i] for t in terms):
            continue
        scored.append((_oracle_eval(idx, tree, i), idx.doc_keys[i]))
    scored.sort(key=lambda s: (-s[0], s[1]))
    return [(r + 1, key, sc) for r, (sc, key) in enumerate(scored[:k])]


TREES = [
    # weighted sum of two BM25 fields + a constant prior
    {
        "type": "sum",
        "children": [
            {"type": "scale", "factor": 2.0,
             "child": {"type": "retrieve", "model": "bm25", "terms": ["join", "hash"]}},
            {"type": "retrieve", "model": "tfidf", "terms": ["merge"]},
            {"type": "const", "value": 0.1},
        ],
    },
    # conditional boost: docs containing 'dup' score differently
    {
        "type": "cond",
        "predicate_terms": ["dup"],
        "negated": False,
        "then": {"type": "scale", "factor": 10.0,
                 "child": {"type": "retrieve", "model": "bm25", "terms": ["merge"]}},
        "else": {"type": "retrieve", "model": "bm25", "terms": ["merge"]},
    },
    # product of two retrieval scores (feature interaction)
    {
        "type": "product",
        "children": [
            {"type": "retrieve", "model": "bm25", "terms": ["scan"]},
            {"type": "sum", "children": [
                {"type": "const", "value": 1.0},
                {"type": "retrieve", "model": "tfidf", "terms": ["window"]},
            ]},
        ],
    },
]


@pytest.mark.parametrize("tree_ix", range(len(TREES)))
def test_dsl_matches_oracle(spark, corpus_small, oracle_idx, tree_ix):
    tree = TREES[tree_ix]
    got = sorted(compile_query(spark, corpus_small, tree, k=10).collect(), key=lambda r: r.rank)
    want = _oracle_topk(oracle_idx, tree, 10)
    assert len(got) == len(want)
    for r, (rank, key, score) in zip(got, want):
        assert (r.rank, r.doc_key) == (rank, key)
        assert abs(r.score - score) <= REL * max(1.0, abs(score))


def test_parametric_substitution(spark, corpus_small, oracle_idx):
    tree = {
        "type": "scale", "factor": "{{w}}",
        "child": {"type": "retrieve", "model": "bm25", "terms": ["join"],
                  "params": {"k1": "{{k1}}", "b": 0.4}},
    }
    resolved = resolve_params(tree, {"w": 3.0, "k1": 1.2})
    assert resolved["factor"] == 3.0 and resolved["child"]["params"]["k1"] == 1.2
    got = sorted(
        compile_query(spark, corpus_small, tree, k=5, params={"w": 3.0, "k1": 1.2}).collect(),
        key=lambda r: r.rank,
    )
    want = _oracle_topk(oracle_idx, resolved, 5)
    for r, (rank, key, score) in zip(got, want):
        assert (r.rank, r.doc_key) == (rank, key)
        assert abs(r.score - score) <= REL * max(1.0, abs(score))


def test_unbound_param_raises():
    with pytest.raises(KeyError, match="unbound"):
        resolve_params({"type": "scale", "factor": "{{missing}}", "child": {"type": "const", "value": 1}}, {})
