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


def _phrase_tf(seq, toks):
    m, n = len(toks), len(seq)
    if m == 0 or m > n:
        return 0
    return sum(1 for i in range(n - m + 1) if seq[i : i + m] == toks)


def _unit_tf(idx, doc_i, unit):
    toks = unit.split()
    if len(toks) == 1:
        return idx.tfs[doc_i].get(unit, 0)
    return _phrase_tf(idx.seqs[doc_i], toks)


def _unit_df(idx, unit):
    toks = unit.split()
    if len(toks) == 1:
        return idx.df.get(unit, 0)
    return sum(1 for i in range(idx.doc_count) if _phrase_tf(idx.seqs[i], toks) > 0)


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
        terms = sorted({" ".join(u.split()) for u in node["terms"]})
        p = node.get("params", {})
        model = node.get("model", "bm25")
        s = 0.0
        for term in terms:
            tf = _unit_tf(idx, doc_i, term)
            if tf == 0:
                continue
            if model == "bm25":
                s += bm25_term(
                    tf, idx.doc_lens[doc_i], _unit_df(idx, term), idx.doc_count,
                    idx.avg_doc_len, p.get("k1", 1.1), p.get("b", 0.4),
                )
            elif model == "tfidf":
                s += tfidf_term(tf, _unit_df(idx, term), idx.doc_count)
        return s
    if t == "cond":
        have = all(_unit_tf(idx, doc_i, p) > 0 for p in set(node["predicate_terms"]))
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
    units = {" ".join(t.split()) for t in terms}
    for i in range(idx.doc_count):
        if not any(_unit_tf(idx, i, u) > 0 for u in units):
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


FEATURE_TREE = {
    "type": "sum",
    "children": [
        {"type": "feature", "name": "f_a",
         "child": {"type": "retrieve", "model": "bm25", "terms": ["join", "hash"]}},
        {"type": "feature", "name": "f_b", "log": False,
         "child": {"type": "retrieve", "model": "tfidf", "terms": ["merge"]}},
    ],
}


def test_feature_node_records_and_weights(spark, corpus_small, oracle_idx):
    """FeatureNode (Query.hs:179-182, Streaming.hs:294-301): recorded value
    is the UNweighted child score; total = sum of weight*feature."""
    w = {"f_a": 2.0, "f_b": 0.5}
    got = compile_query(
        spark, corpus_small, FEATURE_TREE, k=10, params=w, with_features=True
    ).collect()
    assert {"f_a", "f_b"} <= set(got[0].asDict())
    plain = {
        "type": "sum",
        "children": [
            {"type": "scale", "factor": 2.0, "child": FEATURE_TREE["children"][0]["child"]},
            {"type": "scale", "factor": 0.5, "child": FEATURE_TREE["children"][1]["child"]},
        ],
    }
    want = {(r[1]): r[2] for r in _oracle_topk(oracle_idx, plain, 10)}
    for r in got:
        assert abs(r.score - (2.0 * r.f_a + 0.5 * r.f_b)) <= 1e-9 * max(1.0, abs(r.score))
        assert abs(r.score - want[r.doc_key]) <= 1e-9 * max(1.0, abs(r.score))


def test_record_output_on_scale(spark, corpus_small):
    """`record` mirrors recordOutput: emits the node's post-scale value."""
    tree = {
        "type": "scale", "factor": 3.0, "record": "scaled",
        "child": {"type": "retrieve", "model": "bm25", "terms": ["join"]},
    }
    got = compile_query(spark, corpus_small, tree, k=5, with_features=True).collect()
    for r in got:
        assert abs(r.scaled - r.score) <= 1e-12  # recorded AFTER scaling


def test_drop_node_excludes_docs(spark, corpus_small):
    """DropNode: the cond-guarded drop poisons the sum -> doc excluded."""
    base = {"type": "retrieve", "model": "bm25", "terms": ["merge"]}
    tree = {
        "type": "sum",
        "children": [
            base,
            {"type": "cond", "predicate_terms": ["dup"], "negated": False,
             "then": {"type": "drop"}, "else": {"type": "const", "value": 0.0}},
        ],
    }
    kept = {r.doc_key for r in compile_query(spark, corpus_small, tree, k=1000).collect()}
    all_docs = {r.doc_key for r in compile_query(spark, corpus_small, base, k=1000).collect()}
    from simplir_spark.functions.tokenize import with_tokens
    import pyspark.sql.functions as F
    dup_docs = {
        r.doc_key
        for r in with_tokens(corpus_small)
        .filter(F.array_contains("terms", "dup")).select("doc_key").collect()
    }
    assert kept == all_docs - dup_docs
    assert dup_docs and kept < all_docs


def test_l2r_trains_on_dsl_features(spark, corpus_small):
    """End-to-end kba-streaming workflow: DSL feature extraction feeds
    coordinate-ascent L2R (LearningToRank.hs consumer side)."""
    import pyspark.sql.functions as F

    from simplir_spark.operators.ltr import coordinate_ascent

    feats = compile_query(
        spark, corpus_small, FEATURE_TREE, k=50,
        params={"f_a": 1.0, "f_b": 1.0}, with_features=True,
    )
    features = feats.select(
        F.lit("Q1").alias("qid"),
        F.col("doc_key").cast("string").alias("doc"),
        F.array("f_a", "f_b").alias("features"),
    )
    # deterministic synthetic relevance: doc key's last digit parity
    qrels = features.select(
        "qid", "doc", (F.col("doc").substr(-1, 1).cast("int") % 2).alias("relevance")
    )
    w, m = coordinate_ascent(spark, features, qrels, n_features=2, n_iters=1)
    assert len(w) == 2 and 0.0 <= m <= 1.0


PHRASE_TREES = [
    # phrase leaf mixed with a plain term in one retrieve node
    # (TokenOrPhrase, Query.hs:211-216: a query string with spaces IS a
    # phrase; scored as a pseudo-term with trie-match tf and corpus-wide
    # phrase df)
    {
        "type": "sum",
        "children": [
            {"type": "retrieve", "model": "bm25", "terms": ["hash join", "merge"]},
            {"type": "const", "value": 0.25},
        ],
    },
    # phrase as a cond predicate (CondNode predicateTerms are
    # TokenOrPhrase too, Query.hs:183)
    {
        "type": "cond",
        "predicate_terms": ["hash join"],
        "negated": False,
        "then": {"type": "scale", "factor": 3.0,
                 "child": {"type": "retrieve", "model": "tfidf", "terms": ["merge"]}},
        "else": {"type": "retrieve", "model": "tfidf", "terms": ["merge"]},
    },
]


@pytest.mark.parametrize("tree_ix", range(len(PHRASE_TREES)))
def test_dsl_phrase_leaves_match_oracle(spark, corpus_small, oracle_idx, tree_ix):
    tree = PHRASE_TREES[tree_ix]
    got = sorted(compile_query(spark, corpus_small, tree, k=10).collect(), key=lambda r: r.rank)
    want = _oracle_topk(oracle_idx, tree, 10)
    assert len(got) == len(want) > 0
    for r, (rank, key, score) in zip(got, want):
        assert (r.rank, r.doc_key) == (rank, key)
        assert abs(r.score - score) <= REL * max(1.0, abs(score))


def test_dsl_phrase_in_grid(spark, corpus_small, oracle_idx):
    from simplir_spark.plans.query_dsl import compile_query_grid

    template = {
        "type": "scale", "factor": "{{w}}",
        "child": {"type": "retrieve", "model": "bm25", "terms": ["hash join", "merge"]},
    }
    got = compile_query_grid(
        spark, corpus_small, template,
        {"a": {"w": 1.0}, "b": {"w": 2.5}}, k=5,
    ).collect()
    by_set = {}
    for r in got:
        by_set.setdefault(r.param_set, []).append(r)
    for name, w in (("a", 1.0), ("b", 2.5)):
        tree = {"type": "scale", "factor": w, "child": template["child"]}
        want = _oracle_topk(oracle_idx, tree, 5)
        have = sorted(by_set[name], key=lambda r: r.rank)
        assert [(r.rank, r.doc_key) for r in have] == [(rk, ky) for rk, ky, _ in want]
        for r, (_, _, score) in zip(have, want):
            assert abs(r.score - score) <= REL * max(1.0, abs(score))


def test_grid_supports_feature_and_drop_nodes(spark, corpus_small):
    """compile_query_grid used to raise ValueError on feature/drop nodes
    that compile_query accepts, and lacked the NULL-score drop filter."""
    from simplir_spark.plans.query_dsl import compile_query, compile_query_grid

    template = {
        "type": "sum",
        "children": [
            {
                "type": "feature",
                "name": "f_bm25",
                "log": False,
                "weight": "{{w}}",
                "child": {
                    "type": "retrieve", "model": "bm25", "terms": ["hash", "join"],
                },
            },
            {
                "type": "cond",
                "predicate_terms": ["customer"],
                "negated": False,
                "then": {"type": "drop"},
                "else": {"type": "const", "value": 0.0},
            },
        ],
    }
    grid = compile_query_grid(
        spark, corpus_small, template,
        {"w1": {"w": 1.0}, "w2": {"w": 2.0}}, k=5, round_dp=6,
    ).collect()
    assert grid  # runs, and drop-filtered rows are gone
    by_set = {}
    for r in grid:
        by_set.setdefault(r["param_set"], {})[r["doc_key"]] = r["score"]
    # each param set must equal the single-query compile of the same tree
    from simplir_spark.plans.query_dsl import resolve_params

    for name, w in [("w1", 1.0), ("w2", 2.0)]:
        single = compile_query(
            spark, corpus_small, resolve_params(template, {"w": w}), k=5, round_dp=6
        ).collect()
        want = {r["doc_key"]: r["score"] for r in single}
        assert by_set[name] == want, name
        # drop semantics: no doc containing 'customer' survives
