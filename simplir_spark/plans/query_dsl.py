"""Query-expression DSL — the Spark compiler for the reference's JSON
`QueryNode` AST (simplir-trec-streaming/src/Query.hs:162-290, interpreter
`interpretQuery` Streaming.hs:253-331, parametric values Parametric.hs:73-134).

Node forms (JSON-ish dicts):
  {"type": "const",   "value": 1.5}
  {"type": "sum",     "children": [...]}
  {"type": "product", "children": [...]}
  {"type": "scale",   "factor": 2.0, "child": ...}          # factor may be "{{param}}"
  {"type": "retrieve", "model": "bm25"|"tfidf"|"ql_dirichlet",
   "terms": ["..."], "params": {"k1": ..., "b": ...}}
  {"type": "cond", "predicate_terms": ["..."], "negated": false,
   "then": ..., "else": ...}    # then-branch iff doc contains ALL predicate
                                # terms (xor negated) — Streaming.hs:304-318

Compilation strategy (one corpus pass, Catalyst all the way):
  1. statically collect retrieval leaves + cond predicates
     (`collectFieldTerms`, Query.hs:346-357);
  2. score every leaf in ONE job: per-doc (term, tf) rows filtered to the
     union of leaf terms, per-leaf term scores summed via conditional
     aggregation (sum(when(term ∈ leaf_i, score_i))) — no joins between
     leaves, one groupBy(doc);
  3. evaluate the tree bottom-up as a Column expression over the leaf
     columns; Cond uses per-predicate presence counts from the same
     aggregation.

The doc set is the match-any union over all leaf terms (posting-union
semantics, as in the reference's per-doc fold).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simplir_spark.functions.scoring import (
    bm25_term_score,
    ql_dirichlet_term_score,
    tfidf_term_score,
)
from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.query import topk_ranked
from simplir_spark.operators.stats import corpus_stats, doc_term_tfs, term_stats


def resolve_params(node: Any, params: dict[str, Any]) -> Any:
    """Substitute "{{name}}" placeholders (Parametric.hs:73-134)."""
    if isinstance(node, str) and node.startswith("{{") and node.endswith("}}"):
        name = node[2:-2].strip()
        if name not in params:
            raise KeyError(f"unbound parameter {name!r}")
        return params[name]
    if isinstance(node, dict):
        return {k: resolve_params(v, params) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_params(v, params) for v in node]
    return node


def _collect(node: dict, leaves: list[dict], preds: list[list[str]]) -> None:
    t = node["type"]
    if t == "retrieve":
        leaves.append(node)
    elif t in ("sum", "product"):
        for c in node["children"]:
            _collect(c, leaves, preds)
    elif t == "scale":
        _collect(node["child"], leaves, preds)
    elif t == "cond":
        preds.append(sorted(set(node["predicate_terms"])))
        _collect(node["then"], leaves, preds)
        _collect(node["else"], leaves, preds)
    elif t == "const":
        pass
    else:
        raise ValueError(f"unknown node type {t}")


def _leaf_term_score(leaf: dict, doc_count: int, avg_doc_len: float, token_count: int) -> Column:
    model = leaf.get("model", "bm25")
    p = leaf.get("params", {})
    if model == "bm25":
        return bm25_term_score(
            F.col("tf"), F.col("doc_len"), F.col("df"), doc_count, avg_doc_len,
            k1=float(p.get("k1", 1.1)), b=float(p.get("b", 0.4)),
        )
    if model == "tfidf":
        return tfidf_term_score(F.col("tf"), F.col("df"), doc_count)
    if model == "ql_dirichlet":
        bg = F.col("cf").cast("double") / F.lit(float(token_count))
        return ql_dirichlet_term_score(F.col("tf"), F.col("doc_len"), bg, mu=float(p.get("mu", 1000.0)))
    raise ValueError(f"unknown model {model}")


def compile_query(
    spark: SparkSession,
    corpus: DataFrame,
    query: dict,
    k: int = 10,
    params: dict[str, Any] | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Evaluate one QueryNode tree over the corpus -> (doc_key, rank, score)."""
    query = resolve_params(query, params or {})
    leaves: list[dict] = []
    preds: list[list[str]] = []
    _collect(query, leaves, preds)
    if not leaves and not preds:
        raise ValueError("query has no retrieval leaves")

    all_terms = sorted(
        {t for lf in leaves for t in lf["terms"]} | {t for pr in preds for t in pr}
    )

    tokenized = with_tokens(corpus).select("doc_key", "terms", "doc_len", "doc_len_alnum")
    cs = corpus_stats(tokenized).collect()[0]
    doc_count, token_count = cs.doc_count, cs.token_count
    avg_doc_len = token_count / doc_count if doc_count else 1.0

    pairs = doc_term_tfs(tokenized)
    matched = pairs.filter(F.col("term").isin(all_terms))
    ts = term_stats(matched)
    rows = matched.join(F.broadcast(ts), "term")

    aggs: list[Column] = []
    for i, lf in enumerate(leaves):
        terms = sorted(set(lf["terms"]))
        score = _leaf_term_score(lf, doc_count, avg_doc_len, token_count)
        aggs.append(
            F.sum(F.when(F.col("term").isin(terms), score).otherwise(F.lit(0.0))).alias(f"_leaf{i}")
        )
    for j, pr in enumerate(preds):
        aggs.append(
            F.count_distinct(F.when(F.col("term").isin(pr), F.col("term"))).alias(f"_pred{j}")
        )
    per_doc = rows.groupBy("doc_key").agg(*aggs)

    pred_ix = {tuple(pr): j for j, pr in enumerate(preds)}

    def build(node: dict, leaf_iter=iter(range(len(leaves)))) -> Column:
        t = node["type"]
        if t == "const":
            return F.lit(float(node["value"]))
        if t == "sum":
            cols = [build(c, leaf_iter) for c in node["children"]]
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return out
        if t == "product":
            cols = [build(c, leaf_iter) for c in node["children"]]
            out = cols[0]
            for c in cols[1:]:
                out = out * c
            return out
        if t == "scale":
            return F.lit(float(node["factor"])) * build(node["child"], leaf_iter)
        if t == "retrieve":
            return F.col(f"_leaf{next(leaf_iter)}")
        if t == "cond":
            pr = tuple(sorted(set(node["predicate_terms"])))
            have_all = F.col(f"_pred{pred_ix[pr]}") == len(pr)
            if node.get("negated", False):
                have_all = ~have_all
            then_c = build(node["then"], leaf_iter)
            else_c = build(node["else"], leaf_iter)
            return F.when(have_all, then_c).otherwise(else_c)
        raise ValueError(t)

    score_col = build(query)
    if round_dp is not None:
        score_col = F.round(score_col, round_dp)
    scored = per_doc.select("doc_key", score_col.alias("score"))
    # single-query top-k: orderBy+limit (Catalyst TakeOrderedAndProject —
    # partial per-partition top-k), then rank the k survivors
    topk = scored.orderBy(F.desc("score"), F.col("doc_key")).limit(k)
    w = Window.orderBy(F.desc("score"), F.col("doc_key"))
    return topk.withColumn("rank", F.row_number().over(w)).select("doc_key", "rank", "score")
