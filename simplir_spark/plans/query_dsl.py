"""Query-expression DSL — the Spark compiler for the reference's JSON
`QueryNode` AST (simplir-trec-streaming/src/Query.hs:162-290, interpreter
`interpretQuery` Streaming.hs:253-331, parametric values Parametric.hs:73-134).

Node forms (JSON-ish dicts):
  {"type": "const",   "value": 1.5}
  {"type": "sum",     "children": [...], "record": "name"?}
  {"type": "product", "children": [...], "record": "name"?}
  {"type": "scale",   "factor": 2.0, "child": ..., "record": "name"?}
                                # factor may be "{{param}}"
  {"type": "retrieve", "model": "bm25"|"tfidf"|"ql_dirichlet",
   "terms": ["..."], "params": {"k1": ..., "b": ...}}
                                # a terms entry CONTAINING WHITESPACE is a
                                # PHRASE (splitTerms, Query.hs:211-216: one
                                # token -> Token, several -> Phrase): it
                                # matches trie-style over the filtered term
                                # sequence (findPhrases Streaming.hs:472-480)
                                # and scores as a pseudo-term whose tf is the
                                # occurrence count and whose df/cf come from
                                # the same corpus-wide stats fold that counts
                                # tokens (Streaming.hs:168-172, 236-248)
  {"type": "cond", "predicate_terms": ["..."], "negated": false,
   "then": ..., "else": ...}    # then-branch iff doc contains ALL predicate
                                # terms (xor negated) — Streaming.hs:304-318
  {"type": "feature", "name": "f", "log": false, "child": ..., "weight"?: w}
                                # L2R leaf (Query.hs FeatureNode:179-182,
                                # interpreter Streaming.hs:294-301): the
                                # child's score (ln'd when log) is RECORDED
                                # under `name`, then scaled by the weight —
                                # resolved from compile params[`name`]
                                # (featureParameterName), explicit "weight"
                                # field wins, default 1.0
  {"type": "drop"}              # DropNode (Query.hs:163, Streaming.hs
                                # `go DropNode = const Nothing`): poisons
                                # the containing sum/product so the doc is
                                # excluded — Spark NULL propagation models
                                # the reference's Maybe exactly

`record` on sum/product/scale mirrors Query.hs `recordOutput`: the node's
value (post-scale) is emitted as a named per-doc column when the query is
compiled with ``with_features=True`` — the kba-streaming feature-extraction
workflow that feeds learning-to-rank.

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

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simplir_spark.cacheutil import CacheRegistry
from simplir_spark.functions.scoring import (
    bm25_term_score,
    ql_dirichlet_term_score,
    tfidf_term_score,
)
from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.stats import doc_term_tfs, doc_term_tfs_fused, term_stats


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


def _canon_unit(u: str) -> str:
    """Canonical unit name: whitespace-normalized.  Several tokens = a
    phrase (splitTerms, Query.hs:211-216); the phrase's unit name is the
    space-joined token list."""
    return " ".join(u.split())


def _collect(node: dict, leaves: list[dict], preds: list[list[str]]) -> None:
    t = node["type"]
    if t == "retrieve":
        leaves.append(node)
    elif t in ("sum", "product"):
        for c in node["children"]:
            _collect(c, leaves, preds)
    elif t in ("scale", "feature"):
        _collect(node["child"], leaves, preds)
    elif t == "cond":
        preds.append(sorted({_canon_unit(x) for x in node["predicate_terms"]}))
        _collect(node["then"], leaves, preds)
        _collect(node["else"], leaves, preds)
    elif t in ("const", "drop"):
        pass
    else:
        raise ValueError(f"unknown node type {t}")


_dsl_caches = CacheRegistry(retain=4)


def _matched_rows(corpus: DataFrame, all_units: list[str]):
    """Shared leaf-matching front end: ONE tokenizer pass, term rows
    filtered to the unit list, phrase units (names containing a space)
    matched trie-style and unioned in as pseudo-term rows so phrase df/cf
    fall out of the same term_stats aggregation (the reference's
    corpus-stats fold appends Phrase pseudo-terms to each doc's token
    list before counting, Streaming.hs:168-172).

    Returns (rows, doc_count, token_count, avg_doc_len); ``rows`` carries
    (doc_key, doc_len, term, tf, df, cf).  token_count counts TOKENS only
    (collLength = sum of docLength, Streaming.hs:231-234) — phrase
    occurrences do not inflate the background denominator.
    """
    term_units = sorted(u for u in all_units if " " not in u)
    phrase_units = sorted(u for u in all_units if " " in u)

    if phrase_units:
        # the phrase kernel needs the ordered token arrays (a second
        # linear pass) — cache them rather than re-running the tokenizer.
        # Registered for bounded eviction: without it every compiled
        # phrase-bearing query would leak a cached dataset for the
        # session lifetime.
        tokenized = with_tokens(corpus).select("doc_key", "terms", "doc_len")
        tokenized = tokenized.persist(StorageLevel.MEMORY_AND_DISK)
        _dsl_caches.register(tokenized)
        pairs = doc_term_tfs(tokenized).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        # term-only trees: fused tokenizer+pair kernel — the token lists
        # never cross the JVM<->Python boundary a second time (guide §4)
        tokenized = None
        pairs = doc_term_tfs_fused(corpus.select("doc_key", "content")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    _dsl_caches.register(pairs)
    doc_count = corpus.count()
    tc = pairs.agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("tc")).collect()[0]["tc"]
    token_count = int(tc)
    avg_doc_len = token_count / doc_count if doc_count else 1.0

    matched = pairs.filter(F.col("term").isin(term_units))
    if phrase_units:
        from simplir_spark.operators.phrase import phrase_unit_rows

        matched = matched.unionByName(
            phrase_unit_rows(tokenized, [u.split(" ") for u in phrase_units])
        )
    ts = term_stats(matched)
    rows = matched.join(F.broadcast(ts), "term")
    return rows, doc_count, token_count, avg_doc_len


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
    with_features: bool = False,
) -> DataFrame:
    """Evaluate one QueryNode tree over the corpus -> (doc_key, rank, score).

    ``with_features=True`` additionally emits one column per recorded
    value — `feature` nodes and `record`-annotated nodes — for the L2R
    feature-extraction workflow (Streaming.hs:294-301 `recording`)."""
    params = params or {}
    query = resolve_params(query, params)
    leaves: list[dict] = []
    preds: list[list[str]] = []
    _collect(query, leaves, preds)
    if not leaves and not preds:
        raise ValueError("query has no retrieval leaves")

    all_units = sorted(
        {_canon_unit(t) for lf in leaves for t in lf["terms"]}
        | {t for pr in preds for t in pr}
    )
    rows, doc_count, token_count, avg_doc_len = _matched_rows(corpus, all_units)

    aggs: list[Column] = []
    for i, lf in enumerate(leaves):
        terms = sorted({_canon_unit(t) for t in lf["terms"]})
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
    recorded: dict[str, Column] = {}

    def record(name: str | None, col: Column) -> Column:
        if name is not None:
            recorded[name] = col
        return col

    def build(node: dict, leaf_iter=iter(range(len(leaves)))) -> Column:
        t = node["type"]
        if t == "const":
            return F.lit(float(node["value"]))
        if t == "drop":
            # Maybe-Nothing: NULL poisons the containing sum/product
            return F.lit(None).cast("double")
        if t == "sum":
            cols = [build(c, leaf_iter) for c in node["children"]]
            out = cols[0]
            for c in cols[1:]:
                out = out + c
            return record(node.get("record"), out)
        if t == "product":
            cols = [build(c, leaf_iter) for c in node["children"]]
            out = cols[0]
            for c in cols[1:]:
                out = out * c
            return record(node.get("record"), out)
        if t == "scale":
            out = F.lit(float(node["factor"])) * build(node["child"], leaf_iter)
            return record(node.get("record"), out)
        if t == "feature":
            # Streaming.hs:294-301: record(transform(child)), THEN weight
            child = build(node["child"], leaf_iter)
            val = F.log(child) if node.get("log", False) else child
            record(node["name"], val)
            w = float(node.get("weight", params.get(node["name"], 1.0)))
            return F.lit(w) * val
        if t == "retrieve":
            return F.col(f"_leaf{next(leaf_iter)}")
        if t == "cond":
            pr = tuple(sorted({_canon_unit(x) for x in node["predicate_terms"]}))
            have_all = F.col(f"_pred{pred_ix[pr]}") == len(pr)
            if node.get("negated", False):
                have_all = ~have_all
            then_c = build(node["then"], leaf_iter)
            else_c = build(node["else"], leaf_iter)
            return F.when(have_all, then_c).otherwise(else_c)
        raise ValueError(t)

    score_col = build(query)
    feat_cols = list(recorded.items())
    if round_dp is not None:
        score_col = F.round(score_col, round_dp)
        feat_cols = [(n, F.round(c, round_dp)) for n, c in feat_cols]
    extra = [c.alias(n) for n, c in feat_cols] if with_features else []
    scored = per_doc.select("doc_key", score_col.alias("score"), *extra)
    # drop-node semantics: a NULL score is the reference's Nothing — the
    # doc is excluded from the ranking entirely
    scored = scored.filter(F.col("score").isNotNull())
    # single-query top-k: orderBy+limit (Catalyst TakeOrderedAndProject —
    # partial per-partition top-k), then rank the k survivors
    topk = scored.orderBy(F.desc("score"), F.col("doc_key")).limit(k)
    w = Window.orderBy(F.desc("score"), F.col("doc_key"))
    out_cols = ["doc_key", "rank", "score"] + ([n for n, _ in feat_cols] if with_features else [])
    return topk.withColumn("rank", F.row_number().over(w)).select(*out_cols)


def compile_query_grid(
    spark: SparkSession,
    corpus: DataFrame,
    query_template: dict,
    paramsets: dict[str, dict[str, Any]],
    k: int = 10,
    round_dp: int | None = None,
) -> DataFrame:
    """Evaluate one parametric QueryNode template under MANY parameter
    settings in a single corpus pass -> (param_set, doc_key, rank, score).

    The reference's grid evaluation: `queriesFold = sequenceA (M.fromList
    [((qid, paramset), queryFold …)])` scores the queries × parameter-sets
    cross product in one streaming pass (Streaming.hs:432-438,
    Parametric.hs:43-56).  Spark shape: every resolved tree's leaves
    become conditional-aggregation columns of ONE groupBy(doc), per-set
    score expressions are stacked with ``explode``, and the per-set top-k
    is a single window.
    """
    resolved = {name: resolve_params(query_template, ps) for name, ps in sorted(paramsets.items())}
    per_set_leaves: dict[str, list[dict]] = {}
    preds: list[list[str]] = []
    for name, tree in resolved.items():
        leaves: list[dict] = []
        _collect(tree, leaves, preds)
        per_set_leaves[name] = leaves
    # dedupe predicate sets (same template -> same predicates per set)
    preds = [list(p) for p in sorted({tuple(p) for p in preds})]

    all_units = sorted(
        {_canon_unit(t) for lv in per_set_leaves.values() for lf in lv for t in lf["terms"]}
        | {t for pr in preds for t in pr}
    )
    rows, doc_count, token_count, avg_doc_len = _matched_rows(corpus, all_units)

    aggs: list[Column] = []
    for name, leaves in per_set_leaves.items():
        for i, lf in enumerate(leaves):
            terms = sorted({_canon_unit(t) for t in lf["terms"]})
            score = _leaf_term_score(lf, doc_count, avg_doc_len, token_count)
            aggs.append(
                F.sum(F.when(F.col("term").isin(terms), score).otherwise(F.lit(0.0)))
                .alias(f"_{name}_leaf{i}")
            )
    for j, pr in enumerate(preds):
        aggs.append(
            F.count_distinct(F.when(F.col("term").isin(pr), F.col("term"))).alias(f"_pred{j}")
        )
    per_doc = rows.groupBy("doc_key").agg(*aggs)

    pred_ix = {tuple(pr): j for j, pr in enumerate(preds)}

    def build(node: dict, prefix: str, leaf_iter) -> Column:
        t = node["type"]
        if t == "const":
            return F.lit(float(node["value"]))
        if t == "drop":
            # Maybe-Nothing, same as compile_query: NULL poisons the
            # containing sum/product and the row is filtered below
            return F.lit(None).cast("double")
        if t == "feature":
            # grid has no feature-recording sink; evaluate as the
            # weighted (optionally log-transformed) child, the same
            # score semantics as compile_query's feature case
            child = build(node["child"], prefix, leaf_iter)
            val = F.log(child) if node.get("log", False) else child
            return F.lit(float(node.get("weight", 1.0))) * val
        if t in ("sum", "product"):
            cols = [build(c, prefix, leaf_iter) for c in node["children"]]
            out = cols[0]
            for c in cols[1:]:
                out = (out + c) if t == "sum" else (out * c)
            return out
        if t == "scale":
            return F.lit(float(node["factor"])) * build(node["child"], prefix, leaf_iter)
        if t == "retrieve":
            return F.col(f"_{prefix}_leaf{next(leaf_iter)}")
        if t == "cond":
            pr = tuple(sorted({_canon_unit(x) for x in node["predicate_terms"]}))
            have_all = F.col(f"_pred{pred_ix[pr]}") == len(pr)
            if node.get("negated", False):
                have_all = ~have_all
            return F.when(have_all, build(node["then"], prefix, leaf_iter)).otherwise(
                build(node["else"], prefix, leaf_iter)
            )
        raise ValueError(t)

    structs = []
    for name, tree in resolved.items():
        sc = build(tree, name, iter(range(len(per_set_leaves[name]))))
        if round_dp is not None:
            sc = F.round(sc, round_dp)
        structs.append(F.struct(F.lit(name).alias("param_set"), sc.alias("score")))
    stacked = per_doc.select(
        "doc_key", F.explode(F.array(*structs)).alias("_ps")
    ).select("doc_key", F.col("_ps.param_set").alias("param_set"), F.col("_ps.score").alias("score"))
    # drop-node semantics (compile_query parity): NULL score = Nothing
    stacked = stacked.filter(F.col("score").isNotNull())

    w = Window.partitionBy("param_set").orderBy(F.desc("score"), F.col("doc_key"))
    return (
        stacked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("param_set", "doc_key", "rank", "score")
    )
