"""Phrase matching — the TokenOrPhrase/trie path of the reference
(`Phrase [a]` Types.hs:212-225; trie match over the normalized token
stream, simplir-trec-streaming/Streaming.hs:472-480 + Data/Trie.hs:128-154).

Reference semantics: the trie walks the FILTERED normalized-term sequence,
so a phrase matches terms that are consecutive in the surviving sequence
(killed/short tokens do not break adjacency — `findPhrases` feeds the trie
list-consecutive tokens regardless of tokenN gaps).

Two implementations:

* ``phrase_match_scan`` — one pass over the corpus (EP1 shape): an Arrow
  kernel slides each phrase over the per-doc term sequence, vectorized
  per batch.  Semantics exactly mirror the trie walk.
* ``phrase_match_positional`` — over a positional index (payload `p` =
  positions, Types.hs:139-158): per-term position lists are decoded from
  posting runs and intersected with +1 shifts.  Positions are raw tokenN
  (Position.tokenN, Tokenise.hs:46-82), so adjacency here is RAW-token
  adjacency — stricter than the trie walk when filtered tokens sit inside
  the phrase; the right semantics for exact code-token sequences.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simplir_spark.functions import codec
from simplir_spark.operators.index_build import IndexHandle


def phrase_match_scan(
    corpus: DataFrame,
    phrases: list[tuple[str, list[str]]],
    id_col: str = "doc_key",
) -> DataFrame:
    """(phrase_id, doc, tf) for every doc where the phrase occurs.

    ``phrases``: (phrase_id, [normalized terms]).  Returns one row per
    (phrase_id, doc) with the occurrence count — the phrase-tf the
    reference accumulates per query node (Streaming.hs:452-455).
    """
    from simplir_spark.functions.tokenize import with_tokens

    tokenized = with_tokens(corpus).select(id_col, "terms")
    plist = [(pid, list(terms)) for pid, terms in phrases]

    def kernel(batches):
        for pdf in batches:
            ids_out, pid_out, tf_out = [], [], []
            for doc_id, terms in zip(pdf[id_col], pdf["terms"]):
                if terms is None or len(terms) == 0:
                    continue
                arr = np.asarray(terms, dtype=object)
                n = len(arr)
                for pid, p in plist:
                    m = len(p)
                    if m == 0 or m > n:
                        continue
                    # vectorized sliding equality over the term sequence
                    hit = arr[: n - m + 1] == p[0]
                    for j in range(1, m):
                        hit = hit & (arr[j : n - m + 1 + j] == p[j])
                    tf = int(hit.sum())
                    if tf:
                        ids_out.append(doc_id)
                        pid_out.append(pid)
                        tf_out.append(tf)
            yield pd.DataFrame(
                {"phrase_id": pid_out, id_col: ids_out, "tf": np.asarray(tf_out, dtype=np.int64)}
            )

    id_type = tokenized.schema[id_col].dataType.simpleString()
    return tokenized.mapInPandas(kernel, f"phrase_id string, {id_col} {id_type}, tf long")


def phrase_match_positional(
    spark: SparkSession,
    index: IndexHandle,
    phrases: list[tuple[str, list[str]]],
    n_shards: int | None = None,
) -> DataFrame:
    """(phrase_id, did, tf) via the positional index: decode each phrase
    term's runs, group by did, intersect position lists with +1 shifts.

    Plan: postings scan pruned to the phrase terms (parquet pushdown) →
    runs routed to every did-range shard they overlap → per-(phrase,
    shard) applyInPandas intersection (a doc's complete position data
    lives in one shard, so shard outputs union exactly).  Bounds per-task
    memory to one shard's postings — a phrase containing a common term
    never lands corpus-wide in a single task.  Adjacency is in raw tokenN
    space (see module docstring).
    """
    terms_needed = sorted({t for _, p in phrases for t in p})
    post = index.postings.filter(F.col("term").isin(terms_needed))
    if "pos" not in post.columns:
        raise ValueError("index was not built with_positions=True")
    if n_shards is None:
        from simplir_spark.operators.query_indexed import _pick_n_shards

        par = spark.sparkContext.defaultParallelism
        # same span floor as the scorers: runs span many dids, narrow
        # shards duplicate every run (see query_indexed._MIN_SHARD_SPAN)
        n_shards = _pick_n_shards(par, len(phrases), index.doc_count, "query_shard")
    span = max(1, -(-max(1, index.doc_count) // n_shards))

    rows = [(pid, t, j) for pid, p in phrases for j, t in enumerate(p)]
    from simplir_spark.localdf import local_rows_df

    pdf_phrases = local_rows_df(spark, rows, "phrase_id string, term string, term_ix int")
    matched = (
        post.join(F.broadcast(pdf_phrases), "term")
        .withColumn(
            "shard",
            F.explode(
                F.sequence(
                    (F.col("start_did") / span).cast("long"),
                    (F.col("end_did") / span).cast("long"),
                )
            ),
        )
        .select(
            "phrase_id", "shard", "term_ix", "term", "start_did", "n",
            "deltas", "tfs", "dls", "pos",
        )
    )
    phrase_len = {pid: len(p) for pid, p in phrases}

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = pdf["phrase_id"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        lo, hi = shard * span, (shard + 1) * span
        m = phrase_len[pid]
        # positions per (term_ix, did): dict did -> list of position arrays
        per_ix: list[dict[int, np.ndarray]] = [dict() for _ in range(m)]
        for row in pdf.itertuples(index=False):
            dids, tfs, _ = codec.decode_run(
                row.start_did, row.n, bytes(row.deltas), bytes(row.tfs), bytes(row.dls)
            )
            plists = codec.decode_positions(bytes(row.pos), tfs)
            d = per_ix[row.term_ix]
            for did, pl in zip(dids.tolist(), plists):
                if did < lo or did >= hi:
                    continue
                prev = d.get(did)
                d[did] = np.concatenate([prev, pl]) if prev is not None else np.asarray(pl)
        out_did, out_tf = [], []
        first = per_ix[0]
        for did, p0 in first.items():
            cand = np.sort(p0)
            ok = True
            for j in range(1, m):
                nxt = per_ix[j].get(did)
                if nxt is None:
                    ok = False
                    break
                nxt = np.sort(nxt)
                cand = cand[np.isin(cand + 1, nxt)] + 1
                if len(cand) == 0:
                    ok = False
                    break
            if ok and len(cand):
                out_did.append(did)
                out_tf.append(len(cand))
        return pd.DataFrame(
            {
                "phrase_id": pid,
                "did": np.asarray(out_did, dtype=np.int64),
                "tf": np.asarray(out_tf, dtype=np.int64),
            }
        )

    return matched.groupBy("phrase_id", "shard").applyInPandas(
        score_group, "phrase_id string, did long, tf long"
    )


def phrase_unit_rows(
    tokenized: DataFrame,
    phrases: list[list[str]],
    id_col: str = "doc_key",
    carry_cols: tuple[str, ...] = ("doc_len",),
) -> DataFrame:
    """Phrase occurrences as TERM-shaped rows for the query DSL:
    (id, *carry, term, tf) where ``term`` is the whitespace-joined phrase
    string — the unit name a DSL `retrieve`/`cond` node refers to
    (splitTerms, Query.hs:211-216: a query string with spaces IS a
    phrase).

    The rows union directly with ``doc_term_tfs`` output, so phrase df/cf
    fall out of the same term_stats aggregation — exactly the reference's
    corpus-stats fold, which appends `Phrase` pseudo-terms to each doc's
    token list before counting (Streaming.hs:168-172, foldTermStats
    Streaming.hs:236-248).  Trie semantics over the filtered sequence,
    as in ``phrase_match_scan``.
    """
    cols = [id_col, *carry_cols]
    tok = tokenized.select(*cols, "terms")
    plist = [(" ".join(p), list(p)) for p in phrases]

    def kernel(batches):
        for pdf in batches:
            out = {c: [] for c in cols}
            name_out, tf_out = [], []
            for row in pdf.itertuples(index=False):
                terms = getattr(row, "terms")
                if terms is None or len(terms) == 0:
                    continue
                arr = np.asarray(terms, dtype=object)
                n = len(arr)
                for name, p in plist:
                    m = len(p)
                    if m == 0 or m > n:
                        continue
                    hit = arr[: n - m + 1] == p[0]
                    for j in range(1, m):
                        hit = hit & (arr[j : n - m + 1 + j] == p[j])
                    tf = int(hit.sum())
                    if tf:
                        for c in cols:
                            out[c].append(getattr(row, c))
                        name_out.append(name)
                        tf_out.append(tf)
            out_pdf = pd.DataFrame(out, columns=cols)
            out_pdf["term"] = name_out
            out_pdf["tf"] = np.asarray(tf_out, dtype=np.int64)
            yield out_pdf

    carry_schema = ", ".join(
        f"{c} {tokenized.schema[c].dataType.simpleString()}" for c in cols
    )
    return tok.mapInPandas(kernel, f"{carry_schema}, term string, tf long")
