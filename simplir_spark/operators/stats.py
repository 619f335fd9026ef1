"""Collection statistics as DataFrame aggregates.

Port of the reference's corpus-stats folds (SURVEY.md §2.4):
 * ``corpus_stats``  — foldCorpusStats (Search.hs:190-194) /
   documentTermStats's docCount+tokenCount (CorpusStats.hs:107-133)
 * ``term_stats``    — foldTermStats (Search.hs:196-208): per-term
   (cf = collection frequency, df = document frequency)

Both are single shuffle-light aggregations: ``term_stats`` consumes the
per-doc pre-aggregated (term, tf) pairs from the tokenizer (one row per
distinct (doc, term), not per occurrence), so the groupBy(term) shuffle
moves ~df rows per term with map-side partial aggregation — the Spark
analog of the reference's monoidal partial CorpusStats merge
(CorpusStats.hs:89-104).
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def doc_term_tfs(tokenized: DataFrame, doc_cols: list[str] | None = None) -> DataFrame:
    """Flatten a tokenized corpus to (doc..., doc_len, term, tf) rows.

    One row per distinct (doc, term) — tf is pre-summed inside the Arrow
    batch (M.fromListWith (+), SimpleIndex.hs:94-96).  The kernel is one
    ``np.unique`` over the whole batch's (doc, term) keys — no per-doc
    Python loop, columnar in and out (mapInPandas, not explode(udf):
    building 10^7 nested structs dominates the naive version's profile).
    Output within a doc is term-sorted, fixing float summation order for
    score parity (SURVEY.md §4.4).
    """
    doc_cols = doc_cols or ["doc_key"]
    in_df = tokenized.select(*doc_cols, "doc_len", "terms")
    fields = [in_df.schema[c] for c in doc_cols]
    fields.append(in_df.schema["doc_len"])
    fields.append(T.StructField("term", T.StringType(), False))
    fields.append(T.StructField("tf", T.LongType(), False))
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            terms_col = pdf["terms"]
            lens = np.fromiter((len(t) for t in terms_col), dtype=np.int64, count=n)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.fromiter(chain.from_iterable(terms_col), dtype=object, count=total)
            doc_ix = np.repeat(np.arange(n, dtype=np.int64), lens)
            # factorize (hash) then remap codes to lexicographic rank so
            # per-doc output order stays term-sorted (float-sum parity)
            codes, uniq = pd.factorize(flat)
            uniq = np.asarray(uniq, dtype=object)
            order = np.argsort(uniq)
            rank = np.empty(len(uniq), dtype=np.int64)
            rank[order] = np.arange(len(uniq))
            uniq_sorted = uniq[order]
            inv = rank[codes]
            key = doc_ix * len(uniq) + inv
            ukey, tf = np.unique(key, return_counts=True)
            d = ukey // len(uniq)
            t_ix = ukey % len(uniq)
            out = {c: pdf[c].to_numpy()[d] for c in doc_cols}
            out["doc_len"] = pdf["doc_len"].to_numpy()[d]
            out["term"] = uniq_sorted[t_ix]
            out["tf"] = tf.astype(np.int64)
            yield pd.DataFrame(out)

    return in_df.mapInPandas(kernel, schema)


def doc_term_tfs_fused(
    corpus: DataFrame,
    doc_cols: list[str] | None = None,
    text_col: str = "content",
) -> DataFrame:
    """``doc_term_tfs(with_tokens(corpus))`` in ONE Python pass.

    The separate form ships every document's token list across the
    JVM<->Python boundary twice (out of the tokenizer pandas UDF, back in
    for the pair kernel — two ArrowEvalPython/MapInPandas nodes in the
    plan); here the tokenizer's integer core feeds the (doc, term, tf)
    flattening inside the same kernel, so only the raw text crosses once
    and the per-doc term lists never materialize as Arrow at all.

    Output rows, ordering (term-sorted within doc — the float-summation
    parity rule), types, and zero-term-doc behavior are identical to
    ``doc_term_tfs`` by construction: both end in ``tf_codes_core``-
    equivalent grouping of the same normalized token stream.  Plain
    pipeline only (no stopword / token-length variants — those callers
    keep the two-stage form).
    """
    from simplir_spark.functions.tokenize import (
        _KILL_TABLE,
        _factorize_flat,
        tf_codes_core,
    )

    doc_cols = doc_cols or ["doc_key"]
    in_df = corpus.select(*doc_cols, text_col)
    fields = [in_df.schema[c] for c in doc_cols]
    fields.append(T.StructField("doc_len", T.IntegerType(), False))
    fields.append(T.StructField("term", T.StringType(), False))
    fields.append(T.StructField("tf", T.LongType(), False))
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            texts = pdf[text_col].fillna("")
            raw = texts.str.translate(_KILL_TABLE).str.split()
            lens = np.fromiter((len(t) for t in raw), dtype=np.int64, count=n)
            total = int(lens.sum())
            if total == 0:
                continue
            all_toks = np.fromiter(chain.from_iterable(raw), dtype=object, count=total)
            doc_ix = np.repeat(np.arange(n, dtype=np.int64), lens)
            has_nul = bool(texts.str.contains("\x00", regex=False).any())
            inv, uniq = _factorize_flat(all_toks, has_nul)
            term_idx, nt_sorted, tf, n_distinct, doc_len, _ = tf_codes_core(
                inv, uniq, doc_ix, n
            )
            if len(term_idx) == 0:
                continue
            d = np.repeat(np.arange(n, dtype=np.int64), n_distinct)
            out = {c: pdf[c].to_numpy()[d] for c in doc_cols}
            out["doc_len"] = doc_len[d]
            out["term"] = nt_sorted[term_idx]
            out["tf"] = tf
            yield pd.DataFrame(out)

    return in_df.mapInPandas(kernel, schema)


def corpus_stats(tokenized: DataFrame) -> DataFrame:
    """(doc_count, token_count, token_count_alnum) — one row.

    token_count = sum of normalized-term counts (corpusTokenCount in the
    SimpleIndex/BM25 path); token_count_alnum = Search.hs foldCorpusStats'
    collectionLength (sum of alnum doc lengths).
    """
    return tokenized.agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("token_count"),
        F.coalesce(F.sum("doc_len_alnum"), F.lit(0)).cast("long").alias("token_count_alnum"),
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
    log: bool = False,
) -> DataFrame:
    """Binned counts — port of simplir's Histogram fold
    (simplir/src/SimplIR/Histogram.hs:44-152: bounded/linear/log binning).

    Linear: width_bucket over [lo, hi); log: buckets on log10(x) (x <= 0
    lands in bucket 0).  Bounds default to a min/max aggregate (one cheap
    pass).  Returns (bucket, lo, hi, n) with bucket 0 / n_bins+1 as
    under/overflow, mirroring width_bucket semantics.
    """
    c = F.col(col).cast("double")
    # NULLs have no bin: width_bucket(NULL) is NULL and F.least() SKIPS
    # nulls, which would silently fold every NULL row into the top bin
    df = df.filter(c.isNotNull())
    if lo is None or hi is None:
        row = df.agg(F.min(c).alias("lo"), F.max(c).alias("hi")).collect()[0]
        if row.lo is None:  # empty (or all-null) input: any bounds do
            lo, hi = 0.0, 1.0
        else:
            lo = float(row.lo) if lo is None else lo
            hi = float(row.hi) if hi is None else hi
    if hi <= lo:
        # degenerate range (constant column under auto bounds):
        # width_bucket(x, lo, lo, n) is NULL for every row — widen so the
        # whole distribution lands in bucket 1 instead of vanishing
        hi = lo + 1.0
    if log:
        c2 = F.when(c > 0, F.log10(c)).otherwise(F.lit(float("-inf")))
        import math

        lo2, hi2 = (math.log10(lo) if lo > 0 else -12.0), math.log10(hi) if hi > 0 else 0.0
        raw = F.width_bucket(c2, F.lit(lo2), F.lit(hi2), F.lit(n_bins))
        # exact edges; x == hi folds into the top bin, x > hi overflows
        bucket = F.when(c2 > hi2, F.lit(n_bins + 1)).otherwise(F.least(raw, F.lit(n_bins)))
        edges = [(10 ** (lo2 + (hi2 - lo2) * i / n_bins)) for i in range(n_bins + 1)]
    else:
        raw = F.width_bucket(c, F.lit(lo), F.lit(hi), F.lit(n_bins))
        bucket = F.when(c > hi, F.lit(n_bins + 1)).otherwise(F.least(raw, F.lit(n_bins)))
        edges = [lo + (hi - lo) * i / n_bins for i in range(n_bins + 1)]
    counts = df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    spark = df.sparkSession
    edge_rows = [(i + 1, float(edges[i]), float(edges[i + 1])) for i in range(n_bins)]
    edge_df = spark.createDataFrame(edge_rows, "bucket bigint, lo double, hi double")
    return counts.join(F.broadcast(edge_df), "bucket", "left").select(
        "bucket", "lo", "hi", "n"
    )


def term_stats(pairs: DataFrame) -> DataFrame:
    """(term, df, cf) from (doc, term, tf) pairs (Search.hs:196-208)."""
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
