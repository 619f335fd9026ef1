"""Exact repeated-substring detection and removal (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").

The suffix-array formulation in the paper finds every token span of
length >= L that occurs more than once in the corpus (within OR across
documents).  A distributed suffix array is overkill for the same
answer: a span of length >= L repeats iff every one of its L-token
windows repeats, so (1) hash every L-token window positionally, (2)
keep the hashes that occur globally >= 2 times, (3) per document, merge
the surviving window starts into maximal islands (gaps-and-islands over
a doc-partitioned window).  Steps 1-3 are pure DataFrame ops — no
driver state, no Python row loops.

Scale shape at 10^12 docs:
 * window hashing is a per-row JVM projection (transform/sequence HOFs);
 * the occurrence count groups by a 60-bit hash (map-side combinable;
   the shuffled record is 16 bytes) — hot boilerplate hashes are
   unskewed because the count side reduces to (h, n);
 * the join back carries (id, pos, h) triples only for windows, and its
   output is proportional to the corpus' actually-duplicated mass;
 * island merging shuffles once on doc id — bounded by doc length.

Window hash = first 15 hex digits of md5 over the space-joined window
(collision odds ~n_windows^2 / 2^61; reproducible bit-exactly in the
DuckDB oracle via ('0x'||substr(md5(..),1,15))::BIGINT, the same trick
sample_deterministic uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def positional_window_hashes(
    tokenized: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, h): every L-token window of the ``terms`` array with its
    0-based start position and 60-bit content hash.  Unlike
    dedup.ngram_shingles this keeps positions and duplicates — the span
    machinery needs both."""
    win = F.expr(
        f"CASE WHEN size(terms) >= {n} THEN "
        f"transform(sequence(0, size(terms) - {n}), i -> struct("
        f"  CAST(i AS LONG) AS pos,"
        f"  CAST(conv(substr(md5(concat_ws(' ', slice(terms, i + 1, {n}))), 1, 15), 16, 10) AS LONG) AS h"
        f")) ELSE array() END"
    )
    return tokenized.select(
        F.col(id_col), F.explode(win).alias("w")
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))


_ROLL_MOD = (1 << 31) - 1
_ROLL_BASE1 = 1_000_003
_ROLL_BASE2 = 2_000_003


def positional_window_hashes_rolling(
    tokenized: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Scale path for :func:`positional_window_hashes`: same (id, pos, h)
    output shape, but the expr path materializes an ``n``-token STRING per
    window and md5s it — O(corpus_tokens * n) bytes hashed and allocated.
    Here md5 runs once per UNIQUE token in the Arrow batch; every window
    hash is then ``n`` vectorized int64 polynomial passes over the
    batch-flattened token-hash array (two independent 31-bit Karp-Rabin
    hashes packed into one 62-bit value, the winnowing no-overflow
    envelope: hash < 2^31, power < 2^31, product < 2^62).

    Hash VALUES differ from the expr path by construction; span OUTPUTS
    are identical absent collisions (~n_windows^2 / 2^62) — parity-tested.
    The contract entry keeps the expr path because the DuckDB oracle can
    reproduce md5 window hashes bit-exactly; at 10^12 docs this is the
    path to use."""
    from simplir_spark.functions.tokenize import _factorize_flat

    pw1 = np.asarray(
        [pow(_ROLL_BASE1, n - 1 - j, _ROLL_MOD) for j in range(n)], dtype=np.int64
    )
    pw2 = np.asarray(
        [pow(_ROLL_BASE2, n - 1 - j, _ROLL_MOD) for j in range(n)], dtype=np.int64
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def window_hashes(term_lists: pd.Series) -> pd.Series:
        import hashlib

        lists = [list(t) if t is not None else [] for t in term_lists]
        lens = np.asarray([len(t) for t in lists], dtype=np.int64)
        flat = np.asarray([tok for t in lists for tok in t], dtype=object)
        if len(flat) < n:
            return pd.Series([[] for _ in lists])
        codes, uniques = _factorize_flat(flat, False)
        dig = [hashlib.md5(u.encode()).digest() for u in uniques]
        uh1 = np.fromiter(
            ((int.from_bytes(d[:8], "big") >> 4) % _ROLL_MOD for d in dig),
            dtype=np.int64,
            count=len(dig),
        )
        uh2 = np.fromiter(
            ((int.from_bytes(d[8:16], "big") >> 4) % _ROLL_MOD for d in dig),
            dtype=np.int64,
            count=len(dig),
        )
        th1, th2 = uh1[codes], uh2[codes]
        # all windows over the batch-flattened array in n vector passes,
        # then per-doc selection masks out the ones crossing doc bounds
        ng_flat = len(flat) - n + 1
        h1 = np.zeros(ng_flat, dtype=np.int64)
        h2 = np.zeros(ng_flat, dtype=np.int64)
        for j in range(n):
            h1 = (h1 + (th1[j : j + ng_flat] * pw1[j]) % _ROLL_MOD) % _ROLL_MOD
            h2 = (h2 + (th2[j : j + ng_flat] * pw2[j]) % _ROLL_MOD) % _ROLL_MOD
        packed = (h1 << 31) | h2
        doc_ng = np.maximum(lens - n + 1, 0)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        starts = np.repeat(doc_start, doc_ng) + (
            np.arange(int(doc_ng.sum()), dtype=np.int64)
            - np.repeat(np.concatenate([[0], np.cumsum(doc_ng)[:-1]]), doc_ng)
        )
        sel = packed[starts]
        bounds = np.cumsum(doc_ng)
        return pd.Series(
            [
                [int(x) for x in sel[lo:hi]]
                for lo, hi in zip(np.concatenate([[0], bounds[:-1]]), bounds)
            ]
        )

    return (
        tokenized.select(F.col(id_col), window_hashes("terms").alias("_hs"))
        .select(id_col, F.posexplode("_hs").alias("pos", "h"))
        .select(id_col, F.col("pos").cast("long").alias("pos"), "h")
    )


def repeated_spans(
    tokenized: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    method: str = "expr",
    keep: str = "all",
) -> DataFrame:
    """Maximal duplicated token spans: (id, span_start, span_end) with
    span_end exclusive, each span >= ``n`` tokens long and made of
    windows whose content occurs >= 2 times corpus-wide (within- or
    cross-document, per the reference paper's definition).

    ``method="expr"`` (default) hashes windows with a JVM md5 expression —
    oracle-reproducible, O(n) bytes hashed per window.  ``method="rolling"``
    uses the vectorized Karp-Rabin kernel — same spans, the 100-TB path.

    ``keep="all"`` (default) marks EVERY occurrence of duplicated content
    (strip removes them all).  ``keep="first"`` exempts each window's
    canonical occurrence — the lowest (id, pos) — so the first copy of a
    repeated block survives stripping whole (every one of its windows is
    canonical) while later copies are still removed: the Lee et al.
    "remove all but one" training-pipeline semantics.  Same shuffle
    shape: one exchange on the window hash either way."""
    if method == "rolling":
        w = positional_window_hashes_rolling(tokenized, n, id_col)
    elif method == "expr":
        w = positional_window_hashes(tokenized, n, id_col)
    else:
        raise ValueError(f"unknown method: {method!r}")
    if keep == "first":
        # canonical copy per hash = min (id, pos) occurrence.  A
        # row_number window over partitionBy(h) would funnel EVERY
        # occurrence of a hot boilerplate hash into one sorted task
        # (10^9-row license headers -> straggler); min(struct) is a
        # map-side-combinable aggregate, so the hot hash reduces to one
        # row per partition before the exchange, and a join marks the
        # non-canonical occurrences
        canon = w.groupBy("h").agg(
            F.min(F.struct(F.col(id_col).alias("_cid"), F.col("pos").alias("_cpos"))).alias("_c"),
            F.count(F.lit(1)).alias("_n"),
        ).filter(F.col("_n") >= 2).select("h", "_c._cid", "_c._cpos")
        dup = w.join(canon, "h").filter(
            (F.col(id_col) != F.col("_cid")) | (F.col("pos") != F.col("_cpos"))
        ).select(*w.columns)
    elif keep == "all":
        dup_h = (
            w.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") >= 2)
            .select("h")
        )
        dup = w.join(dup_h, "h")
    else:
        raise ValueError(f"unknown keep mode: {keep!r}")
    # gaps-and-islands: windows [p, p+n) and [q, q+n), p < q, belong to
    # one span iff q - p <= n (overlap or adjacency)
    byd = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(byd) <= n, F.lit(0)
    ).otherwise(F.lit(1))
    isl = dup.withColumn("brk", brk).withColumn(
        "island", F.sum("brk").over(byd.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def strip_repeated_spans(
    tokenized: DataFrame, spans: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove every token covered by a duplicated span: (id, n_tokens,
    n_removed, cleaned_text).  The per-doc span list rides a (left) join
    keyed on id; token filtering is a JVM higher-order ``filter`` with
    the positional lambda — no Python in the path."""
    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    joined = tokenized.join(sp, id_col, "left")
    kept = F.expr(
        "CASE WHEN _spans IS NULL THEN terms ELSE "
        "filter(terms, (t, i) -> NOT exists(_spans, s ->"
        " i >= s.span_start AND i < s.span_end)) END"
    )
    return joined.select(
        F.col(id_col),
        F.size("terms").cast("long").alias("n_tokens"),
        (F.size("terms") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned_text"),
    )
