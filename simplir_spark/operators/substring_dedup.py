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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def repeated_spans(
    tokenized: DataFrame, n: int = 50, id_col: str = "doc_id"
) -> DataFrame:
    """Maximal duplicated token spans: (id, span_start, span_end) with
    span_end exclusive, each span >= ``n`` tokens long and made of
    windows whose content occurs >= 2 times corpus-wide (within- or
    cross-document, per the reference paper's definition)."""
    w = positional_window_hashes(tokenized, n, id_col)
    dup_h = (
        w.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("h")
    )
    dup = w.join(dup_h, "h")
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
