"""Corpus-quality operators a training-data pipeline runs at scale,
beyond the reference's feature set (like dedup.py, mandated extensions):

 * lm_cross_entropy — per-document cross-entropy under a self-trained
   Laplace-smoothed word-bigram language model (the KenLM-style
   perplexity filter of web-corpus pipelines, with the model trained on
   the corpus itself so the operator is closed over its input — a real
   deployment swaps in counts trained elsewhere; the plan is identical).
 * decontaminate — flag documents sharing >= 1 token n-gram with a
   benchmark set (train/test contamination detection): benchmark
   n-grams are built once (small side), candidate hits come from an
   equi-join on the n-gram — the same bounded-shuffle shape as the
   MinHash candidate join.

Everything is JVM-side (shingle transforms + joins + aggregations); no
Python in either hot path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simplir_spark.cacheutil import CacheRegistry

_bloom_caches = CacheRegistry(retain=2)


def _bigrams(tokenized: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) rows — consecutive term pairs, order-preserving."""
    bg = F.expr(
        "CASE WHEN size(terms) >= 2 THEN "
        "transform(sequence(0, size(terms) - 2),"
        " i -> struct(terms[i] AS w1, terms[i + 1] AS w2)) "
        "ELSE array() END"
    )
    return (
        tokenized.select(F.col(id_col), F.explode(bg).alias("_bg"))
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def lm_cross_entropy(
    tokenized: DataFrame, id_col: str = "doc_id", round_dp: int | None = 6
) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own Laplace-smoothed
    bigram LM:  H(d) = -(1/n) Σ ln((C(w1,w2) + 1) / (C(w1·) + V)).

    Returns (id, n_bigrams, cross_entropy); docs with < 2 terms carry
    n_bigrams = 0 and NULL entropy.  Shuffle shape: one groupBy for the
    bigram counts, one for the context counts, one join of the doc
    bigrams against the count tables.  BOTH count tables are equi-joined
    (shuffle hash), never broadcast: the context table has one row per
    vocabulary TYPE, and at web scale (10^8+ types) that exceeds any
    broadcast budget even though it looks small at test scale.
    """
    from pyspark import StorageLevel

    # bg feeds three aggregations + the scoring join: persist it once
    # (disk-backed) instead of re-deriving the exploded bigrams per pass
    bg = _bigrams(tokenized, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # vocab from the (far smaller) distinct-bigram table, not from bg
    vocab = (
        c12.select(F.col("w1").alias("w"))
        .union(c12.select("w2"))
        .distinct()
        .count()
    )
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn(
            "_lp",
            F.log(
                (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.lit(float(vocab)))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (-F.sum("_lp") / F.count(F.lit(1))).alias("cross_entropy"),
    )
    docs = tokenized.select(id_col)
    out = docs.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.col("cross_entropy"),
    )
    if round_dp is not None:
        out = out.withColumn("cross_entropy", F.round("cross_entropy", round_dp))
    return out


def bloom_parameters(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln(p)/ln(2)^2 bits (rounded up to a
    64-bit word), k = m/n ln(2) hash functions."""
    n = max(1, n_items)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _bloom_positions(col, m_bits: int, k: int):
    """Array expression of the k Bloom bit positions for a string column,
    entirely JVM-side, identical on the build and probe paths.

    Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m with
    h1 = xxhash64(col), h2 = xxhash64(col, 1).  Both hashes are
    pmod-clamped to [0, m) BEFORE the linear combination so the int64
    arithmetic can never overflow (ANSI mode would raise); h2 is forced
    odd so a zero stride cannot collapse the k probes onto one bit.
    """
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(1)), F.lit(m_bits))
    h2 = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)  # force odd, stays < m+1
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def build_bloom_bitset(
    values: DataFrame, col: str, n_items: int, fpp: float = 0.01
):
    """Aggregate a distributed Bloom filter over ``values[col]`` and
    return (numpy uint64 bitset, m_bits, k).

    Bit positions are computed JVM-side, OR-reduced per 64-bit word with
    a map-side-combinable ``bit_or`` groupBy, and only the non-zero words
    are collected: driver traffic is <= m/64 longs regardless of input
    row count (for 10^8 benchmark n-grams at 1% FPP that is ~15M words /
    120 MB — a bounded, documented driver cost; the raw string set it
    replaces would be 10-100x larger and unbroadcastable).
    """
    m_bits, k = bloom_parameters(n_items, fpp)
    pos = F.explode(_bloom_positions(F.col(col), m_bits, k)).alias("pos")
    # Arrow collect (toPandas), not .collect(): at the 10^8-item scale
    # this method documents, ~15M pyspark Row objects would cost GBs of
    # driver heap and a 15M-iteration Python loop; two numpy columns and
    # a vectorized scatter keep the driver at the advertised ~120 MB.
    words = (
        values.select(pos)
        .select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
        .toPandas()
    )
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(words):
        w = words["w"].to_numpy(dtype=np.int64)
        word = words["word"].to_numpy(dtype=np.int64).view(np.uint64)
        bits[w] = word
    return bits, m_bits, k


def bloom_prefilter(
    df: DataFrame, col: str, bits, m_bits: int, k: int
) -> DataFrame:
    """Keep only rows whose ``col`` MIGHT be in the Bloom bitset (no
    false negatives).  The k positions are computed JVM-side; the bitset
    probe is one Arrow-batched numpy gather (vectorized over the whole
    batch x k probes at once), with the bitset shipped once per executor
    via sc.broadcast — the standard cluster-side membership-test shape.
    """
    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(bits)

    @pandas_udf("boolean")
    def _might_contain(pos_lists: pd.Series) -> pd.Series:
        b = bc.value
        if len(pos_lists) == 0:
            return pd.Series([], dtype=bool)
        pos = np.vstack(pos_lists.to_numpy())  # (rows, k) int64 in [0, m)
        hit = (b[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return df.filter(
        _might_contain(_bloom_positions(F.col(col), m_bits, k))
    )


def decontaminate(
    shingles: DataFrame,
    benchmark_shingles: DataFrame,
    id_col: str = "doc_id",
    method: str = "broadcast",
    bloom_fpp: float = 0.01,
) -> DataFrame:
    """(id, n_hits, contaminated) — per doc, how many of its distinct
    token n-grams appear in the benchmark set.

    ``shingles``/``benchmark_shingles``: (id, shingle) as produced by
    dedup.ngram_shingles (distinct per doc).

    method="broadcast" (default): the benchmark side is
    distinct-projected to (shingle) and the overlap is one broadcast
    equi-join; right while the benchmark n-gram set fits the broadcast
    budget (single test suites), so the corpus side never shuffles.

    method="bloom": for benchmark UNIONS too large to broadcast as raw
    strings (10^8+ n-grams), build a Bloom bitset over the benchmark
    shingles (10-100x smaller than the strings), prefilter the corpus
    side executor-locally, then CONFIRM survivors with the exact
    equi-join — Bloom has no false negatives and the join removes the
    false positives, so the result is bit-identical to the exact path
    while the shuffle carries only |benchmark| + fpp*|corpus| candidate
    rows instead of the whole corpus shingle table.
    """
    bench = benchmark_shingles.select("shingle").distinct()
    if method == "bloom":
        # the distinct benchmark projection feeds three consumers (count,
        # bitset build, exact confirm join) — persist it once instead of
        # recomputing the full pass over the side that is by definition
        # too large to broadcast; lifecycle via the bounded registry (the
        # confirm join is still lazy when this function returns)
        bench = bench.persist()
        _bloom_caches.register(bench)
        n_bench = bench.count()
        bits, m_bits, k = build_bloom_bitset(bench, "shingle", n_bench, bloom_fpp)
        candidates = bloom_prefilter(shingles, "shingle", bits, m_bits, k)
        # exact confirm join (shuffle hash, NOT broadcast: this path
        # exists precisely because bench exceeds the broadcast budget)
        hits = (
            candidates.join(bench.hint("shuffle_hash"), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
    elif method == "broadcast":
        hits = (
            shingles.join(F.broadcast(bench), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
    else:
        raise ValueError(f"decontaminate: unknown method {method!r}")
    all_ids = shingles.select(id_col).distinct()
    return all_ids.join(hits, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
    )
