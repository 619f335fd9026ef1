"""Word-embedding operators — Spark re-expression of
simplir-word-embedding (`SimplIR.WordEmbedding`, WordEmbedding.hs:62-154
+ the GloVe parser WordEmbedding/Parse.hs:1-99).

The reference holds a statically-dimensioned dense table in memory and
averages term vectors into document embeddings (`embedTerms`/`embedText`).
Spark shape: the embedding table is a DataFrame joined (broadcast when it
fits) against per-doc term frequencies; the tf-weighted mean is computed
with ``dim`` JVM sum expressions — no explode of vector positions, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def load_glove(spark, path: str, dim: int) -> DataFrame:
    """Parse GloVe text format (one line: term v1 .. vDim) -> (term, vec).

    Port of WordEmbedding/Parse.hs:1-99; malformed lines (wrong arity)
    are dropped rather than failing the load.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ")
    return (
        lines.select(
            F.element_at(parts, 1).alias("term"),
            F.slice(parts, 2, dim).alias("_s"),
            F.size(parts).alias("_arity"),
        )
        # exact arity, not size(_s) == dim: slice() returns dim elements
        # for ANY longer line, which would silently truncate a 100-d file
        # loaded with dim=50 instead of dropping the wrong-arity rows
        .filter(F.col("_arity") == dim + 1)
        .select("term", F.transform("_s", lambda x: x.cast("double")).alias("vec"))
    )


def hash_term_vectors(terms: DataFrame, dim: int, term_col: str = "term") -> DataFrame:
    """Deterministic md5-derived term vectors — the sandbox stand-in for a
    real embedding table (no GloVe file ships in this container); swap in
    ``load_glove`` output on a real deployment.  vec[j] in [0, 1).
    """
    comps = [
        (
            F.conv(F.substring(F.md5(F.concat(F.col(term_col), F.lit(f":{j}"))), 1, 15), 16, 10)
            .cast("long") % 1000
        ).cast("double") / F.lit(1000.0)
        for j in range(dim)
    ]
    return terms.select(F.col(term_col).alias("term"), F.array(*comps).alias("vec"))


def doc_embeddings(
    pairs: DataFrame,
    term_vecs: DataFrame,
    dim: int,
    doc_col: str = "doc_key",
    broadcast_vectors: bool = True,
) -> DataFrame:
    """tf-weighted mean of term vectors per document (`embedTerms`,
    WordEmbedding.hs:88-103) -> (doc, vec array<double>, n_terms).

    Terms without a vector are skipped (the reference's lookup returns
    mempty for OOV).  The mean uses ``dim`` plain sum aggregates — one
    shuffle on doc, whole-stage-codegen arithmetic.
    """
    tv = F.broadcast(term_vecs) if broadcast_vectors else term_vecs
    joined = pairs.join(tv, "term")
    sums = [
        F.sum(F.col("vec")[j] * F.col("tf").cast("double")).alias(f"_s{j}")
        for j in range(dim)
    ]
    agg = joined.groupBy(doc_col).agg(
        F.sum(F.col("tf").cast("double")).alias("_w"),
        F.count(F.lit(1)).alias("n_terms"),
        *sums,
    )
    vec = F.array(*[F.col(f"_s{j}") / F.col("_w") for j in range(dim)])
    return agg.select(F.col(doc_col), vec.alias("vec"), "n_terms")
