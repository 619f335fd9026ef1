"""Retrieval-model scoring as Catalyst column expressions (JVM-side,
whole-stage-codegen'd — no Python in the scoring hot path).

Ports:
 * BM25      — simplir/src/SimplIR/RetrievalModels/BM25.hs:48-59
   (Lucene probidf variant; ignores query tf and length bias).
 * TF-IDF    — simplir/src/SimplIR/RetrievalModels/TfIdf.hs:18-25
 * Query likelihood (Dirichlet / Jelinek-Mercer / Laplace / none) —
   simplir/src/SimplIR/RetrievalModels/QueryLikelihood.hs:38-73; computed
   in log space (the reference's `Log Double` is ln-space storage).

Default parameters are BASELINE.json's k1=1.1, b=0.4 (the reference's own
`sensibleParams` is k1=1.2, b=0.75 — BM25.hs:20-21; params stay explicit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

K1_DEFAULT = 1.1
B_DEFAULT = 0.4


def bm25_idf(df_col: Column, doc_count) -> Column:
    """Lucene probidf: log(1 + (N - df + 0.5) / (df + 0.5))  (BM25.hs:53-59)."""
    n = F.lit(float(doc_count)) if not isinstance(doc_count, Column) else doc_count
    return F.log(F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def bm25_term_score(
    tf: Column,
    doc_len: Column,
    df_col: Column,
    doc_count,
    avg_doc_len,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> Column:
    """bm25Term' (BM25.hs:48-52):
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*docLen/avgDocLen))."""
    avg = F.lit(float(avg_doc_len)) if not isinstance(avg_doc_len, Column) else avg_doc_len
    idf = bm25_idf(df_col.cast("double"), doc_count)
    tf_d = tf.cast("double")
    denom = tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len.cast("double") / avg)
    return idf * tf_d * F.lit(k1 + 1.0) / denom


def tfidf_term_score(tf: Column, df_col: Column, doc_count) -> Column:
    """TfIdf.hs:18-25: tf * log(N / (1 + df))."""
    n = F.lit(float(doc_count)) if not isinstance(doc_count, Column) else doc_count
    return tf.cast("double") * F.log(n / (F.lit(1.0) + df_col.cast("double")))


def ql_dirichlet_term_score(
    tf: Column, doc_len: Column, bg_prob: Column, mu: float = 1000.0
) -> Column:
    """Dirichlet-smoothed query likelihood, per query token, in log space
    (QueryLikelihood.hs:58-62): log((tf + mu*P(t)) / (docLen + mu)).

    A term absent from both document and corpus has probability 0 — the
    reference's `Log Double` representation of 0 is -inf in log space, so
    the whole document score pins to -inf (Spark's F.log would yield NULL)."""
    num = tf.cast("double") + F.lit(mu) * bg_prob
    return F.when(num > 0, F.log(num / (doc_len.cast("double") + F.lit(mu)))).otherwise(
        F.lit(float("-inf"))
    )


def ql_jm_term_score(tf: Column, doc_len: Column, bg_prob: Column, alpha: float = 0.5) -> Column:
    """Jelinek-Mercer (QueryLikelihood.hs:63-67):
    log(alpha*tf/len + (1-alpha)*P(t)).

    A term absent from both document and corpus has probability 0; like
    the Dirichlet variant, pin to -inf (the reference's `Log Double` zero)
    instead of letting F.log return NULL and silently drop the term."""
    inner = (
        F.lit(alpha) * tf.cast("double") / doc_len.cast("double")
        + F.lit(1.0 - alpha) * bg_prob
    )
    return F.when(inner > 0, F.log(inner)).otherwise(F.lit(float("-inf")))


def ql_laplace_term_score(tf: Column, doc_len: Column) -> Column:
    """Laplace (QueryLikelihood.hs:54-57): log((tf+1)/(len+2))."""
    return F.log((tf.cast("double") + F.lit(1.0)) / (doc_len.cast("double") + F.lit(2.0)))


def ql_nosmoothing_term_score(tf: Column, doc_len: Column) -> Column:
    """NoSmoothing (QueryLikelihood.hs:44-47): log(tf/len); a query term
    absent from the document has probability 0 — `Log Double` zero is
    -inf, pinning the whole document score (only docs containing EVERY
    query term score finite)."""
    return F.when(
        tf > 0, F.log(tf.cast("double") / doc_len.cast("double"))
    ).otherwise(F.lit(float("-inf")))
