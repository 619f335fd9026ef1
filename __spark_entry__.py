"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 /
the training-data-pipeline set, with a DuckDB-oracle ``oracle_sql()``
twin.  Float-score queries round to 6 dp BEFORE ranking on both sides so
summation-order noise cannot flip ranks; ties break on doc_id.

The synthetic documents table is pure ASCII lowercase + spaces, so the
reference tokenizer (punct kill-set, casefold, alpha-strip — see
simplir_spark/functions/tokenize.py) reduces to: split on ' ', keep
tokens of length > 2 — which is what the oracle SQL implements.  Full
Unicode tokenizer semantics are covered by tests/test_tokenize.py
against the pure-Python oracle.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.query import bm25_scan, topk_ranked
from simplir_spark.operators.stats import corpus_stats, doc_term_tfs, term_stats
from simplir_spark.queryset import QUERIES

K = 10
DP = 6  # score rounding, both engines

# queries whose terms all exist in the corpus (QL's log needs cf > 0)
QL_QUERIES = [q for q in QUERIES if q[0] not in ("Q08", "Q09", "Q14")]


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table with (doc_key=doc_id, content) for the operators."""
    return _documents(spark, sf_dir).select(
        F.col("doc_id").alias("doc_key"), F.col("text").alias("content")
    )


def _rename_key(df: DataFrame) -> DataFrame:
    return df.withColumnRenamed("doc_key", "doc_id")


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = with_tokens(_corpus(spark, sf_dir))
    return corpus_stats(tok)


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = with_tokens(_corpus(spark, sf_dir))
    return term_stats(doc_term_tfs(tok))


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = with_tokens(_corpus(spark, sf_dir))
    return tok.select(
        F.col("doc_key").alias("doc_id"),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("doc_len_alnum").cast("long").alias("doc_len_alnum"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = bm25_scan(spark, _corpus(spark, sf_dir), QUERIES, k=K, round_dp=DP)
    return _rename_key(res.select("query_id", "doc_key", "rank", "score"))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = bm25_scan(spark, _corpus(spark, sf_dir), QUERIES, k=K, model="tfidf", round_dp=DP)
    return _rename_key(res.select("query_id", "doc_key", "rank", "score"))


def q_ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = bm25_scan(
        spark, _corpus(spark, sf_dir), QL_QUERIES, k=K, model="ql_dirichlet", mu=1000.0, round_dp=DP
    )
    return _rename_key(res.select("query_id", "doc_key", "rank", "score"))


_INDEX_CACHE: dict[str, object] = {}


def _indexed(spark: SparkSession, sf_dir: str):
    """Build (once per sf_dir) and open the on-disk index."""
    from simplir_spark.operators.index_build import build_index, open_index

    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        out = os.path.join(
            tempfile.gettempdir(), "simplir_idx_" + key.strip("/").replace("/", "_")
        )
        build_index(spark, _corpus(spark, sf_dir), out)
        _INDEX_CACHE[key] = open_index(spark, out)
    return _INDEX_CACHE[key]


def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same ranking as q_bm25_topk but through the on-disk inverted index
    (posting runs + block-max scorer) — the oracle SQL is identical, which
    IS the indexed-vs-SQL rank-identity check."""
    from simplir_spark.operators.query_indexed import bm25_indexed

    idx = _indexed(spark, sf_dir)
    res = bm25_indexed(spark, idx, QUERIES, k=K)
    # re-rank on rounded scores for cross-engine determinism
    scored = res.select("query_id", "doc_key", F.round("score", DP).alias("score"))
    return _rename_key(topk_ranked(scored, K).select("query_id", "doc_key", "rank", "score"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simplir_spark.operators.dedup import exact_duplicates

    docs = _documents(spark, sf_dir).select("doc_id", F.col("text").alias("content"))
    return exact_duplicates(docs, id_col="doc_id")


def q_doclen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = with_tokens(_corpus(spark, sf_dir))
    bucket = F.least(F.floor(F.col("doc_len") / 10), F.lit(20)).cast("long")
    return tok.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n_docs"))


def q_trec_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simplir_spark.sources.trec import to_trec_run

    res = bm25_scan(spark, _corpus(spark, sf_dir), QUERIES, k=K, round_dp=DP)
    return to_trec_run(res, method="bm25")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_stats": q_corpus_stats,
        "term_stats": q_term_stats,
        "doc_lengths": q_doc_lengths,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_indexed": q_bm25_topk_indexed,
        "tfidf_topk": q_tfidf_topk,
        "ql_dirichlet_topk": q_ql_dirichlet_topk,
        "dedup_exact": q_dedup_exact,
        "doclen_histogram": q_doclen_histogram,
        "trec_run": q_trec_run,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 corpus, all reference queries."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

# shared tokenizer CTEs (valid for this corpus: ASCII lowercase + spaces)
_TOK = """
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
terms AS (SELECT doc_id, tok AS term FROM toks WHERE length(tok) > 2),
doclen AS (
  SELECT d.doc_id, count(t.term) AS dl
  FROM documents d LEFT JOIN terms t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT count(*) FROM terms) AS tok_cnt
)
"""


def _values_q(ql: list[tuple[str, list[str]]]) -> str:
    rows = []
    for qid, terms in ql:
        for t in sorted(set(terms)):
            rows.append(f"('{qid}', '{t}')")
    return ", ".join(rows)


def _values_q_qtf(ql: list[tuple[str, list[str]]]) -> str:
    rows = []
    for qid, terms in ql:
        for t in sorted(set(terms)):
            rows.append(f"('{qid}', '{t}', {sum(1 for x in terms if x == t)})")
    return ", ".join(rows)


_BM25_SCORED = f"""
q(query_id, term) AS (VALUES {_values_q(QUERIES)}),
scored AS (
  SELECT q.query_id, tf.doc_id,
    round(sum(
      ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
      * tf.tf * {1.1 + 1.0!r}
      / (tf.tf + 1.1 * (0.6 + 0.4 * doclen.dl / (s.tok_cnt / s.n)))
    ), 6) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN doclen ON doclen.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
)
"""

_BM25_TOPK_SQL = f"""
WITH {_TOK}, {_BM25_SCORED},
ranked AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
         score
  FROM scored
)
SELECT query_id, doc_id, rank, score FROM ranked WHERE rank <= {K}
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["corpus_stats"] = f"""
    WITH {_TOK}
    SELECT s.n AS doc_count,
           s.tok_cnt AS token_count,
           (SELECT count(*) FROM toks WHERE tok <> '') AS token_count_alnum
    FROM stats s
    """

    sql["term_stats"] = f"""
    WITH {_TOK}
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term
    """

    sql["doc_lengths"] = f"""
    WITH {_TOK},
    dla AS (
      SELECT d.doc_id, count(t.tok) AS dl_alnum
      FROM documents d LEFT JOIN (SELECT doc_id, tok FROM toks WHERE tok <> '') t
        ON d.doc_id = t.doc_id
      GROUP BY d.doc_id
    )
    SELECT doclen.doc_id, doclen.dl AS doc_len, dla.dl_alnum AS doc_len_alnum
    FROM doclen JOIN dla ON doclen.doc_id = dla.doc_id
    """

    sql["bm25_topk"] = _BM25_TOPK_SQL
    sql["bm25_topk_indexed"] = _BM25_TOPK_SQL

    sql["tfidf_topk"] = f"""
    WITH {_TOK},
    q(query_id, term) AS (VALUES {_values_q(QUERIES)}),
    scored AS (
      SELECT q.query_id, tf.doc_id,
        round(sum(tf.tf * ln(s.n / (1.0 + df.df))), 6) AS score
      FROM q JOIN tf USING (term) JOIN df USING (term) CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
             score
      FROM scored
    )
    SELECT query_id, doc_id, rank, score FROM ranked WHERE rank <= {K}
    """

    sql["ql_dirichlet_topk"] = f"""
    WITH {_TOK},
    q(query_id, term, qtf) AS (VALUES {_values_q_qtf(QL_QUERIES)}),
    cf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
    matched AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf USING (term)),
    scored AS (
      SELECT m.query_id, m.doc_id,
        round(sum(
          q.qtf * ln( (coalesce(tf.tf, 0) + 1000.0 * (cf.cf / s.tok_cnt))
                      / (dl.dl + 1000.0) )
        ), 6) AS score
      FROM matched m
      JOIN q ON q.query_id = m.query_id
      LEFT JOIN tf ON tf.doc_id = m.doc_id AND tf.term = q.term
      JOIN cf ON cf.term = q.term
      JOIN doclen dl ON dl.doc_id = m.doc_id
      CROSS JOIN stats s
      GROUP BY m.query_id, m.doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
             score
      FROM scored
    )
    SELECT query_id, doc_id, rank, score FROM ranked WHERE rank <= {K}
    """

    sql["dedup_exact"] = """
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           count(*) OVER (PARTITION BY md5(text)) AS group_size
    FROM documents
    """

    sql["doclen_histogram"] = f"""
    WITH {_TOK}
    SELECT CAST(least(floor(dl / 10), 20) AS BIGINT) AS bucket,
           count(*) AS n_docs
    FROM doclen GROUP BY 1
    """

    sql["trec_run"] = f"""
    WITH {_TOK}, {_BM25_SCORED},
    ranked AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
             score
      FROM scored
    )
    SELECT query_id AS qid, 'Q0' AS q0, CAST(doc_id AS VARCHAR) AS doc,
           rank, score, 'bm25' AS method
    FROM ranked WHERE rank <= {K}
    """
    return sql
