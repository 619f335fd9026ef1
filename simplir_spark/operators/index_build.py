"""Inverted-index build (SURVEY.md §2.11, §7 M2) — the heart of the engine.

Stage graph (each stage checkpointed + lineaged by PipelineRunner):

  corpus ─ tokenize ─ doc-ids ─┬─ docmeta  (did, doc_key, doc_len, sha256, …)
                               ├─ postings (term-range-partitioned, delta+
                               │            varint runs ≤ 2^14 postings)
                               ├─ term_stats  (term, df, cf)
                               └─ corpus_stats.json

Scale design decisions (vs the reference's single-process build,
simplir-disk-index/src/SimplIR/DiskIndex/Build.hs:34-135):

* Dense 0-based doc ids (DocumentId, Types.hs:54-63) are assigned by
  doc_key order using explicit range buckets: sample boundaries once,
  bucket each row with a pure expression, count per bucket, driver-side
  exclusive scan for offsets (the distributed analog of Document.hs:62-76's
  mapAccumL), then ``offset[bucket] + row_number within bucket``.
  `monotonically_increasing_id` is rejected — non-dense, repartition-
  dependent.  Boundaries are persisted so re-runs are deterministic.

* Postings are range-partitioned on (term, did) — a hot term spans
  *adjacent* partitions, so skew splits naturally into per-slice sub-runs
  (the salted-skew-splitting BASELINE.json requires, without an explicit
  salt column: the range partitioner IS the salt, and AQE rebalances
  further).  Each partition encodes doc-sorted runs of ≤ run_size
  postings (DiskIndex.hs:117-119: 2^14) via a streaming mapInPandas that
  carries term groups across Arrow batches.

* Runs store delta+varint blobs (codec.py) plus inline per-posting doc
  lengths, so the query path touches only the postings table — no
  postings⋈docmeta join at 10^12-doc scale.

* term_stats/corpus_stats come from run *metadata* (n, sum_tf) — no
  blob decode, no second pass over tokens.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simplir_spark.functions import codec
from simplir_spark.functions.tokenize import with_tokens
from simplir_spark.operators.stats import corpus_stats as corpus_stats_agg
from simplir_spark.operators.stats import doc_term_tfs
from simplir_spark.plans.pipeline import PipelineRunner
from simplir_spark.schema import POSTINGS_SCHEMA
from simplir_spark.sources.corpus import with_integrity

RUN_SIZE_DEFAULT = 1 << 14  # postings per run chunk — DiskIndex.hs:117-119


# ---------------------------------------------------------------------------
# Dense doc-id assignment
# ---------------------------------------------------------------------------


def sample_boundaries(df: DataFrame, key_col: str, n_buckets: int, seed: int = 42) -> list[str]:
    """Deterministic range-bucket boundaries for ``key_col`` (n_buckets-1 cuts)."""
    n = df.count()
    if n == 0 or n_buckets <= 1:
        return []
    target = min(n, max(n_buckets * 200, 10_000))
    frac = min(1.0, target / n)
    sample = [r[0] for r in df.select(key_col).sample(False, frac, seed=seed).collect()]
    if not sample:
        return []
    sample.sort()
    cuts = []
    for i in range(1, n_buckets):
        cuts.append(sample[min(len(sample) - 1, i * len(sample) // n_buckets)])
    return sorted(set(cuts))


def bucket_expr(key_col: str, cuts: list[str]):
    """bucket = number of cuts <= key (0..len(cuts)); pure, deterministic."""
    if not cuts:
        return F.lit(0)
    arr = F.array([F.lit(c) for c in cuts])
    return F.size(F.filter(arr, lambda c: c <= F.col(key_col)))


def assign_doc_ids(df: DataFrame, key_col: str = "doc_key", n_buckets: int | None = None,
                   cuts: list[str] | None = None) -> tuple[DataFrame, list[str]]:
    """Add a dense 0-based ``did`` ordered by ``key_col``.

    Replicates the reference's sequential DocId assignment + per-chunk
    offset re-basing (Document.hs:62-76) distributively; requires unique
    keys (duplicate keys get arbitrary relative order).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if cuts is None:
        cuts = sample_boundaries(df, key_col, n_buckets)
    b = bucket_expr(key_col, cuts).alias("_bucket")
    dfb = df.withColumn("_bucket", b)
    counts = {r["_bucket"]: r["count"] for r in dfb.groupBy("_bucket").count().collect()}
    offsets = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()], "_bucket int, _offset long"
    )
    w = Window.partitionBy("_bucket").orderBy(key_col)
    out = (
        dfb.join(F.broadcast(off_df), "_bucket")
        .withColumn("did", F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_bucket", "_offset")
    )
    return out, cuts


# ---------------------------------------------------------------------------
# Posting-run encoding (streaming, batch-boundary-safe)
# ---------------------------------------------------------------------------


_RUN_COLS = ["term", "start_did", "end_did", "n", "max_tf", "sum_tf", "deltas", "tfs", "dls", "pos"]


def make_run_encoder(run_size: int, with_positions: bool = False):
    """mapInPandas kernel factory: partition sorted by (term, did) -> runs.

    Accumulates the trailing term group across Arrow batches so a term
    split over batch boundaries still produces doc-contiguous runs.
    """

    def flush(term, parts, out):
        dids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        poss = [x for p in parts for x in p[3]] if with_positions else None
        n = len(dids)
        for s in range(0, n, run_size):
            e = min(s + run_size, n)
            run = codec.encode_run(dids[s:e], tfs[s:e], dls[s:e])
            pos_blob = codec.encode_positions(poss[s:e]) if with_positions else None
            out.append(
                (term, run["start_did"], run["end_did"], run["n"], run["max_tf"],
                 run["sum_tf"], run["deltas"], run["tfs"], run["dls"], pos_blob)
            )

    def encode(batches):
        buf_term = None
        buf: list[tuple] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms = pdf["term"].to_numpy()
            dids = pdf["did"].to_numpy(dtype=np.int64)
            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            dls = pdf["doc_len"].to_numpy(dtype=np.int64)
            poss = list(pdf["positions"]) if with_positions else [None] * len(pdf)
            change = np.nonzero(terms[1:] != terms[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(terms)]))
            out: list[tuple] = []
            for s, e in zip(starts, ends):
                t = terms[s]
                if buf_term is not None and t != buf_term:
                    flush(buf_term, buf, out)
                    buf = []
                buf_term = t
                buf.append((dids[s:e], tfs[s:e], dls[s:e], poss[s:e]))
            if out:
                yield pd.DataFrame(out, columns=_RUN_COLS)
        out = []
        if buf_term is not None and buf:
            flush(buf_term, buf, out)
        if out:
            yield pd.DataFrame(out, columns=_RUN_COLS)

    return encode


def build_postings(pairs: DataFrame, n_partitions: int | None = None,
                   run_size: int = RUN_SIZE_DEFAULT,
                   with_positions: bool = False) -> DataFrame:
    """(did, doc_len, term, tf[, positions]) -> posting-run DataFrame.

    Range partition on (term, did): term locality for parquet min/max
    pruning, natural sub-run splitting for hot terms.
    """
    spark = pairs.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = ["term", "did", "tf", "doc_len"] + (["positions"] if with_positions else [])
    part = (
        pairs.repartitionByRange(n_partitions, "term", "did")
        .sortWithinPartitions("term", "did")
        .select(*cols)
    )
    return part.mapInPandas(make_run_encoder(run_size, with_positions), POSTINGS_SCHEMA)


# ---------------------------------------------------------------------------
# Full build pipeline
# ---------------------------------------------------------------------------


@dataclass
class IndexPaths:
    root: str

    @property
    def tokenized(self) -> str:
        return os.path.join(self.root, "tokenized")

    @property
    def docmeta(self) -> str:
        """Merged indexes write an explicit docmeta dir; fresh builds serve
        docmeta from the tokenized checkpoint via column pruning."""
        explicit = os.path.join(self.root, "docmeta")
        return explicit if os.path.exists(explicit) else self.tokenized

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def term_stats(self) -> str:
        return os.path.join(self.root, "term_stats")

    @property
    def corpus_stats(self) -> str:
        return os.path.join(self.root, "corpus_stats.json")


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_partitions: int | None = None,
    run_size: int = RUN_SIZE_DEFAULT,
    params_fp: dict | None = None,
    with_positions: bool = False,
) -> IndexPaths:
    """Build a complete index directory from a corpus DataFrame.

    Resumable: each stage is skipped when its lineage fingerprint matches
    a previous run (kill/re-run safe).  ``with_positions`` builds the
    positional payload (per-posting occurrence positions) — DiskIndex's
    payload genericity (Types.hs:139-158).
    """
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    paths = IndexPaths(out_dir)
    runner = PipelineRunner(
        out_dir,
        params={
            "run_size": run_size,
            "n_partitions": n_partitions,
            "with_positions": with_positions,
            **(params_fp or {}),
        },
    )

    def build_docmeta() -> DataFrame:
        # Tokenization is the CPU-heavy stage and the Arrow UDF runs
        # directly over the scan — decouple its parallelism from the input
        # file layout (a single small parquet file would otherwise pin it
        # to one task; at 100 TB the scan has ample splits and AQE elides
        # the extra round-robin exchange into cheap rebalancing).
        src = with_integrity(corpus).repartition(n_partitions)
        extra_cols = []
        if with_positions:
            from simplir_spark.functions.tokenize import tokenize_pos_udf

            tok = (
                src.withColumn("_tok", tokenize_pos_udf(F.col("content")))
                .select(
                    "*",
                    F.col("_tok.terms").alias("terms"),
                    F.col("_tok.positions").alias("positions"),
                    F.col("_tok.doc_len").alias("doc_len"),
                    F.col("_tok.doc_len_alnum").alias("doc_len_alnum"),
                )
                .drop("_tok")
            )
            extra_cols = ["positions"]
        else:
            tok = with_tokens(src)
        with_ids, cuts = assign_doc_ids(tok, n_buckets=n_partitions)
        with open(os.path.join(out_dir, "_bucket_cuts.json"), "w") as f:
            json.dump(cuts, f)
        optional = [c for c in ("repo", "path", "commit", "lang") if c in with_ids.columns]
        return with_ids.select(
            "did", "doc_key", *optional,
            "doc_len", "doc_len_alnum", "sha256", "terms", *extra_cols,
        ).repartitionByRange(n_partitions, "did")

    # The tokenized checkpoint IS the docmeta table: parquet column pruning
    # means docmeta readers never touch the heavy `terms` column, so a
    # separate docmeta write would only duplicate I/O (open_index projects
    # the docmeta columns).
    os.makedirs(out_dir, exist_ok=True)
    r_tok = runner.run_df_stage("tokenized", build_docmeta, sort_within_partitions=["did"])

    tokenized = spark.read.parquet(r_tok.output)

    # pairs checkpoint: the range partitioner SAMPLES its input, which
    # would otherwise execute the tf-flattening UDF twice; materializing
    # (did, doc_len, term, tf) lets the sampling read plain column-pruned
    # parquet and gives the build another resume point.
    def build_pairs() -> DataFrame:
        if with_positions:
            from simplir_spark.functions.tokenize import term_tf_positions_udf

            return tokenized.withColumn(
                "_tt", F.explode(term_tf_positions_udf("terms", "positions"))
            ).select(
                "did", "doc_len",
                F.col("_tt.term").alias("term"),
                F.col("_tt.tf").alias("tf"),
                F.col("_tt.positions").alias("positions"),
            )
        return doc_term_tfs(tokenized, doc_cols=["did"])

    r_pairs = runner.run_df_stage("pairs", build_pairs, upstream=["tokenized"])
    pairs_df = spark.read.parquet(r_pairs.output)

    r_post = runner.run_df_stage(
        "postings",
        lambda: build_postings(
            pairs_df, n_partitions=n_partitions, run_size=run_size, with_positions=with_positions
        ),
        upstream=["pairs"],
        sort_within_partitions=["term", "start_did"],
    )

    runner.run_df_stage(
        "term_stats",
        lambda: spark.read.parquet(r_post.output)
        .groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf")),
        upstream=["postings"],
    )

    runner.run_json_stage(
        "corpus_stats",
        lambda: corpus_stats_agg(tokenized).collect()[0].asDict(),
        upstream=["tokenized"],
    )
    return paths


@dataclass
class IndexHandle:
    paths: IndexPaths
    docmeta: DataFrame
    postings: DataFrame
    term_stats: DataFrame
    doc_count: int
    token_count: int

    @property
    def avg_doc_len(self) -> float:
        return self.token_count / self.doc_count if self.doc_count else 1.0


def open_index(spark: SparkSession, root: str) -> IndexHandle:
    paths = IndexPaths(root)
    with open(paths.corpus_stats) as f:
        cs = json.load(f)
    docmeta = spark.read.parquet(paths.docmeta)
    for heavy in ("terms", "positions"):
        if heavy in docmeta.columns:
            docmeta = docmeta.drop(heavy)  # column-pruned at scan time
    return IndexHandle(
        paths=paths,
        docmeta=docmeta,
        postings=spark.read.parquet(paths.postings),
        term_stats=spark.read.parquet(paths.term_stats),
        doc_count=int(cs["doc_count"]),
        token_count=int(cs["token_count"]),
    )
