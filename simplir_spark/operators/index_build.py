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
from simplir_spark.operators.stats import corpus_stats as corpus_stats_agg
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


def bucket_offsets(df: DataFrame, key_col: str, cuts: list[str]) -> dict[int, int]:
    """Per-bucket exclusive-scan offsets (Document.hs:62-76's mapAccumL).

    One column-pruned aggregation over ``key_col`` only — the heavy
    columns never execute for this pass.
    """
    counts = {
        int(r["_b"]): int(r["count"])
        for r in df.select(bucket_expr(key_col, cuts).alias("_b")).groupBy("_b").count().collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    return offsets


def probe_shuffle_keys(spark: SparkSession, n_buckets: int, n_partitions: int) -> list[int]:
    """For each bucket b find an int x_b with pmod(murmur3(x_b), P) == b.

    ``repartition(P, col)`` places a row in partition
    pmod(Murmur3Hash(col, seed=42), P) — the same hash ``F.hash`` exposes —
    so repartitioning on x_bucket maps bucket b exactly to partition b:
    one shuffle, perfectly aligned bucket->partition placement, no
    sampling pass.  Correctness never depends on this mapping (the id
    kernel groups by bucket VALUE); only balance does.
    """
    found: dict[int, int] = {}
    lo = 0
    while len(found) < n_buckets:
        probe = spark.range(lo, lo + 64 * max(n_partitions, n_buckets)).select(
            F.col("id").cast("int").alias("x"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_partitions)).alias("p"),
        )
        for r in probe.collect():
            p = int(r["p"])
            if p < n_buckets and p not in found:
                found[p] = int(r["x"])
        lo += 64 * max(n_partitions, n_buckets)
    return [found[b] for b in range(n_buckets)]


def make_tokenize_assign_kernel(offsets: dict[int, int], carry_cols: list[str],
                                with_positions: bool):
    """mapInPandas kernel: rows sorted by (_bucket, doc_key) within the
    partition -> tokenized rows with dense dids.

    did = offset[bucket] + running position within the bucket — the
    distributed equivalent of zipping the doc stream with [0..]
    (collectIndex, Build.hs:117-135) plus chunk-offset re-basing
    (Document.hs:62-76).  Tokenization runs in the SAME pass, after the
    shuffle, so content crosses the wire exactly once and no separate
    id-assignment job exists.
    """
    from simplir_spark.functions.tokenize import tokenize_pos_batch, tokenize_tf_batch

    def kernel(batches):
        counters: dict[int, int] = {}
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            b = pdf["_bucket"].to_numpy()
            dids = np.empty(n, dtype=np.int64)
            change = np.nonzero(b[1:] != b[:-1])[0] + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            for s, e in zip(starts, ends):
                bb = int(b[s])
                base = offsets[bb] + counters.get(bb, 0)
                dids[s:e] = np.arange(base, base + (e - s))
                counters[bb] = counters.get(bb, 0) + (e - s)
            tok = (
                tokenize_pos_batch(pdf["content"])
                if with_positions
                else tokenize_tf_batch(pdf["content"])
            )
            out = {"did": dids}
            for c in carry_cols:
                out[c] = pdf[c].to_numpy()
            for c in tok.columns:
                out[c] = tok[c].to_numpy() if tok[c].dtype != object else tok[c]
            yield pd.DataFrame(out)

    return kernel


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


def term_did_cuts(pairs_sample: list[tuple], n_partitions: int) -> list[tuple]:
    """Range boundaries over (term, did) pairs — (n_partitions-1) cuts."""
    if n_partitions <= 1 or not pairs_sample:
        return []
    s = sorted(pairs_sample)
    cuts = []
    for i in range(1, n_partitions):
        cuts.append(s[min(len(s) - 1, i * len(s) // n_partitions)])
    return sorted(set(cuts))


def term_did_bucket_expr(cuts: list[tuple]):
    """bucket = number of cuts <= (term, did), lexicographic — pure expr."""
    if not cuts:
        return F.lit(0)
    arr = F.array([F.struct(F.lit(t).alias("t"), F.lit(int(d)).alias("d")) for t, d in cuts])
    term, did = F.col("term"), F.col("did")
    return F.size(
        F.filter(arr, lambda c: (c["t"] < term) | ((c["t"] == term) & (c["d"] <= did)))
    )


def build_postings(pairs: DataFrame, n_partitions: int | None = None,
                   run_size: int = RUN_SIZE_DEFAULT,
                   with_positions: bool = False,
                   sample_pairs: list[tuple] | None = None) -> DataFrame:
    """(did, doc_len, term, tf[, positions]) -> posting-run DataFrame.

    Range partition on (term, did): term locality for parquet min/max
    pruning, natural sub-run splitting for hot terms (a term with df
    larger than a partition's share spans ADJACENT partitions — this is
    the salted skew split, with the range partitioner as the salt).

    Partitioning is explicit (sampled boundaries + probe-key shuffle)
    instead of ``repartitionByRange`` so the boundary sample comes from a
    cheap caller-supplied sample rather than a full re-execution of the
    pairs plan (the built-in range partitioner re-runs its child to
    sample it).
    """
    spark = pairs.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = ["term", "did", "tf", "doc_len"] + (["positions"] if with_positions else [])
    if sample_pairs is None:
        part = (
            pairs.repartitionByRange(n_partitions, "term", "did")
            .sortWithinPartitions("term", "did")
            .select(*cols)
        )
    else:
        cuts = term_did_cuts(sample_pairs, n_partitions)
        n_buckets = len(cuts) + 1
        xkeys = probe_shuffle_keys(spark, n_buckets, n_buckets)
        part = (
            pairs.withColumn("_b", term_did_bucket_expr(cuts))
            .withColumn("_xb", F.element_at(F.array([F.lit(x) for x in xkeys]), F.col("_b") + 1))
            .repartition(n_buckets, "_xb")
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
        # One slim pass for id bookkeeping, ONE heavy pass for everything
        # else.  Shape of the heavy pass: shuffle raw content once
        # (bucket-aligned partitions), then a single mapInPandas performs
        # dense-id assignment AND tokenization AND per-doc tf aggregation —
        # content crosses the wire exactly once and the token stream is
        # never materialized (each doc stores distinct terms + tfs).
        src = with_integrity(corpus)
        slim = src.select("doc_key")
        cuts = sample_boundaries(slim, "doc_key", n_partitions)  # slim sample
        offsets = bucket_offsets(slim, "doc_key", cuts)          # slim agg
        with open(os.path.join(out_dir, "_bucket_cuts.json"), "w") as f:
            json.dump(cuts, f)
        n_buckets = len(cuts) + 1
        # probe modulus MUST equal the repartition partition count, else
        # buckets scatter (collision skew)
        xkeys = probe_shuffle_keys(spark, n_buckets, n_buckets)
        carry = ["doc_key"] + [
            c for c in ("repo", "path", "commit", "lang") if c in src.columns
        ] + ["sha256"]
        kernel = make_tokenize_assign_kernel(offsets, carry, with_positions)
        tok_fields = (
            "terms array<string>, positions array<int>"
            if with_positions
            else "terms array<string>, tfs array<long>"
        )
        carry_types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
        schema = (
            "did long, "
            + ", ".join(f"{c} {carry_types[c]}" for c in carry)
            + f", {tok_fields}, doc_len int, doc_len_alnum int"
        )
        heavy = (
            src.withColumn("_bucket", bucket_expr("doc_key", cuts))
            .withColumn("_xb", F.element_at(F.array([F.lit(x) for x in xkeys]), F.col("_bucket") + 1))
            .repartition(n_buckets, "_xb")
            .sortWithinPartitions("_bucket", "doc_key")
        )
        return heavy.mapInPandas(kernel, schema)

    # The tokenized checkpoint IS the docmeta table: parquet column pruning
    # means docmeta readers never touch the heavy `terms`/`tfs` columns, so
    # a separate docmeta write would only duplicate I/O (open_index projects
    # the docmeta columns).  Bucket-aligned partitions are did-contiguous,
    # so parquet min/max stats on did give range pruning for free.
    os.makedirs(out_dir, exist_ok=True)
    r_tok = runner.run_df_stage("tokenized", build_docmeta, sort_within_partitions=["did"])

    tokenized = spark.read.parquet(r_tok.output)

    def build_pairs() -> DataFrame:
        # (did, doc_len, term, tf) from the checkpoint.  JVM-side explode
        # of the pre-aggregated per-doc (terms, tfs) arrays — cheap enough
        # that the range partitioner's sampling pass just re-runs it off
        # page-cached parquet (no pairs checkpoint needed).
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
        return tokenized.select(
            "did", "doc_len", F.explode(F.arrays_zip("terms", "tfs")).alias("_tt")
        ).select(
            "did", "doc_len",
            F.col("_tt.terms").alias("term"),
            F.col("_tt.tfs").alias("tf"),
        )

    # repartitionByRange's boundary resample re-runs the pairs plan, but
    # that plan is a column-pruned read of the tokenized CHECKPOINT plus a
    # JVM explode — measured cheaper than evaluating explicit boundary
    # expressions per row (build_postings(sample_pairs=...) is the opt-in
    # alternative when the pairs input is not a checkpoint).
    r_post = runner.run_df_stage(
        "postings",
        lambda: build_postings(
            build_pairs(), n_partitions=n_partitions, run_size=run_size,
            with_positions=with_positions,
        ),
        upstream=["tokenized"],
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
    for heavy in ("terms", "positions", "tfs"):
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
