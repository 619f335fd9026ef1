"""Resumable stage runner with per-stage lineage + metrics.

The reference resumes nothing (single-process pipes); BASELINE.json demands
checkpointed, resumable stages with per-partition lineage.  Design: every
stage writes a parquet (or JSON) output under the index directory plus a
``_lineage/<stage>.json`` manifest containing a fingerprint of its inputs
and parameters; re-running the pipeline skips stages whose fingerprint
matches (content-addressed resume), re-executes anything downstream of a
change.  Spark has no cross-job resume primitive — this runner is the
engine's equivalent, the Spark-idiomatic analog of simplir's temp-dir
chunk checkpoints (DiskIndex/Build.hs:91-114).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame


def _fingerprint(obj) -> str:
    import hashlib

    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


@dataclass
class StageResult:
    name: str
    output: str
    skipped: bool
    wall_sec: float
    rows: int | None = None
    metrics: dict = field(default_factory=dict)


class PipelineRunner:
    """Runs named stages; each stage writes `out_dir/<name>` + lineage."""

    def __init__(self, out_dir: str, params: dict | None = None, collect_partition_metrics: bool = True):
        self.out_dir = out_dir
        self.params = params or {}
        self.collect_partition_metrics = collect_partition_metrics
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.results: list[StageResult] = []
        self._input_fp = _fingerprint(self.params)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.lineage_dir, f"{name}.json")

    def _stage_fp(self, name: str, upstream: list[str], extra: dict | None) -> str:
        ups = []
        for u in upstream:
            p = self._manifest_path(u)
            if os.path.exists(p):
                with open(p) as f:
                    ups.append(json.load(f).get("fingerprint"))
            else:
                ups.append(None)
        return _fingerprint(
            {"stage": name, "params": self.params, "upstream": ups, "extra": extra or {}}
        )

    def run_df_stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        upstream: list[str] = (),
        extra_fp: dict | None = None,
        sort_within_partitions: list[str] | None = None,
    ) -> StageResult:
        """Materialize a DataFrame stage to parquet with resume + lineage."""
        out = os.path.join(self.out_dir, name)
        fp = self._stage_fp(name, list(upstream), extra_fp)
        mp = self._manifest_path(name)
        if os.path.exists(mp) and os.path.exists(os.path.join(out, "_SUCCESS")):
            with open(mp) as f:
                m = json.load(f)
            if m.get("fingerprint") == fp:
                r = StageResult(name, out, True, 0.0, m.get("rows"))
                self.results.append(r)
                return r

        t0 = time.time()
        df = build()
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        df.write.mode("overwrite").parquet(out)
        wall = time.time() - t0

        metrics: dict = {}
        rows = None
        if self.collect_partition_metrics:
            # per-partition rows/bytes from parquet footers, driver-side —
            # one output file per partition, so file metadata IS the
            # per-partition lineage; no Spark job
            import pyarrow.parquet as pq

            parts: dict[int, int] = {}
            sizes = []
            # enumerate ONLY the parquet part files: _SUCCESS/.crc entries
            # would otherwise shift the enumerate index off the partition id
            part_files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
            for i, fn in enumerate(part_files):
                p = os.path.join(out, fn)
                parts[i] = int(pq.ParquetFile(p).metadata.num_rows)
                sizes.append(os.path.getsize(p))
            rows = int(sum(parts.values()))
            metrics["partitions"] = parts
            metrics["files"] = len(sizes)
            metrics["bytes"] = int(sum(sizes))

        manifest = {
            "stage": name,
            "fingerprint": fp,
            "rows": rows,
            "wall_sec": round(wall, 3),
            "metrics": metrics,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(mp, "w") as f:
            json.dump(manifest, f, indent=1)
        r = StageResult(name, out, False, wall, rows, metrics)
        self.results.append(r)
        return r

    def run_json_stage(
        self, name: str, build: Callable[[], dict], upstream: list[str] = (), extra_fp: dict | None = None
    ) -> StageResult:
        out = os.path.join(self.out_dir, f"{name}.json")
        fp = self._stage_fp(name, list(upstream), extra_fp)
        mp = self._manifest_path(name)
        if os.path.exists(mp) and os.path.exists(out):
            with open(mp) as f:
                if json.load(f).get("fingerprint") == fp:
                    r = StageResult(name, out, True, 0.0)
                    self.results.append(r)
                    return r
        t0 = time.time()
        value = build()
        with open(out, "w") as f:
            json.dump(value, f, indent=1)
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "wall_sec": round(time.time() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(mp, "w") as f:
            json.dump(manifest, f, indent=1)
        r = StageResult(name, out, False, time.time() - t0)
        self.results.append(r)
        return r
