"""Checkpointed multi-stage pipelines: per-stage parquet snapshots with a
lineage manifest, resumable after failure (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Each stage writes ``{root}/{stage}/data`` (parquet) plus
``{root}/{stage}/_LINEAGE.json`` recording: stage name, input stage names,
row count, per-partition row counts, schema, wall time, and a canonical-
plan fingerprint. A stage is complete iff its manifest exists, row counts
match the footer, AND the fingerprint of the rebuilt (lazy) plan matches
the recorded one — resume re-reads the snapshot instead of recomputing,
while a stage whose logic changed recomputes rather than resuming stale
data.
Stages must be deterministic (the pages geotag/synthesis is a pure
function of url — SURVEY.md §7 'hard parts'), so a resumed run is
byte-identical to an uninterrupted one (tested in t4).

This is the parquet stand-in for Iceberg snapshot checkpointing — swap
``_write``/``_read`` for ``writeTo(...).createOrReplace()`` and snapshot
reads on a cluster with an Iceberg catalog; the lineage/resume logic is
storage-agnostic.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def plan_fingerprint(df: DataFrame) -> str | None:
    """sha256 of the CANONICALIZED optimized plan (expression IDs
    normalized, so the hash is stable across sessions). None when the
    backend doesn't expose the plan — callers treat that as 'cannot
    verify' and skip the fingerprint check rather than failing."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
        return hashlib.sha256(plan.encode()).hexdigest()[:16]
    except Exception:
        return None


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.metrics: list[dict] = []

    def _manifest_path(self, stage: str) -> Path:
        return self.root / stage / "_LINEAGE.json"

    def _data_path(self, stage: str) -> str:
        return str(self.root / stage / "data")

    def is_complete(self, stage: str, fingerprint: str | None = None) -> bool:
        """Snapshot is reusable iff the manifest exists, row counts match
        the footer, AND (when both sides have one) the recorded plan
        fingerprint matches — a stage whose build logic changed recomputes
        instead of silently resuming stale data."""
        mp = self._manifest_path(stage)
        if not mp.exists():
            return False
        try:
            manifest = json.loads(mp.read_text())
            recorded = manifest.get("plan_fingerprint")
            if fingerprint is not None and recorded is not None and fingerprint != recorded:
                return False
            n = self.spark.read.parquet(self._data_path(stage)).count()
            return n == manifest["row_count"]
        except Exception:
            return False

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._data_path(stage))

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        inputs: tuple[str, ...] = (),
        sort_cols: tuple[str, ...] = (),
    ) -> DataFrame:
        """Run (or resume) one stage; returns the snapshot-backed frame.

        The stage's DataFrame is always BUILT (lazy, driver-side only) so
        its plan fingerprint can gate the resume: identical plan ->
        reuse the snapshot, changed plan -> recompute."""
        t0 = time.time()
        df = build()
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
        fp = plan_fingerprint(df)
        if self.is_complete(name, fp):
            self.metrics.append({"stage": name, "resumed": True})
            return self.read(name)
        df.write.mode("overwrite").parquet(self._data_path(name))
        out = self.read(name)
        per_part = (
            out.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        manifest = {
            "stage": name,
            "inputs": list(inputs),
            "plan_fingerprint": fp,
            "row_count": sum(r["rows"] for r in per_part),
            "partitions": {str(r["pid"]): r["rows"] for r in per_part},
            "schema": out.schema.simpleString(),
            "wall_sec": round(time.time() - t0, 3),
            "written_at_epoch": int(t0),
        }
        self._manifest_path(name).parent.mkdir(parents=True, exist_ok=True)
        self._manifest_path(name).write_text(json.dumps(manifest, indent=1))
        self.metrics.append({"stage": name, "resumed": False, **manifest})
        return out
