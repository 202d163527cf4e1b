"""Deterministic splitting & sampling — the train/val/test machinery of a
training-data pipeline (ENGINE; no reference counterpart — the reference
is a geometry library, cf. /root/reference/README.rst:1-20; this module
covers the LLM-data-pipeline mandate alongside dedup/similarity).

Both operators are pure per-row hash expressions: **map-only** — no
shuffle, no UDF, no state — so at 10^12 docs they cost one codegen'd
projection fused into whatever scan already runs. Properties that matter
in production and fall out of the hash design:

* **stable**: a doc's split/sample membership depends only on
  (id, salt) — re-runs, re-partitions, cluster-size changes, and
  incremental appends never reassign history (the reason `df.sample`
  or `rand()` is WRONG for train/test splits: both are
  partition-layout- and seed-plumbing-dependent);
* **disjoint + exhaustive**: split thresholds partition the 10k-bucket
  hash space by construction;
* **independent across salts**: changing the salt re-rolls membership —
  held-out evals draw fresh samples without touching the pipeline;
* **engine-portable**: the bucket is the dedup family's 31-bit md5
  prefix hash (operators.dedup.shingle_hash_expr spec), replicated
  verbatim in the DuckDB oracle, so the driver VALUE-checks assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from the 31-bit md5-prefix hash
    of ``id:salt``. DuckDB mirror:
    ``CAST(concat('0x', substr(md5(concat(CAST(id AS VARCHAR), ':{salt}')),
    1, 8)) AS BIGINT) & 2147483647) % 10000``."""
    key = F.concat(id_col.cast("string"), F.lit(":" + salt))
    h = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit((1 << 31) - 1))
    )
    return h % F.lit(BUCKETS)


def hash_split(
    df: DataFrame,
    splits: "dict[str, int]",
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label from cumulative basis-point ranges,
    e.g. ``{"train": 9000, "val": 500, "test": 500}`` (must sum to
    10000). Map-only; label = first range containing the row's bucket."""
    if sum(splits.values()) != BUCKETS:
        raise ValueError(
            f"split weights must sum to {BUCKETS} basis points, got {splits}"
        )
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    cum = 0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        expr = (
            F.when(b < cum, name) if expr is None else expr.when(b < cum, name)
        )
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, rate_bp: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep rows whose hash bucket < rate_bp (rate in basis points of
    10000). Unlike ``df.sample``, membership is a pure function of
    (id, salt): stable across re-runs, partitionings, and appends."""
    if not 0 <= rate_bp <= BUCKETS:
        raise ValueError(f"rate_bp must be in [0, {BUCKETS}], got {rate_bp}")
    return df.filter(hash_bucket(F.col(id_col), salt) < rate_bp)
