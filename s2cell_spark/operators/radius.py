"""Within-radius (spherical-cap) search — ENGINE operator (SURVEY §2.2).

The radius query is the set-returning sibling of kNN (reference surface:
the scalar kernels give cell IDs; the engine composes them into spatial
retrieval — cf. /root/reference/s2cell/s2cell.py lat/lon kernels): return
EVERY page within ``radius_deg`` degrees of arc of each query circle's
center. Two stages, same shape as the containment joins:

1. candidate prune: a driver-built :func:`covering.cap_covering` per
   circle (tiny, mixed levels), normalized to one level and BROADCAST —
   the pages side never shuffles, the join key is the native
   ``parent(cell_id, L)`` expression, and the whole phase is one
   BroadcastHashJoin inside codegen (plan-pinned in tests/test_plans.py);
2. exact verify: native haversine, compared on the repo-wide 1e-7-deg
   fixed-point grid (CLAUDE.md invariant) so membership at the circle
   boundary is decided identically by the engine and the DuckDB oracle
   despite asin ulp differences.

At 100 TB this is the same cost model as ``containment_join_equi``: one
narrow scan of pages, zero pages-side shuffle, per-row work is a codegen
parent-cell mask + a handful of trig ops on the ~covering-selectivity
survivors.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2cell_spark.operators import covering as COV
from s2cell_spark.operators.containment import (
    containment_join_equi,
    containment_join_range,
)
from s2cell_spark.operators.knn import haversine_deg, dist_rank_key

# Circles: dict circle_id -> (lat, lon, radius_deg)
Circles = dict[int, tuple[float, float, float]]


def radius_fp(radius_deg: float) -> int:
    """The circle radius on the 1e-7-deg fixed-point grid — computed ONCE
    in Python and embedded as the same integer literal on both the engine
    and oracle sides, so the boundary comparison never does cross-engine
    float arithmetic (same pattern as knn's ``_knnj_safe_fp``)."""
    return int(math.floor(radius_deg * 1.0e7 + 0.5))


def suggest_cap_level(circles: Circles, max_level: int = 11) -> int:
    """Single covering level for a batch of circles: cell edge ~1/8 of the
    SMALLEST diameter (good pruning) but clamped so the LARGEST circle's
    normalized covering stays ~O((2r/edge)²) ≈ a few thousand cells.
    Any level is correct — the covering is a superset and the exact stage
    owns membership — this only balances broadcast size vs selectivity."""
    r_min = min(r for (_, _, r) in circles.values())
    r_max = max(r for (_, _, r) in circles.values())
    # edge(level) ~ 90 / 2^level degrees; want edge <= 2*r_min/8
    want = max(0, math.ceil(math.log2(90.0 / max(r_min / 4.0, 1e-9))))
    # and edge >= 2*r_max/64 (≤ ~64 cells per side for the largest circle)
    cap = max(0, math.floor(math.log2(90.0 * 32.0 / max(r_max, 1e-9))))
    return max(2, min(max_level, want, cap))


def within_radius_join(
    pages: DataFrame,
    spark: SparkSession,
    circles: Circles,
    level: int | None = None,
    cell_col: str = "cell_id",
    strategy: str = "equi",
) -> DataFrame:
    """Pages within each circle: pages columns + ``circle_id`` +
    ``dist_fp`` (1e-7-deg fixed-point distance to that circle's center).

    A page inside k overlapping circles emits k rows. The exact stage is a
    single CASE chain over the (few) circles — all native exprs, no second
    join and no Python in the plan (equi strategy).

    ``strategy='equi'`` (default) normalizes every cap covering to ONE
    shared level and broadcast-equi-joins — the all-codegen path, but the
    single level is a compromise when radii span orders of magnitude
    (:func:`suggest_cap_level` takes the coarse end to bound the
    broadcast). ``strategy='range'`` keeps each circle's covering
    MIXED-LEVEL at its own granularity and goes through the sorted-range
    searchsorted join (`containment_join_range`) — tighter pruning per
    circle at the cost of the Arrow stab stage; row-identical output
    (tested)."""
    if strategy == "range":
        regions = {
            cid: COV.cap_covering(
                la, lo, r,
                max_level=suggest_cap_level({cid: (la, lo, r)}),
            )
            for cid, (la, lo, r) in circles.items()
        }
        joined = containment_join_range(
            pages, regions, cell_col=cell_col
        ).withColumnRenamed("region_id", "circle_id")
        return _exact_radius_filter(joined, circles)
    if level is None:
        level = suggest_cap_level(circles)
    regions = {
        cid: COV.cap_covering(la, lo, r, max_level=level, min_emit_level=max(0, level - 4))
        for cid, (la, lo, r) in circles.items()
    }
    joined = containment_join_equi(
        pages, spark, regions, level=level, cell_col=cell_col
    ).withColumnRenamed("region_id", "circle_id")
    return _exact_radius_filter(joined, circles)


def _exact_radius_filter(joined: DataFrame, circles: Circles) -> DataFrame:
    cid_col = F.col("circle_id")
    q_lat = reduce(
        lambda acc, kv: acc.when(cid_col == kv[0], F.lit(float(kv[1][0]))),
        circles.items(),
        F.when(F.lit(False), F.lit(0.0)),
    )
    q_lon = reduce(
        lambda acc, kv: acc.when(cid_col == kv[0], F.lit(float(kv[1][1]))),
        circles.items(),
        F.when(F.lit(False), F.lit(0.0)),
    )
    r_fp = reduce(
        lambda acc, kv: acc.when(cid_col == kv[0], F.lit(radius_fp(kv[1][2]))),
        circles.items(),
        F.when(F.lit(False), F.lit(0)),
    )
    dist = haversine_deg(q_lat, q_lon, F.col("lat"), F.col("lon"))
    return joined.withColumn("dist_fp", dist_rank_key(dist)).filter(
        F.col("dist_fp") <= r_fp.cast("long")
    )
