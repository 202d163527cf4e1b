"""Distributed covering + exact PIP over a polygons TABLE (ENGINE;
round-4 verdict "what's missing" #1).

``operators.covering`` builds coverings on the driver — right for a
handful of query regions, wrong for a user joining pages against
10^5-10^6 admin/geofence polygons, where every covering BFS would
serialize through the driver before the join starts. Here the polygons
are a DataFrame and the covering runs as an executor-side
``mapInPandas`` stage (the numpy coverer kernels are already
batch-friendly), so covering cost scales out with polygon-table
partitions and the driver never sees a vertex.

Pipeline (``bulk_pip_join``):

1. polygons (region_id, rings) --mapInPandas--> mixed-level covering
   rows (region_id, cell_id, level);
2. native single-level normalization (containment.normalize_covering_df
   — explode/sequence, no driver);
3. covering equi-join against pages' ``parent(cell_id, L)`` — broadcast
   for dim-sized polygon tables (the default here); for huge polygon
   sets the same key degrades to one co-partitioning shuffle of the
   covering side only;
4. exact even-odd ray-cast per candidate — NATIVE higher-order-function
   expression over the region's vertex arrays (carried by the join; no
   per-region UDF closures, no Python in the pages path): crossing
   PARITY, identical arithmetic term order to
   containment.point_in_polygon_udf and the DuckDB oracle.

Planar lat/lon edge semantics throughout (antimeridian-crossing
polygons must be pre-split — same documented engine semantic as the
driver-side PIP stage).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from s2cell_spark import kernels as K
from s2cell_spark.operators import covering as COV

RINGS_TYPE = "array<array<struct<lat:double,lon:double>>>"

_COV_SCHEMA = StructType(
    [
        StructField("region_id", LongType(), False),
        StructField("cell_id", LongType(), False),
        StructField("level", IntegerType(), False),
    ]
)


def cover_polygons(
    polygons: DataFrame,
    max_level: int = 10,
    min_emit_level: "int | None" = None,
    id_col: str = "region_id",
    rings_col: str = "rings",
) -> DataFrame:
    """Mixed-level coverings of every polygon in `polygons`, computed on
    the EXECUTORS: (region_id, cell_id, level) rows.

    `polygons` needs `id_col` (long) and `rings_col`
    (array<array<struct<lat,lon>>> — outer array = rings, even-odd holes
    supported). Each Arrow batch runs the polygon-aware BFS coverer
    (covering.polygon_covering — superset guarantee documented there)
    per polygon; with the polygons table repartitioned, covering cost
    parallelizes across the cluster instead of the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rids, cells = [], []
            for rid, rings in zip(pdf[id_col], pdf[rings_col]):
                arrs = [
                    np.array([(v["lat"], v["lon"]) for v in ring], dtype=np.float64)
                    for ring in rings
                ]
                cov = COV.polygon_covering(
                    arrs, max_level=max_level, min_emit_level=min_emit_level
                )
                rids.append(np.full(cov.shape, rid, dtype=np.int64))
                cells.append(cov)
            cell_arr = np.concatenate(cells) if cells else np.empty(0, np.uint64)
            yield pd.DataFrame(
                {
                    "region_id": np.concatenate(rids) if rids else np.empty(0, np.int64),
                    "cell_id": cell_arr.view(np.int64),
                    "level": K.cell_id_to_level(cell_arr).astype(np.int32),
                }
            )

    return polygons.select(id_col, rings_col).mapInPandas(run, schema=_COV_SCHEMA)


def pip_parity_expr(rings: Column, lat: Column, lon: Column) -> Column:
    """Even-odd point-in-polygon as a NATIVE expression over a
    rings array column: TRUE iff the count of upward/downward edge
    crossings of the ray x < lon is odd.

    Arithmetic term order is identical to
    containment.point_in_polygon_udf (and covering._points_in_polygon,
    and the DuckDB oracle): ``lon < (x2-x1) * (lat-y1) / (y2-y1) + x1``
    with horizontal edges skipped — so all four implementations agree
    bit-for-bit. Whole-array higher-order functions (zip_with + filter +
    size), not per-element element_at, per the CollapseProject/CSE
    engine invariant.
    """

    def ring_crossings(ring: Column) -> Column:
        n = F.size(ring)
        # edges = zip(ring, rotate-left-1(ring))
        nxt = F.concat(F.slice(ring, 2, n - 1), F.slice(ring, 1, 1))
        def crosses(a: Column, b: Column) -> Column:
            y1, x1 = a["lat"], a["lon"]
            y2, x2 = b["lat"], b["lon"]
            return (
                (y1 != y2)
                & ((y1 > lat) != (y2 > lat))
                & (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)
            )
        return F.size(F.filter(F.zip_with(ring, nxt, crosses), lambda c: c))

    total = F.aggregate(
        rings,
        F.lit(0),
        lambda acc, ring: acc + ring_crossings(ring),
    )
    return total % 2 == F.lit(1)


def bulk_pip_join(
    pages: DataFrame,
    polygons: DataFrame,
    level: int = 10,
    max_level: int = 10,
    cell_col: str = "cell_id",
    broadcast_covering: bool = True,
) -> DataFrame:
    """pages ⋈ polygons point-in-polygon, fully distributed: executor
    covering -> native normalization -> covering equi-join -> native
    exact ray-cast. Returns pages columns + ``region_id``.

    ``broadcast_covering``: True (default) for dim-sized polygon tables
    — the pages side never shuffles. For very large polygon sets pass
    False: the equi-join then shuffles BOTH sides on the covering key
    (pages co-partition once; still no driver trip anywhere).
    """
    from s2cell_spark.functions.exprs import cell_id_to_parent_cell_id
    from s2cell_spark.operators.containment import normalize_covering_df

    cov = normalize_covering_df(
        cover_polygons(polygons, max_level=max_level), level
    )
    if broadcast_covering:
        cov = F.broadcast(cov)
    key = cell_id_to_parent_cell_id(F.col(cell_col), level)
    cand = pages.join(cov, on=key == F.col("cov_cell"), how="inner").drop(
        "cov_cell"
    )
    verts = F.broadcast(polygons.select("region_id", "rings"))
    return (
        cand.join(verts, on="region_id", how="inner")
        .filter(pip_parity_expr(F.col("rings"), F.col("lat"), F.col("lon")))
        .drop("rings")
    )
