"""Cell-prefix containment joins and point-in-polygon (ENGINE, SURVEY §2.2).

Hierarchy containment is a pure uint64 range test (SURVEY.md §1.1): a cell
``c`` contains leaf ``d`` iff ``range_min(c) <= d <= range_max(c)``,
equivalently ``parent(d, level(c)) == c``. Three join strategies:

1. :func:`containment_join_equi` — normalize the covering to ONE level and
   broadcast-hash-equi-join on ``parent(page_cell, L)``. Single scan of the
   pages side, no shuffle of it (broadcast), Catalyst-native. Default.
2. :func:`containment_join_range` — mixed-level coverings without
   expansion: broadcast the sorted ``[range_min, range_max]`` sortable
   intervals and binary-search each Arrow batch (`mapInPandas` +
   np.searchsorted). Avoids the O(n·m) BroadcastNestedLoopJoin Spark would
   pick for a non-equi range condition.
3. :func:`containment_join_salted` — strategy 1 plus explicit hot-cell
   salting: the big side adds ``salt = pmod(hash(url), S)``, the broadcast
   side replicates across salts. Output rows are identical to the unsalted
   plan (tested); use when one covering cell holds a disproportionate share
   of pages (cities) and the downstream per-key work would straddle.

At 100 TB the pages side never shuffles in any strategy — coverings are
broadcast — and the pages scan prunes to (cell_id / lat / lon / carried
columns) only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from s2cell_spark import functions as S2F
from s2cell_spark import kernels as K
from s2cell_spark.operators import covering as COV


def coverings_df(
    spark: SparkSession, regions: dict[int, np.ndarray]
) -> DataFrame:
    """Small DataFrame (region_id, cell_id, level) from region -> cells.

    Built through pandas so the driver->JVM ship rides Arrow — coverings
    can reach 10^5 cells and the Py4J row path is ~100x slower."""
    parts = []
    for rid, cells in regions.items():
        parts.append(
            pd.DataFrame(
                {
                    "region_id": np.full(cells.shape, rid, dtype=np.int32),
                    "cell_id": cells.view(np.int64),
                    "level": K.cell_id_to_level(cells),
                }
            )
        )
    pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {
            # explicit dtypes: an empty frame would infer float64 columns
            # and give the Spark side DOUBLE cell_ids, breaking the
            # downstream bitwise exprs
            "region_id": pd.Series([], dtype="int32"),
            "cell_id": pd.Series([], dtype="int64"),
            "level": pd.Series([], dtype="int32"),
        }
    )
    return spark.createDataFrame(pdf)


def normalized_coverings_df(
    spark: SparkSession, regions: dict[int, np.ndarray], level: int
) -> DataFrame:
    """(region_id, cov_cell) at a single level — the broadcast side of the
    equi strategy. Build once per query; reusable across executions.

    Only the (small) mixed-level covering ships driver->JVM; the
    single-level expansion is :func:`normalize_covering_df` (fully
    native). For a covering computed DISTRIBUTED from a polygons TABLE
    (no driver trip at all) see ``operators.bulkcover.cover_polygons``.
    """
    return normalize_covering_df(coverings_df(spark, regions), level)


def normalize_covering_df(cov_raw: DataFrame, level: int) -> DataFrame:
    """Normalize a mixed-level covering frame (region_id, cell_id, level)
    to (region_id, cov_cell) at ONE level, entirely natively.

    The expansion to 4^(level - l) single-level descendants runs via
    ``explode(sequence(first_child, last_child, step))`` — level-L cells
    under an ancestor are consecutive IDs exactly ``2*lsb(L)`` apart
    (SURVEY.md §1.1 range property). Nothing ships through the driver,
    so the input may be any size (e.g. the executor-side covering of a
    10^6-polygon table). Signed-long order is safe: a covering cell's
    descendants share its face, so the sequence never crosses the
    face-3/4 sign boundary.
    """
    lsb = 1 << (2 * (30 - level))
    step = 2 * lsb
    cell = F.col("cell_id")
    shallow = cov_raw.filter(F.col("level") <= level).select(
        "region_id",
        F.explode(
            F.sequence(
                S2F.cell_id_range_min(cell).bitwiseAND(-lsb).bitwiseOR(lsb),
                S2F.cell_id_range_max(cell).bitwiseAND(-lsb).bitwiseOR(lsb),
                F.lit(step),
            )
        ).alias("cov_cell"),
    )
    deep = cov_raw.filter(F.col("level") > level).select(
        "region_id",
        S2F.cell_id_to_parent_cell_id(cell, level).alias("cov_cell"),
    )
    # mixed-level coverings are disjoint, so only the deep->parent arm can
    # produce duplicates
    return shallow.unionByName(deep.dropDuplicates(["region_id", "cov_cell"]))


def containment_join_equi(
    pages: DataFrame,
    spark: SparkSession,
    regions: dict[int, np.ndarray] | DataFrame,
    level: int,
    cell_col: str = "cell_id",
    how: str = "inner",
) -> DataFrame:
    """Broadcast equi-join pages against single-level-normalized coverings.

    Returns pages columns + ``region_id``. The join key
    ``parent(cell, L)`` is a native codegen expr, so this plans as one
    BroadcastHashJoin with zero shuffle of the pages side. `regions` may be
    a dict of cell arrays or a prebuilt :func:`normalized_coverings_df`.

    ``how="left"`` tags instead of filters: every page survives, with
    ``region_id`` null outside all coverings — the single-pass
    tag-and-rollup shape (no candidate filter can then be pushed below
    the page scan, by construction of outer-join semantics). Coverings
    of DISTINCT regions must be disjoint for per-page multiplicity 1;
    within one region normalization already guarantees it.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"containment_join_equi supports how='inner'/'left' only, got {how!r}"
        )
    cov = (
        regions
        if isinstance(regions, DataFrame)
        else normalized_coverings_df(spark, regions, level)
    )
    key = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    return pages.join(
        F.broadcast(cov),
        on=key == F.col("cov_cell"),
        how=how,
    ).drop("cov_cell")


def containment_join_salted(
    pages: DataFrame,
    spark: SparkSession,
    regions: dict[int, np.ndarray],
    level: int,
    num_salts: int = 8,
    cell_col: str = "cell_id",
    salt_col: str = "url",
) -> DataFrame:
    """Equi strategy with hot-cell salting.

    The composite key (parent cell, salt) splits any single hot covering
    cell across `num_salts` hash buckets; the (small) covering side is
    replicated per salt via ``explode(sequence(...))``. Row-identical to
    the unsalted join.
    """
    cov = normalized_coverings_df(spark, regions, level).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    key = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    salted = pages.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_col)), F.lit(num_salts))
    )
    return (
        salted.join(
            F.broadcast(cov.select("region_id", "cov_cell", "salt")),
            on=(key == F.col("cov_cell")) & (F.col("_salt") == F.col("salt")),
            how="inner",
        )
        .drop("cov_cell", "salt", "_salt")
    )


def containment_join_range(
    pages: DataFrame,
    regions: dict[int, np.ndarray],
    cell_col: str = "cell_id",
) -> DataFrame:
    """Mixed-level containment via broadcast sorted ranges + searchsorted.

    Builds the flattened (region_id, sortable_min, sortable_max) interval
    table once on the driver (coverings are tiny), ships it in the UDF
    closure, and stabs each Arrow batch with two binary searches. Because a
    covering's cells are disjoint, intervals never nest across one region;
    intervals from DIFFERENT regions may overlap, so the stab walks the
    (few) candidate intervals via searchsorted bounds per batch.

    Output: pages columns + region_id (pages matching k regions emit k rows).
    """
    rids, los, his = [], [], []
    for rid, cells in regions.items():
        lo = K.cell_id_range_min(cells) ^ np.uint64(1 << 63)
        hi = K.cell_id_range_max(cells) ^ np.uint64(1 << 63)
        rids.append(np.full(cells.shape, rid, dtype=np.int64))
        los.append(lo.view(np.int64))
        his.append(hi.view(np.int64))
    rid_arr = np.concatenate(rids)
    lo_arr = np.concatenate(los)
    hi_arr = np.concatenate(his)
    order = np.argsort(lo_arr, kind="stable")
    rid_arr, lo_arr, hi_arr = rid_arr[order], lo_arr[order], hi_arr[order]
    # prefix max of hi: lets the scan-back stop as soon as nothing further
    # left can still cover the probe (intervals are sorted by lo)
    max_hi_prefix = np.maximum.accumulate(hi_arr)

    schema = StructType(
        list(pages.schema.fields) + [StructField("region_id", LongType(), False)]
    )

    # null cells can't be contained anywhere; they are dropped INSIDE the
    # Arrow stab (pandas mask per batch), NOT as a plan-level filter —
    # a Filter on `cell_col` would be pushed through whatever projection
    # stack produced it, and pushdown SUBSTITUTES aliases into the
    # condition: through the native encode stack (functions/
    # native_encode) that expansion is multiplicative and planning OOMs
    # (the CLAUDE.md native-cell filter-pushdown trap). The in-batch drop
    # also still guarantees int64 Arrow batches (a nullable long batch
    # with actual nulls degrades to float64 and corrupts IDs over 2^53 —
    # dropped rows never reach the searchsorted).

    def stab(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf[cell_col].isna().any():
                pdf = pdf[pdf[cell_col].notna()]
            if pdf.empty:
                continue
            cells = pdf[cell_col].to_numpy(np.int64).view(np.uint64)
            sortable = (cells ^ np.uint64(1 << 63)).view(np.int64)
            pos = np.searchsorted(lo_arr, sortable, side="right")
            out_rows = []
            out_rids = []
            w = 1
            while True:
                idx = pos - w
                idxc = np.clip(idx, 0, None)
                # a lane stays live while some interval at or left of idx
                # could still reach the probe (per-region disjointness keeps
                # the true overlap depth ~ number of regions)
                live = (idx >= 0) & (max_hi_prefix[idxc] >= sortable)
                if not live.any():
                    break
                hit = live & (sortable <= hi_arr[idxc]) & (sortable >= lo_arr[idxc])
                if hit.any():
                    out_rows.append(np.nonzero(hit)[0])
                    out_rids.append(rid_arr[idxc[hit]])
                w += 1
            if not out_rows:
                continue
            rows = np.concatenate(out_rows)
            rids_out = np.concatenate(out_rids)
            res = pdf.iloc[rows].copy()
            res["region_id"] = rids_out
            yield res

    return pages.mapInPandas(stab, schema=schema)


def filter_in_rect(
    df: DataFrame, lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float
) -> DataFrame:
    """Exact rectangle test (closed bounds) — the PIP 'exact' stage for
    rectangular regions; native so it stays in codegen."""
    return df.filter(
        (F.col("lat") >= lat_lo)
        & (F.col("lat") <= lat_hi)
        & (F.col("lon") >= lon_lo)
        & (F.col("lon") <= lon_hi)
    )


def point_in_polygon_udf(rings: list[np.ndarray]):
    """Vectorized even-odd ray-cast point-in-polygon (lat/lon plane).

    `rings`: list of (k, 2) float arrays of (lat, lon) vertices; even-odd
    across rings supports holes. Planar semantics (edges are straight in
    lat/lon) — documented engine semantic; polygons crossing the
    antimeridian must be pre-split by the caller. Returns a BooleanType
    pandas UDF usable as ``df.filter(pip(F.col('lat'), F.col('lon')))``
    after covering-cell candidate pruning.
    """
    closed = [np.asarray(r, dtype=np.float64) for r in rings]

    @F.pandas_udf("boolean")
    def pip(lat: pd.Series, lon: pd.Series) -> pd.Series:
        y = lat.to_numpy(np.float64)
        x = lon.to_numpy(np.float64)
        inside = np.zeros(y.shape, dtype=bool)
        for ring in closed:
            ry, rx = ring[:, 0], ring[:, 1]
            for a in range(len(ring)):
                b = (a + 1) % len(ring)
                y1, x1, y2, x2 = ry[a], rx[a], ry[b], rx[b]
                if y1 == y2:
                    continue
                cond = ((y1 > y) != (y2 > y)) & (
                    x < (x2 - x1) * (y - y1) / (y2 - y1) + x1
                )
                inside ^= cond
        return pd.Series(inside)

    return pip
