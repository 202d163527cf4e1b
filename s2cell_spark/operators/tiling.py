"""Raster<->vector tile assignment and hierarchical cell rollups (ENGINE).

Two tiling systems:

* **Web-mercator z/x/y tiles** — pure float arithmetic
  (``floor((lon+180)/360 * 2^z)`` / the Mercator y formula), fully
  Catalyst-native so it constant-folds and pushes down. The formula text
  matches the DuckDB oracle symbol-for-symbol.
* **S2 cell tiles** — the level-k parent cell via the native truncation
  expr; Hilbert locality makes level-k rollups the natural heatmap unit.

Rollups are plain ``groupBy().agg()`` (map-side partial + final hash
aggregate — no custom code needed at any scale); hierarchical multi-level
rollups go through one ``explode`` of the parent chain rather than
re-scanning pages per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s2cell_spark import functions as S2F

MERCATOR_MAX_LAT = 85.05112878


def mercator_tile(lat, lon, zoom: int):
    """(tile_x, tile_y) Column exprs at `zoom`; lat clamped to the
    Mercator domain. Matches the oracle SQL expression exactly."""
    n = F.lit(float(2**zoom))
    clat = F.greatest(F.lit(-MERCATOR_MAX_LAT), F.least(F.lit(MERCATOR_MAX_LAT), lat))
    tx = F.floor((lon + F.lit(180.0)) / F.lit(360.0) * n).cast("long")
    lat_rad = F.radians(clat)
    ty = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(float(__import__("math").pi))
        )
        / F.lit(2.0)
        * n
    ).cast("long")
    # the x==2^z edge (lon == +180) folds into the last tile
    tx = F.least(tx, F.lit(2**zoom - 1))
    ty = F.greatest(F.lit(0), F.least(ty, F.lit(2**zoom - 1)))
    return tx, ty


def assign_mercator_tiles(pages: DataFrame, zoom: int) -> DataFrame:
    tx, ty = mercator_tile(F.col("lat"), F.col("lon"), zoom)
    return pages.withColumn("tile_x", tx).withColumn("tile_y", ty)


def tile_heatmap(pages: DataFrame, zoom: int) -> DataFrame:
    """Pages per mercator tile: (tile_x, tile_y, n_pages)."""
    return (
        assign_mercator_tiles(pages, zoom)
        .groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n_pages"))
    )


def cell_heatmap(pages: DataFrame, level: int, cell_col: str = "cell_id") -> DataFrame:
    """Pages per level-`level` S2 cell: (cell_token, n_pages).

    The groupBy key is the native parent expr — map-side combine applies,
    and with pages range-partitioned on cell_id_sortable the shuffle is
    nearly co-located (Hilbert prefix = parent)."""
    parent = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    return (
        pages.groupBy(S2F.cell_id_to_token(parent).alias("cell_token"))
        .agg(F.count("*").alias("n_pages"))
    )


def hierarchical_rollup(
    pages: DataFrame, levels: list[int], cell_col: str = "cell_id"
) -> DataFrame:
    """Counts at several levels in ONE pages scan: explode the parent
    chain (levels are a derived chain, not independent dims — cube/rollup
    would recompute the hierarchy; SURVEY §2.2)."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(l).alias("level"),
                S2F.cell_id_to_parent_cell_id(F.col(cell_col), l).alias("ancestor"),
            )
            for l in sorted(levels)
        ]
    )
    return (
        pages.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.level").alias("level"), F.col("p.ancestor").alias("ancestor"))
        .agg(F.count("*").alias("n_pages"))
        .withColumn("cell_token", S2F.cell_id_to_token(F.col("ancestor")))
        .drop("ancestor")
    )


def cell_distinct_urls(
    pages: DataFrame, level: int, cell_col: str = "cell_id"
) -> DataFrame:
    """Distinct URLs per level-`level` cell: (cell_token, n_distinct).

    Plain ``countDistinct`` on purpose: Spark's distinct rewrite plans
    this as dedup-on-(key, url) [shuffle hash-spread by BOTH columns] ->
    partial_count per key -> final count, so a Zipf-hot cell never
    funnels its URLs through one reducer — exact distinct counts are
    natively skew-safe here, unlike windows (see :func:`salted_topk`)."""
    parent = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    return (
        pages.groupBy(S2F.cell_id_to_token(parent).alias("cell_token"))
        .agg(F.countDistinct("url").alias("n_distinct"))
    )


def top_pages_per_tile(
    pages: DataFrame, zoom: int, k: int, order_col: str = "doc_id"
) -> DataFrame:
    """Top-k pages per mercator tile (adds a ``rank`` column).

    Deliberately the plain ``row_number + filter rank <= k`` window:
    Spark >= 3.5 plans this with **WindowGroupLimit Partial/Final** — a
    map-side per-key top-k BEFORE the exchange — so a Zipf-hot tile ships
    only ~k rows per map task and never straggles. Hand-rolled two-phase
    salting was measured 2-3x SLOWER here (extra shuffle + sort for a
    problem the optimizer already solved; BENCH/SKEW.md). The
    WindowGroupLimit shape is pinned by a plan regression test so a
    future query change that silently breaks the pushdown (e.g. using
    rank over a non-filterable expression) fails loudly."""
    tiled = assign_mercator_tiles(pages, zoom)
    w = Window.partitionBy("tile_x", "tile_y").orderBy(F.col(order_col))
    return tiled.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cell_distinct_urls_hll(
    pages: DataFrame, level_fine: int, level_coarse: int, cell_col: str = "cell_id"
) -> DataFrame:
    """Approximate distinct URLs per coarse cell via MERGEABLE HLL
    sketches: (cell_token, approx_distinct).

    The 100 TB shape exact distinct can't take: fine-cell sketches are
    built once (map-side partial HLL, one shuffle of fixed-size sketch
    bytes instead of the distinct (cell, url) universe) and ROLL UP to
    any coarser level by native ``hll_union_agg`` — reusable across the
    whole level hierarchy without touching raw urls again, the same way
    `hierarchical_rollup` reuses counts. Union is commutative/associative,
    so the estimate is independent of partitioning (deterministic across
    cluster sizes); the error-vs-exact bound is enforced by the
    `cell_distinct_urls_hll` oracle query, not assumed."""
    fine = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level_fine)
    sketches = pages.groupBy(fine.alias("cell_fine")).agg(
        F.hll_sketch_agg("url").alias("sk")
    )
    coarse = S2F.cell_id_to_parent_cell_id(F.col("cell_fine"), level_coarse)
    return sketches.groupBy(S2F.cell_id_to_token(coarse).alias("cell_token")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    )
