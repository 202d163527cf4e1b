"""k-nearest-pages search via expanding S2 cell rings (ENGINE, SURVEY §2.2).

Two phases, both provably correct without relying on cell-size metric
constants:

1. **Ring expansion** (candidate gathering): each query starts at its
   level-L cell; ring r adds the edge+corner neighbors of ring r-1 (kernel
   #17). Pages equi-join rings on ``parent(page_cell, L)`` — a broadcast
   hash join per round — until every query holds >= k candidates. The
   driver loop only ever collects per-query COUNTS (tiny aggregates).
2. **Radius verification**: take each query's kth-smallest candidate
   distance d_k, cover the great-circle cap of radius d_k with a lat/lon
   bbox (meridian-convergence-aware), COVER the bbox with S2 cells, and
   re-query via a containment join + exact bbox filter + haversine
   re-rank. Any true neighbor lies within d_k of the query, hence inside
   the cap, hence the bbox, hence the covering — so the final top-k is
   exact even if phase 1's rings were too coarse.

Scan hygiene at 100 TB (the properties a 1000-executor run needs):

* ONE narrow projection of pages — (id, lat, lon, cell) — is cached and
  feeds every ring iteration AND the phase-2 re-query; the wide table is
  scanned once no matter how many rounds the loop takes.
* The initial ring count is DENSITY-SEEDED (expected candidates per ring
  set from the global page count), so the typical query needs one round,
  not O(log r) doubling rounds from r=1.
* Phase 2 is a cell-covering containment join (equi/interval — never the
  BroadcastNestedLoopJoin Spark plans for a raw non-equi bbox predicate,
  which would be O(pages x queries)); asserted in tests/test_plans.py.

Distances use the haversine great-circle formula on a unit sphere
(returned in degrees of arc) — matching the DuckDB oracle expression
symbol-for-symbol so rank ordering agrees bit-for-bit on float64.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from s2cell_spark import functions as S2F
from s2cell_spark import kernels as K


def haversine_deg(lat1, lon1, lat2, lon2):
    """Great-circle distance in DEGREES of arc, as a native Column expr.

    2*asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2))) — identical formula
    text is embedded in the oracle SQL; keep in lockstep."""
    sp = F.sin(F.radians(lat2 - lat1) / F.lit(2.0))
    sl = F.sin(F.radians(lon2 - lon1) / F.lit(2.0))
    a = sp * sp + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sl * sl
    return F.degrees(F.lit(2.0) * F.asin(F.sqrt(a)))


def dist_rank_key(dist_col):
    """1e-7-deg fixed-point quantization of a ranking distance (~1 cm).

    Ranking directly on the double distance is ulp-fragile: Spark's JVM
    libm and the oracle's (DuckDB) libm disagree on ``asin`` in the final
    ulps, and a near-tie can flip ``row_number`` between engines. The same
    grid the repo's decode oracle uses (1e-7 deg) collapses those ulp
    differences; ties inside a bucket break on the id column, identically
    on both sides. ``floor(d*1e7 + 0.5)`` rather than round(): *, + and
    floor are bit-identical across both engines, half-even rounding is
    not. Oracle mirror: ``CAST(floor(d * 1e7 + 0.5) AS BIGINT)``."""
    return F.floor(dist_col * F.lit(1.0e7) + F.lit(0.5)).cast("long")


def _ring_cells(queries: list[tuple[int, float, float]], level: int, n_rings: int):
    """(query_id, ring_cell_id) pairs for rings 0..n_rings, driver-side."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    lat = np.array([q[1] for q in queries])
    lon = np.array([q[2] for q in queries])
    center = K.lat_lon_to_cell_id(lat, lon, level)
    rows: set[tuple[int, int]] = set()
    for qi, c in enumerate(center):
        seen = {int(c)}
        frontier = {int(c)}
        for _ in range(n_rings):
            cells = np.array(sorted(frontier), dtype=np.uint64)
            grid, valid, _ = K.cell_id_to_neighbor_cell_ids_grid(cells)
            nxt = set(int(x) for x in grid[valid]) - seen
            seen |= nxt
            frontier = nxt
        rows |= {(int(qids[qi]), s) for s in seen}
    return rows


def _seed_rings(n_pages: int, level: int, k: int) -> int:
    """Density-seeded initial ring count: with ~n/(6*4^L) pages per
    level-L cell, rings r cover ~(2r+1)^2 cells; pick the smallest r
    whose expected candidate count clears 2k (safety factor for spatial
    clustering), clamped to [1, 16]. Correctness never depends on this —
    phase 2 verifies the radius — it only sets where the doubling loop
    starts."""
    density = n_pages / (6.0 * 4.0**level)
    if density <= 0:
        return 16
    r = math.ceil((math.sqrt(2.0 * k / density) - 1.0) / 2.0)
    return max(1, min(16, int(r)))


def _bbox_covering_level(lat_span: float, lon_span: float, max_level: int = 12) -> int:
    """Covering granularity matched to the bbox size: ~8-64 cells per
    side (level where the cell edge is ~1/8 the span), so the covering
    stays small for the broadcast regardless of how tiny or global the
    verified radius turned out. Any level is CORRECT (covering is a
    superset); this only tunes pruning vs covering size."""
    span = max(lat_span, lon_span, 1e-9)
    return max(0, min(max_level, int(math.log2(max(90.0 / span, 1.0))) + 3))


def knn_join(
    pages: DataFrame,
    queries_df: DataFrame,
    k: int,
    level: int = 4,
    cell_col: str = "cell_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bulk kNN-JOIN: the k nearest pages per QUERY ROW, among pages in
    the query's 3x3 level-`level` cell neighborhood.

    The dual of :func:`knn` for millions of query points: no driver
    loop, no broadcast of the query set — the query side derives its
    cell and the 9-cell neighborhood IN the engine (encode UDF +
    neighbor kernel, one ``explode`` x9), pages key by their level-L
    parent, and one equi-join + per-query window top-k (which Spark
    plans with WindowGroupLimit partial pushdown) does the rest. Both
    sides scale out; hot cells on the join key are the one skew hazard —
    pair with AQE skew-join or ``skewjoin.salted_equi_join`` at scale.

    SEMANTICS (deterministic, documented): exact top-k within the
    neighborhood relation, ordered by (haversine, id). A query whose
    true k-th neighbor lies OUTSIDE its 3x3 neighborhood returns the
    neighborhood's top-k — standard grid kNN-join behavior; pick `level`
    so the cell edge comfortably exceeds the expected k-NN radius, or
    use :func:`knn` when per-query exactness verification is required.

    `queries_df` needs (query_id, q_lat, q_lon). Returns
    (query_id, id_col, dist_deg, rank), rank 1..<=k.
    """
    qcell = S2F.cell_id_to_parent_cell_id(
        S2F.lat_lon_to_cell_id(F.col("q_lat"), F.col("q_lon"), 30), level
    )
    q = queries_df.withColumn("_qcell", qcell)
    hood = q.select(
        "query_id", "q_lat", "q_lon",
        F.explode(
            F.array_union(
                F.array(F.col("_qcell")),
                S2F.neighbor_cell_ids(F.col("_qcell"), edge=True, corner=True),
            )
        ).alias("_nb"),
    )
    key = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    cand = pages.withColumn("_pcell", key).join(
        hood, on=F.col("_pcell") == F.col("_nb"), how="inner"
    )
    dist = haversine_deg(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    w = Window.partitionBy("query_id").orderBy(dist_rank_key(F.col("dist_deg")), F.col(id_col))
    return (
        cand.withColumn("dist_deg", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist_deg", "rank")
    )


def knn(
    pages: DataFrame,
    spark: SparkSession,
    queries: list[tuple[int, float, float]],
    k: int,
    level: int = 4,
    cell_col: str = "cell_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact k nearest pages per query point.

    Returns (query_id, doc_id, dist_deg, rank) with rank 1..k ordered by
    (distance, doc_id). `level` tunes ring granularity only — correctness
    never depends on it thanks to the phase-2 radius verification.

    The narrow (id, lat, lon, cell) projection is persisted for the
    duration of the search (it backs the lazily-returned result too);
    callers running many kNN batches can ``spark.catalog.clearCache()``
    when done.

    Scale boundary: `queries` is a driver-side list (ring cells are
    computed per query on the driver) — sized for interactive use,
    O(10^3) query points against 10^12 pages. A bulk kNN-JOIN (millions
    of query points) wants the dual formulation instead: broadcast
    nothing, bucket BOTH sides by level-L cell + neighbor replication,
    and rank within buckets — a different operator with different
    exactness tradeoffs, deliberately not bolted onto this one.
    """
    from s2cell_spark.operators.containment import containment_join_range

    q_df = spark.createDataFrame(
        [(int(q), float(a), float(o)) for q, a, o in queries],
        "query_id long, q_lat double, q_lon double",
    )

    # ---- one narrow scan of pages, shared by every phase ------------------
    narrow = pages.select(id_col, "lat", "lon", cell_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_pages = narrow.count()  # materializes the cache; seeds the density

    # ---- phase 1: expand rings until every query has >= k candidates ----
    n_rings = _seed_rings(n_pages, level, k)
    while True:
        ring_rows = _ring_cells(queries, level, n_rings)
        rings_df = spark.createDataFrame(
            sorted(
                (qid, int(np.uint64(c).astype(np.int64)) if c < 2**63 else int(c - 2**64), level)
                for qid, c in ring_rows
            ),
            "query_id long, ring_cell long, lvl int",
        )
        key = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
        cand = narrow.join(
            F.broadcast(rings_df), on=key == F.col("ring_cell"), how="inner"
        )
        counts = {
            r["query_id"]: r["n"]
            for r in cand.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        if all(counts.get(q[0], 0) >= k for q in queries):
            break
        if n_rings > 24:  # ring set has swallowed the globe; fall through
            cand = narrow.crossJoin(F.broadcast(q_df.select("query_id")))
            break
        n_rings *= 2

    # ---- phase 2: verified-radius re-query --------------------------------
    dist = haversine_deg(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    cand = cand.join(F.broadcast(q_df), on="query_id").withColumn("dist_deg", dist)
    w = Window.partitionBy("query_id").orderBy(dist_rank_key(F.col("dist_deg")), F.col(id_col))
    dk = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == k)
        .select("query_id", F.col("dist_deg").alias("d_k"))
        .collect()
    )
    d_k = {r["query_id"]: r["d_k"] for r in dk}

    # cap -> conservative lat/lon bbox; meridians converge by 1/cos(lat)
    verify_rows = []
    for qid, qlat, qlon in queries:
        r = d_k.get(qid)
        if r is None:
            # fewer than k pages exist globally; keep everything
            verify_rows.append((qid, -90.0, 90.0, -180.0, 180.0))
            continue
        # pad must exceed one 1e-7-deg rank-quantization bucket: a row that
        # ties d_k's bucket (true dist up to d_k + 1e-7) can still rank <= k
        r_pad = r * 1.0000001 + 2e-7
        lat_lo, lat_hi = qlat - r_pad, qlat + r_pad
        max_abs = min(89.9999, max(abs(lat_lo), abs(lat_hi)))
        if lat_lo <= -89.0 or lat_hi >= 89.0:
            lon_lo, lon_hi = -180.0, 180.0
        else:
            dl = r_pad / math.cos(math.radians(max_abs))
            lon_lo, lon_hi = qlon - dl, qlon + dl
        if lon_lo < -180.0 or lon_hi > 180.0:
            lon_lo, lon_hi = -180.0, 180.0
        verify_rows.append((qid, max(-90.0, lat_lo), min(90.0, lat_hi), lon_lo, lon_hi))

    # bbox -> mixed-level cell covering per query; ONE interval containment
    # join stabs all queries' coverings in a single pass over the cached
    # narrow projection (broadcast intervals + searchsorted — an equi-class
    # plan, never the O(pages x queries) BroadcastNestedLoopJoin a raw
    # non-equi bbox join would become).
    from s2cell_spark.operators.covering import latlng_rect_covering

    regions = {
        qid: latlng_rect_covering(
            lat_lo, lat_hi, lon_lo, lon_hi,
            max_level=_bbox_covering_level(lat_hi - lat_lo, lon_hi - lon_lo),
        )
        for qid, lat_lo, lat_hi, lon_lo, lon_hi in verify_rows
    }
    covered = containment_join_range(narrow, regions, cell_col=cell_col)
    boxes = spark.createDataFrame(
        verify_rows, "region_id long, lat_lo double, lat_hi double, lon_lo double, lon_hi double"
    ).join(q_df.withColumnRenamed("query_id", "region_id"), on="region_id")
    final = (
        covered.join(F.broadcast(boxes), on="region_id", how="inner")
        .filter(
            (F.col("lat") >= F.col("lat_lo"))
            & (F.col("lat") <= F.col("lat_hi"))
            & (F.col("lon") >= F.col("lon_lo"))
            & (F.col("lon") <= F.col("lon_hi"))
        )
        .withColumnRenamed("region_id", "query_id")
        .withColumn("dist_deg", dist)
    )
    return (
        final.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist_deg", "rank")
    )
