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
import pandas as pd
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


_PAIR_DT = np.dtype([("q", "<i8"), ("c", "<u8")])


def _pack_pairs(q: np.ndarray, c: np.ndarray) -> np.ndarray:
    a = np.empty(len(q), dtype=_PAIR_DT)
    a["q"], a["c"] = q, c
    return a


def _ring_cells(
    queries: list[tuple[int, float, float]], level: int, n_rings: int
) -> np.ndarray:
    """(query_id, ring_cell_id) pairs for rings 0..n_rings, driver-side.

    BATCHED over queries (VERDICT r2 #3): every ring round makes ONE
    neighbor-grid kernel call over the concatenation of all queries'
    frontiers, and the per-query de-dup/seen bookkeeping runs as sorted
    structured-array set algebra (np.unique / np.isin on (q, cell) pairs)
    instead of a per-query Python loop — driver cost is O(rounds) kernel
    calls regardless of query count. Returns a sorted structured array
    with fields ``q`` (int64 query_id) and ``c`` (uint64 cell id)."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    lat = np.array([q[1] for q in queries])
    lon = np.array([q[2] for q in queries])
    center = K.lat_lon_to_cell_id(lat, lon, level)
    seen = np.unique(_pack_pairs(qids, center))
    frontier = seen
    for _ in range(n_rings):
        grid, valid, _ = K.cell_id_to_neighbor_cell_ids_grid(frontier["c"])
        fq = np.broadcast_to(frontier["q"][:, None], grid.shape)
        cand = np.unique(_pack_pairs(fq[valid], grid[valid]))
        fresh = cand[~np.isin(cand, seen)]
        if fresh.size == 0:
            break
        seen = np.unique(np.concatenate([seen, fresh]))
        frontier = fresh
    return seen


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


# Lower bound on the min width of ANY level-L S2 cell: deriv * 2^-L
# radians, deriv = 2*sqrt(2)/3 (the quadratic-projection kMinWidth metric
# from the public s2geometry s2metrics; the reference library carries no
# metrics, so the constant is cited to the upstream spec). A geodesic
# leaving a cell's 3x3 neighborhood must fully cross at least one ring
# cell, i.e. travel >= that cell's min width — making this a SAFE bound
# for the truncation diagnostic below. Empirically validated (worst
# cube-corner cells) in tests/test_operators.py.
KMIN_WIDTH_DERIV = 2.0 * math.sqrt(2.0) / 3.0


def neighborhood_safe_radius_deg(level: int) -> float:
    """Degrees of arc such that EVERY point within this distance of a
    query is guaranteed inside the query's 3x3 level-`level` cell
    neighborhood, wherever the query sits on the sphere."""
    return math.degrees(KMIN_WIDTH_DERIV * 2.0 ** (-level))


def level_for_radius(radius_deg: float) -> int:
    """Deepest S2 level whose 3x3 neighborhood is guaranteed to contain
    every true neighbor within `radius_deg` — the documented way to pick
    :func:`knn_join`'s `level` from an expected k-NN radius (finer level
    => smaller join buckets => cheaper, so deepest safe level wins)."""
    lvl = 0
    while lvl < 30 and neighborhood_safe_radius_deg(lvl + 1) >= radius_deg:
        lvl += 1
    return lvl


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
    via :func:`level_for_radius` so the guaranteed neighborhood radius
    exceeds the expected k-NN radius, or use :func:`knn` when per-query
    exactness verification is required.

    Misuse is VISIBLE, not silent (VERDICT r2 #4): every output row
    carries ``truncated`` — true when the query's rank-k distance exceeds
    :func:`neighborhood_safe_radius_deg` (so a true neighbor could hide
    outside the 3x3 window) or when the neighborhood held fewer than `k`
    candidates at all. ``truncated = false`` certifies the rows ARE the
    query's exact global top-k. The flag compares on the same 1e-7-deg
    fixed-point grid the ranking uses, so it is engine-stable.

    `queries_df` needs (query_id, q_lat, q_lon). Returns
    (query_id, id_col, dist_deg, rank, truncated), rank 1..<=k.
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
    # join on the parent EXPRESSION, never a materialized key column: an
    # inner join on an attribute key infers isnotnull(attr), and that
    # filter pushdown-substitutes through whatever produced the cell —
    # through the native encode stack the expansion is multiplicative
    # and planning OOMs (CLAUDE.md native-cell filter-pushdown trap;
    # same inline-key shape as containment_join_equi).
    key = S2F.cell_id_to_parent_cell_id(F.col(cell_col), level)
    cand = pages.join(hood, on=key == F.col("_nb"), how="inner")
    dist = haversine_deg(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    w = Window.partitionBy("query_id").orderBy(dist_rank_key(F.col("dist_deg")), F.col(id_col))
    wq = Window.partitionBy("query_id")
    safe_fp = int(math.floor(neighborhood_safe_radius_deg(level) * 1.0e7 + 0.5))
    topk = (
        cand.withColumn("dist_deg", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    truncated = (F.count("*").over(wq) < k) | (
        F.max(dist_rank_key(F.col("dist_deg"))).over(wq) > F.lit(safe_fp)
    )
    return topk.select(
        "query_id", id_col, "dist_deg", "rank", truncated.alias("truncated")
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
        # uint64 cells -> LongType via bit reinterpretation (faces 4-5 are
        # negative); already (q, c)-sorted, so the frame is deterministic
        rings_pdf = pd.DataFrame(
            {
                "query_id": ring_rows["q"],
                "ring_cell": ring_rows["c"].view(np.int64),
                "lvl": np.full(len(ring_rows), level, dtype=np.int32),
            }
        )
        rings_df = spark.createDataFrame(
            rings_pdf, "query_id long, ring_cell long, lvl int"
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
