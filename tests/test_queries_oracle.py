"""t3 — every oracle-backed __spark_entry__ query vs DuckDB at sf0.01
(the driver's correctness gate, run locally), plus non-emptiness floors.

compare() passes when BOTH engines return zero rows, so a symmetric
regression (a shared constant drifting until a query degenerates to
empty on both sides) would stay green without the MIN_ROWS floors below.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_util import compare

ORACLES = E.oracle_sql()
QUERIES = E.queries()

# sf0.01 row-count floors: roughly half the observed counts, so data-shape
# drift fails loudly while normal variation passes. Every query must
# return SOMETHING (default floor 1).
MIN_ROWS = {
    "s2_bitops": 400,
    "cell_decode": 400,
    "pip_boxes": 150,  # 3 row-identical variant arms x ~50
    "pip_polygons": 250,  # fixture (~52) + bulk 120-polygon (~560) arms
    "knn_pages": 30,
    "knn_join_bulk": 20,
    "neighbors_interior": 800,
    "cell_heatmap_l8": 200,
    "hierarchical_rollup": 500,
    "cell_hour_counts": 200,
    "cell_distinct_urls": 150,
    "supplier_cell_revenue": 40,
    "asof_clicks_views": 400,  # window + chunked arms x ~200
    "train_split": 8,  # train/val/test x (hash + stratified) + 2 weighted rates
    "contamination": 150,  # n3 (~340) + n13 (verbatim-dup passages only)
    "geotag_extract": 400,  # one row per doc: text-extracted + hash arms
    "spatial_clusters": 15,
    "user_sessions": 100,
    "events_cell_quantiles": 100,
    "tile_topk_pages": 300,
    "events_by_cell": 250,
    "top_tiles": 20,
    "jaccard_pairs": 20,  # capped + uncapped arms
    "minhash_near_dups": 10,
    "simhash": 400,
    "ann_topk": 100,  # brute + ivf_recompute + ivf_bucketed arms x 40
    "cosine_near_dups": 40,
    "sql_api": 400,
    "token_count": 400,
    "within_radius": 120,  # equi + range arms
    "cell_union_normalize": 130,
    "cell_union_setalg": 430,  # intersect (~150) + difference (~280) arms
    "events_bloom_join": 110,
    "events_in_windows": 40,
    "cell_distinct_urls_hll": 150,
    "events_cell_quantiles_approx": 50,
    "dup_clusters": 800,  # jaccard + minhash arms x ~500
    "cc_pipeline": 100,
    "colocated_pairs": 250,
}

# Query callables with NO SQL oracle by design, kept OUT of the
# queries() registry (a registry entry without an oracle is a permanent
# red rows-only cell in the driver artifact — round-4 verdict): sketch
# estimates are engine-internal. Floor-tested and benched here instead.
# Keep minimal — every addition needs an in-repo value-exactness story
# (here: cell_distinct_urls_hll bound-checks the identical expression).
ROWS_ONLY = {"cell_distinct_urls_hll_prod": (E._q_cell_distinct_hll_prod, 150)}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_and_nonempty(spark, name):
    df = QUERIES[name](spark, SF_CORRECT)
    n = df.count()
    assert n >= MIN_ROWS.get(name, 1), f"{name}: only {n} rows at sf0.01"
    ok, msg = compare(df, ORACLES[name], SF_CORRECT)
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)
    assert set(ROWS_ONLY).isdisjoint(QUERIES)


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_query_runs_and_meets_floor(spark, name):
    fn, floor = ROWS_ONLY[name]
    n = fn(spark, SF_CORRECT).count()
    assert n >= floor, f"{name}: only {n} rows at sf0.01"


def test_registry_stays_under_driver_sweep_cap():
    """The r3 driver artifact swept exactly the first 50 of 52 registry
    entries, silently dropping the dict tail (round-3 verdict item 1).
    Until the harness proves otherwise, 50 is the observed cap — keep
    headroom so every entry gets a correctness row."""
    assert len(QUERIES) <= 49, (
        f"{len(QUERIES)} registry entries risks the observed 50-entry "
        "driver sweep cap — merge row-identical variants (_union_variants) "
        "instead of adding raw entries"
    )


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region_id", "cell_token", "n_pages"]


def test_queries_run_at_smoke_sf(spark):
    # a cheap spatial + a cheap text query also run at sf0.001
    assert E._q_pip("equi")(spark, SF_SMOKE).count() > 0
    assert QUERIES["token_count"](spark, SF_SMOKE).count() > 0
