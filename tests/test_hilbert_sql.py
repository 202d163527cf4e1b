"""Parity: the generated DuckDB Hilbert-encode SQL vs the numpy kernels.

This is the foundation of the value-checked S2 oracles
(`cell_heatmap_l8`, `hierarchical_rollup` in `__spark_entry__.py`): the
SQL re-derives cell IDs completely independently (DuckDB trig + unrolled
lookup-join Hilbert rounds), so agreement here means the oracle actually
cross-checks the engine rather than echoing it.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from s2cell_spark import kernels as K
from s2cell_spark.functions import hilbert_sql as H


@pytest.fixture(scope="module")
def grid():
    lats = np.linspace(-89.9, 89.9, 61)
    lons = np.linspace(-179.9, 179.9, 121)
    glat, glon = np.meshgrid(lats, lons)
    lat, lon = glat.ravel(), glon.ravel()
    return pd.DataFrame({"doc_id": np.arange(lat.size), "lat": lat, "lon": lon})


@pytest.mark.parametrize("level", [0, 4, 8, 12, 30])
def test_sql_encode_matches_kernels(grid, level):
    con = duckdb.connect()
    con.register("pts", grid)
    cte = H.leaf_bits_cte(source="pts", max_level=level)
    cell = H.truncate_sql(level)
    got = con.execute(
        f"WITH {cte} SELECT doc_id, {cell} AS cell, {H.token_sql(cell)} AS tok "
        "FROM s2enc ORDER BY doc_id"
    ).fetchnumpy()
    want = K.cell_id_to_parent_cell_id(
        K.lat_lon_to_cell_id(grid["lat"].to_numpy(), grid["lon"].to_numpy(), 30), level
    )
    np.testing.assert_array_equal(got["cell"], want.view(np.int64))
    np.testing.assert_array_equal(got["tok"], K.cell_id_to_token(want))


def test_required_rounds_matches_reference_formula():
    # s2cell/s2cell.py:471 — required_steps = ceil((level + 2) / 4)
    assert [H.required_rounds(l) for l in (0, 2, 3, 8, 14, 30)] == [1, 1, 2, 3, 4, 8]


def test_sortable_flip_sql():
    con = duckdb.connect()
    # face-5 leaf id (negative long) must sort above face-0 ids once flipped
    neg = int(np.uint64(5 << 61 | 1).view(np.int64))
    pos = int(np.uint64((1 << 61) | 1).view(np.int64))
    lo, hi = con.execute(
        f"SELECT {H.flip_sortable_sql(str(pos))}, {H.flip_sortable_sql(str(neg))}"
    ).fetchone()
    assert lo < hi
