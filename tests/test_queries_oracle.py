"""t3 — every oracle-backed __spark_entry__ query vs DuckDB at sf0.01
(the driver's correctness gate, run locally), plus rows-only sanity."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_util import compare

ORACLES = E.oracle_sql()
QUERIES = E.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare(QUERIES[name](spark, SF_CORRECT), ORACLES[name], SF_CORRECT)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_execute(spark, name):
    n = QUERIES[name](spark, SF_CORRECT).count()
    assert n >= 0
    if name in ("cell_heatmap_l8", "hierarchical_rollup", "ivf_topk"):
        assert n > 0, f"{name} unexpectedly empty"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["region_id", "cell_token", "n_pages"]


def test_queries_run_at_smoke_sf(spark):
    # a cheap spatial + a cheap text query also run at sf0.001
    assert QUERIES["pip_boxes_equi"](spark, SF_SMOKE).count() > 0
    assert QUERIES["token_count"](spark, SF_SMOKE).count() > 0
