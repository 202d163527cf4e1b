"""Physical-plan regression tests — the scale-critical properties.

At 100 TB the difference between a correct plan and a correct-but-
wrong-shaped plan IS the outcome (SURVEY.md §4.2), so the properties are
asserted, not assumed:

* containment joins broadcast the covering dim — pages NEVER shuffle;
* queries claimed "fully native" really contain no Python eval node;
* parquet scans prune to the needed columns (never read html/text unless
  the query uses them);
* aggregations are partial+final (map-side combine before the exchange).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as E

    return E


def test_containment_equi_broadcasts_pages_never_shuffle(spark, entry):
    plan = _plan(entry.queries()["pip_boxes_equi"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only exchange allowed is the broadcast of the covering dim
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_salted_join_still_broadcast(spark, entry):
    plan = _plan(entry.queries()["pip_boxes_salted"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_filter_sits_below_encode_udf(spark, entry):
    """The rect predicate must run BEFORE the (expensive) encode UDF output
    is joined — i.e. a Filter node carrying the rect bounds appears BELOW
    ArrowEvalPython in the plan (deeper in the tree = earlier in
    execution). Matched on an actual box constant (39.7, the NYC lat_lo)
    inside a Filter line, not just any Filter — the scan's isnotnull
    filters would satisfy a bare position check vacuously."""
    import re

    plan = _plan(entry.queries()["pip_boxes_equi"](spark, SF))
    arrow_pos = plan.index("ArrowEvalPython")
    below = plan[arrow_pos:]
    assert re.search(r"Filter [^\n]*39\.7", below), (
        "rect predicate no longer evaluated below the encode UDF"
    )


@pytest.mark.parametrize(
    "name",
    [
        "s2_bitops",
        "dedup_exact",
        "jaccard_pairs",
        "minhash_near_dups",
        "simhash",
        "doc_fingerprint",
        "token_count",
        "quality_score",
        "lang_id",
        "tile_heatmap_z6",
        "events_window_1h",
    ],
)
# (cell_heatmap_l8 / hierarchical_rollup legitimately contain ONE
# ArrowEvalPython: the S2 encode kernel itself; the aggregation around it
# is native — covered by test_heatmap_has_partial_aggregation.)
def test_native_queries_have_no_python_eval(spark, entry, name):
    """Everything not inherently kernel-bound stays in JVM codegen — the
    'UDFs are the slow path' rule, enforced."""
    plan = _plan(entry.queries()[name](spark, SF))
    assert "ArrowEvalPython" not in plan, name
    assert "BatchEvalPython" not in plan, name


def test_heatmap_has_partial_aggregation(spark, entry):
    plan = _plan(entry.queries()["cell_heatmap_l8"](spark, SF))
    # partial + final pair around one exchange
    assert plan.count("HashAggregate") >= 2


def test_scan_prunes_unused_columns(spark, entry):
    """tile_heatmap derives everything from doc_id — the parquet scan must
    not read text (or anything else)."""
    plan = _plan(entry.queries()["tile_heatmap_z6"](spark, SF))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "doc_id" in scan
    assert "text" not in scan and "lang" not in scan


def test_pages_loader_never_reads_html_by_default(spark):
    from s2cell_spark.sources.pages import load_pages

    plan = _plan(load_pages(spark, SF).select("url", "lat", "lon"))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "html" not in scan and "text" not in scan
