"""Point-in-interval (temporal containment) join — ENGINE operator.

The time-axis analogue of the cell containment join (SURVEY §2.2): match
each point row (an event at instant t) to every interval row whose
[start, end] contains t, WITHOUT an equi key. Spark's planner turns a
bare range predicate into BroadcastNestedLoopJoin (O(n·m) compares) —
the same trap the containment join avoids on the cell axis, solved the
same way: DISCRETIZE. Both sides map onto fixed-width time buckets
(intervals explode to the few buckets they span, points to exactly one),
the join becomes a plain equi join on bucket id — broadcast or shuffle,
Catalyst's choice — and the exact ``start <= t <= end`` predicate runs
as a native post-filter. An interval spans each point's bucket at most
once, so no dedup is needed.

Pick ``bucket_seconds`` near the typical interval length: the interval
side then explodes by ~len/bucket + 1 ≈ 2 rows while points stay 1:1 —
at 100 TB of events the events side is scanned once and never
nested-loop-compared. NTZ-safe epoch math via ``timestampdiff`` from a
same-type zero (events.ts is TIMESTAMP_NTZ; ``unix_micros`` raises on
it — CLAUDE.md invariant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_seconds(col: str) -> Column:
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
        f"cast({col} AS TIMESTAMP_NTZ))"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    by: list[str] | None = None,
    how: str = "inner",
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Rows of `points` x matching `intervals` (closed bounds). Optional
    `by` adds equi keys (e.g. user_id) alongside the bucket key.

    ``max_buckets_per_interval`` guards the explode: an interval spanning
    ≫ bucket_seconds (a year-long window at minute buckets) would
    ``sequence()`` into an unbounded per-row array — Spark errors near
    10^4 elements and memory balloons well before that. The guard raises
    a CLEAR per-row error naming the offending span instead; fix by
    raising ``bucket_seconds`` toward the typical interval length (or
    pre-splitting pathological intervals)."""
    if how != "inner":
        # an outer bucket-join would null-extend unmatched points and the
        # exact-bounds filter would then silently drop them — i.e. any
        # `how` degenerates to inner here. Refuse instead of lying.
        raise ValueError("interval_join supports how='inner' only")
    b = F.lit(int(bucket_seconds))
    pts = points.withColumn("_ij_bucket", F.floor(_epoch_seconds(ts_col) / b))
    lo = F.floor(_epoch_seconds(start_col) / b)
    hi = F.floor(_epoch_seconds(end_col) / b)
    cap = int(max_buckets_per_interval)
    # executed inline during the explode's child eval — no extra scan
    hi_checked = F.when(hi - lo < F.lit(cap), hi).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: interval spans more than "
                    f"{cap} buckets of {int(bucket_seconds)}s ("
                ),
                (hi - lo + F.lit(1)).cast("string"),
                F.lit(
                    " buckets) — raise bucket_seconds toward the typical "
                    "interval length or pre-split pathological intervals"
                ),
            )
        )
    )
    ivs = intervals.withColumn(
        "_ij_bucket",
        F.explode(F.sequence(lo, hi_checked)),
    )
    keys = ["_ij_bucket"] + list(by or [])
    t = F.col(ts_col)
    return (
        pts.join(ivs, on=keys, how=how)
        .filter((t >= F.col(start_col)) & (t <= F.col(end_col)))
        .drop("_ij_bucket")
    )
