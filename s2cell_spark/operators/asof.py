"""As-of (most-recent-match) join — the temporal-alignment operator every
training-data pipeline needs (feature snapshots at label time, last-touch
attribution, point-in-time correctness for time-series features).

Spark has no native ASOF JOIN (DuckDB does — which is exactly what the
driver oracle uses to value-check this). The naive relational encodings
are scale-killers:

* ``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + per-left max: the non-equi
  conjunct makes the join a BroadcastNestedLoopJoin or an exploded
  equi-join on k whose intermediate is |l_k| x |r_k| per key — quadratic
  on hot keys;
* a correlated "latest row" subquery per left row: not distributable.

This implementation is the UNION-MERGE formulation: tag both sides, union
them, and run ONE window over (key, ts) carrying the right side's columns
forward with ``last(..., ignorenulls=true)``. Every left row then holds
the most recent right row at-or-before its timestamp. Cost: one shuffle
of |l|+|r| rows on the key and a linear within-partition sort — the same
cost class as a plain equi-join, no quadratic term, no BNLJ. Hot keys
behave like any windowed aggregate (sort spills, no per-pair blowup).

At 100 TB: both sides ship to the same key-hash partitions once; if the
left table is repeatedly as-of-joined against slowly-changing right
tables on the same key, bucket BOTH by key (plans.bucketing) and the
exchange disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    tolerance_ms: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT as-of join: every `left` row + the `right` row with the
    largest ``ts_col`` <= the left row's ``ts_col``, matched per `on` key
    (strictly at-or-before; DuckDB ``ASOF LEFT JOIN`` semantics).
    Unmatched left rows keep nulls. ``tolerance_ms`` additionally nulls
    matches older than the window (match, THEN age-filter — identical to
    pandas ``merge_asof(tolerance=...)``).

    Right columns come back prefixed (``{right_prefix}{col}``), including
    its timestamp. DETERMINISM: `right` must be unique per (key, ts) —
    pre-aggregate duplicates first (ties at identical timestamps would
    otherwise resolve by partition order).
    """
    rcols = [c for c in right.columns if c not in (on, ts_col)]
    null_of = {f.name: f.dataType for f in right.schema.fields}
    lt = left.select(
        "*",
        F.lit(1).alias("_side"),
        # keep the right side's exact timestamp type (TIMESTAMP vs _NTZ)
        F.lit(None).cast(null_of[ts_col]).alias("_r_ts"),
        *[F.lit(None).cast(null_of[c]).alias(f"_r_{c}") for c in rcols],
    )
    l_null = {f.name: f.dataType for f in left.schema.fields}
    rt = right.select(
        *[
            F.lit(None).cast(l_null[c]).alias(c)
            for c in left.columns
            if c not in (on, ts_col)
        ],
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.col(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    u = lt.unionByName(rt)
    # right rows sort BEFORE left rows at the same timestamp (_side 0 < 1),
    # so an exactly-simultaneous right row IS matched (at-or-before)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in rcols
        ],
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        # timestampdiff is NTZ-safe; casting TIMESTAMP_NTZ to DOUBLE raises
        # DATATYPE_MISMATCH in Spark 4 (events.ts is NTZ — CLAUDE.md trap)
        fresh = F.expr(
            f"timestampdiff(MILLISECOND, _m_ts, {ts_col})"
        ) <= F.lit(int(tolerance_ms))
        out = out.select(
            *[c for c in left.columns],
            F.when(fresh, F.col("_m_ts")).alias(f"{right_prefix}{ts_col}"),
            *[F.when(fresh, F.col(f"_m_{c}")).alias(f"{right_prefix}{c}") for c in rcols],
        )
        return out
    return out.select(
        *[c for c in left.columns],
        F.col("_m_ts").alias(f"{right_prefix}{ts_col}"),
        *[F.col(f"_m_{c}").alias(f"{right_prefix}{c}") for c in rcols],
    )
