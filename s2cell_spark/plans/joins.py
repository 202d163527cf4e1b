"""Join-side planning helpers.

``broadcast_if_small`` is the scale-safe replacement for an unconditional
``F.broadcast(dim)``: a forced broadcast of a pages-derived dimension is
correct at sf0.1 (thousands of rows) and a guaranteed driver/executor OOM
at 10^12 pages, where the pages table is the LARGEST table in the system.
The gate reads Catalyst's own size estimate for the dim's optimized plan
(driver-side metadata only — no job runs), so:

* small dim (a real dimension table, a covering, a query set) -> the
  broadcast hint is applied and the join plans as BroadcastHashJoin with
  zero shuffle of the fact side;
* large or unknown-size dim (anything derived from the fact table
  itself) -> no hint; an equi-join degrades to a shuffle hash /
  sort-merge join on the key — never a nested-loop, never an
  OOM-broadcast. With AQE on, the runtime can still promote to broadcast
  if the actual post-filter size turns out small.

Plan-shape regression: tests/test_plans.py asserts both halves
(hint applied below the threshold; SMJ/SHJ above it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_size_conf(text: str) -> int:
    """'10485760b' / '10m' / '-1' -> bytes (Spark size-conf syntax)."""
    t = text.strip().lower()
    for suf in ("kb", "mb", "gb", "tb"):
        if t.endswith(suf):
            return int(float(t[: -len(suf)]) * _SUFFIX[suf[0]])
    if t and t[-1] in _SUFFIX:
        return int(float(t[:-1]) * _SUFFIX[t[-1]])
    return int(t)


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the frame's optimized plan, or None
    when the backend doesn't expose it (treat as 'unknown -> not small')."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def broadcast_if_small(df: DataFrame, threshold_bytes: int | None = None) -> DataFrame:
    """Apply ``F.broadcast`` only when the plan-size estimate is under the
    threshold (default: the session's autoBroadcastJoinThreshold).

    A threshold <= 0 (Spark's broadcast-off convention) never hints.
    Unknown size never hints — at 100 TB the cost of a wrongly-withheld
    hint is one extra shuffle; the cost of a wrongly-applied one is an OOM.
    """
    if threshold_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        threshold_bytes = _parse_size_conf(conf)
    if threshold_bytes <= 0:
        return df
    size = plan_size_bytes(df)
    if size is not None and size <= threshold_bytes:
        return F.broadcast(df)
    return df
