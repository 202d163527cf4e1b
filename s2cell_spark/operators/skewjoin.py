"""Salted shuffle joins — the skew case modern Spark does NOT auto-fix.

Where skew actually lives in Spark 4 (measured; BENCH/SKEW.md):

* ``groupBy().count()/countDistinct()`` — natively two-phased (partial
  aggregation / the distinct rewrite); hot keys do NOT straggle.
* ``row_number + filter rank <= k`` windows — natively two-phased since
  Spark 3.5 (WindowGroupLimit Partial/Final); hot keys do NOT straggle.
* **shuffle equi-joins** — NOT fixed when AQE is off (deterministic
  pipelines, streaming micro-batches) or when its skew thresholds miss:
  sort-merge/shuffle-hash joins send every row of a hot key to ONE task,
  which merges 90% of the data. This module is that fix.

``salted_equi_join(fact, dim, key)``: the fact side gets a deterministic
salt (hash of all its columns mod S); the small-ish dim side is
replicated S times with an ``explode(sequence(...))`` (native). The join
key becomes (key, salt), so the hot key's fact rows spread across S
tasks, each joining against its own copy of the dim rows. Output rows are
IDENTICAL to the plain join (the salt never changes which (fact, dim)
pairs match — it only partitions fact rows; tested). Cost: the dim
shuffle grows Sx — use when dim is far smaller than fact but too big (or
forbidden) to broadcast, the exact regime of a pages-derived dim at
10^12 pages (see plans.joins.broadcast_if_small for the broadcast gate).

With AQE on, prefer letting the runtime skew-join handle it; this
operator is for the AQE-off / threshold-missed cases, and its fixture-
measured speedup is recorded in BENCH/SKEW.md rather than assumed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_salts: int = 32,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join `fact` with `dim` on column `on`, salted against hot-key
    skew. Output columns/rows identical to ``fact.join(dim, on, how)``.

    The salt is ``hash(salt_cols) % S`` — deterministic (same row always
    lands in the same salt; duplicate rows co-locate, which is harmless),
    so a hot key's rows spread uniformly as long as `salt_cols` carries
    row-level entropy beyond the join key. Default: every fact column
    whose type ``F.hash`` accepts (MapType is unhashable in Spark and
    would raise AnalysisException). Pass an explicit small subset when the
    fact side carries wide text/binary columns — hashing a 1 KB document
    per row buys no extra distribution over hashing its id. Raises if the
    default subset degenerates to the join key alone (salting the key's
    hash puts the hot key in ONE salt, silently undoing the fix).

    Supports 'inner' and 'left' (the dim replication makes right/full
    semantics subtle — unmatched dim rows would appear S times; not
    offered). A pre-existing ``_salt`` column on either side is an error
    rather than a silent collision."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    if "_salt" in fact.columns or "_salt" in dim.columns:
        raise ValueError(
            "salted_equi_join: a `_salt` column already exists on an input; "
            "rename it first (the operator uses that name internally)"
        )
    if salt_cols is None:
        salt_cols = [
            f.name for f in fact.schema.fields if not isinstance(f.dataType, MapType)
        ]
    if list(salt_cols) in ([], [on]):
        raise ValueError(
            "salted_equi_join: salt_cols must include at least one non-key "
            "column — hash(join key) alone maps every hot-key row to the "
            "same salt and the skew mitigation silently does nothing"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(num_salts))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return fact_s.join(dim_s, on=[on, "_salt"], how=how).drop("_salt")
