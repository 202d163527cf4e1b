"""The full S2 encode (lat/lon -> Hilbert cell ID -> token) as generated
ANSI-ish SQL, executable by DuckDB with no extensions.

This exists so that the S2-cell queries (`cell_heatmap_l8`,
`hierarchical_rollup`) can be VALUE-checked against an independent engine
rather than rows-only: the driver's DuckDB oracle re-derives every page's
level-k cell from scratch — trig, cube-face projection, quadratic ST
transform, and the Hilbert curve itself, with the 1024-entry lookup table
embedded as a VALUES relation and the per-4-level lookup rounds unrolled
as joins (`ceil((level+2)/4)` rounds, exactly the reference's
`required_steps`, s2cell/s2cell.py:463-471; skipped rounds are overwritten
by truncation so fewer rounds are bit-identical for coarse levels).

Bit-layout notes (all int64 two's-complement, mirroring the engine's
LongType convention, SURVEY.md §1.2):

* ``face << 61`` overflows a signed BIGINT for faces 4-5, and DuckDB
  raises on `<<`/`*` overflow — so the face part is built as
  ``(face - 8 if face >= 4 else face) * 2^61``, which is the two's-
  complement value of those bits (face 4 lands exactly on INT64_MIN,
  representable, no overflow).
* position bits never overlap the face bits, so ``+`` is ``|``.
* truncation to level l is the same ``(c & -lsb) | lsb`` used by the
  native Spark exprs (s2cell/s2cell.py:1035-1036).

Float parity: every float expression keeps the kernel's operation order
(`kernels.py` / s2cell/s2cell.py:90-134,625-674); sqrt is IEEE-exact and
sin/cos/radians agree bit-for-bit between numpy and DuckDB's libm on this
platform (asserted by tests/test_hilbert_sql.py on a dense grid). Coarse
levels (<= 12, what the oracles use) additionally tolerate last-ulp trig
divergence: a flipped leaf IJ bit only changes a level-l cell if the point
sits within ~2^-52 of a level-l boundary.
"""

from __future__ import annotations

import math

from s2cell_spark import kernels

MAX_LEVEL = kernels.MAX_LEVEL


def lookup_pos_values() -> str:
    """The 1024-entry LOOKUP_POS table as a SQL VALUES body.

    Same table the numpy kernels gather from (kernels._build_lookups,
    parity with s2cell/s2cell.py:285-342) — (key, val) with key =
    iiiijjjj<<2 | orientation_in, val = pos<<2 | orientation_out.
    """
    return ", ".join(f"({k},{int(v)})" for k, v in enumerate(kernels.LOOKUP_POS))


def required_rounds(level: int) -> int:
    """Lookup rounds needed for a level-`level` cell (s2cell/s2cell.py:471)."""
    return math.ceil((level + 2) / 4)


def encode_rounds_ctes(
    ij_source: str,
    max_level: int,
    prefix: str = "s2r",
    out: str = "s2enc",
    carry_cols: tuple = ("doc_id",),
) -> str:
    """CTE chain ``{prefix}7.., {out}`` running the Hilbert lookup rounds
    over `ij_source` rows (needs `carry_cols` + face, i, j; i/j are LEAF
    coordinates) and emitting ``cell_trunc0``. Requires a ``lut`` CTE
    (:func:`lookup_pos_values`) in scope. Reused by both the lat/lon
    encode and the face/IJ re-encode (neighbor oracle)."""
    rounds = required_rounds(max_level)
    ks = list(range(7, 7 - rounds, -1))  # e.g. [7, 6, 5]
    keys = ", ".join(carry_cols)

    round_ctes = []
    prev = ij_source
    prev_orient = "(face & 1)"  # initial orientation = face & SWAP (s2cell/s2cell.py:455)
    for k in ks:
        carry = ", ".join(f"p{kk}" for kk in ks if kk > k)
        carry = carry + ", " if carry else ""
        round_ctes.append(
            f"{prefix}{k} AS (\n"
            f"  SELECT {keys}, face, i, j, {carry}CAST(lut.v AS BIGINT) >> 2 AS p{k}, lut.v & 3 AS o{k}\n"
            f"  FROM {prev} JOIN lut\n"
            f"    ON lut.k = {prev_orient} + ((i >> {4 * k}) & 15) * 64 + ((j >> {4 * k}) & 15) * 4\n"
            f")"
        )
        prev = f"{prefix}{k}"
        prev_orient = f"o{k}"

    # position bits: round k contributes p_k << 8k, then the whole position
    # is shifted left once for the trailing-bit slot -> p_k * 2^(8k+1)
    pos_terms = " + ".join(f"p{k} * {1 << (8 * k + 1)}" for k in ks)
    rounds_sql = ",\n".join(round_ctes)
    return f"""{rounds_sql},
{out} AS (
  SELECT {keys}, face,
    (face - CASE WHEN face >= 4 THEN 8 ELSE 0 END) * {1 << 61}
    + {pos_terms} AS cell_trunc0
  FROM {prev}
)"""


def leaf_bits_cte(source: str = "pages", max_level: int = 8) -> str:
    """CTE chain ``lut, ..., s2enc`` computing, per row of `source`
    (needs doc_id, lat, lon), the column ``cell_trunc0`` — the cell ID
    with all position bits below round ``8 - required_rounds(max_level)``
    zero and NO trailing bit yet. Apply :func:`truncate_sql` for any
    level <= max_level.
    """
    return f"""lut(k, v) AS (VALUES {lookup_pos_values()}),
s2xyz AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS x,
    cos(radians(lat)) * sin(radians(lon)) AS y,
    sin(radians(lat)) AS z
  FROM {source}
),
s2axis AS (
  SELECT doc_id, x, y, z,
    CASE WHEN abs(x) >= abs(y)
         THEN CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END
         ELSE CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END END AS axis
  FROM s2xyz
),
s2face AS (
  SELECT doc_id, x, y, z,
    CASE WHEN (CASE axis WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
         THEN axis + 3 ELSE axis END AS face
  FROM s2axis
),
s2uv AS (
  SELECT doc_id, face,
    (CASE WHEN face IN (1, 2, 5) THEN -1.0e0 ELSE 1.0e0 END)
      * (CASE WHEN face IN (1, 2) THEN x WHEN face IN (0, 5) THEN y ELSE z END)
      / (CASE face % 3 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) AS u,
    (CASE WHEN face IN (2, 4, 5) THEN -1.0e0 ELSE 1.0e0 END)
      * (CASE WHEN face < 2 THEN z WHEN face < 4 THEN y ELSE x END)
      / (CASE face % 3 WHEN 0 THEN x WHEN 1 THEN y ELSE z END) AS v
  FROM s2face
),
s2st AS (
  SELECT doc_id, face,
    CASE WHEN u >= 0.0e0 THEN 0.5e0 * sqrt(1.0e0 + 3.0e0 * u)
         ELSE 1.0e0 - 0.5e0 * sqrt(1.0e0 - 3.0e0 * u) END AS s,
    CASE WHEN v >= 0.0e0 THEN 0.5e0 * sqrt(1.0e0 + 3.0e0 * v)
         ELSE 1.0e0 - 0.5e0 * sqrt(1.0e0 - 3.0e0 * v) END AS t
  FROM s2uv
),
s2ij AS (
  SELECT doc_id, face,
    CAST(least(1073741823.0e0, greatest(0.0e0, floor(1073741824.0e0 * s))) AS BIGINT) AS i,
    CAST(least(1073741823.0e0, greatest(0.0e0, floor(1073741824.0e0 * t))) AS BIGINT) AS j
  FROM s2st
),
{encode_rounds_ctes("s2ij", max_level)}"""


def truncate_sql(level: int, col: str = "cell_trunc0") -> str:
    """Level-`level` cell ID from the round-truncated bits: set the
    trailing bit and clear everything below (s2cell/s2cell.py:1035)."""
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return f"(({col} & -{lsb}) | {lsb})"


def token_sql(cell: str) -> str:
    """cell ID -> canonical token, nonzero input (s2cell/s2cell.py:552-580)."""
    return f"regexp_replace(lpad(lower(to_hex({cell})), 16, '0'), '0+$', '')"


def flip_sortable_sql(cell: str) -> str:
    """Order-preserving sortable form: flip the sign bit (SURVEY.md §1.2)."""
    return f"xor({cell}, {-(1 << 63)})"


def lookup_ij_values() -> str:
    """The inverse (LOOKUP_IJ) table as a SQL VALUES body."""
    return ", ".join(f"({k},{int(v)})" for k, v in enumerate(kernels.LOOKUP_IJ))


def decode_cte(source: str = "cells", cell_col: str = "cell_id") -> str:
    """CTE chain ``lutij, ..., s2dec`` computing, per row of `source`
    (needs doc_id and a valid `cell_col` BIGINT), the cell-CENTER
    ``lat``/``lon`` in degrees — the full inverse pipeline
    (s2cell/s2cell.py:708-771): 8 inverse lookup rounds -> Si/Ti with
    leaf/parity center correction -> quadratic ST->UV -> XYZ -> atan2.

    Arithmetic notes: `>>` on negative BIGINT is an arithmetic shift, but
    every shift here is immediately masked, so sign-extension bits never
    survive; i/j accumulate below 2^30 so all sums stay in range.
    """
    rounds = []
    prev = source
    prev_orient = f"(({cell_col} >> 61) & 1)"
    prev_i, prev_j = "0", "0"
    for k in range(7, -1, -1):
        mask = 15 if k == 7 else 255
        rounds.append(
            f"s2d{k} AS (\n"
            f"  SELECT doc_id, {cell_col},\n"
            f"    lutij.v AS b{k},\n"
            f"    {prev_i} + ((CAST(lutij.v AS BIGINT) >> 6) << {4 * k}) AS i{k},\n"
            f"    {prev_j} + (((CAST(lutij.v AS BIGINT) >> 2) & 15) << {4 * k}) AS j{k}\n"
            f"  FROM {prev} JOIN lutij\n"
            f"    ON lutij.k = {prev_orient} + ((({cell_col} >> {k * 8 + 1}) & {mask}) << 2)\n"
            f")"
        )
        prev = f"s2d{k}"
        prev_orient = f"(b{k} & 3)"
        prev_i, prev_j = f"i{k}", f"j{k}"
    rounds_sql = ",\n".join(rounds)

    return f"""lutij(k, v) AS (VALUES {lookup_ij_values()}),
{rounds_sql},
s2sit AS (
  SELECT doc_id, {cell_col},
    ({cell_col} >> 61) & 7 AS face,
    2 * i0 + (CASE WHEN ({cell_col} & 1) = 1 THEN 1
                   WHEN (xor(i0, {cell_col} >> 2) & 1) = 1 THEN 2 ELSE 0 END) AS si,
    2 * j0 + (CASE WHEN ({cell_col} & 1) = 1 THEN 1
                   WHEN (xor(i0, {cell_col} >> 2) & 1) = 1 THEN 2 ELSE 0 END) AS ti
  FROM s2d0
),
s2uvd AS (
  SELECT doc_id, face,
    CASE WHEN (1.0e0 / 2147483648.0e0) * CAST(si AS DOUBLE) >= 0.5e0
         THEN (1.0e0 / 3.0e0) * (4.0e0 * ((1.0e0 / 2147483648.0e0) * CAST(si AS DOUBLE)) * ((1.0e0 / 2147483648.0e0) * CAST(si AS DOUBLE)) - 1.0e0)
         ELSE (1.0e0 / 3.0e0) * (1.0e0 - 4.0e0 * (1.0e0 - (1.0e0 / 2147483648.0e0) * CAST(si AS DOUBLE)) * (1.0e0 - (1.0e0 / 2147483648.0e0) * CAST(si AS DOUBLE))) END AS u,
    CASE WHEN (1.0e0 / 2147483648.0e0) * CAST(ti AS DOUBLE) >= 0.5e0
         THEN (1.0e0 / 3.0e0) * (4.0e0 * ((1.0e0 / 2147483648.0e0) * CAST(ti AS DOUBLE)) * ((1.0e0 / 2147483648.0e0) * CAST(ti AS DOUBLE)) - 1.0e0)
         ELSE (1.0e0 / 3.0e0) * (1.0e0 - 4.0e0 * (1.0e0 - (1.0e0 / 2147483648.0e0) * CAST(ti AS DOUBLE)) * (1.0e0 - (1.0e0 / 2147483648.0e0) * CAST(ti AS DOUBLE))) END AS v
  FROM s2sit
),
s2xyzd AS (
  SELECT doc_id,
    CASE face WHEN 0 THEN 1.0e0 WHEN 1 THEN -u WHEN 2 THEN -u WHEN 3 THEN -1.0e0 WHEN 4 THEN v ELSE v END AS x,
    CASE face WHEN 0 THEN u WHEN 1 THEN 1.0e0 WHEN 2 THEN -v WHEN 3 THEN -v WHEN 4 THEN -1.0e0 ELSE u END AS y,
    CASE face WHEN 0 THEN v WHEN 1 THEN v WHEN 2 THEN 1.0e0 WHEN 3 THEN -u WHEN 4 THEN -u ELSE -1.0e0 END AS z
  FROM s2uvd
),
s2dec AS (
  SELECT doc_id,
    degrees(atan2(z, sqrt(x * x + y * y))) AS lat,
    degrees(atan2(y, x)) AS lon
  FROM s2xyzd
)"""
