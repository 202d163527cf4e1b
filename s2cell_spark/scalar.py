"""Drop-in scalar API matching the reference library's surface.

``from s2cell_spark import scalar as s2cell`` is call-compatible with
``import s2cell`` (aaliddell/s2cell v1.8.0): same function names,
signatures, return types, and exception behavior (`InvalidCellID`,
`InvalidToken`, `TypeError`/`ValueError` with the reference's messages —
verified against the reference library in tests/test_scalar.py). This is
the migration path for existing reference users; everything here
delegates to the vectorized numpy kernels (1-element batches) or to the
same trivial bit formulas the Catalyst exprs use — there is no third
implementation of the math.

Scalar parity citations: function-by-function against
``/root/reference/s2cell/s2cell.py`` (given as ``ref:<line>`` below).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np

from s2cell_spark import kernels as K

_MAX_LEVEL = 30
_POS_BITS = 61


class InvalidCellID(Exception):  # noqa: N818 - matches reference name, ref:26
    """The provided cell ID is invalid."""


class InvalidToken(Exception):  # noqa: N818 - matches reference name, ref:30
    """The provided token is invalid."""


def _check_cell_type(cell_id, message: str) -> None:
    if not isinstance(cell_id, int):
        raise TypeError(message.format(type(cell_id)))


def lat_lon_to_cell_id(lat: float, lon: float, level: int = 30) -> int:
    """degrees -> cell ID at `level` (ref:625-674)."""
    if not isinstance(level, int) or level < 0 or level > _MAX_LEVEL:
        raise ValueError('S2 level must be integer >= 0 and <= 30')
    out = K.lat_lon_to_cell_id(
        np.array([lat], dtype=np.float64), np.array([lon], dtype=np.float64), level
    )
    return int(out[0])


def lat_lon_to_token(lat: float, lon: float, level: int = 30) -> str:
    """degrees -> token at `level` (ref:677-701)."""
    return cell_id_to_token(lat_lon_to_cell_id(lat, lon, level))


def cell_id_to_lat_lon(cell_id: int) -> Tuple[float, float]:
    """cell ID -> (lat, lon) degrees of the CELL CENTER (ref:708-771)."""
    _check_cell_type(cell_id, 'Cannot decode S2 cell ID from type: {}')
    if not cell_id_is_valid(cell_id):
        raise InvalidCellID('Cannot decode invalid S2 cell ID: {}'.format(cell_id))
    lat, lon = K.cell_id_to_lat_lon(np.array([cell_id], dtype=np.uint64))
    return (float(lat[0]), float(lon[0]))


def token_to_lat_lon(token: str) -> Tuple[float, float]:
    """token -> (lat, lon) degrees of the cell center (ref:774-798).
    Type errors surface from token_is_valid ('Cannot check S2 token...'),
    matching the reference's call path — no pre-check here."""
    if not token_is_valid(token):
        raise InvalidToken('Cannot decode invalid S2 token: {}'.format(token))
    return cell_id_to_lat_lon(token_to_cell_id(token))


def cell_id_to_token(cell_id: int) -> str:
    """hex, trailing zeros stripped; 0 -> 'X' (ref:552-580)."""
    _check_cell_type(cell_id, 'Cannot convert S2 cell ID from type: {}')
    if cell_id == 0:
        return 'X'
    return '{:016x}'.format(cell_id).rstrip('0')


def token_to_cell_id(token: str) -> int:
    """token -> cell ID; 'x'/'X' -> 0 (ref:583-618)."""
    if not isinstance(token, str):
        raise TypeError('Cannot convert S2 token from type: {}'.format(type(token)))
    if len(token) > 16:
        raise InvalidToken('Cannot convert S2 token with length > 16 characters')
    if token in ('x', 'X'):
        return 0
    return int(token + '0' * (16 - len(token)), 16)


def cell_id_is_valid(cell_id: int) -> bool:
    """face <= 5, nonzero, trailing 1 at an even position (ref:844-879).
    Pure int bit math (unbounded), so out-of-uint64 quirks match too."""
    _check_cell_type(cell_id, 'Cannot decode S2 cell ID from type: {}')
    if cell_id == 0:
        return False
    if (cell_id >> _POS_BITS) > 5:
        return False
    lowest_set_bit = cell_id & (~cell_id + 1)
    return bool(lowest_set_bit & 0x1555555555555555)


def token_is_valid(token: str) -> bool:
    """hex-shape regex + contained-ID validity (ref:882-909)."""
    if not isinstance(token, str):
        raise TypeError('Cannot check S2 token with type: {}'.format(type(token)))
    if not re.match(r'^[0-9a-fA-F]{1,16}$', token):
        return False
    return cell_id_is_valid(token_to_cell_id(token))


def cell_id_to_level(cell_id: int) -> int:
    """level 0..30 from the trailing-one-bit position (ref:916-950)."""
    if not cell_id_is_valid(cell_id):
        raise InvalidCellID('Cannot decode invalid S2 cell ID: {}'.format(cell_id))
    lowest_set_bit = cell_id & (~cell_id + 1)
    return _MAX_LEVEL - (lowest_set_bit.bit_length() - 1) // 2


def token_to_level(token: str) -> int:
    """token -> level (ref:953-977); type errors via token_is_valid."""
    if not token_is_valid(token):
        raise InvalidToken('Cannot decode invalid S2 token: {}'.format(token))
    return cell_id_to_level(token_to_cell_id(token))


def cell_id_to_parent_cell_id(cell_id: int, level: Optional[int] = None) -> int:
    """ancestor via bit truncation; default = direct parent (ref:984-1038)."""
    if not cell_id_is_valid(cell_id):
        raise InvalidCellID('Cannot decode invalid S2 cell ID: {}'.format(cell_id))
    current_level = cell_id_to_level(cell_id)
    if level is None and current_level == 0:
        raise ValueError('Cannot get parent cell ID of a level 0 cell ID')
    if level is None:
        level = current_level - 1
    if not isinstance(level, int) or level < 0 or level > _MAX_LEVEL:
        raise ValueError('S2 level must be integer >= 0 and <= 30')
    if level > current_level:
        raise ValueError('Cannot get level {} parent cell ID of cell ID with level {}'.format(
            level, current_level
        ))
    if level == current_level:
        return cell_id
    lsb = 1 << (2 * (_MAX_LEVEL - level))
    return (cell_id & -lsb) | lsb


def token_to_parent_token(token: str, level: Optional[int] = None) -> str:
    """token -> parent token (ref:1041-1069); type errors via token_is_valid."""
    if not token_is_valid(token):
        raise InvalidToken('Cannot decode invalid S2 token: {}'.format(token))
    return cell_id_to_token(cell_id_to_parent_cell_id(token_to_cell_id(token), level))


def token_to_canonical_token(token: str) -> str:
    """lower, strip whitespace, strip trailing zeros; ''/'x' -> 'X'
    (ref:805-837)."""
    if not isinstance(token, str):
        raise TypeError('Cannot convert S2 token from type: {}'.format(type(token)))
    token = token.strip().lower().rstrip('0')
    if token in ('', 'x'):
        return 'X'
    return token


def cell_id_to_neighbor_cell_ids(
    cell_id: int, edge: bool = True, corner: bool = False
) -> List[int]:
    """edge/corner neighbors in down/right/up/left interleaved order,
    cube-corner candidates dropped (ref:1076-1143)."""
    if not cell_id_is_valid(cell_id):
        raise InvalidCellID('Cannot decode invalid S2 cell ID: {}'.format(cell_id))
    grid, valid, corner_flags = K.cell_id_to_neighbor_cell_ids_grid(
        np.array([cell_id], dtype=np.uint64)
    )
    out: List[int] = []
    for col in range(8):
        if not valid[0, col]:
            continue
        if (edge and not corner_flags[col]) or (corner and corner_flags[col]):
            out.append(int(grid[0, col]))
    return out


def s2_cell_id_to_face_ij(cell_id: int) -> Tuple[int, int, int]:
    """cell ID -> (face, i, j) leaf coordinates (ref:345-426; public since
    reference v1.8.0)."""
    if not cell_id_is_valid(cell_id):
        raise InvalidCellID('Cannot decode invalid S2 cell ID: {}'.format(cell_id))
    face, i, j = K.cell_id_to_face_ij(np.array([cell_id], dtype=np.uint64))
    return (int(face[0]), int(i[0]), int(j[0]))


def s2_face_ij_to_cell_id(face: int, i: int, j: int, level: int = 30) -> int:
    """(face, i, j) -> cell ID at `level` (ref:429-502)."""
    if not isinstance(level, int) or level < 0 or level > _MAX_LEVEL:
        raise ValueError('S2 level must be integer >= 0 and <= 30')
    out = K.face_ij_to_cell_id(
        np.array([face], dtype=np.uint64),
        np.array([i], dtype=np.uint64),
        np.array([j], dtype=np.uint64),
        level,
    )
    return int(out[0])


# -- private-surface parity shims -------------------------------------------
# The reference's own test suite imports two PRIVATE names
# (`from s2cell.s2cell import _S2_POS_BITS, _s2_face_uv_to_xyz`,
# reference tests/test_s2cell.py:23); tests/test_reference_suite.py runs
# that suite verbatim against this module, so expose them with identical
# behavior (ref:49 and ref:~117-160).

_S2_POS_BITS = _POS_BITS


def _s2_face_uv_to_xyz(face: int, uv: Tuple[float, float]) -> Tuple[float, float, float]:
    """face + (u, v) -> unnormalised XYZ; ValueError on face outside 0-5
    with the reference's message (ref docstring: 'Raises ValueError: If
    the face is not valid in range 0-5')."""
    if not isinstance(face, int) or face < 0 or face > 5:
        raise ValueError('Cannot convert UV to XYZ with invalid face: {}'.format(face))
    x, y, z = K.face_uv_to_xyz(
        np.array([face], dtype=np.uint64),
        np.array([uv[0]], dtype=np.float64),
        np.array([uv[1]], dtype=np.float64),
    )
    return (float(x[0]), float(y[0]), float(z[0]))
