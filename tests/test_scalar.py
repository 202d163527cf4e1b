"""Drop-in parity: s2cell_spark.scalar vs the reference library.

A reference user must be able to change one import and keep identical
behavior — outputs AND exception types/messages (the reference's own
tests match messages verbatim, so we do too).
"""

from __future__ import annotations

import numpy as np
import pytest

from s2cell_spark import scalar as S


@pytest.fixture(scope="module")
def ref():
    import sys

    sys.path.insert(0, "/root/reference")
    import s2cell

    return s2cell


def test_output_parity_fuzz(ref):
    rng = np.random.default_rng(123)
    for _ in range(200):
        lat = float(rng.uniform(-89.9, 89.9))
        lon = float(rng.uniform(-180.0, 180.0))
        level = int(rng.integers(0, 31))
        cid = S.lat_lon_to_cell_id(lat, lon, level)
        assert cid == ref.lat_lon_to_cell_id(lat, lon, level)
        assert S.cell_id_to_token(cid) == ref.cell_id_to_token(cid)
        assert S.cell_id_to_level(cid) == ref.cell_id_to_level(cid)
        assert S.cell_id_to_lat_lon(cid) == pytest.approx(
            ref.cell_id_to_lat_lon(cid), abs=1e-12
        )
        assert S.lat_lon_to_token(lat, lon, level) == ref.lat_lon_to_token(lat, lon, level)
        assert S.s2_cell_id_to_face_ij(cid) == ref.s2_cell_id_to_face_ij(cid)
        if level > 0:
            assert S.cell_id_to_parent_cell_id(cid) == ref.cell_id_to_parent_cell_id(cid)
            pl = int(rng.integers(0, level + 1))
            assert S.cell_id_to_parent_cell_id(cid, pl) == ref.cell_id_to_parent_cell_id(cid, pl)
        assert S.cell_id_to_neighbor_cell_ids(cid) == ref.cell_id_to_neighbor_cell_ids(cid)
        assert S.cell_id_to_neighbor_cell_ids(
            cid, edge=True, corner=True
        ) == ref.cell_id_to_neighbor_cell_ids(cid, edge=True, corner=True)


@pytest.mark.parametrize(
    "tok",
    ["x", "X", "2ef", "2ef059", "89c25", "ABC", " 04x", "", "zzz", "0", "2ef0590000000000"],
)
def test_token_behavior_parity(ref, tok):
    for fn in ("token_is_valid", "token_to_canonical_token"):
        try:
            want = getattr(ref, fn)(tok)
            err = None
        except Exception as e:  # noqa: BLE001
            want, err = None, e
        if err is None:
            assert getattr(S, fn)(tok) == want, (fn, tok)
        else:
            with pytest.raises(type(err)):
                getattr(S, fn)(tok)


@pytest.mark.parametrize(
    "call",
    [
        lambda m: m.lat_lon_to_cell_id(0.0, 0.0, 31),
        lambda m: m.lat_lon_to_cell_id(0.0, 0.0, -1),
        lambda m: m.lat_lon_to_cell_id(0.0, 0.0, 1.5),
        lambda m: m.cell_id_to_token("nope"),
        lambda m: m.cell_id_to_token(1.5),
        lambda m: m.token_to_cell_id(17 * "f"),
        lambda m: m.token_to_cell_id(123),
        lambda m: m.cell_id_to_lat_lon(0),
        lambda m: m.cell_id_to_lat_lon(6),  # odd trailing-bit position
        lambda m: m.cell_id_to_level(0),
        lambda m: m.cell_id_to_level("x"),
        lambda m: m.token_to_level("zz"),
        lambda m: m.token_to_lat_lon("zz"),
        lambda m: m.cell_id_to_parent_cell_id(1 << 61),  # level 0 cell, no parent
        lambda m: m.cell_id_to_parent_cell_id((1 << 61) | (1 << 58), 31),
        lambda m: m.cell_id_to_parent_cell_id((1 << 61) | (1 << 58), 5),  # deeper than cell
        lambda m: m.cell_id_to_neighbor_cell_ids(6),
        lambda m: m.token_is_valid(5),
        lambda m: m.token_to_parent_token("zz"),
    ],
)
def test_error_parity(ref, call):
    """Same exception TYPE NAME and message as the reference for every
    documented error path (cross-module, so compare by name/str)."""
    with pytest.raises(Exception) as ref_err:
        call(ref)
    with pytest.raises(Exception) as our_err:
        call(S)
    assert type(our_err.value).__name__ == type(ref_err.value).__name__
    assert str(our_err.value) == str(ref_err.value)


def test_face_ij_bad_level_raises_valueerror(ref):
    """Both raise ValueError for an out-of-range level; the reference's
    message is an incidental internal ('negative shift count') while ours
    validates explicitly — type parity only on this undocumented path."""
    with pytest.raises(ValueError):
        ref.s2_face_ij_to_cell_id(0, 0, 0, 77)
    with pytest.raises(ValueError):
        S.s2_face_ij_to_cell_id(0, 0, 0, 77)


def test_reference_quirk_parity_out_of_domain_ints(ref):
    """The reference's pure-int validity accepts some out-of-uint64 ints
    (e.g. -1); the drop-in must agree, not 'fix' it."""
    for weird in (-1, -2, 1 << 64, (1 << 64) | 1):
        assert S.cell_id_is_valid(weird) == ref.cell_id_is_valid(weird), weird
