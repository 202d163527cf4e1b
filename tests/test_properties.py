"""Property-based kernel invariants (hypothesis).

The corpus tests pin EXACT reference bits on 111,600 fixed vectors; these
properties assert the algebra that must hold for EVERY input — the class
of bug a fixed corpus can miss (edge-of-domain floats, level boundaries,
adversarial IJ). All checks run on the vectorized kernels directly (no
Spark session — fast enough for hypothesis's example counts).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from s2cell_spark import kernels as K

lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
levels = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lats, lons, levels)
def test_encode_roundtrip_containment(lat, lon, level):
    """encode(p, L) is valid, has level L, and CONTAINS encode(p, 30)
    (the leaf refines every ancestor of the same point)."""
    cell = K.lat_lon_to_cell_id(np.array([lat]), np.array([lon]), level)
    leaf = K.lat_lon_to_cell_id(np.array([lat]), np.array([lon]), 30)
    assert K.cell_id_is_valid(cell).all()
    assert K.cell_id_to_level(cell)[0] == level
    lo = K.cell_id_range_min(cell)[0] ^ np.uint64(1 << 63)
    hi = K.cell_id_range_max(cell)[0] ^ np.uint64(1 << 63)
    ls = leaf[0] ^ np.uint64(1 << 63)
    assert lo <= ls <= hi


@settings(max_examples=200, deadline=None)
@given(lats, lons, levels)
def test_decode_center_reencodes_to_same_cell(lat, lon, level):
    """The decoded cell-center lat/lon re-encodes (at the same level) to
    the SAME cell — centers are interior points, never on a boundary."""
    cell = K.lat_lon_to_cell_id(np.array([lat]), np.array([lon]), level)
    clat, clon = K.cell_id_to_lat_lon(cell)
    back = K.lat_lon_to_cell_id(clat, clon, level)
    assert back[0] == cell[0]


@settings(max_examples=200, deadline=None)
@given(lats, lons, levels, levels)
def test_parent_is_prefix_monotone(lat, lon, la, lb):
    """parent(cell, min(la, lb)) == parent(parent(cell, max), min) — the
    ancestor chain is consistent under any truncation order."""
    lo_l, hi_l = min(la, lb), max(la, lb)
    cell = K.lat_lon_to_cell_id(np.array([lat]), np.array([lon]), 30)
    direct = K.cell_id_to_parent_cell_id(cell, lo_l)
    via = K.cell_id_to_parent_cell_id(K.cell_id_to_parent_cell_id(cell, hi_l), lo_l)
    assert direct[0] == via[0]


@settings(max_examples=200, deadline=None)
@given(lats, lons, levels)
def test_token_roundtrip_and_canonical_idempotent(lat, lon, level):
    cell = K.lat_lon_to_cell_id(np.array([lat]), np.array([lon]), level)
    tok = K.cell_id_to_token(cell)
    back, ok = K.token_to_cell_id(tok)
    assert ok.all() and back[0] == cell[0]
    canon = K.token_to_canonical_token(tok)
    assert (canon == tok).all()  # kernel tokens are already canonical
    assert (K.token_to_canonical_token(canon) == canon).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=(1 << 30) - 1),
       st.integers(min_value=0, max_value=(1 << 30) - 1), levels)
def test_face_ij_roundtrip(face, i, j, level):
    """face/IJ -> cell -> face/IJ preserves the level-truncated IJ prefix
    and the face exactly."""
    cell = K.face_ij_to_cell_id(
        np.array([face], dtype=np.uint64),
        np.array([i], dtype=np.uint64),
        np.array([j], dtype=np.uint64),
        level,
    )
    f2, i2, j2 = K.cell_id_to_face_ij(cell)
    assert f2[0] == face
    mask = ~np.uint64((1 << (30 - level)) - 1)
    assert i2[0] & mask == np.uint64(i) & mask
    assert j2[0] & mask == np.uint64(j) & mask


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_validity_never_crashes_and_gates_level(raw):
    """cell_id_is_valid must be total (no overflow on LONG_MIN etc.) and
    cell_id_to_level returns -1 exactly on invalid input."""
    arr = np.array([raw], dtype=np.int64).view(np.uint64)
    valid = K.cell_id_is_valid(arr)[0]
    lvl = K.cell_id_to_level(arr)[0]
    assert bool(valid) == (lvl >= 0)


@settings(max_examples=120, deadline=None)
@given(
    lo=st.integers(min_value=0, max_value=(6 << 60) - 2),
    span=st.integers(min_value=1, max_value=1 << 52),
)
def test_greedy_dyadic_decomposition_exact_and_maximal(lo, span):
    """cellunion._decompose_island on arbitrary leaf intervals: blocks
    exactly tile [lo, hi), are 4-ary aligned at their own size, and are
    MAXIMAL (no two adjacent blocks could merge into a bigger aligned
    block — the uniqueness argument for the normal form)."""
    from s2cell_spark.operators.cellunion import _decompose_island

    hi = min(lo + span, 6 << 60)
    ids = _decompose_island(lo, hi)
    pos = lo
    blocks = []
    for cid in ids:
        lsb = cid & -cid
        start = (cid - lsb) >> 1
        assert start == pos, "blocks must tile left-to-right without gaps"
        assert lsb & 0x5555555555555555, "size must be a power of 4"
        assert start % lsb == 0, "block must be aligned to its size"
        blocks.append((start, lsb))
        pos = start + lsb
    assert pos == hi, "blocks must end exactly at hi"
    # maximality (the greedy invariant): no emitted block could have been
    # 4x larger — the same-start 4x block is misaligned or overflows hi
    for start, size in blocks:
        big = size * 4
        if big > 1 << 60:
            continue  # face blocks are the ceiling
        assert start % big != 0 or start + big > hi, (start, size)


@settings(max_examples=60, deadline=None)
@given(
    qlat=st.floats(min_value=-89.9, max_value=89.9),
    qlon=st.floats(min_value=-180.0, max_value=180.0),
    radius=st.floats(min_value=0.05, max_value=40.0),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_cap_covering_superset_fuzz(qlat, qlon, radius, seed):
    """Randomized cap superset property: 300 random points inside each
    random cap land in a covering cell (complements the 6 fixed caps in
    test_operators)."""
    from s2cell_spark.operators.covering import cap_covering

    cov = cap_covering(qlat, qlon, radius, max_level=8)
    assert cov.size > 0
    rng = np.random.default_rng(seed)
    n = 300
    t = rng.uniform(0.0, 2.0 * np.pi, n)
    d = np.sqrt(rng.uniform(0.0, 1.0, n)) * radius
    phi1, lam1, delta = np.radians(qlat), np.radians(qlon), np.radians(d)
    phi2 = np.arcsin(
        np.sin(phi1) * np.cos(delta) + np.cos(phi1) * np.sin(delta) * np.cos(t)
    )
    lam2 = lam1 + np.arctan2(
        np.sin(t) * np.sin(delta) * np.cos(phi1),
        np.cos(delta) - np.sin(phi1) * np.sin(phi2),
    )
    lat = np.degrees(phi2)
    lon = (np.degrees(lam2) + 540.0) % 360.0 - 180.0
    leaf = K.lat_lon_to_cell_id(lat, lon, 30)
    lo = (K.cell_id_range_min(cov) ^ np.uint64(1 << 63)).view(np.int64)
    hi = (K.cell_id_range_max(cov) ^ np.uint64(1 << 63)).view(np.int64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    s = (leaf ^ np.uint64(1 << 63)).view(np.int64)
    pos = np.searchsorted(lo, s, side="right") - 1
    ok = (pos >= 0) & (s <= hi[np.clip(pos, 0, None)])
    assert ok.all()
