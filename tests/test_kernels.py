"""t1 — numpy kernels vs the reference C++-generated corpora and the
reference scalar library (fuzz oracle). Bit-exact for integer outputs,
abs<=1e-12 for decode lat/lon (same gate as the reference's own suite,
/root/reference/tests/test_s2cell.py:127).
"""

from __future__ import annotations

import numpy as np
import pytest

from s2cell_spark import kernels as K


def test_encode_corpus_bit_exact(encode_corpus):
    lat, lon, level, want_id, want_tok = encode_corpus
    got = K.lat_lon_to_cell_id(lat, lon, level)
    np.testing.assert_array_equal(got, want_id)
    got_tok = K.cell_id_to_token(got)
    assert (got_tok == want_tok).all()


def test_decode_corpus_tolerance(decode_corpus):
    cell_id, token, want_lat, want_lon, want_level = decode_corpus
    lat, lon = K.cell_id_to_lat_lon(cell_id)
    np.testing.assert_allclose(lat, want_lat, rtol=0, atol=1e-12)
    np.testing.assert_allclose(lon, want_lon, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(K.cell_id_to_level(cell_id), want_level)


def test_token_round_trip(decode_corpus):
    cell_id, token, *_ = decode_corpus
    toks = K.cell_id_to_token(cell_id)
    assert (toks == token).all()
    ids, ok = K.token_to_cell_id(toks)
    assert ok.all()
    np.testing.assert_array_equal(ids, cell_id)


def test_parent_chain_vs_reference(encode_corpus, ref_s2cell):
    lat, lon, level, cell_id, _ = encode_corpus
    rng = np.random.default_rng(7)
    idx = rng.choice(len(cell_id), 300, replace=False)
    ids = cell_id[idx]
    lvls = K.cell_id_to_level(ids)
    for target in (0, 3, 10, 22, 30):
        mask = lvls >= target
        got = K.cell_id_to_parent_cell_id(ids[mask], target)
        want = np.array(
            [ref_s2cell.cell_id_to_parent_cell_id(int(c), target) for c in ids[mask]],
            dtype=np.uint64,
        )
        np.testing.assert_array_equal(got, want)


def test_validity_truth_table():
    ids = np.array(
        [0, 1, 2, 3, 0b100 << 61, 5 << 61 | 1, 6 << 61 | 1, (1 << 60)],
        dtype=np.uint64,
    )
    got = K.cell_id_is_valid(ids)
    # 0 invalid; 1 valid (leaf face 0); 2 invalid (odd trailing pos);
    # 3 valid (lsb=1); face 6 invalid; 1<<60 valid (level 0 face 0).
    want = np.array([False, True, False, True, False, True, False, True])
    np.testing.assert_array_equal(got, want)


def test_validity_fuzz_vs_reference(ref_s2cell):
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    got = K.cell_id_is_valid(ids)
    want = np.array([ref_s2cell.cell_id_is_valid(int(c)) for c in ids])
    np.testing.assert_array_equal(got, want)


def test_encode_fuzz_vs_reference(ref_s2cell):
    rng = np.random.default_rng(13)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    level = rng.integers(0, 31, 2000)
    got = K.lat_lon_to_cell_id(lat, lon, level)
    want = np.array(
        [
            ref_s2cell.lat_lon_to_cell_id(float(a), float(o), int(l))
            for a, o, l in zip(lat, lon, level)
        ],
        dtype=np.uint64,
    )
    np.testing.assert_array_equal(got, want)


def test_decode_fuzz_vs_reference(ref_s2cell):
    # np.arctan2 may differ from libm atan2 by ~1 ulp; the binding gate is
    # the corpus tolerance abs<=1e-12 (reference tests/test_s2cell.py:127).
    rng = np.random.default_rng(17)
    lat = rng.uniform(-90, 90, 1000)
    lon = rng.uniform(-180, 180, 1000)
    level = rng.integers(0, 31, 1000)
    ids = K.lat_lon_to_cell_id(lat, lon, level)
    glat, glon = K.cell_id_to_lat_lon(ids)
    want = [ref_s2cell.cell_id_to_lat_lon(int(c)) for c in ids]
    np.testing.assert_allclose(glat, [w[0] for w in want], rtol=0, atol=1e-12)
    np.testing.assert_allclose(glon, [w[1] for w in want], rtol=0, atol=1e-12)


def test_neighbors_fuzz_vs_reference(ref_s2cell):
    rng = np.random.default_rng(19)
    lat = rng.uniform(-90, 90, 400)
    lon = rng.uniform(-180, 180, 400)
    level = rng.integers(0, 31, 400)
    ids = K.lat_lon_to_cell_id(lat, lon, level)
    # Include face-corner cells (cube corners drop the 4th corner neighbor).
    corner_ids = np.array(
        [
            ref_s2cell.s2_face_ij_to_cell_id(f, i, j, 30)
            for f in range(6)
            for (i, j) in ((0, 0), (0, K.MAX_SIZE - 1), (K.MAX_SIZE - 1, 0))
        ],
        dtype=np.uint64,
    )
    ids = np.concatenate([ids, corner_ids])
    grid, valid, corner_flags = K.cell_id_to_neighbor_cell_ids_grid(ids)
    for row, cid in enumerate(ids):
        for edge, corner in ((True, False), (True, True), (False, True)):
            want = ref_s2cell.cell_id_to_neighbor_cell_ids(
                int(cid), edge=edge, corner=corner
            )
            got = [
                int(grid[row, col])
                for col in range(8)
                if valid[row, col]
                and ((edge and not corner_flags[col]) or (corner and corner_flags[col]))
            ]
            assert got == want, (cid, edge, corner)


def test_range_min_max_containment(ref_s2cell):
    rng = np.random.default_rng(23)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    leaf = K.lat_lon_to_cell_id(lat, lon, 30)
    for lvl in (0, 5, 12, 29):
        parent = K.cell_id_to_parent_cell_id(leaf, lvl)
        lo = K.cell_id_range_min(parent)
        hi = K.cell_id_range_max(parent)
        assert ((lo <= leaf) & (leaf <= hi)).all()
        # parent truncation and range test agree
        assert (K.cell_id_to_parent_cell_id(leaf, lvl) == parent).all()


def test_canonical_token():
    toks = np.array(["3", "e66ef376f790adf8", "ABC0", " 5 ", "x", "X", "", "000"])
    got = K.token_to_canonical_token(toks)
    want = np.array(["3", "e66ef376f790adf8", "abc", "5", "X", "X", "X", "X"])
    np.testing.assert_array_equal(got, want)


def test_token_malformed():
    toks = np.array(["zzz", "12345678901234567", "", "abcg", "ABCDEF"])
    ids, ok = K.token_to_cell_id(toks)
    np.testing.assert_array_equal(ok, [False, False, False, False, True])
