"""Planar commit pipeline: bit-exactness of the lanes-are-rows layout.

The single-chip device prover keeps committed sections planar — (cols, N)
limb pairs — from witness upload through LDE, the Merkle leaf sponge, tree
levels and query gathers (zero transposes on the hot path; reference
layout is row-major per merklehash_p.js).  These tests pin every planar
building block against its row-major twin.
"""
import numpy as np
import pytest

from pil2_stark_tpu.field import jax_gl as gl
from pil2_stark_tpu.hash import jax_poseidon as jp
from pil2_stark_tpu.ops import ntt as ntt_ops
from pil2_stark_tpu.stark import device

P = 0xFFFFFFFF00000001


@pytest.mark.parametrize("H,W,split", [
    (64, 8, False), (32, 10, False), (48, 13, True), (16, 3, False),
    (33, 9, False), (64, 8, True),
])
def test_merkle_levels_planar_matches_rows(H, W, split):
    rng = np.random.default_rng(H * 100 + W)
    rows = rng.integers(0, P, size=(H, W), dtype=np.uint64)
    ref = jp.merkle_levels(gl.from_u64(rows), W, H, split=split)
    pl = jp.merkle_levels_planar(
        gl.from_u64(np.ascontiguousarray(rows.T)), W, H, split=split)
    assert len(ref) == len(pl)
    for r, p in zip(ref, pl):
        assert np.array_equal(np.asarray(r[0]), np.asarray(p[0]).T)
        assert np.array_equal(np.asarray(r[1]), np.asarray(p[1]).T)


def test_merkle_levels_planar_pallas_interpret():
    rng = np.random.default_rng(7)
    rows = rng.integers(0, P, size=(64, 8), dtype=np.uint64)
    old = jp._FORCE_PALLAS
    jp._FORCE_PALLAS = True
    try:
        ref = jp.merkle_levels(gl.from_u64(rows), 8, 64)
        pl = jp.merkle_levels_planar(
            gl.from_u64(np.ascontiguousarray(rows.T)), 8, 64)
    finally:
        jp._FORCE_PALLAS = old
    for r, p in zip(ref, pl):
        assert np.array_equal(np.asarray(r[0]), np.asarray(p[0]).T)
        assert np.array_equal(np.asarray(r[1]), np.asarray(p[1]).T)


@pytest.mark.parametrize("bits,ext_bits,cols", [(6, 9, 4), (5, 7, 1)])
def test_lde_planar_matches_rows(bits, ext_bits, cols):
    rng = np.random.default_rng(bits)
    x = rng.integers(0, P, size=(1 << bits, cols), dtype=np.uint64)
    ref = ntt_ops.lde(gl.from_u64(x), bits, ext_bits)
    pl = ntt_ops.lde_planar(
        gl.from_u64(np.ascontiguousarray(x.T)), bits, ext_bits)
    assert np.array_equal(np.asarray(ref[0]), np.asarray(pl[0]).T)
    assert np.array_equal(np.asarray(ref[1]), np.asarray(pl[1]).T)


def test_planar_tree_gathers_match_rows():
    rng = np.random.default_rng(3)
    H, W = 64, 9
    rows = rng.integers(0, P, size=(H, W), dtype=np.uint64)
    t_rows = device.merkelize(gl.from_u64(rows), W, H)
    t_pl = device.merkelize(
        gl.from_u64(np.ascontiguousarray(rows.T)), W, H, planar=True)
    assert np.array_equal(t_rows.root, t_pl.root)
    idxs = [0, 1, 17, 63, 32]
    a = device.gather_group_proofs(t_rows, idxs)
    b = device.gather_group_proofs(t_pl, idxs)
    for (va, pa), (vb, pb) in zip(a, b):
        assert np.array_equal(va, vb)
        for sa, sb in zip(pa, pb):
            assert np.array_equal(sa, sb)
    # mixed planar/row-major trees in ONE batched gather
    mixed = device.gather_group_proofs_multi([t_rows, t_pl], [idxs, idxs])
    for (va, pa), (vb, pb) in zip(mixed[0], mixed[1]):
        assert np.array_equal(va, vb)
