"""Reference-CI-scale differential tests (slow-marked).

Mirrors the largest shapes the reference exercises on CI:
- block NTT / iNTT / interpolate at 2^18 rows x 5 cols vs the in-memory
  oracle (/root/reference/test/fft_p.test.js:121-229)
- parallel Merkle tree at 2^18 leaves x 10 cols: build + group-proof
  round trip (/root/reference/test/merklehash_p.test.js:79-100)

Runs on both CPU (suite default: 8-device virtual mesh env) and TPU
(JAX_PLATFORMS unset); scripts/scale_check.py remains the TPU throughput
harness, these are the correctness anchors wired into the suite.
"""
import numpy as np
import pytest

from pil2_stark_tpu.field import gl64
from pil2_stark_tpu.hash import merkle
from pil2_stark_tpu.ops import ntt

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def big_cols():
    rng = np.random.default_rng(0)
    return rng.integers(0, gl64.P_INT, (1 << 18, 5), dtype=np.uint64)


def test_ntt_2pow18_x5_vs_oracle(big_cols):
    bits = 18
    got = ntt.ntt_u64(big_cols, bits)
    want = ntt.ntt_host_u64(big_cols, bits)
    assert np.array_equal(got, want)


def test_intt_roundtrip_2pow18_x5(big_cols):
    bits = 18
    back = ntt.intt_u64(ntt.ntt_u64(big_cols, bits), bits)
    assert np.array_equal(back, big_cols)


def test_interpolate_2pow18_to_2pow19(big_cols):
    """LDE output == oracle iNTT -> coset scale -> zero-pad -> NTT
    (fft_p.js interpolate:187-297 semantics)."""
    bits = 18
    x = big_cols[:, :2]
    got = ntt.lde_u64(x, bits, bits + 1)
    coefs = ntt.ntt_host_u64(x, bits, inverse=True)
    shift_pows = gl64.powers(gl64.SHIFT_INT, 1 << bits)
    coefs = gl64.mul(coefs, shift_pows[:, None])
    padded = np.zeros((1 << (bits + 1), 2), dtype=np.uint64)
    padded[: 1 << bits] = coefs
    want = ntt.ntt_host_u64(padded, bits + 1)
    assert np.array_equal(got, want)


def test_merkle_2pow18_x10_build_and_proofs():
    h, w = 1 << 18, 10
    rng = np.random.default_rng(1)
    leaves = rng.integers(0, gl64.P_INT, (h, w), dtype=np.uint64)
    tree = merkle.merkelize(leaves, w, h)
    for idx in (0, 3, 12345, h - 1):
        values, proof = merkle.get_group_proof(tree, idx)
        assert np.array_equal(values, leaves[idx])
        assert merkle.verify_group_proof(tree.root, proof, idx, values)
    # corrupted value must fail
    bad = list(values)
    bad[0] = (int(bad[0]) + 1) % gl64.P_INT
    assert not merkle.verify_group_proof(tree.root, proof, h - 1, bad)
