"""Pallas Poseidon kernel vs oracle (interpret mode on CPU) + golden digest."""
import numpy as np
import pytest

from pil2_stark_tpu.hash import poseidon_gl, pallas_poseidon

P = 0xFFFFFFFF00000001


def test_pallas_poseidon_matches_oracle():
    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(20, 12), dtype=np.uint64)
    want = poseidon_gl.permute(states)
    got = pallas_poseidon.permute_pallas_u64(states)
    np.testing.assert_array_equal(got, want)


def test_pallas_poseidon_golden():
    state = np.arange(12, dtype=np.uint64)[None, :]
    out = pallas_poseidon.permute_pallas_u64(state)[0, :4]
    assert [int(x) for x in out] == [
        0xD64E1E3EFC5B8E9E,
        0x53666633020AAA47,
        0xD40285597C6A8825,
        0x613A4F81E81231D2,
    ]
