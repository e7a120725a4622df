"""Poseidon-GL tests.

Golden digest vectors are the reference's hard-coded test constants
(/root/reference/test/poseidon.test.js:13-43) — the anchor for bit-exactness
of every hash downstream.  The JAX batched path is differential-tested
against the numpy oracle.
"""
import numpy as np
import pytest

from pil2_stark_tpu.field import gl64
from pil2_stark_tpu.hash import poseidon_gl, linearhash
from pil2_stark_tpu.hash import jax_poseidon

P = gl64.P_INT


GOLDEN = [
    # (inputs8, capacity4, expected4)
    (
        [0] * 8,
        None,
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4, 0xC71603F33A1144CA],
    ),
    (
        [0, 1, 2, 3, 4, 5, 6, 7],
        [8, 9, 10, 11],
        [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825, 0x613A4F81E81231D2],
    ),
    (
        [P - 1] * 8,
        [P - 1] * 4,
        [0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953, 0x95803A74F4530E82],
    ),
]


@pytest.mark.parametrize("inputs,capacity,expected", GOLDEN)
def test_poseidon_golden_numpy(inputs, capacity, expected):
    out = poseidon_gl.hash_n(
        np.array(inputs, dtype=np.uint64),
        None if capacity is None else np.array(capacity, dtype=np.uint64),
    )
    assert [int(x) for x in out] == expected


def test_poseidon_jax_matches_numpy_batch():
    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(64, 12), dtype=np.uint64)
    want = poseidon_gl.permute(states)
    got = jax_poseidon.permute_u64(states)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("inputs,capacity,expected", GOLDEN)
def test_poseidon_golden_jax(inputs, capacity, expected):
    state = np.array(
        inputs + (capacity if capacity is not None else [0, 0, 0, 0]),
        dtype=np.uint64,
    )[None, :]
    out = jax_poseidon.permute_u64(state)[0, :4]
    assert [int(x) for x in out] == expected


@pytest.mark.parametrize("width", [1, 3, 4, 5, 8, 9, 16, 23])
def test_linear_hash_jax_matches_numpy(width):
    rng = np.random.default_rng(width)
    rows = rng.integers(0, P, size=(17, width), dtype=np.uint64)
    want = linearhash.linear_hash(rows)
    got = jax_poseidon.linear_hash_u64(rows)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [3, 9, 16, 23, 40])
def test_linear_hash_split_jax_matches_numpy(width):
    rng = np.random.default_rng(width + 100)
    rows = rng.integers(0, P, size=(11, width), dtype=np.uint64)
    want = linearhash.linear_hash_split(rows)
    got = jax_poseidon.linear_hash_u64(rows, split=True)
    np.testing.assert_array_equal(got, want)


def test_linear_hash_width_le4_copies():
    rows = np.arange(8, dtype=np.uint64).reshape(2, 4)
    out = linearhash.linear_hash(rows)
    np.testing.assert_array_equal(out, rows)
