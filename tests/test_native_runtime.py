"""Native C++ runtime vs numpy oracle (and the reference golden digests)."""
import numpy as np
import pytest

from pil2_stark_tpu.runtime import native
from pil2_stark_tpu.field import gl64
from pil2_stark_tpu.hash import poseidon_gl, linearhash

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)

P = gl64.P_INT


def test_native_gl_ops():
    rng = np.random.default_rng(0)
    a = rng.integers(0, P, size=1000, dtype=np.uint64)
    b = rng.integers(0, P, size=1000, dtype=np.uint64)
    np.testing.assert_array_equal(native.gl64_mul(a, b), gl64.mul(a, b))
    np.testing.assert_array_equal(native.gl64_add(a, b), gl64.add(a, b))


def test_native_poseidon_golden():
    state = np.arange(12, dtype=np.uint64)[None, :]
    out = native.poseidon_permute(state)[0, :4]
    assert [int(x) for x in out] == [
        0xD64E1E3EFC5B8E9E,
        0x53666633020AAA47,
        0xD40285597C6A8825,
        0x613A4F81E81231D2,
    ]


def test_native_poseidon_batch():
    rng = np.random.default_rng(1)
    states = rng.integers(0, P, size=(33, 12), dtype=np.uint64)
    np.testing.assert_array_equal(
        native.poseidon_permute(states), poseidon_gl.permute(states)
    )


@pytest.mark.parametrize("width", [2, 4, 5, 9, 23])
def test_native_linear_hash(width):
    rng = np.random.default_rng(width)
    rows = rng.integers(0, P, size=(16, width), dtype=np.uint64)
    np.testing.assert_array_equal(
        native.linear_hash(rows), linearhash.linear_hash(rows)
    )


def test_native_merkle_level():
    rng = np.random.default_rng(7)
    level = rng.integers(0, P, size=(8, 4), dtype=np.uint64)
    want = poseidon_gl.hash_n(level.reshape(4, 8))
    np.testing.assert_array_equal(native.merkle_level(level), want)
