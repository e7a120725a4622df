"""Pallas Poseidon kernel vs oracle + golden digest.

TPU-only: pallas interpret mode's tracing of this kernel wedges for tens of
minutes (and can crash) on the CPU runners with jax 0.9 — the kernel is the
TPU production path and is validated bit-exact against the oracle when a
real TPU is attached (scripts/ and bench runs do this on hardware)."""
import jax
import numpy as np
import pytest

from pil2_stark_tpu.hash import poseidon_gl, pallas_poseidon

P = 0xFFFFFFFF00000001

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="pallas interpret-mode tracing hangs on CPU (jax 0.9); "
    "kernel is TPU-only and checked on hardware",
)


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
