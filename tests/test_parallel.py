"""Sharded (multi-chip) kernels vs single-device oracles, on the virtual
8-device CPU mesh (conftest.py)."""
import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from pil2_stark_tpu.field import jax_gl as gl
from pil2_stark_tpu.ops import ntt as ntt_ops
from pil2_stark_tpu.parallel import ntt_sharded, merkle_sharded
from pil2_stark_tpu.hash import merkle

P = 0xFFFFFFFF00000001


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("x",))


def test_sharded_ntt_matches_single(mesh):
    bits, cols = 8, 3
    rng = np.random.default_rng(0)
    x = rng.integers(0, P, size=(1 << bits, cols), dtype=np.uint64)
    want = ntt_ops.ntt_u64(x, bits)
    fn = ntt_sharded.make_sharded_ntt(bits, cols, mesh)
    got = gl.to_u64(fn(*gl.from_u64(x)))
    np.testing.assert_array_equal(got, want)


def test_sharded_lde_matches_single(mesh):
    bits, ext_bits, cols = 6, 8, 2
    rng = np.random.default_rng(1)
    x = rng.integers(0, P, size=(1 << bits, cols), dtype=np.uint64)
    want = ntt_ops.lde_u64(x, bits, ext_bits)
    fn = ntt_sharded.make_sharded_lde(bits, ext_bits, cols, mesh)
    got = gl.to_u64(fn(*gl.from_u64(x)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("width", [3, 9])
def test_sharded_merkle_root_matches_single(mesh, width):
    height = 256
    rng = np.random.default_rng(2)
    buff = rng.integers(0, P, size=(height, width), dtype=np.uint64)
    want = merkle.merkelize(buff, width, height).root
    fn = merkle_sharded.make_sharded_merkle_root(height, width, mesh)
    got = gl.to_u64(fn(*gl.from_u64(buff)))
    np.testing.assert_array_equal(got, want)
