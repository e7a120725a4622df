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


def test_sharded_merkle_levels_match_single(mesh):
    """Full sharded tree build: every level bit-equal to the host tree
    (sharded levels are global arrays; tops replicated)."""
    height, width = 256, 5
    rng = np.random.default_rng(3)
    buff = rng.integers(0, P, size=(height, width), dtype=np.uint64)
    want = merkle.merkelize(buff, width, height, backend="np")
    build = merkle_sharded.make_sharded_merkle_levels(height, width, mesh)
    levels = build(*gl.from_u64(buff))
    assert len(levels) == len(want.levels)
    for k, (lv, ref) in enumerate(zip(levels, want.levels)):
        np.testing.assert_array_equal(gl.to_u64(lv), ref, err_msg=f"level {k}")


def test_sharded_prove_bit_equal(mesh):
    """Complete proof on the 8-device mesh == single-device host proof
    (VERDICT r1 item 4: prove() mesh integration, not just a commit step)."""
    from pil2_stark_tpu.compiler import pil1_parser
    from pil2_stark_tpu.models import fibonacci
    from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier

    n_bits = 6
    n = 1 << n_bits
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
    pil["name"] = "Fibonacci"
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)

    res_mesh = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer,
        s["constTree"], (cm_cols.buffer, publics), backend="device",
        mesh=mesh,
    )
    res_host = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer,
        s["constTree"], (cm_cols.buffer, publics), backend="numpy",
    )

    def canon(o):
        if isinstance(o, np.ndarray):
            return [canon(x) for x in o.tolist()]
        if isinstance(o, (list, tuple)):
            return [canon(x) for x in o]
        if isinstance(o, dict):
            return {k: canon(v) for k, v in o.items()}
        if isinstance(o, (int, np.integer)):
            return int(o)
        return o

    assert canon(res_mesh["proof"]) == canon(res_host["proof"])
    assert verifier.verify(
        res_mesh["proof"], res_mesh["publics"], s["constRoot"],
        s["starkInfo"], s["verifierInfo"],
    )
