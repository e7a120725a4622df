"""Poseidon verification machine: constraints enforce the permutation, the
STARK proves correct hash evaluation (the C12-style custom-gate building
block for recursion)."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.models import poseidon_vm, gadgets
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
from pil2_stark_tpu.hash import poseidon_gl
from pil2_stark_tpu.field import gl64

N_BITS = 6
N = 1 << N_BITS  # 2 permutations


@pytest.fixture(scope="module")
def vm():
    pil = pil1_parser.compile_pil_source(poseidon_vm.pil_source(N_BITS))
    pil["name"] = "PoseidonVM"
    const_cols = witness.generate_fixed_cols(pil["references"], N)
    poseidon_vm.build_globals(N, const_cols.Global)
    poseidon_vm.build_constants(N, const_cols.PoseidonVM)
    cm_cols = witness.generate_wtns_cols(pil["references"], N)
    rng = np.random.default_rng(3)
    inputs = rng.integers(0, gl64.P_INT, size=(N // 32, 12), dtype=np.uint64)
    outs = poseidon_vm.execute(N, cm_cols.PoseidonVM, inputs)
    return pil, const_cols, cm_cols, inputs, outs


def test_vm_trace_matches_oracle(vm):
    _, _, _, inputs, outs = vm
    want = poseidon_gl.permute(inputs)
    np.testing.assert_array_equal(outs, want)


def test_vm_constraints_hold(vm):
    pil, const_cols, cm_cols, _, _ = vm
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], const_cols.buffer, None,
        (cm_cols.buffer, []), debug=True,
    )
    assert errors == [], errors[:3]


def test_vm_rejects_tampered_hash(vm):
    pil, const_cols, cm_cols, _, _ = vm
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    bad = cm_cols.buffer.copy()
    bad[7, 0] ^= np.uint64(1)  # corrupt a mid-trace state element
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], const_cols.buffer, None,
        (bad, []), debug=True,
    )
    assert errors


def test_vm_prove_verify(vm):
    pil, const_cols, cm_cols, _, _ = vm
    ss = gadgets.stark_struct(N_BITS, N_BITS + 3)
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, []),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
