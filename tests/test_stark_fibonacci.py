"""End-to-end STARK: fibonacci state machine.

Mirrors /root/reference/test/stark/stark_fibonacci.test.js: debug constraint
check → setup → prove → verify; plus negative tests (corrupted proof /
wrong publics must fail)."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier


@pytest.fixture(scope="module")
def fib_pols():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    return pil, const_cols, cm_cols, publics


def test_debug_constraint_check(fib_pols):
    pil, const_cols, cm_cols, publics = fib_pols
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        const_cols.buffer,
        None,
        (cm_cols.buffer, publics),
        debug=True,
    )
    assert errors == []


def test_debug_constraint_check_fails_on_bad_witness(fib_pols):
    pil, const_cols, cm_cols, publics = fib_pols
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    bad = cm_cols.buffer.copy()
    bad[5, 0] ^= np.uint64(1)
    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        const_cols.buffer,
        None,
        (bad, publics),
        debug=True,
    )
    assert errors


@pytest.fixture(scope="module")
def fib_proof(fib_pols):
    pil, const_cols, cm_cols, publics = fib_pols
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"],
        s["expressionsInfo"],
        const_cols.buffer,
        s["constTree"],
        (cm_cols.buffer, publics),
    )
    return s, res


def test_prove_and_verify(fib_proof):
    s, res = fib_proof
    ok = verifier.verify(
        res["proof"],
        res["publics"],
        s["constRoot"],
        s["starkInfo"],
        s["verifierInfo"],
    )
    assert ok is True


def test_verify_with_prover_challenges(fib_proof):
    s, res = fib_proof
    ok = verifier.verify(
        res["proof"],
        res["publics"],
        s["constRoot"],
        s["starkInfo"],
        s["verifierInfo"],
        challenges=(res["challenges"], res["challengesFRISteps"]),
    )
    assert ok is True


def test_verify_rejects_wrong_publics(fib_proof):
    s, res = fib_proof
    bad = list(res["publics"])
    bad[2] = (bad[2] + 1) % 0xFFFFFFFF00000001
    assert (
        verifier.verify(
            res["proof"], bad, s["constRoot"], s["starkInfo"], s["verifierInfo"]
        )
        is False
    )


def test_verify_rejects_corrupted_eval(fib_proof):
    s, res = fib_proof
    import copy

    proof = copy.deepcopy(res["proof"])
    e0 = list(proof["evals"][0])
    e0[0] = (e0[0] + 1) % 0xFFFFFFFF00000001
    proof["evals"][0] = tuple(e0)
    assert (
        verifier.verify(
            proof, res["publics"], s["constRoot"], s["starkInfo"], s["verifierInfo"]
        )
        is False
    )


def test_split_linear_hash_e2e(fib_pols):
    """splitLinearHash (the 'GPU' two-level leaf layout) through a full
    prove+verify (stark_gen_helpers.js:85-93 path)."""
    pil, const_cols, cm_cols, publics = fib_pols
    ss = dict(fibonacci.STARK_STRUCT)
    ss["splitLinearHash"] = True
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )


def test_profile_dir_capture(fib_pols, tmp_path):
    """prove(profile_dir=...) captures a jax.profiler (xprof) trace and
    still produces a verifying proof (SURVEY.md §5 tracing subsystem)."""
    import os

    pil, const_cols, cm_cols, publics = fib_pols
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    pdir = str(tmp_path / "trace")
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer,
        s["constTree"], (cm_cols.buffer, publics), profile_dir=pdir,
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
    captured = [
        os.path.join(root, f)
        for root, _, fs in os.walk(pdir) for f in fs
    ]
    assert any(f.endswith(".xplane.pb") for f in captured), captured
    assert res["timings"]
