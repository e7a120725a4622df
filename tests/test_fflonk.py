"""pil-fflonk tier E2E: fibonacci over BN254-Fr.

Mirrors the reference's pil-fflonk chain (main_fflonkinfo → fflonk_setup
→ fflonk_prover → fflonk_verify, /root/reference/src/fflonk/): debug
constraint check, setup, prove, verify, plus negative tests.
"""
import random

import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.fflonk.prover import fflonk_prove
from pil2_stark_tpu.fflonk.shkey import fflonk_setup, verification_key
from pil2_stark_tpu.fflonk.verifier import fflonk_verify
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.ops.fft_bn128 import FR
from pil2_stark_tpu.protocol.shplonk import dev_ptau

N_BITS = 4
N = 1 << N_BITS


@pytest.fixture(scope="module")
def fib_fr():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(N_BITS))
    pil["name"] = "Fibonacci"
    info = pilinfo.pil_info(pil, stark=False)
    fflonk_info = info["pilInfo"]
    assert fflonk_info["pilPower"] == N_BITS
    assert fflonk_info["nBitsZK"] >= 1

    # constants: L1, LLAST lagrangians
    const_names = [p["name"] for p in fflonk_info["constPolsMap"]]
    const_pols = [[0] * len(const_names) for _ in range(N)]
    const_pols[0][const_names.index("Fibonacci.L1")] = 1
    const_pols[N - 1][const_names.index("Fibonacci.LLAST")] = 1

    # witness over Fr
    cm_names = [p["name"] for p in fflonk_info["cmPolsMap"]
                if p["stage"] == 1]
    l1 = [0] * N
    l2 = [0] * N
    l2[0], l1[0] = 1, 2
    for i in range(1, N):
        l2[i] = l1[i - 1]
        l1[i] = (l1[i - 1] ** 2 + l2[i - 1] ** 2) % FR
    cm1 = np.empty((N, len(cm_names)), dtype=object)
    cm1[:, cm_names.index("Fibonacci.l1")] = l1
    cm1[:, cm_names.index("Fibonacci.l2")] = l2
    publics = [1, 2, l1[N - 1]]

    ptau = dev_ptau(4 * (N + 4) + 8 * N, tau=12345)
    zkey = fflonk_setup(const_pols, fflonk_info, ptau)
    return info, zkey, ptau, cm1, publics


def test_debug_constraint_check(fib_fr):
    info, zkey, ptau, cm1, publics = fib_fr
    errors = fflonk_prove(
        zkey, ptau, info["pilInfo"], info["expressionsInfo"], cm1, publics,
        debug=True,
    )
    assert errors == []


def test_debug_catches_bad_witness(fib_fr):
    info, zkey, ptau, cm1, publics = fib_fr
    bad = cm1.copy()
    bad[5, 0] = (int(bad[5, 0]) + 1) % FR
    errors = fflonk_prove(
        zkey, ptau, info["pilInfo"], info["expressionsInfo"], bad, publics,
        debug=True,
    )
    assert errors


@pytest.fixture(scope="module")
def fib_fr_proof(fib_fr):
    info, zkey, ptau, cm1, publics = fib_fr
    res = fflonk_prove(
        zkey, ptau, info["pilInfo"], info["expressionsInfo"], cm1, publics,
        rng=random.Random(99),
    )
    return res


def test_prove_verify(fib_fr, fib_fr_proof):
    info, zkey, ptau, cm1, publics = fib_fr
    vk = verification_key(zkey, info["pilInfo"])
    ok = fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"],
        fib_fr_proof["proof"], fib_fr_proof["publics"],
    )
    assert ok is True


def test_verify_rejects_wrong_publics(fib_fr, fib_fr_proof):
    info, zkey, ptau, cm1, publics = fib_fr
    vk = verification_key(zkey, info["pilInfo"])
    bad = list(fib_fr_proof["publics"])
    bad[2] = (bad[2] + 1) % FR
    assert not fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], fib_fr_proof["proof"], bad,
    )


def test_verify_rejects_tampered_evaluation(fib_fr, fib_fr_proof):
    info, zkey, ptau, cm1, publics = fib_fr
    vk = verification_key(zkey, info["pilInfo"])
    proof = {
        "polynomials": dict(fib_fr_proof["proof"]["polynomials"]),
        "evaluations": dict(fib_fr_proof["proof"]["evaluations"]),
    }
    name = next(k for k in proof["evaluations"] if k not in ("inv", "invZh"))
    proof["evaluations"][name] = (proof["evaluations"][name] + 1) % FR
    assert not fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], proof,
        fib_fr_proof["publics"],
    )


def test_verify_rejects_tampered_commitment(fib_fr, fib_fr_proof):
    from pil2_stark_tpu.curve.bn254 import G1, g1_add

    info, zkey, ptau, cm1, publics = fib_fr
    vk = verification_key(zkey, info["pilInfo"])
    proof = {
        "polynomials": dict(fib_fr_proof["proof"]["polynomials"]),
        "evaluations": dict(fib_fr_proof["proof"]["evaluations"]),
    }
    key = next(k for k in proof["polynomials"] if k.startswith("f"))
    proof["polynomials"][key] = g1_add(proof["polynomials"][key], G1)
    assert not fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], proof,
        fib_fr_proof["publics"],
    )


def test_zk_blinding_changes_proof_not_outcome(fib_fr):
    info, zkey, ptau, cm1, publics = fib_fr
    res2 = fflonk_prove(
        zkey, ptau, info["pilInfo"], info["expressionsInfo"], cm1, publics,
        rng=random.Random(1234),
    )
    vk = verification_key(zkey, info["pilInfo"])
    assert fflonk_verify(
        vk, info["pilInfo"], info["verifierInfo"], res2["proof"], res2["publics"],
    ) is True


# ---------------------------------------------------------------------------
# search optimizer (search_optimizer.js): parameter selection by
# measured MSM:FFT cost ratio


def test_search_optimizer_cost_table():
    from pil2_stark_tpu.fflonk import search_optimizer as so

    table = so.fflonk_cost_table(3, 10, 6, 4, 10, 100.0)
    assert [d["degP"] for d in table] == list(range(3, 11))
    # blowup = floor(log2(degP - 2)) + 2 (search_optimizer.js:42)
    assert [d["blowup"] for d in table] == [2, 3, 3, 4, 4, 4, 4, 5]
    for d in table:
        assert d["cost"] == d["msm"] * 100.0 + d["fft"]
        assert d["degZ"] == d["degP"] - 1


def test_search_optimizer_picks_minimum_and_respects_ptau_ceiling():
    from pil2_stark_tpu.fflonk import search_optimizer as so

    # high ratio -> MSM dominates -> smallest msm count wins
    best = so.exhaustive_search_optimizer(6, n_intermediate=4, n_p=10,
                                          ratio=1e9)
    assert best["degP"] == 3
    # low ratio -> FFT dominates -> smallest blowup wins too (fft grows
    # with blowup); with zero intermediates cost ties break by order
    best = so.exhaustive_search_optimizer(6, n_intermediate=0, n_p=1,
                                          ratio=0.0)
    assert best["blowup"] == 2
    # infeasible: power beyond every ptau ceiling
    with pytest.raises(ValueError, match="feasible"):
        so.exhaustive_search_optimizer(28, n_intermediate=0, n_p=1, ratio=1.0)


def test_search_optimizer_measured_ratio():
    from pil2_stark_tpu.fflonk import search_optimizer as so

    ptau = dev_ptau(64, tau=5)
    ratio = so.ratio_msm_to_fft(ptau, 6, iterations=1)
    assert ratio > 0
    best = so.exhaustive_search_optimizer(6, n_intermediate=2, n_p=4,
                                          ptau=ptau, iterations=1)
    assert 3 <= best["degP"] <= 10
