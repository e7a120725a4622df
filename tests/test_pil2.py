"""PIL2 pilout front-end: decode the reference's compiled pilout fixture
(test/state_machines/pil2/sm_fibv) and run a full E2E STARK on the Module
air — exercising the log-up gsum hint, subproofValue hint, negative row
offsets ('gsum), public values, and the hashCommits transcript variant."""
import json

import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil2_frontend as pf
from pil2_stark_tpu.compiler.pilinfo import pil_info
from pil2_stark_tpu.stark import prover, verifier
from pil2_stark_tpu.hash import merkle
from pil2_stark_tpu.ops import ntt as ntt_ops

PILOUT = "/root/reference/test/state_machines/pil2/sm_fibv/data/fibv.pilout"
STRUCTS = "/root/reference/test/state_machines/pil2/sm_fibv/data/fibv.starkstruct.json"
P = 0xFFFFFFFF00000001


def test_pilout_decode():
    pilout = pf.load_pilout(PILOUT)
    assert pilout["name"] == "myFirstPil"
    assert pilout["numChallenges"] == [0, 2]
    assert pilout["numPublicValues"] == 4
    assert [s["name"] for s in pilout["subproofs"]] == ["Module", "Fibonacci"]
    module = pilout["subproofs"][0]["airs"][0]
    assert module["numRows"] == 16
    assert module["stageWidths"] == [3, 1]
    fixed = pf.fixed_cols_array(module)
    assert fixed[0, 0] == 1 and fixed[1:, 0].sum() == 0  # L1


@pytest.fixture(scope="module")
def module_air():
    pilout = pf.load_pilout(PILOUT)
    pil = pf.select_air(pilout, 0, 0)
    ss = json.load(open(STRUCTS))["Module"]
    info = pil_info(pil, True, ss, pil2=True)
    return pil, ss, info


def _module_witness(n, mod):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1 << 31, size=n, dtype=np.uint64)
    q = x // np.uint64(mod)
    x_mod = x % np.uint64(mod)
    cm1 = np.zeros((n, 3), dtype=np.uint64)
    cm1[:, 0] = x
    cm1[:, 1] = q
    cm1[:, 2] = x_mod
    return cm1


def test_pil2_module_e2e(module_air):
    pil, ss, info = module_air
    n = pil["numRows"]
    mod = 101
    publics = [mod, 0, 0, 0]  # mod, in1, in2, out (fib publics unused here)
    cm1 = _module_witness(n, mod)

    const_pols = pf.fixed_cols_array(pil)
    ext = ntt_ops.lde_u64(const_pols, ss["nBits"], ss["nBitsExt"])
    const_tree = merkle.merkelize(ext, const_pols.shape[1], 1 << ss["nBitsExt"])

    res = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        const_pols,
        const_tree,
        (cm1, publics),
    )
    assert len(res["proof"]["subproofValues"]) == 1
    ok = verifier.verify(
        res["proof"],
        res["publics"],
        const_tree.root,
        info["pilInfo"],
        info["verifierInfo"],
    )
    assert ok is True

    bad = list(publics)
    bad[0] = mod + 1
    assert not verifier.verify(
        res["proof"], bad, const_tree.root, info["pilInfo"], info["verifierInfo"]
    )


def test_pil2_module_debug_check(module_air):
    pil, ss, info_full = module_air
    n = pil["numRows"]
    info = pil_info(pil, True, {}, {"debug": True}, pil2=True)
    cm1 = _module_witness(n, 101)
    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        pf.fixed_cols_array(pil),
        None,
        (cm1, [101, 0, 0, 0]),
        debug=True,
    )
    assert errors == [], errors[:2]

    # corrupt q -> constraint must fail
    bad = cm1.copy()
    bad[3, 1] += np.uint64(1)
    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        pf.fixed_cols_array(pil),
        None,
        (bad, [101, 0, 0, 0]),
        debug=True,
    )
    assert errors


def test_global_constraints():
    """vadcop cross-subproof constraint: gsum_fibonacci + gsum_module === 0
    (getGlobalConstraintsInfo + finalProof evaluation)."""
    from pil2_stark_tpu.stark.verifier import verify_global_constraints

    pilout = pf.load_pilout(PILOUT)
    codes = pf.get_global_constraints_info(pilout, stark=True)
    assert len(codes) == 1
    assert codes[0]["boundary"] == "finalProof"
    assert "gsum_fibonacci+gsum_module" in codes[0]["line"]

    v = (123456789, 42, 7)
    neg = tuple((-x) % P for x in v)
    ok = verify_global_constraints(codes, [[neg], [v]])
    assert ok == []

    bad = verify_global_constraints(codes, [[neg], [(1, 2, 3)]])
    assert bad and "global constraint" in bad[0]
