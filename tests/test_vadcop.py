"""Vadcop aggregation layer E2E.

1. Aggregate2 circuit (compiler/vadcop.py): TWO real fibonacci STARK
   proofs verified inside ONE aggregation circuit through the in-repo
   circom front-end, with run-time verification-key selection
   (SelectVerificationKey, /root/reference/circuits.gl/vadcop.circom:7-50)
   and enable gating (stark_verifier.circom.ejs:765-771) — a corrupted
   proof is rejected when live and ignored when its slot is null.
2. The aggregation circuit C12-compresses (the recursive2 tier shape).
3. Cross-subproof global constraints on REAL proofs: the two sm_fibv
   airs (Module + Fibonacci) proven under SHARED vadcop challenges
   (prove(external_challenges=...), main_prover.js --vadcopchallenges),
   verified with external challenges, and gsum_fibonacci + gsum_module
   === 0 checked over the proofs' actual subproof values.
"""
import copy
import json

import numpy as np
import pytest

from pil2_stark_tpu.compiler import (
    pil1_parser, circom_front as cf, compressor12, pilinfo, vadcop,
)
from pil2_stark_tpu.compiler import pil2_frontend as pf
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
from pil2_stark_tpu.stark.verifier import verify_global_constraints
from pil2_stark_tpu.utils import proof2zkin as p2z
from pil2_stark_tpu.hash import merkle
from pil2_stark_tpu.ops import ntt as ntt_ops

P = 0xFFFFFFFF00000001
PILOUT = "/root/reference/test/state_machines/pil2/sm_fibv/data/fibv.pilout"


def _fib_proof(inputs):
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, inputs)
    publics = list(inputs) + [out]
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    return s, res, zkin


@pytest.fixture(scope="module")
def agg():
    s, res_a, zkin_a = _fib_proof([1, 2])
    _, res_b, zkin_b = _fib_proof([3, 5])
    files = vadcop.emit_aggregation_files(
        s["constRoot"], s["starkInfo"], s["verifierInfo"], n_recursives1=1
    )
    root = [int(v) for v in s["constRoot"]]
    return s, files, zkin_a, zkin_b, root


def test_aggregate2_accepts_two_proofs(agg):
    s, files, zkin_a, zkin_b, root = agg
    zkin = vadcop.aggregate2_zkin(zkin_a, zkin_b, [0, 0, 0, 0], [root])
    cc = cf.compile_and_witness(files, "aggregate2.circom", zkin)
    assert cc.check()
    # aggregated publics pass through both sides
    pubs = [int(x) for x in cc.witness[1:7]]
    assert pubs == zkin_a["publics"] + zkin_b["publics"]


def test_aggregate2_rejects_live_corruption(agg):
    s, files, zkin_a, zkin_b, root = agg
    bad = dict(zkin_b)
    bad["evals"] = copy.deepcopy(zkin_b["evals"])
    bad["evals"][0][0] = (int(bad["evals"][0][0]) + 1) % P
    zkin = vadcop.aggregate2_zkin(zkin_a, bad, [0, 0, 0, 0], [root])
    # enable-gated checks land as R1CS constraints (enable is a signal, so
    # the witness calculator can't constant-fold the === into an assert):
    # rejection = either a witness-calc assert or a failing check()
    rejected = False
    try:
        cc = cf.compile_and_witness(files, "aggregate2.circom", zkin)
        rejected = not cc.check()
    except AssertionError:
        rejected = True
    assert rejected


def test_aggregate2_null_slot_gates_checks(agg):
    """The SAME corruption is ignored when slot B's circuit type is null
    (enable gating) — the core of the aggregation mux semantics."""
    s, files, zkin_a, zkin_b, root = agg
    bad = dict(zkin_b)
    bad["evals"] = copy.deepcopy(zkin_b["evals"])
    bad["evals"][0][0] = (int(bad["evals"][0][0]) + 1) % P
    zkin = vadcop.aggregate2_zkin(
        zkin_a, bad, [0, 0, 0, 0], [root], circuit_type_b=0
    )
    cc = cf.compile_and_witness(files, "aggregate2.circom", zkin)
    assert cc.check()


def test_aggregate2_rejects_unsupported_type(agg):
    s, files, zkin_a, zkin_b, root = agg
    zkin = vadcop.aggregate2_zkin(
        zkin_a, zkin_b, [0, 0, 0, 0], [root], circuit_type_b=7
    )
    with pytest.raises(AssertionError):
        cf.compile_and_witness(files, "aggregate2.circom", zkin)


@pytest.mark.slow
def test_aggregate2_c12_compress(agg):
    """The aggregation circuit compresses into the C12 machine (the
    recursive2 tier: aggregate -> compress -> next STARK)."""
    s, files, zkin_a, zkin_b, root = agg
    zkin = vadcop.aggregate2_zkin(zkin_a, zkin_b, [0, 0, 0, 0], [root])
    cc = cf.compile_and_witness(files, "aggregate2.circom", zkin)
    assert cc.check()
    setup12 = compressor12.setup(cc)
    cm = compressor12.exec_witness(
        cc.witness, setup12["plonkAdditions"], setup12["sMap"], setup12["nBits"]
    )
    c12_publics = [int(x) for x in cc.witness[1 : 1 + setup12["nPublics"]]]
    info = pilinfo.pil_info(setup12["pil"], True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], setup12["constBuffer"], None,
        (cm, c12_publics), debug=True,
    )
    assert errors == [], errors[:3]


# ---------------------------------------------------------------------------
# shared-challenge proving + cross-subproof global constraints


def _ext_challenges(rng, pil_info, ss):
    stages = []
    for stage in range(1, pil_info["nStages"] + 4):
        n = sum(1 for c in pil_info["challengesMap"] if c["stage"] == stage)
        stages.append([
            tuple(int(rng.integers(0, 1 << 63)) % P for _ in range(3)) for _ in range(n)
        ])
    fri = [
        tuple(int(rng.integers(0, 1 << 63)) % P for _ in range(3))
        for _ in range(len(ss["steps"]) + 1)
    ]
    return {"stages": stages, "friSteps": fri}


def _prove_air(pilout, sub_id, air_id, ss, cm1, publics, ext):
    pil = pf.select_air(pilout, sub_id, air_id)
    info = pilinfo.pil_info(pil, True, ss, pil2=True)
    const_pols = pf.fixed_cols_array(pil)
    ext_pols = ntt_ops.lde_u64(const_pols, ss["nBits"], ss["nBitsExt"])
    const_tree = merkle.merkelize(
        ext_pols, const_pols.shape[1], 1 << ss["nBitsExt"]
    )
    res = prover.prove(
        info["pilInfo"], info["expressionsInfo"], const_pols, const_tree,
        (cm1, publics), external_challenges=ext,
    )
    ok = verifier.verify(
        res["proof"], res["publics"], const_tree.root, info["pilInfo"],
        info["verifierInfo"],
        challenges=(res["challenges"], res["challengesFRISteps"]),
    )
    assert ok is True
    return res


def test_vadcop_global_constraints_real_proofs(tmp_path):
    """Prove BOTH subproofs of the fibv vadcop machine (models/fibv.py,
    the sound twin of the reference's sm_fibv fixture) under SHARED vadcop
    challenges, verify each with external challenges, and check
    gsum_fibonacci + gsum_module === 0 over the proofs' REAL subproof
    values (the finalProof global constraint)."""
    from pil2_stark_tpu.models import fibv

    # encode -> decode through the wire format (the pilout is data, not a
    # python object, to the rest of the pipeline)
    path = tmp_path / "fibv.pilout"
    path.write_bytes(pf.encode_pilout(fibv.build_pilout()))
    pilout = pf.load_pilout(str(path))

    cm_mod, cm_fib, publics = fibv.execute(101, 1, 2)

    # witnesses satisfy the airs (debug constraint check, both subproofs)
    for sub_id, cm in ((0, cm_mod), (1, cm_fib)):
        pil = pf.select_air(pilout, sub_id, 0)
        info = pilinfo.pil_info(pil, True, {}, {"debug": True}, pil2=True)
        errors = prover.prove(
            info["pilInfo"], info["expressionsInfo"], pf.fixed_cols_array(pil),
            None, (cm, publics), debug=True,
        )
        assert errors == [], errors[:3]

    rng = np.random.default_rng(7)
    pil_fib = pf.select_air(pilout, 1, 0)
    info_probe = pilinfo.pil_info(pil_fib, True, fibv.STARK_STRUCT, pil2=True)
    ext = _ext_challenges(rng, info_probe["pilInfo"], fibv.STARK_STRUCT)

    res_mod = _prove_air(pilout, 0, 0, fibv.STARK_STRUCT, cm_mod, publics, ext)
    res_fib = _prove_air(pilout, 1, 0, fibv.STARK_STRUCT, cm_fib, publics, ext)

    sv_mod = res_mod["proof"]["subproofValues"]
    sv_fib = res_fib["proof"]["subproofValues"]
    assert len(sv_mod) == 1 and len(sv_fib) == 1

    codes = pf.get_global_constraints_info(pilout, stark=True)
    assert len(codes) == 1
    errors = verify_global_constraints(codes, [sv_mod, sv_fib])
    assert errors == [], errors

    # breaking the coupling must break the cross-subproof sum
    bad = [[tuple((int(x) + 1) % P for x in sv_mod[0])], sv_fib]
    assert verify_global_constraints(codes, bad)


def test_input_challenges_variant(agg):
    """options.inputChallenges: the verifier takes its challenges as
    signals (vadcop multi-FRI aggregation shape,
    stark_verifier.circom.ejs:811-828) and re-derives only the query
    positions; rootC becomes an output.  The same proof verifies with its
    own transcript challenges supplied externally, and corrupted
    challenges are rejected."""
    s, files, zkin_a, zkin_b, root = agg
    _, res, zkin = _fib_proof([1, 2])
    v = vadcop.p2c.pil2circom(
        s["constRoot"], s["starkInfo"], s["verifierInfo"],
        options={"inputChallenges": True, "multiFRI": True},
    )
    assert "signal input challengeXi[3]" in v
    assert "signal output rootC[4]" in v
    assert "signal output queryVals" in v
    files2 = dict(files)
    files2["verifier_ic.circom"] = v
    zkin_ic = p2z.challenges2zkin_circom(
        res["challenges"], res["challengesFRISteps"], s["starkInfo"], zkin
    )
    cc = cf.compile_and_witness(files2, "verifier_ic.circom", zkin_ic)
    assert cc.check()

    bad = dict(zkin_ic)
    bad["challengeXi"] = [
        (int(v_) + 1) % P for v_ in zkin_ic["challengeXi"]
    ]
    rejected = False
    try:
        cc = cf.compile_and_witness(files2, "verifier_ic.circom", bad)
        rejected = not cc.check()
    except AssertionError:
        rejected = True
    assert rejected
