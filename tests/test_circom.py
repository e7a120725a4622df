"""Recursion-tier circuit tests.

1. Conformance: the circom front-end (compiler.circom_front) elaborates the
   REFERENCE's own pre-built verifier circuit + gadget library on its real
   proof zkin (/root/reference/test/compressor/ — the only
   reference-produced E2E artifact available without node/circom) and every
   R1CS constraint must hold.
2. Emission: our pil2circom generator emits a verifier circuit for the
   fibonacci machine; the circuit must accept a real proof (via the
   front-end) and reject a corrupted one — the in-repo equivalent of the
   reference's circom wasm_tester cross-check (SURVEY.md §4 tier 2).
3. Structure: the emitted circuit's template inventory matches the
   reference template set; proof2zkin key-set/shape pattern matches the
   reference zkin fixture.
"""
import copy
import json
import os
import re

import pytest

from pil2_stark_tpu.compiler import pil1_parser, pil2circom as p2c, circom_front as cf
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover
from pil2_stark_tpu.utils import proof2zkin as p2z

REF_GL = "/root/reference/circuits.gl"
REF_FIX = "/root/reference/test/compressor"


def _ref_files():
    files = {}
    for f in os.listdir(REF_GL):
        if f.endswith(".circom"):
            files[f] = open(os.path.join(REF_GL, f)).read()
    return files


@pytest.fixture(scope="module")
def fib_proof():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    return s, res, publics


def test_front_end_validates_reference_fixture():
    files = _ref_files()
    files["verifier.circom"] = open(os.path.join(REF_FIX, "verifier.circom")).read()
    zkin = json.load(open(os.path.join(REF_FIX, "verifier.proof.zkin.json")))
    cc = cf.compile_and_witness(files, "verifier.circom", zkin)
    assert cc.check()
    assert cc.n_pub_inputs == 3
    gates = {g["template"] for g in cc.custom_gates}
    assert {"Poseidon12", "CustPoseidon12", "CMul", "TreeSelector4", "FFT4",
            "EvPol4"} <= gates
    assert len(cc.custom_uses) > 1000


def test_emitted_verifier_accepts_real_proof(fib_proof):
    s, res, publics = fib_proof
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    cc = cf.compile_and_witness(files, "verifier.circom", zkin)
    assert cc.check()
    assert cc.n_pub_inputs == 3
    # every heavy gadget rides a custom gate, as in the reference circuits
    gates = {g["template"] for g in cc.custom_gates}
    assert {"Poseidon12", "CustPoseidon12", "CMul", "EvPol4"} <= gates


def test_emitted_verifier_rejects_corrupted_proof(fib_proof):
    s, res, publics = fib_proof
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    bad = dict(zkin)
    bad["evals"] = copy.deepcopy(zkin["evals"])
    bad["evals"][0][0] = (int(bad["evals"][0][0]) + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(AssertionError):
        cf.compile_and_witness(files, "verifier.circom", bad)


def test_emitted_structure_matches_reference_templates(fib_proof):
    s, _, _ = fib_proof
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    ours = set(re.findall(r"template (?:parallel )?(\w+?)\d*\(", files["verifier.circom"]))
    ref = open(os.path.join(REF_FIX, "verifier.circom")).read()
    theirs = set(re.findall(r"template (?:parallel )?(\w+?)\d*\(", ref))
    assert ours == theirs, (ours, theirs)
    # same main-component input signal inventory (names modulo counts)
    def input_names(src, tmpl):
        body = src.split(f"template {tmpl}")[1]
        return set(
            re.sub(r"\d+$", "N", n)
            for n in re.findall(r"signal input (\w+)", body.split("template")[0])
        )
    assert input_names(files["verifier.circom"], "StarkVerifier") == input_names(
        ref, "StarkVerifier"
    )


def test_zkin_shape_matches_reference_fixture(fib_proof):
    s, res, publics = fib_proof
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    ref = json.load(open(os.path.join(REF_FIX, "verifier.proof.zkin.json")))

    def pattern(keys):
        return sorted({re.sub(r"\d+", "N", k) for k in keys})

    assert pattern(zkin.keys()) == pattern(ref.keys())
    # same nesting depth per key pattern
    def depth(v):
        d = 0
        while isinstance(v, list):
            d += 1
            v = v[0]
        return d

    ref_depth = {re.sub(r"\d+", "N", k): depth(v) for k, v in ref.items()}
    for k, v in zkin.items():
        assert depth(v) == ref_depth[re.sub(r"\d+", "N", k)], k


def _fib_proof_with(struct_overrides):
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    ss = dict(fibonacci.STARK_STRUCT)
    ss.update(struct_overrides)
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
        split_linear_hash=ss.get("splitLinearHash", False),
    )
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    return s, res, zkin


def test_hashcommits_proof_verified_in_circuit():
    """hashCommits transcript variant: the prover absorbs sub-transcript
    states (publics / evals / final polynomial hashes) and the emitted
    verifier circuit replays the same schedule
    (stark_verifier.circom.ejs:304-371) — previously the option was
    recursion-dead (VERDICT r2 missing item 2)."""
    s, res, zkin = _fib_proof_with({"hashCommits": True})
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    assert "publicsHash" in files["verifier.circom"]
    assert "lastPolFRIHash" in files["verifier.circom"]
    cc = cf.compile_and_witness(files, "verifier.circom", zkin)
    assert cc.check()
    bad = dict(zkin)
    bad["evals"] = copy.deepcopy(zkin["evals"])
    bad["evals"][0][0] = (int(bad["evals"][0][0]) + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(AssertionError):
        cf.compile_and_witness(files, "verifier.circom", bad)


def test_split_linear_hash_proof_verified_in_circuit():
    """splitLinearHash ("GPU") leaf layout: a split-hash proof verified by
    the emitted circuit through the linearhash_gpu/merklehash_gpu gadget
    variants (stark_verifier.circom.ejs:11-15 include switch) — previously
    split proofs were recursion-dead (VERDICT r2 missing item 3)."""
    s, res, zkin = _fib_proof_with({"splitLinearHash": True})
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    assert 'include "merklehash_gpu.circom";' in files["verifier.circom"]
    cc = cf.compile_and_witness(files, "verifier.circom", zkin)
    assert cc.check()
    # a sibling digest corruption must fail the split-leaf Merkle check
    bad = dict(zkin)
    bad["s0_siblings1"] = copy.deepcopy(zkin["s0_siblings1"])
    bad["s0_siblings1"][0][0][0] = (int(bad["s0_siblings1"][0][0][0]) + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(AssertionError):
        cf.compile_and_witness(files, "verifier.circom", bad)
