"""BN128-tier verifier circuit: emitted over BN254 Fr, executed by the
circom front-end against a REAL BN128-hash STARK proof (the recursion →
SNARK leg: circuits.bn128/stark_verifier.circom.ejs semantics)."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, circom_front as cf, pil2circom
from pil2_stark_tpu.compiler import circom_gadgets_bn128 as gbn
from pil2_stark_tpu.hash import poseidon_bn128, merkle_bn128
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
from pil2_stark_tpu.utils.proof2zkin import proof2zkin

P_GL = 0xFFFFFFFF00000001


@pytest.fixture(scope="module")
def bn_proof():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    ss = dict(fibonacci.STARK_STRUCT)
    ss["verificationHashType"] = "BN128"
    ss["merkleTreeArity"] = 16
    ss["nQueries"] = 4
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, [1, 2, out]),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
    src = pil2circom.pil2circom(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    zkin = proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in res["publics"]]
    return src, zkin, s, res


def test_poseidon_bn_gadget_matches_host():
    lib = gbn.gen_bit_utils() + gbn.gen_gl_lib() + gbn.gen_poseidon_bn([17])
    main = "pragma circom 2.1.0;\n" + lib + """
template Main() {
    signal input inputs[16];
    signal input st;
    signal output out[17];
    out <== PoseidonBN17()(inputs, st);
}
component main = Main();
"""
    ins = list(range(1, 17))
    cc = cf.compile_and_witness(
        {"m.circom": main}, "m.circom", {"inputs": ins, "st": 7},
        prime=cf.BN254_FR,
    )
    want = poseidon_bn128.poseidon(ins, 7, 17)
    got = [cc.witness[i] for i in range(1, 18)]
    assert cc.check()
    assert got == [w % poseidon_bn128.P for w in want]


def test_merkle_bn_gadget_path():
    width, height = 7, 64
    rng = np.random.default_rng(3)
    buff = rng.integers(0, P_GL, size=(height, width), dtype=np.uint64)
    tree = merkle_bn128.merkelize(buff, width, height, arity=16)
    idx = 37
    values, proof = merkle_bn128.get_group_proof(tree, idx)
    n_levels = len(proof)
    lib = (
        gbn.gen_bit_utils() + gbn.gen_gl_lib()
        + gbn.gen_poseidon_bn([17, -(-((width + 2) // 3)) + 1])
        + gbn.gen_one_hot(4) + gbn.gen_linear_hash_bn(width)
        + gbn.gen_verify_merkle_bn(width, n_levels)
    )
    main = "pragma circom 2.1.0;\n" + lib + f"""
template Main() {{
    signal input values[{width}];
    signal input siblings[{n_levels}][16];
    signal input key[{n_levels * 4}];
    signal input root;
    VerifyMerkleBN{width}_{n_levels}()(values, siblings, key, root, 1);
}}
component main = Main();
"""
    key_bits = [(idx >> b) & 1 for b in range(n_levels * 4)]
    inputs = {
        "values": [int(v) for v in values],
        "siblings": [[int(x) for x in s] for s in proof],
        "key": key_bits,
        "root": int(tree.root),
    }
    cc = cf.compile_and_witness(
        {"m.circom": main}, "m.circom", inputs, prime=cf.BN254_FR
    )
    assert cc.check()
    bad = dict(inputs)
    bad["root"] = int(tree.root) + 1
    with pytest.raises(AssertionError):
        cf.compile_and_witness(
            {"m.circom": main}, "m.circom", bad, prime=cf.BN254_FR
        )


def test_bn128_verifier_accepts_real_proof(bn_proof):
    src, zkin, s, res = bn_proof
    cc = cf.compile_and_witness(
        {"verifier.circom": src}, "verifier.circom", zkin, prime=cf.BN254_FR
    )
    assert cc.check()
    assert cc.n_pub_inputs == s["starkInfo"]["nPublics"]


def test_bn128_verifier_rejects_corrupted_proof(bn_proof):
    src, zkin, s, res = bn_proof
    bad = dict(zkin)
    bad["evals"] = [list(e) for e in zkin["evals"]]
    bad["evals"][0] = list(bad["evals"][0])
    bad["evals"][0][0] = (bad["evals"][0][0] + 1) % P_GL
    with pytest.raises(AssertionError):
        cf.compile_and_witness(
            {"verifier.circom": src}, "verifier.circom", bad, prime=cf.BN254_FR
        )


@pytest.fixture(scope="module")
def bn_custom_proof():
    """merkleTreeCustom proof (arity-4 trees, custom-padded linear hash,
    custom-arity transcript) + its custom-gate verifier circuit
    (reference circuits.bn128/custom/, selected by pil2circom.js:25-26)."""
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    ss = dict(fibonacci.STARK_STRUCT)
    ss["verificationHashType"] = "BN128"
    ss["merkleTreeArity"] = 4
    ss["merkleTreeCustom"] = True
    ss["nQueries"] = 4
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, [1, 2, out]),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
    src = pil2circom.pil2circom(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    zkin = proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in res["publics"]]
    return src, zkin, s, res


def test_bn128_custom_verifier_accepts_real_proof(bn_custom_proof):
    src, zkin, s, res = bn_custom_proof
    assert "pragma custom_templates;" in src
    assert "template custom PoseidonT(t)" in src
    assert "PoseidonBN17" not in src  # every hash rides the custom gate
    cc = cf.compile_and_witness(
        {"verifier.circom": src}, "verifier.circom", zkin, prime=cf.BN254_FR
    )
    assert cc.check()
    # the custom gate is recorded for the final-tier plonkish setup
    # (final/plonksetup.py custom_gates_info matches by name)
    names = [g["template"] for g in cc.custom_gates]
    assert "PoseidonT" in names
    assert len(cc.custom_uses) > 0


def test_bn128_custom_verifier_rejects_corrupted_proof(bn_custom_proof):
    src, zkin, s, res = bn_custom_proof
    bad = dict(zkin)
    bad["evals"] = [list(e) for e in zkin["evals"]]
    bad["evals"][0] = list(bad["evals"][0])
    bad["evals"][0][0] = (bad["evals"][0][0] + 1) % P_GL
    with pytest.raises(AssertionError):
        cf.compile_and_witness(
            {"verifier.circom": src}, "verifier.circom", bad, prime=cf.BN254_FR
        )
