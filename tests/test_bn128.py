"""BN128 recursion tier: Poseidon-BN254 (circomlib vector), arity-16 Merkle
round trips, BN128 transcript, and an E2E STARK with
verificationHashType=BN128 (the final-tier configuration)."""
import numpy as np
import pytest

from pil2_stark_tpu.hash import poseidon_bn128, merkle_bn128
from pil2_stark_tpu.hash.transcript_bn128 import TranscriptBN128
from pil2_stark_tpu.compiler import pil1_parser
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier

P_GL = 0xFFFFFFFF00000001


def test_poseidon_bn128_circomlib_vector():
    # canonical circomlibjs test vector (t=3)
    assert (
        poseidon_bn128.poseidon([1, 2])
        == 7853200120776062878684798364095072458815029376092732009249414926327459813530
    )


def test_poseidon_bn128_t17():
    # the arity-16 tree/transcript width; constants validated against the
    # reference circuit tables
    out = poseidon_bn128.poseidon(list(range(16)))
    assert 0 < out < poseidon_bn128.P


@pytest.mark.parametrize("height,width", [(33, 5), (16, 3), (300, 9)])
def test_merkle_bn128_roundtrip(height, width):
    rng = np.random.default_rng(height)
    buff = rng.integers(0, P_GL, size=(height, width), dtype=np.uint64)
    tree = merkle_bn128.merkelize(buff, width, height)
    for idx in [0, 1, height // 2, height - 1]:
        values, proof = merkle_bn128.get_group_proof(tree, idx)
        assert merkle_bn128.verify_group_proof(tree.root, proof, idx, values)
        bad = values.copy()
        bad[0] ^= np.uint64(1)
        assert not merkle_bn128.verify_group_proof(tree.root, proof, idx, bad)


def test_transcript_bn128_determinism_and_fields():
    t1 = TranscriptBN128()
    t2 = TranscriptBN128()
    for t in (t1, t2):
        t.put([1, 2, 3])
        t.put(12345678901234567890)
    assert t1.get_field() == t2.get_field()
    f = t1.get_field()
    assert all(0 <= x < (1 << 64) for x in f)
    q = TranscriptBN128()
    q.put(7)
    perms = q.get_permutations(8, 9)
    assert len(perms) == 8 and all(0 <= p < 512 for p in perms)


def test_stark_bn128_tier_e2e():
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

    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    assert isinstance(s["constRoot"], int)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, [1, 2, out]),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"], s["verifierInfo"]
    )
    # tamper
    bad = list(res["publics"])
    bad[0] = 9
    assert not verifier.verify(
        res["proof"], bad, s["constRoot"], s["starkInfo"], s["verifierInfo"]
    )
