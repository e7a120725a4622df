"""Compressor core: R1CS → PlonK-gate PIL machine → STARK proof.

The recursion-plumbing skeleton (SURVEY §3.4): constraints of an arbitrary
circuit become a provable PIL machine with copy constraints."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import compressor, pil1_parser, pilinfo
from pil2_stark_tpu.models import gadgets
from pil2_stark_tpu.stark import setup as stark_setup, prover, verifier
from pil2_stark_tpu.field import gl64

P = gl64.P_INT


def _toy_r1cs():
    """x*y = xy; (x + 2y + 3)*z = xy + 5x; xy*z = t  — a small circuit with
    shared signals so copy constraints are exercised."""
    x, y = 3, 7
    xy = x * y % P
    z = (xy + 5 * x) * pow(x + 2 * y + 3, P - 2, P) % P
    t = xy * z % P
    witness = [1, x, y, z, xy, t]
    constraints = [
        ({1: 1}, {2: 1}, {4: 1}),
        ({1: 1, 2: 2, 0: 3}, {3: 1}, {4: 1, 1: 5}),
        ({4: 1}, {3: 1}, {5: 1}),
    ]
    return constraints, witness


@pytest.fixture(scope="module")
def compressed():
    constraints, witness = _toy_r1cs()
    s = compressor.setup(P, constraints, len(witness))
    pil = pil1_parser.compile_pil_source(s["pilSource"])
    pil["name"] = "Compressor"
    cm = compressor.exec_witness(s, witness)
    return s, pil, cm


def test_compressor_debug_check(compressed):
    s, pil, cm = compressed
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], s["constPols"], None,
        (cm, []), debug=True,
    )
    assert errors == [], errors[:3]


def test_compressor_rejects_bad_witness(compressed):
    s, pil, cm = compressed
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    bad = cm.copy()
    bad[0, 0] ^= np.uint64(1)
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], s["constPols"], None,
        (bad, []), debug=True,
    )
    assert errors


def test_compressor_prove_verify(compressed):
    s, pil, cm = compressed
    ss = gadgets.stark_struct(s["nBits"], s["nBits"] + 2)
    st = stark_setup.stark_setup(s["constPols"], pil, ss)
    res = prover.prove(
        st["starkInfo"], st["expressionsInfo"], s["constPols"], st["constTree"],
        (cm, []),
    )
    assert verifier.verify(
        res["proof"], res["publics"], st["constRoot"],
        st["starkInfo"], st["verifierInfo"],
    )
