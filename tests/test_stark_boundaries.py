"""Boundary constraints E2E: everyFrame / firstRow / lastRow (the reference's
stark_fibonacci.test.js first case — fibonacci without selector columns,
recurrences constrained on a frame excluding the wrap-around row)."""
import numpy as np
import pytest

from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.compiler import pilinfo
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier

STARK_STRUCT = {
    "nBits": 6,
    "nBitsExt": 9,
    "nQueries": 8,
    "verificationHashType": "GL",
    "steps": [{"nBits": 9}, {"nBits": 6}, {"nBits": 3}],
}


@pytest.fixture(scope="module")
def fib2():
    pil = fibonacci.pil_boundaries(6)
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    return pil, const_cols, cm_cols, [1, 2, out]


def test_boundaries_debug_check(fib2):
    pil, const_cols, cm_cols, publics = fib2
    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    assert {b["name"] for b in info["pilInfo"]["boundaries"]} >= {
        "everyRow", "everyFrame", "firstRow", "lastRow"
    }
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], const_cols.buffer, None,
        (cm_cols.buffer, publics), debug=True,
    )
    assert errors == [], errors[:3]


def test_boundaries_prove_verify(fib2):
    pil, const_cols, cm_cols, publics = fib2
    s = stark_setup.stark_setup(const_cols.buffer, pil, STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
    # wrong public must fail
    bad = list(publics)
    bad[2] = (bad[2] + 1) % 0xFFFFFFFF00000001
    assert not verifier.verify(
        res["proof"], bad, s["constRoot"], s["starkInfo"], s["verifierInfo"]
    )
