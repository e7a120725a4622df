"""shplonk batched KZG openings: commit/open/verify round-trip.

Exercises the composed-commitment packing (multiple pols per G1 point),
multi-point openings (xi and xi*w), the two-witness BDFG batching, and
the single pairing check — the protocol surface the reference borrows
from shplonkjs (/root/reference/src/fflonk/helpers/fflonk_shkey.js:1).
"""
import random

import pytest

from pil2_stark_tpu.ops.fft_bn128 import FR
from pil2_stark_tpu.protocol.keccak import keccak256
from pil2_stark_tpu.protocol.poly_fr import poly_eval
from pil2_stark_tpu.protocol.shplonk import (
    dev_ptau,
    shplonk_commit,
    shplonk_open,
    shplonk_setup,
    shplonk_verify,
)


def test_keccak_known_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # spans >1 rate block (136 bytes)
    assert keccak256(b"x" * 200).hex() == (
        "3c3800defb6a25a70a2737e0716eeb5d270559ad3cad8f6abddac58802d7158e"
    )


@pytest.fixture(scope="module")
def scheme():
    rng = random.Random(7)
    power = 3
    n = 1 << power
    # stage 1: a, b, c opened at {0, 1}; stage 2: z opened at {0, 1};
    # stage 0 (const): k opened at {0}; plus a lone q at {0}
    pol_defs = {
        0: [
            {"name": "k", "stage": 0, "degree": n, "fi": 0},
            {"name": "a", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "b", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "c", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "z", "stage": 2, "degree": n + 2, "fi": 2},
            {"name": "q", "stage": 3, "degree": 2 * n, "fi": 3},
        ],
        1: [
            {"name": "a", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "b", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "c", "stage": 1, "degree": n + 2, "fi": 1},
            {"name": "z", "stage": 2, "degree": n + 2, "fi": 2},
        ],
    }
    ptau = dev_ptau(4 * (n + 2) + 8, tau=rng.randrange(1, FR))
    zkey = shplonk_setup({"power": power, "polDefs": pol_defs}, ptau)
    pols = {
        name: [rng.randrange(FR) for _ in range(deg)]
        for name, deg in
        [("k", n), ("a", n + 2), ("b", n + 2), ("c", n + 2), ("z", n + 2),
         ("q", 2 * n)]
    }
    committed = {}
    for stage in (0, 1, 2, 3):
        for ent in shplonk_commit(stage, zkey, pols, ptau):
            committed[ent["index"]] = ent
    xi_seed = rng.randrange(1, FR)
    cmts, evals = shplonk_open(zkey, ptau, pols, committed, xi_seed)
    return zkey, ptau, pols, cmts, evals, xi_seed


def test_setup_grouping(scheme):
    zkey = scheme[0]
    by_idx = {f["index"]: f for f in zkey["f"]}
    assert by_idx[1]["pols"] == ["a", "b", "c"]
    assert by_idx[1]["c"] == 4  # rounded to pow2
    assert by_idx[1]["openingPoints"] == [0, 1]
    assert by_idx[0]["openingPoints"] == [0]
    assert zkey["powerW"] == 4


def test_evaluations_match_polynomials(scheme):
    zkey, _, pols, _, evals, xi_seed = scheme
    from pil2_stark_tpu.protocol.poly_fr import domain_w
    xi = pow(xi_seed, zkey["powerW"], FR)
    w_n = domain_w(zkey["power"])
    assert evals["a"] == poly_eval(pols["a"], xi)
    assert evals["aw"] == poly_eval(pols["a"], xi * w_n % FR)
    assert evals["z"] == poly_eval(pols["z"], xi)
    assert evals["k"] == poly_eval(pols["k"], xi)


def test_verify_accepts(scheme):
    zkey, ptau, _, cmts, evals, xi_seed = scheme
    assert shplonk_verify(zkey, cmts, dict(evals), xi_seed)


def test_verify_rejects_bad_eval(scheme):
    zkey, ptau, _, cmts, evals, xi_seed = scheme
    bad = dict(evals)
    bad["b"] = (bad["b"] + 1) % FR
    bad.pop("inv")  # recomputation not claimed; check pairing rejects
    assert not shplonk_verify(zkey, cmts, bad, xi_seed)


def test_verify_rejects_bad_commit(scheme):
    zkey, ptau, _, cmts, evals, xi_seed = scheme
    from pil2_stark_tpu.curve.bn254 import G1, g1_add
    bad = dict(cmts)
    bad["f1"] = g1_add(bad["f1"], G1)
    assert not shplonk_verify(zkey, bad, dict(evals), xi_seed)


def test_verify_rejects_bad_inv_hint(scheme):
    zkey, ptau, _, cmts, evals, xi_seed = scheme
    bad = dict(evals)
    bad["inv"] = (bad["inv"] + 1) % FR
    assert not shplonk_verify(zkey, cmts, bad, xi_seed)
