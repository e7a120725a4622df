"""BN254 curve layer: group laws, MSM, optimal-ate pairing.

Self-consistency suffices to pin the curve down (no external vectors
needed): the group orders, the twist equation, and bilinearity together
determine the pairing up to a power of the final-exponentiation, and the
standard EIP-196/197 generators are hardcoded.  Mirrors the checks
ffjavascript's test suite performs for the reference's fflonk tier
(/root/reference/src/fflonk/helpers/fflonk_prover_helpers.js delegates
curve ops to ffjavascript/wasmcurves).
"""
import random

from pil2_stark_tpu.curve.bn254 import (
    FQ12_ONE,
    G1,
    G2,
    R,
    g1_add,
    g1_is_on_curve,
    g1_msm,
    g1_mul,
    g1_neg,
    g2_is_on_curve,
    g2_mul,
    pairing,
    pairing_check,
)


def test_generators_on_curve_and_order():
    assert g1_is_on_curve(G1)
    assert g2_is_on_curve(G2)
    assert g1_mul(G1, R) is None
    assert g2_mul(G2, R) is None


def test_g1_group_law():
    rng = random.Random(1)
    a, b = rng.randrange(1, R), rng.randrange(1, R)
    pa, pb = g1_mul(G1, a), g1_mul(G1, b)
    assert g1_add(pa, pb) == g1_mul(G1, (a + b) % R)
    assert g1_add(pa, g1_neg(pa)) is None
    assert g1_is_on_curve(g1_add(pa, pb))


def test_msm_matches_naive():
    rng = random.Random(2)
    n = 37
    scalars = [rng.randrange(0, R) for _ in range(n)]
    points = [g1_mul(G1, rng.randrange(1, R)) for _ in range(n)]
    expect = None
    for p, s in zip(points, scalars):
        expect = g1_add(expect, g1_mul(p, s))
    assert g1_msm(points, scalars) == expect
    # edge cases: zero scalars, identity points
    assert g1_msm([G1, None], [0, 5]) is None
    assert g1_msm([], []) is None


def test_pairing_bilinear_nondegenerate():
    e = pairing(G1, G2)
    assert e != FQ12_ONE  # non-degenerate
    a, b = 3, 7
    lhs = pairing(g1_mul(G1, a), g2_mul(G2, b))
    rhs = pairing(G1, g2_mul(G2, a * b))
    assert lhs == rhs
    # e(P,Q)^r = 1  <=>  e(rP, Q) = 1
    assert pairing(g1_mul(G1, R), G2) == FQ12_ONE


def test_pairing_check_batched():
    # e(aG1, G2) * e(-G1, aG2) == 1
    a = 11
    assert pairing_check(
        [(g1_mul(G1, a), G2), (g1_neg(G1), g2_mul(G2, a))]
    )
    assert not pairing_check([(G1, G2), (G1, G2)])
