"""Differential tests for the BN254-Fr NTT (ops/fft_bn128.py), mirroring the
reference's fft_p.bn128 cross-checks against the naive in-memory FFT
(/root/reference/test/fft_p.test.js pattern applied to the Fr domain)."""
import random

from pil2_stark_tpu.ops.fft_bn128 import FR, interpolate, intt, ntt, w, w_inv


def _naive_dft(vals, inverse=False):
    n = len(vals)
    bits = n.bit_length() - 1
    root = w_inv(bits) if inverse else w(bits)
    out = [
        sum(vals[j] * pow(root, j * k, FR) for j in range(n)) % FR
        for k in range(n)
    ]
    if inverse:
        n_inv = pow(n, FR - 2, FR)
        out = [v * n_inv % FR for v in out]
    return out


def test_root_chain():
    # w[s]^2 == w[s-1], w[0] == 1, and w[28] has exact order 2^28
    for s in range(1, 12):
        assert pow(w(s), 2, FR) == w(s - 1)
    assert w(0) == 1
    assert pow(w(28), 1 << 28, FR) == 1
    assert pow(w(28), 1 << 27, FR) != 1


def test_ntt_matches_naive_dft():
    rng = random.Random(1)
    for bits in (0, 1, 3, 5):
        vals = [rng.randrange(FR) for _ in range(1 << bits)]
        assert ntt(vals) == _naive_dft(vals)
        assert intt(vals) == _naive_dft(vals, inverse=True)


def test_ntt_roundtrip():
    rng = random.Random(2)
    vals = [rng.randrange(FR) for _ in range(1 << 8)]
    assert intt(ntt(vals)) == vals


def test_interpolate_contract():
    # interpolate evaluates P on shift·H_ext: out[k] == P(shift · w_ext^k)
    rng = random.Random(3)
    bits, ext_bits, shift = 3, 5, 7
    vals = [rng.randrange(FR) for _ in range(1 << bits)]
    coefs = intt(vals)
    out = interpolate(vals, bits, ext_bits, shift=shift)
    for k in (0, 1, 5, (1 << ext_bits) - 1):
        x = shift * pow(w(ext_bits), k, FR) % FR
        expect = 0
        for c in reversed(coefs):
            expect = (expect * x + c) % FR
        assert out[k] == expect
