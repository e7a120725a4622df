"""NTT / LDE differential tests (mirrors reference test/fft.test.js and
test/fft_p.test.js: roundtrip identities + cross-check vs the naive DFT)."""
import numpy as np

from pil2_stark_tpu.field import gl64
from pil2_stark_tpu.ops import ntt

P = gl64.P_INT
RNG = np.random.default_rng(42)


def rand(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64)


def test_ntt_matches_naive_dft():
    for bits in [1, 2, 3, 5]:
        x = rand(((1 << bits), 3))
        got = ntt.ntt_u64(x, bits)
        want = ntt.naive_dft_u64(x, bits)
        assert np.array_equal(got, want), f"bits={bits}"


def test_intt_roundtrip():
    for bits in [1, 4, 10]:
        x = rand(((1 << bits), 5))
        assert np.array_equal(ntt.intt_u64(ntt.ntt_u64(x, bits), bits), x)
        assert np.array_equal(ntt.ntt_u64(ntt.intt_u64(x, bits), bits), x)


def test_intt_matches_naive():
    bits = 4
    x = rand(((1 << bits), 2))
    got = ntt.intt_u64(x, bits)
    want = ntt.naive_dft_u64(x, bits, inverse=True)
    assert np.array_equal(got, want)


def test_lde_semantics():
    """lde output at index k must equal P(shift · w_ext^k) where P
    interpolates the input on H_N — the contract of fft_p.interpolate."""
    bits, ext_bits = 3, 5
    n, ext_n = 1 << bits, 1 << ext_bits
    x = rand((n, 2))
    out = ntt.lde_u64(x, bits, ext_bits)
    assert out.shape == (ext_n, 2)

    coefs = ntt.naive_dft_u64(x, bits, inverse=True)
    # evaluate naive polynomial at shift * w_ext^k
    for k in [0, 1, 7, 31]:
        xpt = (7 * pow(gl64.w(ext_bits), k, P)) % P
        for c in range(2):
            acc = 0
            for j in range(n - 1, -1, -1):
                acc = (acc * xpt + int(coefs[j, c])) % P
            assert int(out[k, c]) == acc, (k, c)


def test_lde_blowup_consistency():
    """Rows k<<extendBits of the extension reproduce the original values
    only after accounting for the coset — instead check degree: iNTT of the
    extension has zero high coefficients."""
    bits, ext_bits = 4, 6
    x = rand(((1 << bits), 1))
    out = ntt.lde_u64(x, bits, ext_bits)
    coefs_ext = ntt.intt_u64(out, ext_bits)
    # evaluations on a coset of size extN of a degree <N polynomial:
    # after un-shifting, coefficients >= N must vanish
    shift_inv_pows = gl64.powers(gl64.SHIFT_INV_INT, 1 << ext_bits)
    unshifted = gl64.mul(coefs_ext[:, 0], shift_inv_pows)
    assert np.all(unshifted[(1 << bits):] == 0)
    assert not np.all(unshifted[: (1 << bits)] == 0)


def test_large_roundtrip_2_14():
    bits = 14
    x = rand(((1 << bits), 4))
    y = ntt.lde_u64(x, bits, bits + 1)
    # spot-check via polynomial evaluation at one point
    coefs = ntt.intt_u64(x, bits)
    k = 12345 % (1 << (bits + 1))
    xpt = (7 * pow(gl64.w(bits + 1), k, P)) % P
    acc = 0
    for j in range((1 << bits) - 1, -1, -1):
        acc = (acc * xpt + int(coefs[j, 0])) % P
    assert int(y[k, 0]) == acc
