"""Small utilities: field sqrt, extendPol, polMulAxi, phase timing."""
import numpy as np

from pil2_stark_tpu.field.sqrt import sqrt, legendre, P
from pil2_stark_tpu.field import gl64, f3
from pil2_stark_tpu.ops import polutils, ntt as ntt_ops
from pil2_stark_tpu.utils.timing import PhaseTimer


def test_sqrt_roundtrip():
    rng = np.random.default_rng(0)
    found = 0
    for _ in range(20):
        a = int(rng.integers(1, 1 << 62))
        sq = a * a % P
        r = sqrt(sq)
        assert r is not None and r * r % P == sq
        found += 1
    assert found == 20
    assert sqrt(0) == 0
    assert sqrt(7) is None  # nqr


def test_extend_pol_matches_lde():
    rng = np.random.default_rng(1)
    p = rng.integers(0, P, size=(16, 2), dtype=np.uint64)
    # extendPol with shift=True equals the production LDE with blowup 2
    ext = polutils.extend_pol(p, extend_bits=1)
    want = ntt_ops.lde_u64(p, 4, 5)
    np.testing.assert_array_equal(ext, want)


def test_pol_mul_axi():
    p = [1, 2, 3]
    out = polutils.pol_mul_axi(p, 1, 2)
    assert out == [1, 4, 12]  # coefs * 2^i


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b"} and all(v >= 0 for v in s.values())
