"""Adversarial tests for the LAZY Goldilocks helpers used inside the
Pallas kernels (hash/pallas_poseidon.py, ops/pallas_ntt.py).

The lazy ops accept ANY u64 representative (x ≡ x mod p, x < 2^64) and
must return a valid representative.  The dangerous corners are the
double-carry/borrow folds: adding carry·ε can carry past hi=0xFFFFFFFF
(dropping 2^64 ≡ ε) and subtracting ε can borrow past hi=0 — unreachable
with canonical operands, hit at ~2^-32/op by lazy chains (a 2^20 device
prove FAILED VERIFICATION on exactly this before the _fold_carry /
_fold_borrow double folds).  These tests drive the helpers as plain jnp
functions on crafted near-2^64 operands against python-int ground truth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pil2_stark_tpu.hash import pallas_poseidon as pp
from pil2_stark_tpu.ops import pallas_ntt as pn

P = 0xFFFFFFFF00000001
EPS = 0xFFFFFFFF

# adversarial u64 representatives: canonical edge values, near-2^64,
# values whose low word is tiny/huge, ε multiples, and randoms
_EDGES = [
    0, 1, 2, EPS, EPS + 1, EPS - 1,
    P - 1, P, P + 1,
    2**64 - 1, 2**64 - 2, 2**64 - EPS, 2**64 - EPS - 1, 2**64 - EPS + 1,
    (EPS << 32), (EPS << 32) | 1, (EPS << 32) | EPS,
    2**63, 2**63 - 1, 2**32, 2**32 - 1, 2**32 + 1,
]


def _pairs():
    rng = np.random.default_rng(7)
    vals = _EDGES + [int(x) for x in rng.integers(0, 2**64, 200, dtype=np.uint64)]
    a = np.array(vals, dtype=np.uint64)
    # all ordered pairs of edges + random-vs-random
    ii, jj = np.meshgrid(np.arange(len(vals)), np.arange(len(_EDGES)))
    return a[ii.ravel()], a[np.minimum(jj.ravel(), len(vals) - 1)]


def _split(x):
    x = np.asarray(x, dtype=np.uint64)
    return (jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((x >> np.uint64(32)).astype(np.uint32)))


def _join(lo, hi):
    return (np.asarray(lo, dtype=np.uint64)
            | (np.asarray(hi, dtype=np.uint64) << np.uint64(32)))


def _check(got_u64, a, b, op):
    want = (op(a.astype(object), b.astype(object))) % P
    got = got_u64.astype(object) % P
    bad = got != want
    assert not bad.any(), (
        f"{bad.sum()} mismatches; first at a={a[bad][0]:#x} b={b[bad][0]:#x}: "
        f"got {got[bad][0]:#x} want {want[bad][0]:#x}"
    )


def test_poseidon_lazy_add():
    a, b = _pairs()
    alo, ahi = _split(a)
    blo, bhi = _split(b)
    lo, hi = pp._add(alo, ahi, blo, bhi)
    _check(_join(lo, hi), a, b, lambda x, y: x + y)


def test_poseidon_mul_any_u64():
    a, b = _pairs()
    alo, ahi = _split(a)
    blo, bhi = _split(b)
    lo, hi = pp._mul(alo, ahi, blo, bhi)
    out = _join(lo, hi)
    _check(out, a, b, lambda x, y: x * y)
    assert (out.astype(object) < P).all(), "_mul output must be canonical"


def test_ntt_lazy_add_sub_mul():
    a, b = _pairs()
    ap = _split(a)
    bp = _split(b)
    lo, hi = pn._lazy_add(ap, bp)
    _check(_join(lo, hi), a, b, lambda x, y: x + y)
    lo, hi = pn._lazy_sub(ap, bp)
    _check(_join(lo, hi), a, b, lambda x, y: x - y)
    lo, hi = pn._lazy_mul(ap, bp)
    _check(_join(lo, hi), a, b, lambda x, y: x * y)


def test_ntt_canon_pair():
    a, _ = _pairs()
    lo, hi = pn._canon_pair(*_split(a))
    out = _join(lo, hi).astype(object)
    assert (out == a.astype(object) % P).all()
    assert (out < P).all()


def test_poseidon_recombine_lazy_valid():
    # recombine consumes s32 limb planes Y_a < NL·T·127^2; drive it with
    # extreme planes (max magnitude) and randoms against the weighted sum
    rng = np.random.default_rng(3)
    bound = pp.NL * pp.T * 127 * 127
    ys = [rng.integers(0, bound, size=(pp.T, 64), dtype=np.int64)
          for _ in range(pp.NL)]
    ys[0][:] = bound - 1
    ys[pp.NL - 1][:] = bound - 1
    y = jnp.asarray(np.concatenate(ys, axis=0).astype(np.int32))
    lo, hi = pp._recombine_packed(y)
    got = _join(lo, hi).astype(object) % P
    want = sum(
        (ys[a2].astype(object) << (7 * a2)) for a2 in range(pp.NL)
    ) % P
    assert (got == want).all()
