"""Goldilocks field arithmetic in JAX with uint32 limb pairs.

TPU-native representation: a GL vector is a pair ``(lo, hi)`` of
``jnp.uint32`` arrays of identical shape (TPUs have no native u64; XLA/Mosaic
lanes are 32-bit).  All kernels (NTT, Poseidon, constraint evaluation) are
built from these ops, which lower to pure VPU element-wise instructions.

Reduction logic follows the standard Goldilocks identities
2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p); overflow corner cases mirror the
reference's WASM kernel (/root/reference/src/helpers/glwasm.js:5-96) which the
JS test-suite pins down.  Inputs/outputs are canonical (< p).
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)
EPS32 = np.uint32(0xFFFFFFFF)  # low limb of 2^64 mod p = 2^32 - 1
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
P_INT = 0xFFFFFFFF00000001

# A GL value: tuple (lo, hi) of jnp.uint32 arrays.
GL = tuple


def _u32(x):
    return jnp.asarray(x, dtype=U32)


def _b2u(b):
    return b.astype(U32)


# ---------------------------------------------------------------------------
# conversions


def from_u64(x: np.ndarray) -> GL:
    """numpy uint64 array -> (lo, hi) jnp.uint32 device pair."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return (jnp.asarray(lo), jnp.asarray(hi))


def to_u64(a: GL) -> np.ndarray:
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape) -> GL:
    z = jnp.zeros(shape, dtype=U32)
    return (z, z)


def full(shape, value: int) -> GL:
    value %= P_INT
    return (
        jnp.full(shape, np.uint32(value & 0xFFFFFFFF), dtype=U32),
        jnp.full(shape, np.uint32(value >> 32), dtype=U32),
    )


def const(value: int) -> GL:
    value %= P_INT
    return (
        jnp.asarray(np.uint32(value & 0xFFFFFFFF)),
        jnp.asarray(np.uint32(value >> 32)),
    )


# ---------------------------------------------------------------------------
# 64-bit primitive helpers on (lo, hi) u32 pairs


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out bit (as u32 0/1)."""
    lo = alo + blo
    c = _b2u(lo < alo)
    h1 = ahi + bhi
    c1 = h1 < ahi
    hi = h1 + c
    c2 = hi < h1
    return lo, hi, _b2u(c1 | c2)


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out bit (as u32 0/1)."""
    lo = alo - blo
    b = _b2u(alo < blo)
    h1 = ahi - bhi
    b1 = ahi < bhi
    hi = h1 - b
    b2 = h1 < b
    return lo, hi, _b2u(b1 | b2)


def _geq_p(lo, hi):
    return (hi == EPS32) & (lo >= P_LO)


def _canon(lo, hi):
    """Subtract p once if >= p (inputs < 2p)."""
    geq = _geq_p(lo, hi)
    lo2 = lo - P_LO
    bor = _b2u(lo < P_LO)
    hi2 = hi - P_HI - bor
    return jnp.where(geq, lo2, lo), jnp.where(geq, hi2, hi)


# ---------------------------------------------------------------------------
# field ops


def add(a: GL, b: GL) -> GL:
    lo, hi, carry = _add64(a[0], a[1], b[0], b[1])
    # wrapped past 2^64: add EPSILON (2^64 mod p); cannot re-overflow since
    # the wrapped value is < p + p - 2^64 < 2^33.
    addend = carry * EPS32
    lo2 = lo + addend
    c = _b2u(lo2 < lo)
    hi2 = hi + c
    return _canon(lo2, hi2)


def sub(a: GL, b: GL) -> GL:
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    # borrowed past 0: result is a - b + 2^64; want a - b + p = that - EPSILON
    subl = borrow * EPS32
    lo2 = lo - subl
    bor = _b2u(lo < subl)
    hi2 = hi - bor
    return (lo2, hi2)


def neg(a: GL) -> GL:
    nz = (a[0] | a[1]) != 0
    lo = P_LO - a[0]
    bor = _b2u(P_LO < a[0])
    hi = P_HI - a[1] - bor
    return (jnp.where(nz, lo, a[0]), jnp.where(nz, hi, a[1]))


def _mul32(a, b):
    """u32 × u32 -> (hi, lo) full 64-bit product via 16-bit split."""
    al = a & MASK16
    ah = a >> 16
    bl = b & MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    midc = _b2u(mid < lh)
    lo = ll + (mid << 16)
    c = _b2u(lo < ll)
    hi = hh + (mid >> 16) + (midc << 16) + c
    return hi, lo


def _mul_wide(a: GL, b: GL):
    """Full 128-bit product as four u32 limbs (n0..n3, little-endian)."""
    alo, ahi = a
    blo, bhi = b
    h00, l00 = _mul32(alo, blo)
    h01, l01 = _mul32(alo, bhi)
    h10, l10 = _mul32(ahi, blo)
    h11, l11 = _mul32(ahi, bhi)

    n0 = l00
    n1 = h00 + l01
    c1 = _b2u(n1 < h00)
    n1b = n1 + l10
    c2 = _b2u(n1b < n1)

    n2 = h01 + h10
    d1 = _b2u(n2 < h01)
    n2b = n2 + l11
    d2 = _b2u(n2b < n2)
    n2c = n2b + (c1 + c2)
    d3 = _b2u(n2c < n2b)

    n3 = h11 + d1 + d2 + d3
    return n0, n1b, n2c, n3


def _reduce128(n0, n1, n2, n3) -> GL:
    """(n0 + n1·2^32 + n2·2^64 + n3·2^96) mod p, canonical."""
    # t0 = lo64 - n3  (64-bit), correcting a borrow by subtracting EPSILON
    lo = n0 - n3
    bor0 = _b2u(n0 < n3)
    hi = n1 - bor0
    bor64 = n1 < bor0
    subl = _b2u(bor64) * EPS32
    lo2 = lo - subl
    bor1 = _b2u(lo < subl)
    hi2 = hi - bor1
    # t1 = n2 * EPSILON = (n2 << 32) - n2
    t1lo = jnp.uint32(0) - n2
    t1hi = n2 - _b2u(n2 != 0)
    # t2 = t0 + t1, overflow -> add EPSILON (single correction suffices)
    lo3, hi3, carry = _add64(lo2, hi2, t1lo, t1hi)
    addend = carry * EPS32
    lo4 = lo3 + addend
    c = _b2u(lo4 < lo3)
    hi4 = hi3 + c
    return _canon(lo4, hi4)


def mul(a: GL, b: GL) -> GL:
    return _reduce128(*_mul_wide(a, b))


def square(a: GL) -> GL:
    return mul(a, a)


def mul_const(a: GL, k: int) -> GL:
    return mul(a, const(k))


def where(cond, a: GL, b: GL) -> GL:
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def is_zero(a: GL):
    return (a[0] | a[1]) == 0


def eq(a: GL, b: GL):
    return (a[0] == b[0]) & (a[1] == b[1])


def exp_const(a: GL, e: int) -> GL:
    """a^e for a python-int exponent (square-and-multiply).

    Small exponents unroll (cheapest — no select per step).  Large ones
    (e.g. p−2 for the inverse) run as a lax.scan over the exponent bits:
    unrolling 63 squarings of ~70-primitive limb muls builds a ~30k-op
    single dependency chain that XLA's CPU/TPU schedulers choke on
    (minutes of compile), while the scan body is ~150 ops regardless of e."""
    e = int(e) % (P_INT - 1)
    if e == 0:
        return full(a[0].shape, 1)
    if e.bit_length() <= 8:
        res = a
        for bit in bin(e)[3:]:
            res = square(res)
            if bit == "1":
                res = mul(res, a)
        return res

    bits = jnp.asarray([b == "1" for b in bin(e)[3:]], dtype=bool)

    def body(res, bit):
        res = square(res)
        res = where(bit, mul(res, a), res)
        return res, None

    res, _ = jax.lax.scan(body, a, bits)
    return res


def pow7(a: GL) -> GL:
    """x^7 — the Poseidon S-box (poseidon.js:55)."""
    x2 = square(a)
    x3 = mul(x2, a)
    x4 = square(x2)
    return mul(x4, x3)
