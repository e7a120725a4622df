"""Poseidon-GL permutation as a Pallas TPU kernel.

The batched permutation is the inner loop of Merkle tree builds (SURVEY.md
§3.2 hot loop #2).  The jnp/XLA path (jax_poseidon) is a chain of ~90
scanned element-wise stages; this kernel keeps the entire 30-round
permutation in VMEM for a block of states — one HBM read and one write per
state — with the round loop unrolled inside the kernel body (all VPU u32
ops; the constants are embedded as immediates).

Layout: the batch is split into blocks of `_BLOCK` states; each block is a
(12, _BLOCK) u32 limb plane pair (state elements on sublanes, batch on
lanes).  Differentially tested against the numpy oracle / golden digests
(tests/test_pallas_poseidon.py) — bit-exact.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import poseidon_gl as ref

T = 12
HALF_F = ref.N_ROUNDS_F // 2
RP = ref.N_ROUNDS_P

_BLOCK = 512  # states per kernel instance (lanes dim = _BLOCK)

MASK16 = np.uint32(0xFFFF)
EPS32 = np.uint32(0xFFFFFFFF)
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)


def _b2u(b):
    return b.astype(jnp.uint32)


def _canon(lo, hi):
    geq = (hi == EPS32) & (lo >= P_LO)
    lo2 = lo - P_LO
    bor = _b2u(lo < P_LO)
    hi2 = hi - P_HI - bor
    return jnp.where(geq, lo2, lo), jnp.where(geq, hi2, hi)


def _add(alo, ahi, blo, bhi):
    lo = alo + blo
    c = _b2u(lo < alo)
    h1 = ahi + bhi
    c1 = h1 < ahi
    hi = h1 + c
    c2 = hi < h1
    carry = _b2u(c1 | c2)
    addend = carry * EPS32
    lo2 = lo + addend
    c3 = _b2u(lo2 < lo)
    return _canon(lo2, hi + c3)


def _mul32(a, b):
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


def _mul(alo, ahi, blo, bhi):
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
    # reduce (n0 + n1b·2^32 + n2c·2^64 + n3·2^96) mod p
    lo = n0 - n3
    bor0 = _b2u(n0 < n3)
    hi = n1b - bor0
    bor64 = n1b < bor0
    subl = _b2u(bor64) * EPS32
    lo2 = lo - subl
    bor1 = _b2u(lo < subl)
    hi2 = hi - bor1
    t1lo = jnp.uint32(0) - n2c
    t1hi = n2c - _b2u(n2c != 0)
    lo3 = lo2 + t1lo
    c = _b2u(lo3 < lo2)
    h1 = hi2 + t1hi
    c1_ = h1 < hi2
    hi3 = h1 + c
    c2_ = hi3 < h1
    carry = _b2u(c1_ | c2_)
    addend = carry * EPS32
    lo4 = lo3 + addend
    c3 = _b2u(lo4 < lo3)
    return _canon(lo4, hi3 + c3)


def _mulc(alo, ahi, k: int):
    k %= 0xFFFFFFFF00000001
    return _mul(alo, ahi, jnp.uint32(k & 0xFFFFFFFF), jnp.uint32(k >> 32))


def _addc(alo, ahi, k: int):
    k %= 0xFFFFFFFF00000001
    return _add(alo, ahi, jnp.uint32(k & 0xFFFFFFFF), jnp.uint32(k >> 32))


def _pow7(lo, hi):
    l2, h2 = _mul(lo, hi, lo, hi)
    l3, h3 = _mul(l2, h2, lo, hi)
    l4, h4 = _mul(l2, h2, l2, h2)
    return _mul(l4, h4, l3, h3)


def _kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    C, S, M, P = ref.C, ref.S, ref.M, ref.P
    st = [
        (lo_ref[i, :], hi_ref[i, :]) for i in range(T)
    ]

    def addc_all(st, base):
        return [_addc(l, h, int(C[base + i])) for i, (l, h) in enumerate(st)]

    def pow7_all(st):
        return [_pow7(l, h) for (l, h) in st]

    def mat_mul(st, mat):
        out = []
        for i in range(T):
            acc = _mulc(st[0][0], st[0][1], int(mat[0][i]))
            for j in range(1, T):
                term = _mulc(st[j][0], st[j][1], int(mat[j][i]))
                acc = _add(acc[0], acc[1], term[0], term[1])
            out.append(acc)
        return out

    st = addc_all(st, 0)
    for r in range(HALF_F - 1):
        st = pow7_all(st)
        st = addc_all(st, (r + 1) * T)
        st = mat_mul(st, M)
    st = pow7_all(st)
    st = addc_all(st, HALF_F * T)
    st = mat_mul(st, P)

    for r in range(RP):
        x0 = _pow7(st[0][0], st[0][1])
        x0 = _addc(x0[0], x0[1], int(C[(HALF_F + 1) * T + r]))
        st[0] = x0
        srow = S[(2 * T - 1) * r : (2 * T - 1) * (r + 1)]
        new0 = _mulc(st[0][0], st[0][1], int(srow[0]))
        for j in range(1, T):
            term = _mulc(st[j][0], st[j][1], int(srow[j]))
            new0 = _add(new0[0], new0[1], term[0], term[1])
        for k in range(1, T):
            term = _mulc(x0[0], x0[1], int(srow[T + k - 1]))
            st[k] = _add(st[k][0], st[k][1], term[0], term[1])
        st[0] = new0

    base = (HALF_F + 1) * T + RP
    for r in range(HALF_F - 1):
        st = pow7_all(st)
        st = addc_all(st, base + r * T)
        st = mat_mul(st, M)
    st = pow7_all(st)
    st = mat_mul(st, M)

    for i in range(T):
        out_lo_ref[i, :] = st[i][0]
        out_hi_ref[i, :] = st[i][1]


@functools.lru_cache(maxsize=None)
def _pallas_permute(n_blocks: int, interpret: bool):
    grid = (n_blocks,)
    spec = pl.BlockSpec((T, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    return jax.jit(
        lambda lo, hi: pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
            ],
            interpret=interpret,
        )(lo, hi)
    )


def permute_pallas_u64(states: np.ndarray, interpret: bool | None = None) -> np.ndarray:
    """Batched permutation on (B, 12) u64 states via the Pallas kernel.

    interpret=None auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    states = np.asarray(states, dtype=np.uint64)
    b = states.shape[0]
    padded = -(-b // _BLOCK) * _BLOCK
    buf = np.zeros((padded, T), dtype=np.uint64)
    buf[:b] = states
    planes = buf.T.copy()  # (12, padded)
    lo = (planes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (planes >> np.uint64(32)).astype(np.uint32)
    olo, ohi = _pallas_permute(padded // _BLOCK, interpret)(lo, hi)
    out = np.asarray(olo, dtype=np.uint64) | (
        np.asarray(ohi, dtype=np.uint64) << np.uint64(32)
    )
    return out.T[:b]
