"""Poseidon-GL permutation as a Pallas TPU kernel.

The batched permutation is the inner loop of Merkle tree builds (SURVEY.md
§3.2 hot loop #2).  The jnp/XLA path (jax_poseidon) is a chain of ~90
scanned element-wise stages — one HBM round trip per round; this kernel
keeps the entire 30-round permutation in VMEM for a block of states — one
HBM read and one write per state.

Layout: the batch is split into blocks of `_BLOCK` states; each block is a
(12, _BLOCK) u32 limb plane pair (state elements on sublanes, batch on
lanes).  The round loops run as `fori_loop`s INSIDE the kernel with the
round constants in SMEM (scalar loads overlap the VPU work): a fully
unrolled 30-round body is ~120k vector ops and takes minutes per shape
through the Mosaic compiler + remote relay, while the looped body compiles
in seconds — and production tree builds need one shape per power-of-two
level size (permute_pair pads the batch up).

Differentially tested against the numpy oracle / golden digests
(tests/test_pallas_poseidon.py, hardware-only) — bit-exact.
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


def _pow7(lo, hi):
    l2, h2 = _mul(lo, hi, lo, hi)
    l3, h3 = _mul(l2, h2, lo, hi)
    l4, h4 = _mul(l2, h2, l2, h2)
    return _mul(l4, h4, l3, h3)


# ---------------------------------------------------------------------------
# constant tables, flattened for SMEM (scalar memory): one u32 lo plane and
# one u32 hi plane over [C | M | P | S] in that order


@functools.lru_cache(maxsize=None)
def _const_planes():
    flat = np.concatenate([
        np.asarray(ref.C, dtype=np.uint64),
        np.asarray(ref.M, dtype=np.uint64).reshape(-1),  # M[j][i] row-major
        np.asarray(ref.P, dtype=np.uint64).reshape(-1),
        np.asarray(ref.S, dtype=np.uint64),
    ])
    return (
        (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (flat >> np.uint64(32)).astype(np.uint32),
    )


_OFF_C = 0
_OFF_M = len(ref.C)
_OFF_P = _OFF_M + T * T
_OFF_S = _OFF_P + T * T
_N_CONST = _OFF_S + len(ref.S)


def _kernel(clo_ref, chi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    def kc(idx):
        """Scalar constant (lo, hi) at flat index idx (idx may be traced)."""
        return clo_ref[idx], chi_ref[idx]

    def addc(v, idx):
        cl, ch = kc(idx)
        return _add(v[0], v[1], cl, ch)

    def mulc(v, idx):
        cl, ch = kc(idx)
        return _mul(v[0], v[1], cl, ch)

    def pow7_all(lo, hi):
        o = [_pow7(lo[i], hi[i]) for i in range(T)]
        return [x[0] for x in o], [x[1] for x in o]

    def add_crow(lo, hi, base):
        o = [_add(lo[i], hi[i], *kc(base + i)) for i in range(T)]
        return [x[0] for x in o], [x[1] for x in o]

    def mat_mul(lo, hi, base):
        """out[i] = Σ_j st[j] · mat[j][i], mat row-major at `base`."""
        olo, ohi = [], []
        for i in range(T):
            acc = mulc((lo[0], hi[0]), base + 0 * T + i)
            for j in range(1, T):
                term = mulc((lo[j], hi[j]), base + j * T + i)
                acc = _add(acc[0], acc[1], term[0], term[1])
            olo.append(acc[0])
            ohi.append(acc[1])
        return olo, ohi

    # fori_loop carries are (tuple of 12 lo rows, tuple of 12 hi rows) —
    # a pytree of (B,) vectors, so no per-iteration (12, B) relayout
    lo = [lo_ref[i, :] for i in range(T)]
    hi = [hi_ref[i, :] for i in range(T)]

    lo, hi = add_crow(lo, hi, _OFF_C)  # C row 0

    def full_round(r, carry, c_base, m_base):
        lo, hi = list(carry[0]), list(carry[1])
        lo, hi = pow7_all(lo, hi)
        o = [_add(lo[i], hi[i], *kc(c_base + r * T + i)) for i in range(T)]
        lo, hi = [x[0] for x in o], [x[1] for x in o]
        lo, hi = mat_mul(lo, hi, m_base)
        return tuple(lo), tuple(hi)

    # first half: HALF_F-1 M-rounds with C rows 1..HALF_F-1
    st = jax.lax.fori_loop(
        0, HALF_F - 1,
        lambda r, c: full_round(r, c, _OFF_C + T, _OFF_M),
        (tuple(lo), tuple(hi)),
    )
    lo, hi = list(st[0]), list(st[1])

    # bridge round: pow7 + C row HALF_F + P matrix
    lo, hi = pow7_all(lo, hi)
    lo, hi = add_crow(lo, hi, _OFF_C + HALF_F * T)
    lo, hi = mat_mul(lo, hi, _OFF_P)

    # partial rounds: sparse S-matrix updates
    def partial_round(r, carry):
        lo, hi = list(carry[0]), list(carry[1])
        x0 = _pow7(lo[0], hi[0])
        x0 = addc(x0, _OFF_C + (HALF_F + 1) * T + r)
        lo[0], hi[0] = x0
        s_base = _OFF_S + (2 * T - 1) * r
        new0 = mulc((lo[0], hi[0]), s_base)
        for j in range(1, T):
            term = mulc((lo[j], hi[j]), s_base + j)
            new0 = _add(new0[0], new0[1], term[0], term[1])
        for k in range(1, T):
            term = mulc(x0, s_base + T + k - 1)
            lo[k], hi[k] = _add(lo[k], hi[k], term[0], term[1])
        lo[0], hi[0] = new0
        return tuple(lo), tuple(hi)

    st = jax.lax.fori_loop(0, RP, partial_round, (tuple(lo), tuple(hi)))

    # second half: HALF_F-1 M-rounds, then the explicit tail pow7 + M
    c2_base = _OFF_C + (HALF_F + 1) * T + RP
    st = jax.lax.fori_loop(
        0, HALF_F - 1,
        lambda r, c: full_round(r, c, c2_base, _OFF_M),
        st,
    )
    lo, hi = list(st[0]), list(st[1])
    lo, hi = pow7_all(lo, hi)
    lo, hi = mat_mul(lo, hi, _OFF_M)

    for i in range(T):
        out_lo_ref[i, :] = lo[i]
        out_hi_ref[i, :] = hi[i]


@functools.lru_cache(maxsize=None)
def _pallas_permute(n_blocks: int, interpret: bool):
    grid = (n_blocks,)
    spec = pl.BlockSpec((T, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec(
        (_N_CONST,), lambda i: (0,), memory_space=pltpu.SMEM
    )
    return jax.jit(
        lambda clo, chi, lo, hi: pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[cspec, cspec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
            ],
            interpret=interpret,
        )(clo, chi, lo, hi)
    )


def _permute_planes(lo, hi, interpret: bool):
    """(12, B) u32 limb planes -> permuted planes; B a _BLOCK multiple."""
    clo, chi = _const_planes()
    return _pallas_permute(lo.shape[1] // _BLOCK, interpret)(
        jnp.asarray(clo), jnp.asarray(chi), lo, hi
    )


# Batch-size buckets: every dispatch pads to one of THREE fixed batch
# shapes (larger batches scan the _CHUNK program), so the process compiles
# at most 3 Mosaic kernels total — each new pallas shape costs ~1 min
# through the remote compile relay, and tree levels would otherwise touch
# one shape per power-of-two level size.  Production batches are powers of
# two, so bucket padding wastes at most 2x on the (tiny) mid-size levels.
_BUCKETS = (1 << 12, 1 << 14, 1 << 16)
_CHUNK = _BUCKETS[-1]


def permute_pair(state, interpret: bool | None = None):
    """Traceable batched permutation on a (lo, hi) uint32 (B, 12) pair —
    the production entry point used by jax_poseidon.permute on TPU
    backends.  Transposes to the kernel's (12, B) planar layout, pads the
    batch to a fixed bucket (or scans the _CHUNK-sized program for large
    batches), and slices the result back; usable inside jit/scan bodies."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    lo, hi = state
    b = lo.shape[0]
    if b <= _CHUNK:
        pb = next(p for p in _BUCKETS if p >= b)
        if pb != b:
            lo = jnp.pad(lo, ((0, pb - b), (0, 0)))
            hi = jnp.pad(hi, ((0, pb - b), (0, 0)))
        olo, ohi = _permute_planes(lo.T, hi.T, interpret)
        return olo.T[:b], ohi.T[:b]
    pb = -(-b // _CHUNK) * _CHUNK
    if pb != b:
        lo = jnp.pad(lo, ((0, pb - b), (0, 0)))
        hi = jnp.pad(hi, ((0, pb - b), (0, 0)))
    nc = pb // _CHUNK
    lo = lo.reshape(nc, _CHUNK, T)
    hi = hi.reshape(nc, _CHUNK, T)

    def body(_, ch):
        clo, chi = ch
        olo, ohi = _permute_planes(clo.T, chi.T, interpret)
        return None, (olo.T, ohi.T)

    _, (olo, ohi) = jax.lax.scan(body, None, (lo, hi))
    return olo.reshape(pb, T)[:b], ohi.reshape(pb, T)[:b]


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
    olo, ohi = _permute_planes(jnp.asarray(lo), jnp.asarray(hi), interpret)
    out = np.asarray(olo, dtype=np.uint64) | (
        np.asarray(ohi, dtype=np.uint64) << np.uint64(32)
    )
    return out.T[:b]
