"""Poseidon-GL permutation as a Pallas TPU kernel (MXU linear maps).

The batched permutation is the inner loop of Merkle tree builds (SURVEY.md
§3.2 hot loop #2).  The jnp/XLA path (jax_poseidon) is a chain of ~90
scanned element-wise stages — one HBM round trip per round; this kernel
keeps the entire 30-round permutation in VMEM for a block of states — one
HBM read and one write per state.

Layout: the batch is split into blocks of `_BLOCK` states; each block is a
(12, _BLOCK) u32 limb plane pair (state elements on sublanes, batch on
lanes), zero-padded to 16 rows in-kernel so every MXU operand is
tile-aligned.  Every GL *linear map* in the permutation — the MDS multiply
of the full rounds, the bridge P matrix, and the whole linear part of each
partial round — runs on the MXU as an exact s8 x s8 -> s32 limb-stacked
matmul (ops/gl_mxu): the VPU only computes sboxes, constant adds, and the
limb extract/recombine around each matmul (~6x fewer vector ops per round
than the broadcast-multiply formulation; the GL multiply itself has no
native dtype, so the systolic array is otherwise idle during hashing).
The 30 rounds are Python-unrolled with STATIC constant slices (Mosaic
rejects dynamic lane/sublane slices), and permute_pair pads every batch to
one of three fixed buckets so the process compiles at most three kernel
shapes.

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
from ..ops import gl_mxu

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
# constant tables:
#   C_t:  (16, n_rounds_with_c) u32 limb planes — round-constant COLUMNS
#         over a zero-padded 16-row state (sublane granularity is 8, so
#         padding 12 -> 16 costs nothing on the VPU and makes every
#         int8/i32 operand tile-aligned for the MXU path).
#   Wq_m / Wq_p: (160, 160) int8 — the MDS / bridge matrices quantized by
#         ops/gl_mxu.quantize_matrix (7-bit limb-stacked), acting on column
#         states: out = M^T @ st  (same convention as the jnp _mat_mul).
#   Wq_s: (RP·160, 160) int8 — one matrix PER PARTIAL ROUND.  Round r's
#         linear part is itself a 12x12 GL matrix A_r (identity except
#         row 0 = Sa_r and column 0 rows 1.. = Sb_r), so the whole partial
#         round after the row-0 sbox is ONE MXU matmul:
#             new = A_r @ st'    (st' = st with row0 <- pow7(st0) + c_r)
#         A_r[0, j] = S[23r + j];  A_r[k, 0] = S[23r + T + k - 1];
#         A_r[k, k] = 1 (k >= 1) — matching the reference's Sa-dot +
#         Sb-update partial-round form (poseidon.js:89-98) bit-exactly.

T_PAD = 16
_NLROWS = gl_mxu.NL * T_PAD  # 160 int8 rows per quantized operand


@functools.lru_cache(maxsize=None)
def _const_planes():
    C = np.asarray(ref.C, dtype=np.uint64)
    M = np.asarray(ref.M, dtype=np.uint64)
    P = np.asarray(ref.P, dtype=np.uint64)
    S = np.asarray(ref.S, dtype=np.uint64).reshape(RP, 2 * T - 1)
    # add-round constant columns, in consumption order:
    #   col 0: C row 0 (initial add)
    #   cols 1..HALF_F-1: first-half full-round rows
    #   col HALF_F: the bridge row
    #   cols HALF_F+1 .. +RP: partial-round constants (c at row 0 only)
    #   last HALF_F-1 cols: second-half full-round rows
    cols = [C[0:T]]
    for r in range(HALF_F - 1):
        cols.append(C[(r + 1) * T : (r + 2) * T])
    cols.append(C[HALF_F * T : (HALF_F + 1) * T])
    for r in range(RP):
        col = np.zeros(T, dtype=np.uint64)
        col[0] = C[(HALF_F + 1) * T + r]
        cols.append(col)
    base = (HALF_F + 1) * T + RP
    for r in range(HALF_F - 1):
        cols.append(C[base + r * T : base + (r + 1) * T])
    c_t = np.zeros((T_PAD, len(cols)), dtype=np.uint64)
    c_t[:T] = np.stack(cols, axis=1)

    def quant16(w):
        wp = np.zeros((T_PAD, T_PAD), dtype=np.uint64)
        wp[: w.shape[0], : w.shape[1]] = w
        return gl_mxu.quantize_matrix(wp)

    a_rs = []
    for r in range(RP):
        a = np.zeros((T, T), dtype=np.uint64)
        a[0, :] = S[r, :T]
        for k in range(1, T):
            a[k, k] = 1
            a[k, 0] = S[r, T + k - 1]
        a_rs.append(quant16(a))

    def pair(a):
        return (
            (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32),
        )

    return {
        "c": pair(c_t),
        "wq_m": quant16(M.T.copy()),
        "wq_p": quant16(P.T.copy()),
        "wq_s": np.concatenate(a_rs, axis=0),
    }


_C_PARTIAL0 = HALF_F + 1  # first partial-round column in C_t
_C_SECOND0 = _C_PARTIAL0 + RP


def _kernel(c_lo, c_hi, wq_m, wq_p, wq_s, lo_ref, hi_ref,
            out_lo_ref, out_hi_ref):
    """30-round permutation on a (16, _BLOCK) zero-padded block: sboxes on
    the VPU, every linear map as one exact int8 limb matmul on the MXU."""

    def c_col(r):
        # static round index: (16, 1) constant column (Mosaic rejects
        # dynamic lane slices, so the round loops are Python-unrolled)
        return c_lo[:, r : r + 1], c_hi[:, r : r + 1]

    def add_pair(a, b):
        return _add(a[0], a[1], b[0], b[1])

    def mxu_mat(st, wq):
        xl = gl_mxu.extract_limbs(st[0], st[1])  # (160, B) int8
        y = jax.lax.dot_general(
            wq, xl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return gl_mxu.recombine(y, T_PAD)

    def pow7_st(st):
        return _pow7(st[0], st[1])

    # zero-pad the 12-row block to 16 rows; the pad rows stay zero through
    # every round (quantized matrices have zero pad rows/cols, constant
    # columns pad with zeros, 0^7 = 0)
    zpad = ((0, T_PAD - T), (0, 0))
    st = (jnp.pad(lo_ref[:], zpad), jnp.pad(hi_ref[:], zpad))
    st = add_pair(st, c_col(0))

    def full_round(r, st, c_off, wq):
        st = pow7_st(st)
        st = add_pair(st, c_col(r + c_off))
        return mxu_mat(st, wq)

    for r in range(HALF_F - 1):
        st = full_round(r, st, 1, wq_m[:])
    # bridge round: pow7 + C col HALF_F + P matrix
    st = full_round(HALF_F - 1, st, 1, wq_p[:])

    row0 = jax.lax.broadcasted_iota(jnp.int32, (T_PAD, 1), 0) == 0

    def partial_round(r, st):
        x0 = pow7_st((st[0][0:1, :], st[1][0:1, :]))
        c = r + _C_PARTIAL0
        x0 = add_pair(x0, (c_lo[0:1, c : c + 1], c_hi[0:1, c : c + 1]))
        stl = jnp.where(row0, x0[0], st[0])
        sth = jnp.where(row0, x0[1], st[1])
        # whole linear part (Sa dot + Sb column update) as one matmul
        return mxu_mat((stl, sth), wq_s[r * _NLROWS : (r + 1) * _NLROWS, :])

    for r in range(RP):
        st = partial_round(r, st)

    for r in range(HALF_F - 1):
        st = full_round(r, st, _C_SECOND0, wq_m[:])
    st = pow7_st(st)
    st = mxu_mat(st, wq_m[:])

    out_lo_ref[:] = st[0][:T]
    out_hi_ref[:] = st[1][:T]


@functools.lru_cache(maxsize=None)
def _pallas_permute(n_blocks: int, interpret: bool):
    grid = (n_blocks,)
    spec = pl.BlockSpec((T, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)

    def cspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    k = _const_planes()
    n_c = k["c"][0].shape[1]
    consts_spec = [
        cspec(T_PAD, n_c), cspec(T_PAD, n_c),
        cspec(_NLROWS, _NLROWS), cspec(_NLROWS, _NLROWS),
        cspec(RP * _NLROWS, _NLROWS),
    ]
    return jax.jit(
        lambda consts, lo, hi: pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=consts_spec + [spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
                jax.ShapeDtypeStruct((T, n_blocks * _BLOCK), jnp.uint32),
            ],
            interpret=interpret,
        )(*consts, lo, hi)
    )


def _permute_planes(lo, hi, interpret: bool):
    """(12, B) u32 limb planes -> permuted planes; B a _BLOCK multiple."""
    k = _const_planes()
    consts = (
        jnp.asarray(k["c"][0]), jnp.asarray(k["c"][1]),
        jnp.asarray(k["wq_m"]), jnp.asarray(k["wq_p"]),
        jnp.asarray(k["wq_s"]),
    )
    return _pallas_permute(lo.shape[1] // _BLOCK, interpret)(consts, lo, hi)


# Batch-size buckets: every dispatch pads to one of THREE fixed batch
# shapes (larger batches scan the _CHUNK program), so the process compiles
# at most 3 Mosaic kernels total — each new pallas shape costs ~1 min
# through the remote compile relay, and tree levels would otherwise touch
# one shape per power-of-two level size.  Production batches are powers of
# two, so bucket padding wastes at most 2x on the (tiny) mid-size levels.
_BUCKETS = (1 << 12, 1 << 14, 1 << 16)
_CHUNK = _BUCKETS[-1]


def permute_planes_pair(state, interpret: bool | None = None):
    """Batched permutation on a (lo, hi) uint32 (12, B) PLANAR pair —
    lanes are the batch, rows the Poseidon state.  This is the kernel's
    native layout: callers that keep their data planar (the planar commit
    pipeline: LDE output, tree levels) pay NO transposes at the entry —
    permute_pair's (B, 12) API costs one relayout in and one out per
    dispatch.  Pads the batch to a fixed bucket (or scans the _CHUNK-sized
    program); usable inside jit/scan bodies."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    lo, hi = state
    b = lo.shape[1]
    if b <= _CHUNK:
        pb = next(p for p in _BUCKETS if p >= b)
        if pb != b:
            lo = jnp.pad(lo, ((0, 0), (0, pb - b)))
            hi = jnp.pad(hi, ((0, 0), (0, pb - b)))
        olo, ohi = _permute_planes(lo, hi, interpret)
        return olo[:, :b], ohi[:, :b]
    pb = -(-b // _CHUNK) * _CHUNK
    if pb != b:
        lo = jnp.pad(lo, ((0, 0), (0, pb - b)))
        hi = jnp.pad(hi, ((0, 0), (0, pb - b)))
    nc = pb // _CHUNK
    lo = jnp.moveaxis(lo.reshape(T, nc, _CHUNK), 1, 0)
    hi = jnp.moveaxis(hi.reshape(T, nc, _CHUNK), 1, 0)

    def body(_, ch):
        clo, chi = ch
        return None, _permute_planes(clo, chi, interpret)

    _, (olo, ohi) = jax.lax.scan(body, None, (lo, hi))
    olo = jnp.moveaxis(olo, 0, 1).reshape(T, pb)
    ohi = jnp.moveaxis(ohi, 0, 1).reshape(T, pb)
    return olo[:, :b], ohi[:, :b]


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
