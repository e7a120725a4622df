"""Poseidon-GL permutation as a Pallas TPU kernel (MXU linear maps).

The batched permutation is the inner loop of Merkle tree builds (SURVEY.md
§3.2 hot loop #2).  The jnp/XLA path (jax_poseidon) is a chain of ~90
scanned element-wise stages — one HBM round trip per round; this kernel
keeps the entire 30-round permutation in VMEM for a block of states — one
HBM read and one write per state.

Layout: the batch is split into blocks of `_BLOCK` states; each block is a
(12, _BLOCK) u32 limb plane pair (state elements on sublanes, batch on
lanes).  Every GL *linear map* in the permutation — the MDS multiply of
the full rounds, the bridge P matrix, and the whole linear part of each
partial round — runs on the MXU as an exact s8 x s8 -> s32 limb-stacked
matmul (ops/gl_mxu) PACKED to a single 128x128 tile: the 10 7-bit limbs
of the 12 real state rows occupy 120 rows, zero-padded to 128, so each
matmul is one MXU tile pass instead of the 2x2 padded passes a 16-row
state would cost.  Three further measured wins (round 5, chip-timed):

  * LAZY arithmetic — adds and limb recombinations keep any-u64
    representatives (x ≡ x mod p, x < 2^64), with ONE canonicalization at
    kernel exit.  Valid because both the sbox multiply (full 128-bit
    product, any u64 inputs) and the limb matmul (W·x ≡ W·(x mod p)) are
    congruence-preserving.  +23% throughput.
  * Partial-round sboxes at full sublane utilization — row 0 of the
    state is a (1, B) vector (1/8 sublane occupancy, and 22 of 30 rounds
    sbox only row 0); it is re-laid as (B/128, 128) via lane-tile slices
    (offset-0 layouts Mosaic accepts), pow7'd there, and reassembled with
    one-hot sublane mask + reduction.  ~2x whole-kernel throughput.
  * _BLOCK = 2048 — the measured optimum of {512, 1024, 2048, 4096}.

The 30 rounds are Python-unrolled with STATIC constant slices (Mosaic
rejects dynamic lane/sublane slices), and permute_pair pads every batch to
one of three fixed buckets so the process compiles at most three kernel
shapes.

Differentially tested against the numpy oracle / golden digests
(tests/test_pallas_poseidon.py) — bit-exact; the lazy fold corners are
pinned by tests/test_lazy_gl.py (adversarial near-2^64 operands).
Sustained (long-chain) rate ~33M perms/s on v5e vs ~21M for the round-4
16-row kernel; see PROBES_r05.md for the full measurement record and the
burst-vs-sustained timing caveat.
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
NL = gl_mxu.NL

_BLOCK = 2048  # states per kernel instance (lanes dim = _BLOCK)

MASK16 = np.uint32(0xFFFF)
EPS32 = np.uint32(0xFFFFFFFF)
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)
_MASK7 = np.uint32(0x7F)


def _b2u(b):
    return b.astype(jnp.uint32)


def _canon(lo, hi):
    """x mod p for any u64 representative (x < 2^64 < 2p)."""
    geq = (hi == EPS32) & (lo >= P_LO)
    lo2 = lo - P_LO
    bor = _b2u(lo < P_LO)
    hi2 = hi - P_HI - bor
    return jnp.where(geq, lo2, lo), jnp.where(geq, hi2, hi)


def _fold_carry(lo, hi, c):
    """(lo, hi) + c·2^64 ≡ (lo, hi) + c·ε for ANY u64 (c in {0,1}).

    Two folds: the first ε-add can carry past hi = 0xFFFFFFFF (dropping
    another 2^64 ≡ ε) — with canonical operands the bounds exclude this,
    with lazy any-u64 representatives it happens at ~2^-32 per op, which
    a 2^21-leaf tree build hits."""
    a1 = c * EPS32
    lo2 = lo + a1
    c2 = _b2u(lo2 < lo)
    hi2 = hi + c2
    w = c2 & _b2u(hi2 == 0)
    lo3 = lo2 + w * EPS32
    c3 = _b2u(lo3 < lo2)
    return lo3, hi2 + c3


def _add(alo, ahi, blo, bhi):
    """Lazy GL add: any-u64 in, any-u64 representative out (no canon)."""
    lo = alo + blo
    c = _b2u(lo < alo)
    h1 = ahi + bhi
    c1 = h1 < ahi
    hi = h1 + c
    c2 = hi < h1
    return _fold_carry(lo, hi, _b2u(c1 | c2))


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
    """GL multiply of any-u64 inputs; canonical output.

    (Keeping the final canon here measured FASTER than a lazy tail —
    the sbox chain feeds itself, and the canon adds scheduling slack.)"""
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
    lo2, hi2 = _fold_borrow(lo, hi, _b2u(bor64))
    t1lo = jnp.uint32(0) - n2c
    t1hi = n2c - _b2u(n2c != 0)
    lo3 = lo2 + t1lo
    c = _b2u(lo3 < lo2)
    h1 = hi2 + t1hi
    c1_ = h1 < hi2
    hi3 = h1 + c
    c2_ = hi3 < h1
    lo4, hi4 = _fold_carry(lo3, hi3, _b2u(c1_ | c2_))
    return _canon(lo4, hi4)


def _fold_borrow(lo, hi, b):
    """(lo, hi) - b·2^64 ≡ (lo, hi) - b·ε for ANY u64 (b in {0,1});
    the ε-subtract can itself borrow past hi = 0 (see _fold_carry)."""
    s1 = b * EPS32
    lo2 = lo - s1
    b2 = _b2u(lo < s1)
    hi2 = hi - b2
    w = b2 & _b2u(hi == 0)
    lo3 = lo2 - w * EPS32
    b3 = _b2u(lo2 < w * EPS32)
    return lo3, hi2 - b3


def _pow7(lo, hi):
    l2, h2 = _mul(lo, hi, lo, hi)
    l3, h3 = _mul(l2, h2, lo, hi)
    l4, h4 = _mul(l2, h2, l2, h2)
    return _mul(l4, h4, l3, h3)


# ---------------------------------------------------------------------------
# constant tables:
#   C_t:  (16, n_rounds_with_c) u32 limb planes — round-constant COLUMNS
#         (rows 12..15 zero; the kernel consumes rows :12).
#   Wq_m / Wq_p: (128, 128) int8 — the MDS / bridge matrices quantized by
#         ops/gl_mxu.quantize_matrix (7-bit limb-stacked, 10·12 = 120 real
#         rows/cols zero-padded to one MXU tile), acting on column states:
#         out = M^T @ st  (same convention as the jnp _mat_mul).
#   Wq_s: (RP·128, 128) int8 — one matrix PER PARTIAL ROUND.  Round r's
#         linear part is itself a 12x12 GL matrix A_r (identity except
#         row 0 = Sa_r and column 0 rows 1.. = Sb_r), so the whole partial
#         round after the row-0 sbox is ONE MXU matmul:
#             new = A_r @ st'    (st' = st with row0 <- pow7(st0) + c_r)
#         A_r[0, j] = S[23r + j];  A_r[k, 0] = S[23r + T + k - 1];
#         A_r[k, k] = 1 (k >= 1) — matching the reference's Sa-dot +
#         Sb-update partial-round form (poseidon.js:89-98) bit-exactly.


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
    c_t = np.zeros((16, len(cols)), dtype=np.uint64)
    c_t[:T] = np.stack(cols, axis=1)

    def quant128(w):
        q = gl_mxu.quantize_matrix(w)  # (120, 120)
        out = np.zeros((128, 128), dtype=np.int8)
        out[:120, :120] = q
        return out

    a_rs = []
    for r in range(RP):
        a = np.zeros((T, T), dtype=np.uint64)
        a[0, :] = S[r, :T]
        for k in range(1, T):
            a[k, k] = 1
            a[k, 0] = S[r, T + k - 1]
        a_rs.append(quant128(a))

    def pair(a):
        return (
            (a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32),
        )

    return {
        "c": pair(c_t),
        "wq_m": quant128(M.T.copy()),
        "wq_p": quant128(P.T.copy()),
        "wq_s": np.concatenate(a_rs, axis=0),
    }


_C_PARTIAL0 = HALF_F + 1  # first partial-round column in C_t
_C_SECOND0 = _C_PARTIAL0 + RP


def _extract_packed(lo, hi):
    """(12, B) u32 pair -> (128, B) int8: 10 limb groups of 12 rows,
    zero-padded to one MXU tile."""
    planes = [
        lo & _MASK7,
        (lo >> 7) & _MASK7,
        (lo >> 14) & _MASK7,
        (lo >> 21) & _MASK7,
        ((lo >> 28) | (hi << 4)) & _MASK7,
        (hi >> 3) & _MASK7,
        (hi >> 10) & _MASK7,
        (hi >> 17) & _MASK7,
        (hi >> 24) & _MASK7,
        hi >> 31,
    ]
    out = jnp.concatenate([p.astype(jnp.int8) for p in planes], axis=0)
    return jnp.pad(out, ((0, 128 - NL * T), (0, 0)))


def _recombine_packed(y):
    """(128, B) s32 output-limb planes -> lazy (lo, hi) u32 (12, B).

    out[k] = sum_a Y_a[k] << 7a (mod p) with Y_a < NL·T·127² < 2^21:
    pairs limbs into five 14-bit-spaced u32 words, carry-accumulates into
    a 96-bit (v0, v1, v2), and reduces — WITHOUT the final canon (lazy)."""
    ya = [y[a * T : (a + 1) * T].astype(jnp.uint32) for a in range(NL)]
    z = [ya[2 * c] + (ya[2 * c + 1] << 7) for c in range(5)]
    a1 = z[1] << 14
    a2 = z[2] << 28
    v0 = z[0] + a1
    c01 = (v0 < a1).astype(jnp.uint32)
    v0b = v0 + a2
    c02 = (v0b < a2).astype(jnp.uint32)
    v1 = (z[1] >> 18) + (z[2] >> 4) + c01 + c02  # < 2^29: no wrap
    b3 = z[3] << 10
    b4 = z[4] << 24
    v1b = v1 + b3
    c13 = (v1b < b3).astype(jnp.uint32)
    v1c = v1b + b4
    c14 = (v1c < b4).astype(jnp.uint32)
    v2 = (z[3] >> 22) + (z[4] >> 8) + c13 + c14  # < 2^25: no wrap
    # 128-bit reduce (2^64 = 2^32 - 1, 2^96 = -1 mod p), lazy tail
    n0, n1b, n2c = v0b, v1c, v2
    lo = n0
    hi = n1b
    t1lo = jnp.uint32(0) - n2c
    t1hi = n2c - _b2u(n2c != 0)
    lo3 = lo + t1lo
    c = _b2u(lo3 < lo)
    h1 = hi + t1hi
    c1_ = h1 < hi
    hi3 = h1 + c
    c2_ = hi3 < h1
    return _fold_carry(lo3, hi3, _b2u(c1_ | c2_))


def _kernel(c_lo, c_hi, wq_m, wq_p, wq_s, x_ref, out_ref):
    """30-round permutation on a COMBINED (24, _BLOCK) block (rows 0..11
    lo limbs, 12..23 hi limbs — 3 exact (8,128) tiles, so each grid step
    is ONE aligned input DMA and one output DMA; the split (12, B) pair
    layout measured 33.8M perms/s streamed vs 47.4M combined): sboxes on
    the VPU, every linear map as one 128x128 int8 limb matmul on the MXU,
    lazy representatives between ops, one canon at exit."""
    x = x_ref[:]
    st = (x[:T], x[T:])
    block = x.shape[1]

    def c_col(r):
        # static round index: (12, 1) constant column (Mosaic rejects
        # dynamic lane/sublane slices, so the round loops are unrolled)
        return c_lo[:T, r : r + 1], c_hi[:T, r : r + 1]

    def add_pair(a, b):
        return _add(a[0], a[1], b[0], b[1])

    def mxu_mat(st, wq):
        xl = _extract_packed(st[0], st[1])
        y = jax.lax.dot_general(
            wq, xl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return _recombine_packed(y)

    st = add_pair(st, c_col(0))

    def full_round(r, st, c_off, wq):
        st = _pow7(st[0], st[1])
        st = add_pair(st, c_col(r + c_off))
        return mxu_mat(st, wq)

    for r in range(HALF_F - 1):
        st = full_round(r, st, 1, wq_m[:])
    # bridge round: pow7 + C col HALF_F + P matrix
    st = full_round(HALF_F - 1, st, 1, wq_p[:])

    row0 = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) == 0
    nc = block // 128
    riota = jax.lax.broadcasted_iota(jnp.int32, (nc, 128), 0)

    def pick(arr, i):
        # row i of a (nc, 128) block as a canonical-layout (1, 128)
        s = jnp.sum(
            jnp.where(riota == i, arr, jnp.uint32(0)).astype(jnp.int32),
            axis=0, keepdims=True)
        return s.astype(jnp.uint32)

    def partial_round(r, st):
        # row 0 re-laid (1, B) -> (B/128, 128): lane-tile slices keep
        # offset-0 layouts, so pow7 runs at full sublane utilization
        xl = st[0][0:1, :]
        xh = st[1][0:1, :]
        xcl = jnp.concatenate(
            [xl[:, i * 128 : (i + 1) * 128] for i in range(nc)], axis=0)
        xch = jnp.concatenate(
            [xh[:, i * 128 : (i + 1) * 128] for i in range(nc)], axis=0)
        y = _pow7(xcl, xch)
        x0 = (
            jnp.concatenate([pick(y[0], i) for i in range(nc)], axis=1),
            jnp.concatenate([pick(y[1], i) for i in range(nc)], axis=1),
        )
        c = r + _C_PARTIAL0
        x0 = add_pair(x0, (c_lo[0:1, c : c + 1], c_hi[0:1, c : c + 1]))
        stl = jnp.where(row0, x0[0], st[0])
        sth = jnp.where(row0, x0[1], st[1])
        # whole linear part (Sa dot + Sb column update) as one matmul
        return mxu_mat((stl, sth), wq_s[r * 128 : (r + 1) * 128, :])

    for r in range(RP):
        st = partial_round(r, st)

    for r in range(HALF_F - 1):
        st = full_round(r, st, _C_SECOND0, wq_m[:])
    st = _pow7(st[0], st[1])
    st = mxu_mat(st, wq_m[:])
    st = _canon(st[0], st[1])

    out_ref[:] = jnp.concatenate([st[0], st[1]], axis=0)


@functools.lru_cache(maxsize=None)
def _pallas_permute(n_blocks: int, interpret: bool):
    grid = (n_blocks,)
    spec = pl.BlockSpec((2 * T, _BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)

    def cspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    k = _const_planes()
    n_c = k["c"][0].shape[1]
    consts_spec = [
        cspec(16, n_c), cspec(16, n_c),
        cspec(128, 128), cspec(128, 128),
        cspec(RP * 128, 128),
    ]
    return jax.jit(
        lambda consts, x: pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=consts_spec + [spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(
                (2 * T, n_blocks * _BLOCK), jnp.uint32),
            interpret=interpret,
        )(*consts, x)
    )


def _permute_combined(x, interpret: bool):
    """(24, B) combined u32 limb planes -> permuted; B a _BLOCK multiple."""
    k = _const_planes()
    consts = (
        jnp.asarray(k["c"][0]), jnp.asarray(k["c"][1]),
        jnp.asarray(k["wq_m"]), jnp.asarray(k["wq_p"]),
        jnp.asarray(k["wq_s"]),
    )
    return _pallas_permute(x.shape[1] // _BLOCK, interpret)(consts, x)


def _permute_planes(lo, hi, interpret: bool):
    """(12, B) u32 limb plane pair -> permuted pair; B a _BLOCK multiple.

    The kernel's native I/O is the combined 24-row array; the concat here
    replaces the state-assembly concat callers already paid."""
    out = _permute_combined(jnp.concatenate([lo, hi], axis=0), interpret)
    return out[:T], out[T:]


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
    # static lane slices, one kernel call per chunk, single concat out —
    # a lax.scan here would relayout (T, nc·CHUNK) <-> (nc, T, CHUNK)
    # through HBM on every call (measured 2.3x slower at nc=4)
    outs = [
        _permute_planes(lo[:, i * _CHUNK : (i + 1) * _CHUNK],
                        hi[:, i * _CHUNK : (i + 1) * _CHUNK], interpret)
        for i in range(nc)
    ]
    olo = jnp.concatenate([o[0] for o in outs], axis=1)
    ohi = jnp.concatenate([o[1] for o in outs], axis=1)
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
    outs = [
        _permute_planes(lo[i * _CHUNK : (i + 1) * _CHUNK].T,
                        hi[i * _CHUNK : (i + 1) * _CHUNK].T, interpret)
        for i in range(nc)
    ]
    olo = jnp.concatenate([o[0].T for o in outs], axis=0)
    ohi = jnp.concatenate([o[1].T for o in outs], axis=0)
    return olo[:b], ohi[:b]


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
