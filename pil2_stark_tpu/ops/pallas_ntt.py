"""VMEM-resident NTT base transform as a Pallas TPU kernel.

The four-step NTT (ops/ntt.py) reduces every large transform to base
transforms of 2^11..2^12 rows.  The pure-jnp base (`_axis0_base`) is a
chain of `bits` butterfly stages that XLA materialises through HBM —
~`bits` HBM round-trips per base call, which round-1 profiling showed is
the dominant cost of the whole NTT (SURVEY.md §6 roofline target).  This
kernel runs all stages on a (n, TILE)-column block held in VMEM: one HBM
read and one write per block.

Butterfly formulation (no gathers, no concatenates — Mosaic-friendly):
a radix-2 DIT stage with half = 2^(s-1) pairs row r with r ^ half.  With
t = T_s · x  (T_s[r] = w_s^(r mod half), precomputed per stage):

    y[r] = x[r] + t[r + half]          if r & half == 0   ("u" rows)
    y[r] = x[r - half] - t[r]          if r & half != 0   ("v" rows)

i.e. two cyclic sublane rolls + a select per stage; every element of t on
a v-row is consumed exactly once, wrap-around rows are never selected.
Input must be bit-reverse permuted (callers fuse the jnp.take into the
preceding XLA op); output is natural order — matching `_axis0_base`
(same math as /root/reference/src/helpers/fft/fft.js:118-163) bit-exactly.

Twiddles ride as a (n, 2·bits) u32 ref (stage s: lo in column 2s, hi in
2s+1) — constant block index, so Pallas DMAs it once and revisits.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl64
from ..field import jax_gl as gl
from . import gl_mxu

_TILE = 128  # lanes per block; (4096, 128) u32 ×2 limbs = 4 MB in VMEM

# ---------------------------------------------------------------------------
# MXU stage-group: on bit-reversed DIT input the first 7 stages act
# independently within every aligned 128-row group, i.e. they are ONE
# shared 128x128 GL matrix D (the product of the stage-1..7 butterfly
# maps).  D rides the MXU as an exact s8 x s8 -> s32 limb-stacked matmul
# (ops/gl_mxu): ~70 VPU ops/point of extract/recombine replace ~3.5 GL
# muls/point (~230 ops) of butterflies, and the multiplies move to the
# otherwise-idle systolic array.  Remaining stages (8..bits) stay on the
# fused-pair butterfly path below.

_GRP_BITS = 7
_GRP = 1 << _GRP_BITS


@functools.lru_cache(maxsize=None)
def _dft_grp_quant(inverse: bool) -> np.ndarray:
    """Quantized (1280, 1280) int8 limb matrix of the stage-1..7 product."""
    m = np.zeros((_GRP, _GRP), dtype=np.uint64)
    np.fill_diagonal(m, 1)
    n = _GRP
    for s in range(1, _GRP_BITS + 1):
        blk = 1 << s
        half = blk >> 1
        w = gl64.w_inv(s) if inverse else gl64.w(s)
        tw = gl64.powers(w, half)[None, :, None]
        v = m.reshape(n // blk, blk, -1)
        u = v[:, :half]
        t = gl64.mul(tw, v[:, half:])
        m = np.concatenate(
            [gl64.add(u, t), gl64.sub(u, t)], axis=1
        ).reshape(n, -1)
    return gl_mxu.quantize_matrix(m)


def _dft_wq(inverse: bool):
    return jnp.asarray(_dft_grp_quant(inverse))


def _grp_mxu(dft_ref, lo, hi, n: int, b: int):
    """Apply the 7-stage group transform to every 128-row group of an
    (n, b) block via one limb matmul (relayout groups onto lanes)."""
    g = n // _GRP
    if g > 1:
        lo = jnp.swapaxes(lo.reshape(g, _GRP, b), 0, 1).reshape(_GRP, g * b)
        hi = jnp.swapaxes(hi.reshape(g, _GRP, b), 0, 1).reshape(_GRP, g * b)
    xl = gl_mxu.extract_limbs(lo, hi)
    y = jax.lax.dot_general(
        dft_ref[:], xl, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    lo, hi = gl_mxu.recombine(y, _GRP)
    if g > 1:
        lo = jnp.swapaxes(lo.reshape(_GRP, g, b), 0, 1).reshape(n, b)
        hi = jnp.swapaxes(hi.reshape(_GRP, g, b), 0, 1).reshape(n, b)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _stage_twiddles(bits: int, inverse: bool) -> np.ndarray:
    """(n, 2·bits) u32: per-stage full-length twiddle vectors
    T_s[r] = w_s^(r mod 2^(s-1)), limb pair interleaved by column."""
    n = 1 << bits
    out = np.empty((n, 2 * bits), dtype=np.uint32)
    r = np.arange(n)
    for s in range(1, bits + 1):
        half = 1 << (s - 1)
        ws = gl64.w_inv(s) if inverse else gl64.w(s)
        pows = gl64.powers(ws, half)
        col = pows[r % half]
        out[:, 2 * (s - 1)] = (col & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        out[:, 2 * (s - 1) + 1] = (col >> np.uint64(32)).astype(np.uint32)
    return out


# ---------------------------------------------------------------------------
# lazy GL ops (round 5): inside the stage chain every value may be ANY
# u64 representative (x ≡ x mod p, x < 2^64) — adds/subs/muls skip the
# canonicalizing compare-subtract, and each kernel canonicalizes ONCE at
# exit.  Valid because the full-product multiply and the butterfly
# add/sub are congruence-preserving for arbitrary u64 inputs.


def _b2u(b):
    return b.astype(jnp.uint32)


_EPS32 = np.uint32(0xFFFFFFFF)


def _fold_carry(lo, hi, c):
    """(lo, hi) + c·2^64 ≡ + c·ε for ANY u64; the ε-add can carry past
    hi = 0xFFFFFFFF (dropping another 2^64 ≡ ε) — reachable at ~2^-32
    per op with lazy representatives, so fold twice."""
    a1 = c * _EPS32
    lo2 = lo + a1
    c2 = _b2u(lo2 < lo)
    hi2 = hi + c2
    w = c2 & _b2u(hi2 == 0)
    lo3 = lo2 + w * _EPS32
    c3 = _b2u(lo3 < lo2)
    return lo3, hi2 + c3


def _fold_borrow(lo, hi, b):
    """(lo, hi) - b·2^64 ≡ - b·ε for ANY u64; the ε-subtract can borrow
    past hi = 0 — fold twice (see _fold_carry)."""
    s1 = b * _EPS32
    lo2 = lo - s1
    b2 = _b2u(lo < s1)
    hi2 = hi - b2
    w = b2 & _b2u(hi == 0)
    lo3 = lo2 - w * _EPS32
    b3 = _b2u(lo2 < w * _EPS32)
    return lo3, hi2 - b3


def _lazy_add(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo + blo
    c = _b2u(lo < alo)
    h1 = ahi + bhi
    c1 = h1 < ahi
    hi = h1 + c
    c2 = hi < h1
    return _fold_carry(lo, hi, _b2u(c1 | c2))


def _lazy_sub(a, b):
    alo, ahi = a
    blo, bhi = b
    lo = alo - blo
    bor = _b2u(alo < blo)
    h1 = ahi - bhi
    b1 = ahi < bhi
    hi = h1 - bor
    b2 = h1 < bor
    return _fold_borrow(lo, hi, _b2u(b1 | b2))


def _lazy_mul(a, b):
    n0, n1, n2, n3 = gl._mul_wide(a, b)
    lo = n0 - n3
    bor0 = _b2u(n0 < n3)
    hi = n1 - bor0
    bor64 = n1 < bor0
    lo2, hi2 = _fold_borrow(lo, hi, _b2u(bor64))
    t1lo = jnp.uint32(0) - n2
    t1hi = n2 - _b2u(n2 != 0)
    lo3 = lo2 + t1lo
    c = _b2u(lo3 < lo2)
    h1 = hi2 + t1hi
    c1_ = h1 < hi2
    hi3 = h1 + c
    c2_ = hi3 < h1
    return _fold_carry(lo3, hi3, _b2u(c1_ | c2_))


def _canon_pair(lo, hi):
    geq = (hi == _EPS32) & (lo >= np.uint32(1))
    lo2 = lo - np.uint32(1)
    bor = _b2u(lo < np.uint32(1))
    hi2 = hi - _EPS32 - bor
    return jnp.where(geq, lo2, lo), jnp.where(geq, hi2, hi)


def _roll(x, shift: int):
    """Cyclic roll along sublanes: result[r] = x[(r - shift) % n]."""
    return pltpu.roll(x, shift % x.shape[0], 0)


def _make_kernel(bits: int):
    if bits >= _GRP_BITS:
        def kernel(tw_ref, dft_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits, dft_ref)
            lo, hi = _canon_pair(lo, hi)
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi
    else:
        def kernel(tw_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits)
            lo, hi = _canon_pair(lo, hi)
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi

    return kernel


def _dft_spec():
    nl = gl_mxu.NL * _GRP
    return pl.BlockSpec((nl, nl), lambda *idx: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _pallas_base(bits: int, n_blocks: int, interpret: bool):
    n = 1 << bits
    data_spec = pl.BlockSpec((n, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((n, 2 * bits), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    mxu = bits >= _GRP_BITS
    return pl.pallas_call(
        _make_kernel(bits),
        grid=(n_blocks,),
        in_specs=[tw_spec] + ([_dft_spec()] if mxu else [])
        + [data_spec, data_spec],
        out_specs=[data_spec, data_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, n_blocks * _TILE), jnp.uint32),
            jax.ShapeDtypeStruct((n, n_blocks * _TILE), jnp.uint32),
        ],
        # the stage chain keeps ~10 (n, TILE) u32 temps live; the default
        # 16 MB scoped-vmem cap OOMs at n=4096 — v5e has 128 MiB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def supported(bits: int, b: int) -> bool:
    """Shapes the kernel handles: whole lane tiles, ≥ 8 sublanes,
    block ≤ VMEM budget (2^12 rows)."""
    return 3 <= bits <= 12 and b % _TILE == 0 and b > 0


def profitable(bits: int, b: int) -> bool:
    """Shapes where the kernel beats XLA's fused jnp butterfly chain,
    measured on v5e: big bases with enough column tiles to pipeline the
    grid.  Small bases / few tiles lose to fusion (the pallas_call
    boundary forces HBM materialisation that XLA would have fused away):
    2^22 = (10, 12·B=1024) ran 2.8× slower with the kernel, while
    2^24 = (12·B=4096)² ran 1.5× faster."""
    return supported(bits, b) and bits >= 11 and b >= 2048


def _stage_roll(tw_ref, lo, hi, s: int, n: int, row):
    """Single radix-2 stage in the roll formulation (used for half < 8,
    where sublane-block slicing is not tile-aligned)."""
    half = 1 << (s - 1)
    tlo = tw_ref[:, 2 * (s - 1)].reshape(n, 1)
    thi = tw_ref[:, 2 * (s - 1) + 1].reshape(n, 1)
    plo, phi = _lazy_mul((tlo, thi), (lo, hi))
    is_v = (row & half) != 0
    alo, ahi = _lazy_add((lo, hi), (_roll(plo, -half), _roll(phi, -half)))
    blo, bhi = _lazy_sub((_roll(lo, half), _roll(hi, half)), (plo, phi))
    return jnp.where(is_v, blo, alo), jnp.where(is_v, bhi, ahi)


def _tw_slice(tw_ref, s: int, half: int, lo_rows: int):
    """Stage-s twiddle vector w_s^(j), j in [0, half), as (half, 1) pair
    broadcast over a lo_rows-row block (tw table stores T_s[r] = w_s^(r mod
    half), so the first `half` rows ARE the power sequence)."""
    tlo = tw_ref[:half, 2 * (s - 1)].reshape(1, half, 1)
    thi = tw_ref[:half, 2 * (s - 1) + 1].reshape(1, half, 1)
    return tlo, thi


def _butterflies(tw_ref, lo, hi, bits: int, dft_ref=None):
    """DIT butterfly network on bit-reversed input, natural-order output.

    With dft_ref (bits >= 7) the first 7 stages run as one MXU limb
    matmul per 128-row group (_grp_mxu).  Remaining stages: half < 8 runs
    the roll formulation; aligned stages run a sliced-block formulation
    that multiplies ONLY the rows whose products are consumed (the roll
    form multiplies every row — half the muls are discarded), and
    consecutive aligned stages are FUSED IN PAIRS, reusing the stage-s
    products for both x1 and x3 sub-blocks: 4 twiddle muls per 4·half rows
    per 2 stages instead of 8.  GL muls dominate the VPU cost (~65 u32 ops
    vs ~10 for add/sub), so this roughly halves stage cost."""
    n = 1 << bits
    row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    b = lo.shape[1]

    s = 1
    if dft_ref is not None and bits >= _GRP_BITS:
        lo, hi = _grp_mxu(dft_ref, lo, hi, n, b)
        s = _GRP_BITS + 1
    while s <= bits and (1 << (s - 1)) < 8:
        lo, hi = _stage_roll(tw_ref, lo, hi, s, n, row)
        s += 1

    while s <= bits:
        h = 1 << (s - 1)
        if s + 1 <= bits:
            # fused pair (s, s+1): blocks of 4h rows [x0 x1 x2 x3]
            m2 = 4 * h
            lo3 = lo.reshape(n // m2, m2, b)
            hi3 = hi.reshape(n // m2, m2, b)
            x0 = (lo3[:, :h], hi3[:, :h])
            x1 = (lo3[:, h : 2 * h], hi3[:, h : 2 * h])
            x2 = (lo3[:, 2 * h : 3 * h], hi3[:, 2 * h : 3 * h])
            x3 = (lo3[:, 3 * h :], hi3[:, 3 * h :])
            w1 = _tw_slice(tw_ref, s, h, h)
            t1 = _lazy_mul(w1, x1)
            t2 = _lazy_mul(w1, x3)
            p = _lazy_add(x0, t1)
            q = _lazy_sub(x0, t1)
            r_ = _lazy_add(x2, t2)
            s_ = _lazy_sub(x2, t2)
            # stage s+1 twiddles over j in [0, 2h): first/second halves
            w2lo = tw_ref[: 2 * h, 2 * s].reshape(1, 2 * h, 1)
            w2hi = tw_ref[: 2 * h, 2 * s + 1].reshape(1, 2 * h, 1)
            w2a = (w2lo[:, :h], w2hi[:, :h])
            w2b = (w2lo[:, h:], w2hi[:, h:])
            u2 = _lazy_mul(w2a, r_)
            v2 = _lazy_mul(w2b, s_)
            z0 = _lazy_add(p, u2)
            z1 = _lazy_add(q, v2)
            z2 = _lazy_sub(p, u2)
            z3 = _lazy_sub(q, v2)
            lo = jnp.concatenate([z0[0], z1[0], z2[0], z3[0]], axis=1)
            hi = jnp.concatenate([z0[1], z1[1], z2[1], z3[1]], axis=1)
            lo = lo.reshape(n, b)
            hi = hi.reshape(n, b)
            s += 2
        else:
            # trailing single aligned stage: blocks of 2h rows [x0 x1]
            m = 2 * h
            lo3 = lo.reshape(n // m, m, b)
            hi3 = hi.reshape(n // m, m, b)
            x0 = (lo3[:, :h], hi3[:, :h])
            x1 = (lo3[:, h:], hi3[:, h:])
            w1 = _tw_slice(tw_ref, s, h, h)
            t = _lazy_mul(w1, x1)
            a = _lazy_add(x0, t)
            c = _lazy_sub(x0, t)
            lo = jnp.concatenate([a[0], c[0]], axis=1).reshape(n, b)
            hi = jnp.concatenate([a[1], c[1]], axis=1).reshape(n, b)
            s += 1
    return lo, hi


# ---------------------------------------------------------------------------
# planar four-step level kernels (ops/ntt.py planar path)
#
# Data rides COLUMN-MAJOR: lanes of a step-1 block are (c fixed, i2 tile),
# so the (n1, n2) level-twiddle table tiles directly (no lane interleaving
# to expand) and the inter-level transpose is a clean 2D (n1, 128) ->
# (128, n1) relayout inside VMEM.  One HBM read + one write per level.


def _make_level_planar_kernel(bits: int):
    n = 1 << bits

    def kernel_mxu(tw_ref, dft_ref, lt_ref, ht_ref, lo_ref, hi_ref,
                   out_lo_ref, out_hi_ref):
        lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits, dft_ref)
        # level twiddle w^{o1·i2}: (n1, 128) slice of the (n1, n2) table
        lo, hi = gl.mul((lo, hi), (lt_ref[:], ht_ref[:]))
        # inter-level transpose (n1, 128) -> (128, n1)
        out_lo_ref[:] = jnp.transpose(lo, (1, 0))
        out_hi_ref[:] = jnp.transpose(hi, (1, 0))

    def kernel(tw_ref, lt_ref, ht_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits)
        lo, hi = gl.mul((lo, hi), (lt_ref[:], ht_ref[:]))
        out_lo_ref[:] = jnp.transpose(lo, (1, 0))
        out_hi_ref[:] = jnp.transpose(hi, (1, 0))

    return kernel_mxu if bits >= _GRP_BITS else kernel


@functools.lru_cache(maxsize=None)
def _pallas_level_planar(bits: int, n_blocks: int, n2_tiles: int,
                         interpret: bool):
    """grid i over all (C·n2)/128 lane tiles of the (n1, C·n2) input; the
    twiddle block index wraps per column (i % n2_tiles)."""
    n = 1 << bits
    data_spec = pl.BlockSpec((n, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((n, 2 * bits), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    lvl_spec = pl.BlockSpec((n, _TILE), lambda i: (0, i % n2_tiles),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_TILE, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    mxu = bits >= _GRP_BITS
    return pl.pallas_call(
        _make_level_planar_kernel(bits),
        grid=(n_blocks,),
        in_specs=[tw_spec] + ([_dft_spec()] if mxu else [])
        + [lvl_spec, lvl_spec, data_spec, data_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * _TILE, n), jnp.uint32),
            jax.ShapeDtypeStruct((n_blocks * _TILE, n), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def level_planar(x_brev, bits1: int, n2: int, n_cols: int, level_tw,
                 inverse: bool, interpret: bool | None = None):
    """Fused step-1 of a four-step level on column-major data: butterflies
    over the bit-reversed (n1, C·n2) pair + w^{o1·i2} twiddle + transpose
    to (C·n2, n1) (rows (c, i2) c-major)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tw = jnp.asarray(_stage_twiddles(bits1, inverse))
    n_blocks = (n_cols * n2) // _TILE
    fn = _pallas_level_planar(bits1, n_blocks, n2 // _TILE, interpret)
    if bits1 >= _GRP_BITS:
        return tuple(fn(tw, _dft_wq(inverse), level_tw[0], level_tw[1],
                        x_brev[0], x_brev[1]))
    return tuple(fn(tw, level_tw[0], level_tw[1], x_brev[0], x_brev[1]))


def _make_base_grid_kernel(bits: int):
    if bits >= _GRP_BITS:
        def kernel(tw_ref, dft_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits, dft_ref)
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi
    else:
        def kernel(tw_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
            lo, hi = _butterflies(tw_ref, lo_ref[:], hi_ref[:], bits)
            out_lo_ref[:] = lo
            out_hi_ref[:] = hi

    return kernel


@functools.lru_cache(maxsize=None)
def _pallas_base_grid(bits: int, n_cols: int, n1_tiles: int, interpret: bool):
    """Step-2 base: 2D grid (c, o1 tile) over a (C·n2, n1) array; each
    block is the (n2, 128) slice of one column batch."""
    n = 1 << bits
    data_spec = pl.BlockSpec((n, _TILE), lambda c, j: (c, j),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((n, 2 * bits), lambda c, j: (0, 0),
                           memory_space=pltpu.VMEM)
    mxu = bits >= _GRP_BITS
    return pl.pallas_call(
        _make_base_grid_kernel(bits),
        grid=(n_cols, n1_tiles),
        in_specs=[tw_spec] + ([_dft_spec()] if mxu else [])
        + [data_spec, data_spec],
        out_specs=[data_spec, data_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_cols * n, n1_tiles * _TILE), jnp.uint32),
            jax.ShapeDtypeStruct((n_cols * n, n1_tiles * _TILE), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def base_grid(x_brev, bits2: int, n_cols: int, inverse: bool,
              interpret: bool | None = None):
    """Per-column base transform along sublanes of a (C·n2, n1) pair whose
    rows are bit-reversed within each column batch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tw = jnp.asarray(_stage_twiddles(bits2, inverse))
    n1 = x_brev[0].shape[1]
    fn = _pallas_base_grid(bits2, n_cols, n1 // _TILE, interpret)
    if bits2 >= _GRP_BITS:
        return tuple(fn(tw, _dft_wq(inverse), x_brev[0], x_brev[1]))
    return tuple(fn(tw, x_brev[0], x_brev[1]))


def planar_supported(bits: int, bits1: int) -> bool:
    """Planar four-step path: one fused level + a grid base.  Needs both
    factors tileable: n2 % 128 == 0 (level twiddle blocks + step-2
    sublanes) and n1 % 128 == 0 (step-2 lane tiles)."""
    bits2 = bits - bits1
    return 3 <= bits1 <= 12 and 7 <= bits2 <= 12 and bits1 >= 7


def base_ntt_brev(x, bits: int, inverse: bool, interpret: bool | None = None):
    """DIT butterfly network on bit-reverse-permuted input (natural-order
    output) along axis 0 of a (n, B) limb pair.  Callers own the bitrev.

    interpret=None auto-selects the Pallas interpreter off-TPU (tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tw = jnp.asarray(_stage_twiddles(bits, inverse))
    lo, hi = x
    fn = _pallas_base(bits, lo.shape[1] // _TILE, interpret)
    if bits >= _GRP_BITS:
        return tuple(fn(tw, _dft_wq(inverse), lo, hi))
    return tuple(fn(tw, lo, hi))
