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

_TILE = 128  # lanes per block; (4096, 128) u32 ×2 limbs = 4 MB in VMEM


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


def _roll(x, shift: int):
    """Cyclic roll along sublanes: result[r] = x[(r - shift) % n]."""
    return pltpu.roll(x, shift % x.shape[0], 0)


def _make_kernel(bits: int):
    n = 1 << bits

    def kernel(tw_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        for s in range(1, bits + 1):
            half = 1 << (s - 1)
            tlo = tw_ref[:, 2 * (s - 1)].reshape(n, 1)
            thi = tw_ref[:, 2 * (s - 1) + 1].reshape(n, 1)
            plo, phi = gl.mul((tlo, thi), (lo, hi))
            is_v = (row & half) != 0
            # u rows: x[r] + t[r+half]; v rows: x[r-half] - t[r]
            alo, ahi = gl.add((lo, hi), (_roll(plo, -half), _roll(phi, -half)))
            blo, bhi = gl.sub((_roll(lo, half), _roll(hi, half)), (plo, phi))
            lo = jnp.where(is_v, blo, alo)
            hi = jnp.where(is_v, bhi, ahi)
        out_lo_ref[:] = lo
        out_hi_ref[:] = hi

    return kernel


@functools.lru_cache(maxsize=None)
def _pallas_base(bits: int, n_blocks: int, interpret: bool):
    n = 1 << bits
    data_spec = pl.BlockSpec((n, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((n, 2 * bits), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(bits),
        grid=(n_blocks,),
        in_specs=[tw_spec, data_spec, data_spec],
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


def base_ntt_brev(x, bits: int, inverse: bool, interpret: bool | None = None):
    """DIT butterfly network on bit-reverse-permuted input (natural-order
    output) along axis 0 of a (n, B) limb pair.  Callers own the bitrev.

    interpret=None auto-selects the Pallas interpreter off-TPU (tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tw = jnp.asarray(_stage_twiddles(bits, inverse))
    lo, hi = x
    return tuple(
        _pallas_base(bits, lo.shape[1] // _TILE, interpret)(tw, lo, hi)
    )
