"""Exact Goldilocks linear maps on the MXU via int8 limb-stacked matmuls.

The VPU u32 emulation of a GL multiply costs ~80 elementwise ops (no
integer mulhi on TPU), which makes every GL *linear map* — NTT base
transforms (out = W_dft @ x) and the Poseidon MDS round (out = M @ st) —
VPU-compute-bound at ~5% of the chip's FLOP budget.  The MXU does
s8 x s8 -> s32 matmuls at ~4x the bf16 rate and >200x the VPU's u32
throughput, and s32 accumulation is EXACT — so a GL matrix-vector batch
can ride the systolic array if both sides are decomposed into limbs
small enough that no partial sum overflows 31 bits.

Encoding (the "limb-stacked" trick):
  - data x (m rows, B batch) splits into NL=10 limbs of 7 bits
    (values 0..127, exactly representable in int8):
        x = sum_b  x_b << (7 b),   X' rows (b, j) = x_b[j]  -> (10m, B)
  - the weight matrix W (m x m, entries < p) is NOT limb-split directly;
    instead each data-limb weight is folded in mod p FIRST:
        W^(b) = (W << 7b) mod p            (still 64-bit entries)
    and then each W^(b) splits into 10 output limbs:
        Wq[(a, k), (b, j)] = limb_a(W^(b)[k, j])   -> (10m, 10m) int8
  - ONE matmul  Y = Wq @ X'  (s8 x s8 -> s32) yields output limb planes
        Y_a[k] = sum_{b,j} limb_a(W^(b)[k,j]) * x_b[j]
    with every partial sum bounded by 10m * 127^2 < 2^31 for m <= 1024.
  - recombination on the VPU:  out[k] = sum_a Y_a[k] << (7a)  (mod p),
    a ~40-op carry-save fold instead of m GL multiplies.

This reduces the VPU cost of an m-point GL matmul from ~80m ops/point to
~70 ops/point total (extraction + recombination), moving the multiplies
onto the otherwise-idle MXU.  Used by ops/pallas_ntt.py (DFT-by-matmul
base transforms) and hash/pallas_poseidon.py (MDS rounds).

Reference equivalents: the reference reaches for AVX2 in its generated
chelpers (src/stark/chelpers/generateParser.js:25, nrowsPack=4) and a
WASM kernel for hashing (src/helpers/glwasm.js) — same motive (the field
multiply is the hot primitive), hardware-appropriate answer here.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

P_INT = 0xFFFFFFFF00000001

LIMB_BITS = 7
NL = 10  # ceil(64 / 7)
_MASK = np.uint32((1 << LIMB_BITS) - 1)


def quantize_matrix(w: np.ndarray) -> np.ndarray:
    """(m, n) uint64 GL matrix -> (NL*m, NL*n) int8 limb-stacked matrix.

    Row group a (output limb), column group b (input limb):
    block[a, b] = limb_a((w << 7b) mod p).  Partial-sum exactness bound:
    NL * n * 127^2 < 2^31  (n <= 1024)."""
    w = np.asarray(w, dtype=np.uint64)
    m, n = w.shape
    # s32 accumulation bound AND recombine's 14-bit pair-word bound
    # (z = Y_even + Y_odd*128 must fit u32): n <= 128 satisfies both
    assert NL * n * 127 * 127 * 129 < 2**32, (
        "limb accumulation would overflow (n too large; max 128)"
    )
    wi = w.astype(object)  # python ints: << 7b exceeds u64
    out = np.empty((NL * m, NL * n), dtype=np.int8)
    for b in range(NL):
        wb = (wi << (LIMB_BITS * b)) % P_INT
        for a in range(NL):
            limb = ((wb >> (LIMB_BITS * a)) & int(_MASK)).astype(np.int8)
            out[a * m : (a + 1) * m, b * n : (b + 1) * n] = limb
    return out


def extract_limbs(lo, hi):
    """(m, B) u32 limb-pair -> (NL*m, B) int8 limb planes, b-major rows.

    Works on jnp arrays inside jit/pallas kernels (pure elementwise +
    concatenate along sublanes)."""
    planes = [
        lo & _MASK,
        (lo >> 7) & _MASK,
        (lo >> 14) & _MASK,
        (lo >> 21) & _MASK,
        ((lo >> 28) | (hi << 4)) & _MASK,
        (hi >> 3) & _MASK,
        (hi >> 10) & _MASK,
        (hi >> 17) & _MASK,
        (hi >> 24) & _MASK,
        hi >> 31,
    ]
    return jnp.concatenate([p.astype(jnp.int8) for p in planes], axis=0)


def matmul(wq, x_limbs):
    """Wq (NL*m, NL*n) s8 @ X (NL*n, B) s8 -> (NL*m, B) s32, exact."""
    return jax.lax.dot_general(
        wq, x_limbs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def recombine(y, m: int):
    """(NL*m, B) s32 output-limb planes -> canonical (lo, hi) u32 pair.

    out[k] = sum_a Y_a[k] << 7a (mod p), with Y_a < NL*n*127^2 < 2^31.
    Pairs limbs into five 14-bit-spaced u32 words (Y_a < 2^25 so
    (Y_{2c+1} << 7) + Y_{2c} < 2^32), carry-accumulates the five words
    into a 96-bit (v0, v1, v2), and reduces with the shared tested
    128-bit reducer (2^64 = 2^32 - 1, 2^96 = -1 mod p)."""
    from ..field import jax_gl as gl

    ya = [y[a * m : (a + 1) * m].astype(jnp.uint32) for a in range(NL)]
    # five pair-words z_c = Y_{2c} + (Y_{2c+1} << 7), weight 2^{14c}
    z = [ya[2 * c] + (ya[2 * c + 1] << 7) for c in range(5)]
    # v0 collects z0 + z1<<14 + z2<<28; spill bits go to v1
    a1 = z[1] << 14
    a2 = z[2] << 28
    v0 = z[0] + a1
    c01 = (v0 < a1).astype(jnp.uint32)
    v0b = v0 + a2
    c02 = (v0b < a2).astype(jnp.uint32)
    v1 = (z[1] >> 18) + (z[2] >> 4) + c01 + c02  # < 2^29: no wrap
    # v1 collects z3<<10 + z4<<24; spill bits go to v2
    b3 = z[3] << 10
    b4 = z[4] << 24
    v1b = v1 + b3
    c13 = (v1b < b3).astype(jnp.uint32)
    v1c = v1b + b4
    c14 = (v1c < b4).astype(jnp.uint32)
    v2 = (z[3] >> 22) + (z[4] >> 8) + c13 + c14  # < 2^25: no wrap
    return gl._reduce128(v0b, v1c, v2, jnp.zeros_like(v2))


def apply_host(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Oracle: (m,n) @ (n,B) mod p over uint64 numpy via python ints."""
    wi = np.asarray(w, dtype=np.uint64).astype(object)
    xi = np.asarray(x, dtype=np.uint64).astype(object)
    return ((wi @ xi) % P_INT).astype(np.uint64)
