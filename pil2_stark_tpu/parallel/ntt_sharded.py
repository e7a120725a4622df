"""Multi-chip NTT / LDE: four-step decomposition over a device mesh.

This is the TPU-native replacement for the reference's block-transpose NTT
(/root/reference/src/helpers/fft/fft_p.js:114-176): the reference's explicit
inter-pass transposes between worker threads become `jax.lax.all_to_all`
collectives over the mesh axis (SURVEY.md §2.7 P1); per-device butterfly
stages are whole-array vector ops on the local shard.

Decomposition (N = N1·N2, input x[i1·N2 + i2] sharded by i1 blocks):

    Y[o2·N1 + o1] = Σ_{i2} w_N2^{i2·o2} · w_N^{i2·o1} · Σ_{i1} w_N1^{i1·o1} x[i1·N2+i2]

    1. all_to_all: shard i2              (transpose #1)
    2. local NTT_N1 along i1             (no comm)
    3. twiddle w_N^{o1·i2}               (local)
    4. all_to_all: shard o1              (transpose #2)
    5. local NTT_N2 along i2             (no comm)
    6. all_to_all: restore row sharding of the naturally-ordered output
       (transpose #3)

Outputs equal ops.ntt.ntt exactly (differentially tested on a virtual
8-device CPU mesh).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gl64
from ..field import jax_gl as gl
from ..ops import ntt as ntt_ops


def _local_ntt_cols(lo, hi, bits, inverse):
    """NTT along axis 0 of (N1, M) limb arrays (natural order in/out).

    Shares the single-chip kernels (round-3/4 weak #7): the sharded
    decomposition splits bits1 = bits // 2, so every local factor of an
    N <= 2^24 mesh transform is BASE-sized (<= 2^12) and hits the Pallas
    VMEM butterfly kernel directly through _axis0_ntt — the same lazy
    fused-pair kernel the single-chip planar pipeline uses for its own
    base steps (the multi-level planar pipeline only exists for
    transforms > 2^12, which never occur locally here)."""
    return ntt_ops._axis0_ntt((lo, hi), bits, inverse)


def _twiddle_table(bits_total: int, n1: int, n2: int, inverse: bool = False) -> np.ndarray:
    """w_±N^{o1·i2} as (n1, n2) u64 (host-precomputed)."""
    w = gl64.w_inv(bits_total) if inverse else gl64.w(bits_total)
    # row o1: w^(o1*i2) — compute via powers of w^o1? O(n1*n2) host ints is
    # too slow for big N; use outer powers: w^{o1·i2} = (w^{o1})^{i2}
    base = gl64.powers(w, n1)  # w^o1
    out = np.empty((n1, n2), dtype=np.uint64)
    for o1 in range(n1):
        out[o1] = gl64.powers(int(base[o1]), n2)
    return out


@functools.lru_cache(maxsize=None)
def _twiddle_pair(bits_total, n1, n2, inverse=False):
    t = _twiddle_table(bits_total, n1, n2, inverse)
    return (
        (t & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (t >> np.uint64(32)).astype(np.uint32),
    )


def _norm_axes(mesh: Mesh, axis):
    """None → every mesh axis (a ("dcn", "ici") mesh shards over the full
    device grid, the all_to_all riding DCN × ICI hierarchically); a string
    or tuple selects specific axes."""
    if axis is None:
        return tuple(mesh.axis_names)
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _axes_size(mesh: Mesh, axes) -> int:
    out = 1
    for a in axes:
        out *= mesh.shape[a]
    return out


def _linear_axis_index(mesh: Mesh, axes):
    """Flattened device index over the (row-major) axis tuple."""
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
    return idx


@functools.lru_cache(maxsize=None)
def make_sharded_ntt(bits: int, n_cols: int, mesh: Mesh, axis=None, inverse: bool = False):
    """Returns a jitted fn over (lo, hi) arrays of shape (N, C) sharded on
    rows, computing the same DFT as ops.ntt.ntt (or, with inverse=True, the
    unscaled inverse transform: running the same network on inverted roots
    — mathematically identical to the reference's forward + index reversal
    iNTT, fft.js:165-174, hence bit-exact after the 1/n scale).

    axis: mesh axis name, tuple of names, or None for all axes — a
    ("dcn", "ici") multi-host mesh works unchanged (collectives take the
    axis tuple; device order follows the mesh's row-major layout)."""
    axis = _norm_axes(mesh, axis)
    d = _axes_size(mesh, axis)
    n = 1 << bits
    bits1 = bits // 2
    bits2 = bits - bits1
    n1, n2 = 1 << bits1, 1 << bits2
    assert n1 % d == 0 and n2 % d == 0, "mesh axis must divide both factors"

    twiddle = _twiddle_pair(bits, n1, n2, inverse)

    c = n_cols

    def local_fn(lo, hi):
        # local shard: (n/d, c) = (n1/d * n2, c) rows i = i1*N2 + i2
        lo = lo.reshape(n1 // d, n2, c)
        hi = hi.reshape(n1 // d, n2, c)
        # transpose #1: shard i2 -> (n1, n2/d, c)
        lo = jax.lax.all_to_all(lo, axis, split_axis=1, concat_axis=0, tiled=True)
        hi = jax.lax.all_to_all(hi, axis, split_axis=1, concat_axis=0, tiled=True)
        # local NTT_N1 along axis 0
        lo2 = lo.reshape(n1, (n2 // d) * c)
        hi2 = hi.reshape(n1, (n2 // d) * c)
        lo2, hi2 = _local_ntt_cols(lo2, hi2, bits1, inverse)
        lo = lo2.reshape(n1, n2 // d, c)
        hi = hi2.reshape(n1, n2 // d, c)
        # twiddle w_N^{o1·i2}: i2_global = rank*(n2/d) + local
        rank = _linear_axis_index(mesh, axis)
        tlo = jax.lax.dynamic_slice_in_dim(twiddle[0], rank * (n2 // d), n2 // d, 1)
        thi = jax.lax.dynamic_slice_in_dim(twiddle[1], rank * (n2 // d), n2 // d, 1)
        lo, hi = gl.mul((lo, hi), (tlo[:, :, None], thi[:, :, None]))
        # transpose #2: shard o1 -> (n1/d, n2, c)
        lo = jax.lax.all_to_all(lo, axis, split_axis=0, concat_axis=1, tiled=True)
        hi = jax.lax.all_to_all(hi, axis, split_axis=0, concat_axis=1, tiled=True)
        lo = lo.reshape(n1 // d, n2, c)
        hi = hi.reshape(n1 // d, n2, c)
        # local NTT_N2 along i2: transform each row (axis 1)
        lo2 = jnp.swapaxes(lo, 0, 1).reshape(n2, (n1 // d) * c)
        hi2 = jnp.swapaxes(hi, 0, 1).reshape(n2, (n1 // d) * c)
        lo2, hi2 = _local_ntt_cols(lo2, hi2, bits2, inverse)
        lo = jnp.swapaxes(lo2.reshape(n2, n1 // d, c), 0, 1)  # (n1/d, n2, c)
        hi = jnp.swapaxes(hi2.reshape(n2, n1 // d, c), 0, 1)
        # current layout: local [o1_local, o2]; global flat desired:
        # Y[o2*n1 + o1].  transpose #3: exchange to shard o2.
        lo = jax.lax.all_to_all(lo, axis, split_axis=1, concat_axis=0, tiled=True)
        hi = jax.lax.all_to_all(hi, axis, split_axis=1, concat_axis=0, tiled=True)
        # now local: (n1, n2/d, c) indexed [o1, o2_local] for o2 block `rank`
        # flat global row o = o2*n1 + o1 -> local rows: swap axes
        lo = jnp.swapaxes(lo, 0, 1).reshape((n // d), c)
        hi = jnp.swapaxes(hi, 0, 1).reshape((n // d), c)
        return lo, hi

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def make_sharded_lde(bits: int, ext_bits: int, n_cols: int, mesh: Mesh, axis=None, shift: int = 7):
    """Sharded low-degree extension: iNTT(N) → coset scale → zero-pad →
    NTT(extN), matching ops.ntt.lde bit-exactly.

    The iNTT runs the sharded four-step network on inverted roots — no
    index-reversal permutation exists anywhere, so there is no global
    gather (round-1's version materialized the full array on every device
    for the reversal, which destroyed memory scaling at 2^24).  The
    n_inv·shift^row coset scale and the zero-pad are row-local elementwise
    ops that GSPMD keeps on the row sharding.
    """
    n = 1 << bits
    ext_n = 1 << ext_bits
    inv_small = make_sharded_ntt(bits, n_cols, mesh, axis, inverse=True)
    fwd_big = make_sharded_ntt(ext_bits, n_cols, mesh, axis)

    n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
    # per-row scale on the natural-order coefficients: n_inv * shift^row
    shift_pows = gl64.mul(gl64.powers(shift, n), np.uint64(n_inv))
    sp = (
        (shift_pows & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (shift_pows >> np.uint64(32)).astype(np.uint32),
    )

    def body(lo, hi):
        clo, chi = inv_small(lo, hi)
        clo, chi = gl.mul((clo, chi), (sp[0][:, None], sp[1][:, None]))
        pad = ((0, ext_n - n), (0, 0))
        return fwd_big(jnp.pad(clo, pad), jnp.pad(chi, pad))

    return jax.jit(body)
