"""NTT / iNTT / low-degree extension over the Goldilocks field, in JAX.

Functionally equivalent to the reference's block NTT pipeline
(/root/reference/src/helpers/fft/fft_p.js): ``ntt`` computes the same DFT as
fft_p.fft (natural order in/out, roots from the f3g w[] chain), and
``lde`` mirrors fft_p.interpolate:187-297 — iNTT(N) → coset scale by
shift^i → zero-pad → NTT(extN) — so outputs are bit-identical.

The TPU-native structure differs deliberately: instead of worker threads with
explicit block transposes, each butterfly stage is a whole-array vector op
traced under jit; XLA fuses the gather/butterfly chain.  Stage twiddles are
precomputed host-side and cached on device.  Multi-chip sharding lives in
``pil2_stark_tpu.parallel.ntt_sharded``.

Layout: a column batch is a pair (lo, hi) of uint32 arrays shaped [N, C]
(C = number of interleaved columns, reference "nPols").
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl64
from ..field import jax_gl as gl
from . import pallas_ntt

# Tri-state override for the Pallas base transform: None = auto (use the
# VMEM-resident kernel on TPU backends, the pure-jnp chain elsewhere).
_FORCE_PALLAS_BASE: bool | None = None


def _pallas_base_enabled() -> bool:
    if _FORCE_PALLAS_BASE is not None:
        return _FORCE_PALLAS_BASE
    return jax.default_backend() == "tpu"


def bit_reverse_indices(bits: int) -> np.ndarray:
    n = 1 << bits
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _make_consts(bits: int):
    """Bit-reverse permutation + per-stage twiddles w_s^j as device arrays.

    Must be called OUTSIDE any jit trace (device constants are closure-
    captured by the jitted callables below).
    """
    rev = jnp.asarray(bit_reverse_indices(bits))
    tables = []
    for s in range(1, bits + 1):
        ws = gl64.w(s)
        tbl = gl64.powers(ws, 1 << (s - 1))
        tables.append(gl.from_u64(tbl))
    return rev, tables


def _ntt_body(x, bits: int, rev, tw):
    """Radix-2 DIT NTT on (lo, hi) arrays shaped [N, C] (natural in/out)."""
    n = 1 << bits
    lo = jnp.take(x[0], rev, axis=0)
    hi = jnp.take(x[1], rev, axis=0)
    for s in range(1, bits + 1):
        m = 1 << s
        half = m >> 1
        lo = lo.reshape(n // m, m, -1)
        hi = hi.reshape(n // m, m, -1)
        u = (lo[:, :half], hi[:, :half])
        v = (lo[:, half:], hi[:, half:])
        wlo, whi = tw[s - 1]
        t = gl.mul((wlo[None, :, None], whi[None, :, None]), v)
        a = gl.add(u, t)
        b = gl.sub(u, t)
        lo = jnp.concatenate([a[0], b[0]], axis=1)
        hi = jnp.concatenate([a[1], b[1]], axis=1)
    c = x[0].shape[1]
    return (lo.reshape(n, c), hi.reshape(n, c))


def _intt_body(x, bits: int, rev, tw, perm):
    n = 1 << bits
    y = _ntt_body(x, bits, rev, tw)
    # index reversal (n - i) % n  +  scale by n^{-1}   (fft.js:165-174)
    lo = jnp.take(y[0], perm, axis=0)
    hi = jnp.take(y[1], perm, axis=0)
    n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
    return gl.mul_const((lo, hi), n_inv)


def _rev_perm(bits: int):
    n = 1 << bits
    return jnp.asarray(
        np.concatenate([[0], np.arange(n - 1, 0, -1)]).astype(np.uint32)
    )


# ---------------------------------------------------------------------------
# self-sorting four-step NTT (no bit-reverse gather — the dominant cost of
# the naive radix-2 network on TPU is the random gather; the four-step
# recursion replaces it with reshapes + one transpose per level, which XLA
# lowers to efficient relayouts).
#
#   Y[o2·N1+o1] = Σ_{i2} w_N2^{i2·o2} · w_N^{i2·o1} · Σ_{i1} w_N1^{i1·o1} x[i1·N2+i2]
#
# The inverse transform runs the same network with inverted roots and a
# final 1/n scale — mathematically identical to the reference's
# "forward + index reversal" iNTT (fft.js:165-174), hence bit-exact.

# Base-case size for the four-step recursion.  Measured on v5e (points/s,
# cols=1): base 2^12 gives 1.40e9 @ 2^22 and 0.59e9 @ 2^24 — the best of
# {11, 12, 13} at both sizes, because 2^24 = (12, 12) stays a single
# recursion level (base 2^11 forces a (2,11)-sub-split and a 30% hit).
_BASE_BITS = 12


def _pair_np(arr: np.ndarray):
    arr = np.asarray(arr, dtype=np.uint64)
    return (
        (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (arr >> np.uint64(32)).astype(np.uint32),
    )


@functools.lru_cache(maxsize=None)
def _base_consts(bits: int, inverse: bool):
    rev = bit_reverse_indices(bits)
    tables = []
    for s in range(1, bits + 1):
        ws = gl64.w_inv(s) if inverse else gl64.w(s)
        tables.append(_pair_np(gl64.powers(ws, 1 << (s - 1))))
    return rev, tables


@functools.lru_cache(maxsize=None)
def _twiddle_consts(bits: int, bits1: int, inverse: bool):
    """w_±N^{o1·i2} as (n1, n2) u32 limb pair (host numpy)."""
    n1 = 1 << bits1
    n2 = 1 << (bits - bits1)
    w = gl64.w_inv(bits) if inverse else gl64.w(bits)
    row = gl64.powers(w, n2)
    t = np.empty((n1, n2), dtype=np.uint64)
    t[0] = 1
    for o1 in range(1, n1):
        t[o1] = gl64.mul(t[o1 - 1], row)
    return _pair_np(t)


# Above this size a level's (n1, n2) twiddle table is passed to the jitted
# program as a runtime argument instead of an embedded constant: a 2^24
# transform otherwise bakes a 128 MB literal into the HLO (slow compiles,
# and remote-compile transports reject the module).
_TWIDDLE_ARG_BITS = 18


@functools.lru_cache(maxsize=None)
def _twiddle_dev(bits: int, bits1: int, inverse: bool):
    """Device-resident twiddle pair for argument-passing levels."""
    lo, hi = _twiddle_consts(bits, bits1, inverse)
    return (jnp.asarray(lo), jnp.asarray(hi))


def _split_bits(bits: int) -> int:
    """Four-step factor split (keep one factor at the VMEM base size)."""
    if bits <= 2 * _BASE_BITS:
        return bits - _BASE_BITS
    return bits // 2


def _twiddle_schedule(bits: int):
    """(bits_total, bits1) pairs of every recursion level that passes its
    twiddle table as a runtime argument, in consumption order."""
    if bits <= _BASE_BITS:
        return []
    bits1 = _split_bits(bits)
    bits2 = bits - bits1
    mine = [(bits, bits1)] if bits > _TWIDDLE_ARG_BITS else []
    return mine + _twiddle_schedule(bits1) + _twiddle_schedule(bits2)


def _axis0_base(x, bits: int, inverse: bool):
    """Radix-2 DIT along axis 0 of (n, B) limb arrays, n ≤ 2^_BASE_BITS.
    The bit-reverse take touches ≤ 64 contiguous rows — cheap.

    On TPU backends the butterfly network runs as the VMEM-resident Pallas
    kernel (ops/pallas_ntt.py) — one HBM read/write instead of one per
    stage; the jnp chain below is the oracle and the fallback for shapes
    the kernel does not tile."""
    n = 1 << bits
    rev, tables = _base_consts(bits, inverse)
    b = x[0].shape[1]
    use_pallas = (
        pallas_ntt.supported(bits, b) if _FORCE_PALLAS_BASE
        else _pallas_base_enabled() and pallas_ntt.profitable(bits, b)
    )
    if use_pallas:
        revd = jnp.asarray(rev)
        xr = (jnp.take(x[0], revd, axis=0), jnp.take(x[1], revd, axis=0))
        return pallas_ntt.base_ntt_brev(xr, bits, inverse)
    lo = jnp.take(x[0], rev, axis=0)
    hi = jnp.take(x[1], rev, axis=0)
    b = x[0].shape[1]
    for s in range(1, bits + 1):
        m = 1 << s
        half = m >> 1
        lo = lo.reshape(n // m, m, b)
        hi = hi.reshape(n // m, m, b)
        u = (lo[:, :half], hi[:, :half])
        v = (lo[:, half:], hi[:, half:])
        wlo, whi = tables[s - 1]
        t = gl.mul((wlo[None, :, None], whi[None, :, None]), v)
        a = gl.add(u, t)
        c = gl.sub(u, t)
        lo = jnp.concatenate([a[0], c[0]], axis=1)
        hi = jnp.concatenate([a[1], c[1]], axis=1)
    return (lo.reshape(n, b), hi.reshape(n, b))


def _axis0_ntt(x, bits: int, inverse: bool, tw_iter=None):
    """NTT along axis 0 of (n, B) limb arrays, natural order in/out.

    tw_iter: iterator over the argument-passed twiddle pairs for levels
    above _TWIDDLE_ARG_BITS (in _twiddle_schedule order); small levels embed
    their tables as trace constants."""
    if bits <= _BASE_BITS:
        return _axis0_base(x, bits, inverse)
    # Keep one factor at the VMEM-resident base size whenever possible:
    # 2^24 splits (13, 11) -> ((2, 11), 11), not (12, 12) -> (6, 6)... —
    # the latter loses the 2^11 base and pays two extra HBM-roundtrip
    # transposes per level.
    bits1 = _split_bits(bits)
    bits2 = bits - bits1
    n1, n2 = 1 << bits1, 1 << bits2
    b = x[0].shape[1]

    if bits > _TWIDDLE_ARG_BITS and tw_iter is not None:
        tlo, thi = next(tw_iter)
    else:
        tlo, thi = _twiddle_consts(bits, bits1, inverse)

    # step 1: transform i1 (axis 0 of (n1, n2·B))
    y = _axis0_ntt(
        (x[0].reshape(n1, n2 * b), x[1].reshape(n1, n2 * b)), bits1, inverse,
        tw_iter,
    )
    ylo = y[0].reshape(n1, n2, b)
    yhi = y[1].reshape(n1, n2, b)
    # twiddle w^{o1·i2}
    ylo, yhi = gl.mul((ylo, yhi), (tlo[:, :, None], thi[:, :, None]))
    # transpose (n1, n2, B) -> (n2, n1, B)
    ylo = jnp.swapaxes(ylo, 0, 1)
    yhi = jnp.swapaxes(yhi, 0, 1)
    # step 2: transform i2
    z = _axis0_ntt(
        (ylo.reshape(n2, n1 * b), yhi.reshape(n2, n1 * b)), bits2, inverse,
        tw_iter,
    )
    # output flat index o2·n1 + o1 == current layout flattened
    return (z[0].reshape(1 << bits, b), z[1].reshape(1 << bits, b))


def _tw_args(bits: int, inverse: bool):
    return tuple(
        _twiddle_dev(b, b1, inverse) for (b, b1) in _twiddle_schedule(bits)
    )


# ---------------------------------------------------------------------------
# planar (column-major) four-step: the TPU fast path
#
# Data rides as (C, N) — columns in sublanes, the domain in lanes — so the
# whole level runs as ONE VMEM kernel (butterflies + w^{o1·i2} twiddle +
# inter-level transpose, pallas_ntt.level_planar) and step 2 as a second
# kernel (pallas_ntt.base_grid), with one row-gather (bit-reverse) before
# each: 4 HBM sweeps per transform instead of one per butterfly stage.
# The reference's equivalent structure is the blocked fft_p.js pipeline
# (fft_block / transpose passes); here each pass is a fused TPU kernel.


def _planar_ok(bits: int) -> bool:
    if _FORCE_PALLAS_BASE is not None:
        enabled = _FORCE_PALLAS_BASE
    else:
        enabled = _pallas_base_enabled()
    return enabled and pallas_ntt.planar_supported(bits, _split_bits(bits))


def _planar_ntt(xp, bits: int, n_cols: int, inverse: bool, tw_iter=None):
    """NTT along axis 1 of a (C, N) planar pair (natural order in/out)."""
    bits1 = _split_bits(bits)
    bits2 = bits - bits1
    n1, n2 = 1 << bits1, 1 << bits2

    if bits > _TWIDDLE_ARG_BITS and tw_iter is not None:
        tlo, thi = next(tw_iter)
    else:
        tlo, thi = (jnp.asarray(a) for a in _twiddle_consts(bits, bits1, inverse))

    # entry relayout (one pass, fused with the bit-reverse row gather):
    # (C, n1, n2) -> (n1, C·n2) with i1 bit-reversed
    rev1 = jnp.asarray(bit_reverse_indices(bits1))
    x_lo = jnp.moveaxis(xp[0].reshape(n_cols, n1, n2), 1, 0).reshape(n1, n_cols * n2)
    x_hi = jnp.moveaxis(xp[1].reshape(n_cols, n1, n2), 1, 0).reshape(n1, n_cols * n2)
    x_lo = jnp.take(x_lo, rev1, axis=0)
    x_hi = jnp.take(x_hi, rev1, axis=0)

    y = pallas_ntt.level_planar(
        (x_lo, x_hi), bits1, n2, n_cols, (tlo, thi), inverse
    )  # (C·n2, n1), rows (c, i2)

    # step-2 bit-reverse within each column batch (one gather pass)
    rev2 = bit_reverse_indices(bits2)
    full_idx = jnp.asarray(
        np.add.outer(
            np.arange(n_cols, dtype=np.uint32) * n2, rev2
        ).reshape(-1)
    )
    z_in = (jnp.take(y[0], full_idx, axis=0), jnp.take(y[1], full_idx, axis=0))
    z = pallas_ntt.base_grid(z_in, bits2, n_cols, inverse)
    # rows (c, o2), lanes o1: per column the flat index is o2·n1 + o1
    return (z[0].reshape(n_cols, 1 << bits), z[1].reshape(n_cols, 1 << bits))


@functools.lru_cache(maxsize=None)
def _jit_ntt(bits: int):
    fwd_tw = _tw_args(bits, False)

    def body(x, tws):
        if _planar_ok(bits):
            c = x[0].shape[1]
            xp = (x[0].T, x[1].T)
            y = _planar_ntt(xp, bits, c, False, iter(tws))
            return (y[0].T, y[1].T)
        return _axis0_ntt(x, bits, False, iter(tws))

    fn = jax.jit(body)
    return lambda x: fn(x, fwd_tw)


@functools.lru_cache(maxsize=None)
def _jit_intt(bits: int):
    n = 1 << bits
    n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
    inv_tw = _tw_args(bits, True)

    def body(x, tws):
        if _planar_ok(bits):
            c = x[0].shape[1]
            xp = (x[0].T, x[1].T)
            y = _planar_ntt(xp, bits, c, True, iter(tws))
            y = gl.mul_const(y, n_inv)
            return (y[0].T, y[1].T)
        y = _axis0_ntt(x, bits, True, iter(tws))
        return gl.mul_const(y, n_inv)

    fn = jax.jit(body)
    return lambda x: fn(x, inv_tw)


@functools.lru_cache(maxsize=None)
def _lde_parts(bits: int, ext_bits: int, shift: int):
    n = 1 << bits
    n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
    # fold n_inv into the coset-shift scaling; big enough tables ride as
    # runtime args (device-resident), not trace constants
    shift_pows = gl64.mul(gl64.powers(shift, n), np.uint64(n_inv))
    sp_small = bits <= _TWIDDLE_ARG_BITS
    sp_const = _pair_np(shift_pows) if sp_small else None
    sp_dev = None if sp_small else tuple(
        jnp.asarray(a) for a in _pair_np(shift_pows)
    )
    inv_tw = _tw_args(bits, True)
    fwd_tw = _tw_args(ext_bits, False)

    def planar_body(xp, tws_i, tws_f, sp):
        """(C, N) planar pair -> (C, extN) planar pair — the scale and
        zero-pad ride the lane axis between the two transforms; no
        transposes anywhere (the planar commit pipeline's entry)."""
        s = sp_const if sp_small else sp
        c = xp[0].shape[0]
        coefs = _planar_ntt(xp, bits, c, True, iter(tws_i))
        coefs = gl.mul((s[0][None, :], s[1][None, :]), coefs)
        pad = ((0, 0), (0, (1 << ext_bits) - n))
        padded = (jnp.pad(coefs[0], pad), jnp.pad(coefs[1], pad))
        return _planar_ntt(padded, ext_bits, c, False, iter(tws_f))

    def rows_body(x, tws_i, tws_f, sp):
        s = sp_const if sp_small else sp
        if _planar_ok(bits) and _planar_ok(ext_bits):
            # planar core: transpose once in, once out
            y = planar_body((x[0].T, x[1].T), tws_i, tws_f, sp)
            return (y[0].T, y[1].T)
        coefs = _axis0_ntt(x, bits, True, iter(tws_i))
        coefs = gl.mul((s[0][:, None], s[1][:, None]), coefs)
        pad = ((0, (1 << ext_bits) - n), (0, 0))
        padded = (jnp.pad(coefs[0], pad), jnp.pad(coefs[1], pad))
        return _axis0_ntt(padded, ext_bits, False, iter(tws_f))

    return planar_body, rows_body, inv_tw, fwd_tw, sp_dev


@functools.lru_cache(maxsize=None)
def _jit_lde(bits: int, ext_bits: int, shift: int):
    _, rows_body, inv_tw, fwd_tw, sp_dev = _lde_parts(bits, ext_bits, shift)
    fn = jax.jit(rows_body)
    return lambda x: fn(x, inv_tw, fwd_tw, sp_dev)


@functools.lru_cache(maxsize=None)
def _jit_lde_planar(bits: int, ext_bits: int, shift: int):
    planar_body, _, inv_tw, fwd_tw, sp_dev = _lde_parts(bits, ext_bits, shift)
    if not (_planar_ok(bits) and _planar_ok(ext_bits)):
        # fall back through the row-major path (axis-0 chain)
        _, rows_body, *_ = _lde_parts(bits, ext_bits, shift)
        fn = jax.jit(rows_body)
        return lambda xp: (lambda y: (y[0].T, y[1].T))(
            fn((xp[0].T, xp[1].T), inv_tw, fwd_tw, sp_dev))
    fn = jax.jit(planar_body)
    return lambda xp: fn(xp, inv_tw, fwd_tw, sp_dev)


# ---------------------------------------------------------------------------
# public API (device pairs in / device pairs out)


def ntt(x, bits: int):
    return _jit_ntt(bits)(x)


def intt(x, bits: int):
    return _jit_intt(bits)(x)


def lde(x, bits: int, ext_bits: int, shift: int = 7):
    """Low-degree extension onto the coset shift·H_ext (fft_p interpolate)."""
    return _jit_lde(bits, ext_bits, shift)(x)


def lde_planar(xp, bits: int, ext_bits: int, shift: int = 7):
    """LDE on a PLANAR (C, N) pair -> (C, extN) pair.  Same values as
    lde(xp.T).T with zero transposes — the planar commit pipeline keeps
    columns on the lane axis from witness upload through the Merkle leaf
    sponge."""
    return _jit_lde_planar(bits, ext_bits, shift)(xp)


# ---------------------------------------------------------------------------
# numpy host conveniences (u64 in / u64 out) used by the prover driver


def ntt_u64(x: np.ndarray, bits: int) -> np.ndarray:
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    r = ntt(gl.from_u64(x2), bits)
    return gl.to_u64(r).reshape(shape)


def intt_u64(x: np.ndarray, bits: int) -> np.ndarray:
    shape = x.shape
    x2 = x.reshape(shape[0], -1)
    r = intt(gl.from_u64(x2), bits)
    return gl.to_u64(r).reshape(shape)


def lde_u64(x: np.ndarray, bits: int, ext_bits: int, shift: int = 7) -> np.ndarray:
    x2 = x.reshape(x.shape[0], -1)
    r = lde(gl.from_u64(x2), bits, ext_bits, shift)
    out = gl.to_u64(r)
    if x.ndim == 1:
        return out.reshape(-1)
    return out.reshape((1 << ext_bits,) + x.shape[1:])


# ---------------------------------------------------------------------------
# naive numpy oracle (small N only) — the differential-testing anchor,
# mirroring the role of the in-memory F.fft in the reference test-suite
# (test/fft_p.test.js cross-checks the block NTT against it).


def ntt_host_u64(x: np.ndarray, bits: int, inverse: bool = False) -> np.ndarray:
    """Pure-numpy radix-2 NTT along axis 0 (no JIT) — host path for small
    transforms (FRI group iFFTs in prover/verifier) where XLA compile time
    would dominate.  Bit-exact with ntt_u64/intt_u64."""
    n = 1 << bits
    x = np.asarray(x, dtype=np.uint64)
    shape = x.shape
    cols = x.reshape(n, -1)
    out = cols[bit_reverse_indices(bits)].copy()
    for s in range(1, bits + 1):
        m = 1 << s
        half = m >> 1
        w = gl64.w_inv(s) if inverse else gl64.w(s)
        tw = gl64.powers(w, half)[None, :, None]
        v = out.reshape(n // m, m, -1)
        u = v[:, :half]
        t = gl64.mul(tw, v[:, half:])
        out = np.concatenate([gl64.add(u, t), gl64.sub(u, t)], axis=1).reshape(
            n, -1
        )
    if inverse:
        n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
        out = gl64.mul(out, np.uint64(n_inv))
    return out.reshape(shape)


def naive_dft_u64(x: np.ndarray, bits: int, inverse: bool = False) -> np.ndarray:
    n = 1 << bits
    assert x.shape[0] == n
    w = gl64.w_inv(bits) if inverse else gl64.w(bits)
    cols = x.reshape(n, -1)
    out = np.zeros_like(cols)
    wk = gl64.powers(w, n)  # w^j
    for k in range(n):
        coeff = wk[(np.arange(n) * k) % n]
        acc = np.zeros(cols.shape[1], dtype=np.uint64)
        for j in range(n):
            acc = gl64.add(acc, gl64.mul(cols[j], coeff[j]))
        out[k] = acc
    if inverse:
        n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)
        out = gl64.mul(out, np.uint64(n_inv))
    return out.reshape(x.shape)
