"""Poseidon Pallas kernel experiments (round 5).

Variants of hash/pallas_poseidon.py's kernel, validated bit-exact against
the numpy oracle and chain-timed on the real chip.  Findings feed the
production kernel; this file is an instrument, not a shipping path.

Run: python tools/exp_poseidon.py [variant ...]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import __graft_entry__  # noqa: F401

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pil2_stark_tpu.hash import poseidon_gl as ref
from pil2_stark_tpu.hash import pallas_poseidon as pp
from pil2_stark_tpu.ops import gl_mxu

P = 0xFFFFFFFF00000001
T = 12
HALF_F = ref.N_ROUNDS_F // 2
RP = ref.N_ROUNDS_P
NL = gl_mxu.NL

MASK16 = np.uint32(0xFFFF)
EPS32 = np.uint32(0xFFFFFFFF)
P_HI = np.uint32(0xFFFFFFFF)
P_LO = np.uint32(0x00000001)

_b2u = pp._b2u
_canon = pp._canon
_add = pp._add
_mul = pp._mul
_mul32 = pp._mul32


def _add_lazy(alo, ahi, blo, bhi):
    """a + b mod p as any-u64 representative (no canon)."""
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
    return lo2, hi + c3


def _reduce128_lazy(n0, n1b, n2c, n3):
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
    return lo4, hi3 + c3


def _mul_lazy(alo, ahi, blo, bhi):
    from pil2_stark_tpu.field import jax_gl as gl
    return _reduce128_lazy(*gl._mul_wide((alo, ahi), (blo, bhi)))


def _sqr_lazy(alo, ahi):
    h00, l00 = _sqr32(alo)
    h01, l01 = _mul32(alo, ahi)
    h11, l11 = _sqr32(ahi)
    n0 = l00
    n1 = h00 + l01
    c1 = _b2u(n1 < h00)
    n1b = n1 + l01
    c2 = _b2u(n1b < n1)
    n2 = h01 + h01
    d1 = _b2u(n2 < h01)
    n2b = n2 + l11
    d2 = _b2u(n2b < n2)
    n2c = n2b + (c1 + c2)
    d3 = _b2u(n2c < n2b)
    n3 = h11 + d1 + d2 + d3
    return _reduce128_lazy(n0, n1b, n2c, n3)


def _pow7_lazy(lo, hi):
    l2, h2 = _sqr_lazy(lo, hi)
    l3, h3 = _mul_lazy(l2, h2, lo, hi)
    l4, h4 = _sqr_lazy(l2, h2)
    return _mul_lazy(l4, h4, l3, h3)


def _dualize(half_kernel, block: int):
    """Run the kernel body on two independent lane halves — one traced
    graph, so Mosaic's scheduler can overlap chain A's MXU with chain B's
    VPU work."""
    h = block // 2

    class _ArrRef:
        def __init__(self, arr):
            self.arr = arr
            self.out = None

        def __getitem__(self, idx):
            return self.arr[idx]

        def __setitem__(self, idx, val):
            self.out = val

    def kernel(c_lo, c_hi, wq_m, wq_p, wq_s, lo_ref, hi_ref,
               out_lo_ref, out_hi_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        outs = []
        for i in range(2):
            sl = slice(i * h, (i + 1) * h)
            rl, rh = _ArrRef(lo[:, sl]), _ArrRef(hi[:, sl])
            ol, oh = _ArrRef(None), _ArrRef(None)
            half_kernel(c_lo, c_hi, wq_m, wq_p, wq_s, rl, rh, ol, oh)
            outs.append((ol.out, oh.out))
        out_lo_ref[:] = jnp.concatenate([outs[0][0], outs[1][0]], axis=1)
        out_hi_ref[:] = jnp.concatenate([outs[0][1], outs[1][1]], axis=1)

    return kernel


def _sqr32(a):
    """u32 squaring: 3 unique 16-bit products instead of 4."""
    al = a & MASK16
    ah = a >> 16
    ll = al * al
    m = al * ah  # lh == hl
    hh = ah * ah
    mid2 = m + m
    midc = _b2u(mid2 < m)
    lo = ll + (mid2 << 16)
    c = _b2u(lo < ll)
    hi = hh + (mid2 >> 16) + (midc << 16) + c
    return hi, lo


def _sqr(alo, ahi):
    """GL squaring: h01 == h10 (saves one _mul32)."""
    h00, l00 = _sqr32(alo)
    h01, l01 = _mul32(alo, ahi)
    h11, l11 = _sqr32(ahi)
    n0 = l00
    n1 = h00 + l01
    c1 = _b2u(n1 < h00)
    n1b = n1 + l01
    c2 = _b2u(n1b < n1)
    n2 = h01 + h01
    d1 = _b2u(n2 < h01)
    n2b = n2 + l11
    d2 = _b2u(n2b < n2)
    n2c = n2b + (c1 + c2)
    d3 = _b2u(n2c < n2b)
    n3 = h11 + d1 + d2 + d3
    # same 128-bit reducer as pp._mul
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


def _pow7_sq(lo, hi):
    l2, h2 = _sqr(lo, hi)
    l3, h3 = _mul(l2, h2, lo, hi)
    l4, h4 = _sqr(l2, h2)
    return _mul(l4, h4, l3, h3)


# ---------------------------------------------------------------------------
# packed-128 constants: 12-row state, 10x12=120 limb rows padded to 128


@functools.lru_cache(maxsize=None)
def _const_packed():
    C = np.asarray(ref.C, dtype=np.uint64)
    M = np.asarray(ref.M, dtype=np.uint64)
    Pm = np.asarray(ref.P, dtype=np.uint64)
    S = np.asarray(ref.S, dtype=np.uint64).reshape(RP, 2 * T - 1)
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
        "wq_p": quant128(Pm.T.copy()),
        "wq_s": np.concatenate(a_rs, axis=0),  # (RP*128, 128)
    }


_C_PARTIAL0 = HALF_F + 1
_C_SECOND0 = _C_PARTIAL0 + RP
_MASK7 = np.uint32(0x7F)


def _extract_packed(lo, hi):
    """(12, B) u32 pair -> (128, B) int8: 10 limb groups of 12 rows."""
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
    return jnp.pad(out, ((0, 128 - 120), (0, 0)))


def _recombine_packed(y, lazy: bool = False):
    """(128, B) s32 -> (lo, hi) (12, B) (canonical unless lazy)."""
    from pil2_stark_tpu.field import jax_gl as gl

    ya = [y[a * T : (a + 1) * T].astype(jnp.uint32) for a in range(NL)]
    z = [ya[2 * c] + (ya[2 * c + 1] << 7) for c in range(5)]
    a1 = z[1] << 14
    a2 = z[2] << 28
    v0 = z[0] + a1
    c01 = (v0 < a1).astype(jnp.uint32)
    v0b = v0 + a2
    c02 = (v0b < a2).astype(jnp.uint32)
    v1 = (z[1] >> 18) + (z[2] >> 4) + c01 + c02
    b3 = z[3] << 10
    b4 = z[4] << 24
    v1b = v1 + b3
    c13 = (v1b < b3).astype(jnp.uint32)
    v1c = v1b + b4
    c14 = (v1c < b4).astype(jnp.uint32)
    v2 = (z[3] >> 22) + (z[4] >> 8) + c13 + c14
    if lazy:
        return _reduce128_lazy(v0b, v1c, v2, jnp.zeros_like(v2))
    return gl._reduce128(v0b, v1c, v2, jnp.zeros_like(v2))


def make_kernel(block: int, pow7_fn, partial_4x128: bool, mxu: str,
                skip_psbox: bool = False, skip_fsbox: bool = False,
                lazy: bool = False, pslice: bool = False,
                dual: bool = False):
    """mxu: 'packed' (128-tile), 'none' (VPU ceiling probe)."""
    if dual:
        half = make_kernel(block // 2, pow7_fn, partial_4x128, mxu,
                           skip_psbox, skip_fsbox, lazy, pslice, dual=False)
        return _dualize(half, block)

    def kernel(c_lo, c_hi, wq_m, wq_p, wq_s, lo_ref, hi_ref,
               out_lo_ref, out_hi_ref):
        def c_col(r):
            return c_lo[:T, r : r + 1], c_hi[:T, r : r + 1]

        if lazy:
            def add_pair(a, b):
                return _add_lazy(a[0], a[1], b[0], b[1])
        else:
            def add_pair(a, b):
                return _add(a[0], a[1], b[0], b[1])

        if mxu == "packed":
            def mxu_mat(st, wq):
                xl = _extract_packed(st[0], st[1])
                y = jax.lax.dot_general(
                    wq, xl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return _recombine_packed(y, lazy)
        else:
            def mxu_mat(st, wq):
                return (st[0] ^ jnp.uint32(1), st[1])

        st = (lo_ref[:], hi_ref[:])
        st = add_pair(st, c_col(0))

        def full_round(r, st, c_off, wq):
            if not skip_fsbox:
                st = pow7_fn(st[0], st[1])
            st = add_pair(st, c_col(r + c_off))
            return mxu_mat(st, wq)

        for r in range(HALF_F - 1):
            st = full_round(r, st, 1, wq_m[:])
        st = full_round(HALF_F - 1, st, 1, wq_p[:])

        row0 = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) == 0

        def partial_round(r, st):
            if skip_psbox:
                x0 = (st[0][0:1, :], st[1][0:1, :])
                c = r + _C_PARTIAL0
                x0 = add_pair(x0, (c_lo[0:1, c : c + 1], c_hi[0:1, c : c + 1]))
            elif pslice:
                # (1, block) -> (C, 128) via lane-tile slices (offset-0
                # layouts), pow7 at full sublane utilization, then back via
                # sublane rolls + lane concat
                nc = block // 128
                xl = st[0][0:1, :]
                xh = st[1][0:1, :]
                xcl = jnp.concatenate(
                    [xl[:, i * 128 : (i + 1) * 128] for i in range(nc)],
                    axis=0)
                xch = jnp.concatenate(
                    [xh[:, i * 128 : (i + 1) * 128] for i in range(nc)],
                    axis=0)
                y = pow7_fn(xcl, xch)
                riota = jax.lax.broadcasted_iota(jnp.int32, (nc, 128), 0)

                def pick(arr, i):
                    s = jnp.sum(
                        jnp.where(riota == i, arr, jnp.uint32(0)).astype(
                            jnp.int32),
                        axis=0, keepdims=True)
                    return s.astype(jnp.uint32)

                x0 = (
                    jnp.concatenate([pick(y[0], i) for i in range(nc)], axis=1),
                    jnp.concatenate([pick(y[1], i) for i in range(nc)], axis=1),
                )
                c = r + _C_PARTIAL0
                x0 = add_pair(x0, (c_lo[0:1, c : c + 1], c_hi[0:1, c : c + 1]))
            elif partial_4x128:
                x0l = st[0][0:1, :].reshape(4, block // 4)
                x0h = st[1][0:1, :].reshape(4, block // 4)
                x0 = pow7_fn(x0l, x0h)
                cl = c_lo[0, r + _C_PARTIAL0]
                ch = c_hi[0, r + _C_PARTIAL0]
                x0 = _add(x0[0], x0[1], cl, ch)
                x0 = (x0[0].reshape(1, block), x0[1].reshape(1, block))
            else:
                x0 = pow7_fn(st[0][0:1, :], st[1][0:1, :])
                c = r + _C_PARTIAL0
                x0 = add_pair(x0, (c_lo[0:1, c : c + 1], c_hi[0:1, c : c + 1]))
            stl = jnp.where(row0, x0[0], st[0])
            sth = jnp.where(row0, x0[1], st[1])
            return mxu_mat((stl, sth), wq_s[r * 128 : (r + 1) * 128, :])

        for r in range(RP):
            st = partial_round(r, st)

        for r in range(HALF_F - 1):
            st = full_round(r, st, _C_SECOND0, wq_m[:])
        st = pow7_fn(st[0], st[1])
        st = mxu_mat(st, wq_m[:])
        if lazy:
            st = _canon(st[0], st[1])

        out_lo_ref[:] = st[0][:T]
        out_hi_ref[:] = st[1][:T]

    return kernel


@functools.lru_cache(maxsize=None)
def build(variant: str, n_blocks: int, block: int):
    lazy = "lazy" in variant
    if "nosq" in variant:
        pow7_fn = lambda lo, hi: pp._pow7(lo, hi)
    elif lazy:
        pow7_fn = _pow7_lazy
    else:
        pow7_fn = _pow7_sq
    partial_4x128 = "p4x" in variant
    mxu = "none" if "nomxu" in variant else "packed"
    kern = make_kernel(block, pow7_fn, partial_4x128, mxu,
                       skip_psbox="nops" in variant,
                       skip_fsbox="nofs" in variant,
                       lazy=lazy, pslice="psl" in variant,
                       dual="dual" in variant)

    grid = (n_blocks,)
    spec = pl.BlockSpec((T, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    def cspec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    k = _const_packed()
    n_c = k["c"][0].shape[1]
    consts_spec = [
        cspec(16, n_c), cspec(16, n_c),
        cspec(128, 128), cspec(128, 128), cspec(RP * 128, 128),
    ]
    consts = tuple(jnp.asarray(v) for v in
                   (k["c"][0], k["c"][1], k["wq_m"], k["wq_p"], k["wq_s"]))
    fn = jax.jit(
        lambda lo, hi: pl.pallas_call(
            kern,
            grid=grid,
            in_specs=consts_spec + [spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((T, n_blocks * block), jnp.uint32),
                jax.ShapeDtypeStruct((T, n_blocks * block), jnp.uint32),
            ],
        )(*consts, lo, hi)
    )
    return fn


def run_variant(variant: str, block: int = 512, batch: int = 1 << 16):
    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(batch, T), dtype=np.uint64)
    planes = states.T.copy()
    lo = jnp.asarray((planes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((planes >> np.uint64(32)).astype(np.uint32))
    fn = build(variant, batch // block, block)

    t0 = time.perf_counter()
    olo, ohi = jax.block_until_ready(fn(lo, hi))
    compile_s = time.perf_counter() - t0

    if not any(t in variant for t in ("nomxu", "nops", "nofs")):
        want = np.stack([ref.permute(states[i]) for i in range(64)])
        got = (np.asarray(olo[:, :64], dtype=np.uint64)
               | (np.asarray(ohi[:, :64], dtype=np.uint64) << np.uint64(32))).T
        ok = np.array_equal(got, want)
    else:
        ok = None

    # chained timing
    def chain(k):
        cur = (lo, hi)
        for _ in range(k):
            cur = fn(*cur)
        return int(np.asarray(cur[0][0, 0]))

    chain(1)
    def timed(k):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best
    dt = (timed(6) - timed(1)) / 5
    print(f"{variant:28s} block={block:5d} ok={ok} "
          f"{batch/dt/1e6:7.1f}M perms/s  ({dt*1e3:.3f} ms, compile {compile_s:.1f}s)")


if __name__ == "__main__":
    args = sys.argv[1:] or ["packed-nosq", "packed", "packed-p4x"]
    for a in args:
        if ":" in a:
            v, b = a.split(":")
            run_variant(v, block=int(b))
        else:
            run_variant(a)


def run_sustained(variant: str, block: int = 2048, batch: int = 1 << 16):
    """Honest sustained timing: diff k=60 vs k=30 chained executions."""
    rng = np.random.default_rng(0)
    states = rng.integers(0, P, size=(batch, T), dtype=np.uint64)
    planes = states.T.copy()
    lo = jnp.asarray((planes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((planes >> np.uint64(32)).astype(np.uint32))
    fn = build(variant, batch // block, block)

    def chain(k):
        cur = (lo, hi)
        for _ in range(k):
            cur = fn(*cur)
        return int(np.asarray(cur[0][0, 0]))

    chain(1)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); chain(60); d60 = time.perf_counter() - t0
        t0 = time.perf_counter(); chain(30); d30 = time.perf_counter() - t0
        best = min(best, (d60 - d30) / 30)
    print(f"{variant:28s} block={block:5d} sustained "
          f"{batch/best/1e6:7.1f}M perms/s  ({best*1e3:.3f} ms)")
