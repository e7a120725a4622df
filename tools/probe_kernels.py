"""Micro-probes of the TPU hot kernels (chained-readback timing).

Decomposes the bench metrics into their kernel components so perf work
targets the real bottleneck (device-side tracing is unavailable through
the remote tunnel; elapsed chained timing is the reliable instrument).
Run: python tools/probe_kernels.py [ntt|poseidon|merkle|lde|all]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import __graft_entry__  # noqa: F401  (env + persistent cache)

import jax
import jax.numpy as jnp

P = 0xFFFFFFFF00000001


def chain_time(fn, arg, k_short=1, k_long=5, reps=3, scalar=None):
    """Best-of-reps chained timing; fn must map arg -> same-structure arg."""
    if scalar is None:
        scalar = lambda cur: int(np.asarray(cur[0].reshape(-1)[0]))

    def chain(k):
        cur = arg
        for _ in range(k):
            cur = fn(cur)
        return scalar(cur)

    chain(1)

    def timed(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_long) - timed(k_short)) / (k_long - k_short)


def probe_poseidon():
    """Raw permutation kernel rate at the production batch bucket."""
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.hash import pallas_poseidon as pp

    rng = np.random.default_rng(0)
    for b in (pp._CHUNK, 4 * pp._CHUNK):
        st = gl.from_u64(rng.integers(0, P, size=(b, 12), dtype=np.uint64))
        fn = jax.jit(lambda s: pp.permute_pair(s))
        dt = chain_time(fn, st)
        print(f"poseidon permute B={b}: {b/dt/1e6:.1f}M perms/s  ({dt*1e3:.3f} ms)")


def probe_merkle_parts():
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.hash import jax_poseidon as jp

    rng = np.random.default_rng(0)
    n, w = 1 << 20, 8
    rows = gl.from_u64(rng.integers(0, P, size=(n, w), dtype=np.uint64))

    # leaf sponges only
    def leaves(r):
        d = jp._leaf_digests_device(r, w, n, False)
        return (r[0] ^ (d[0].reshape(-1)[0] & np.uint32(1)), r[1])

    dt = chain_time(leaves, rows)
    print(f"leaf sponges 2^20 x {w}: {n/dt/1e6:.1f}M leaves/s  ({dt*1e3:.1f} ms)")

    # one big level hash (2^20 digests -> 2^19)
    d = gl.from_u64(rng.integers(0, P, size=(n, 4), dtype=np.uint64))

    def level(x):
        o = jp._hash_level_all(x[0], x[1])
        pad = ((0, x[0].shape[0] - o[0].shape[0]), (0, 0))
        return (jnp.pad(o[0], pad) ^ (x[0] & np.uint32(1)), x[1])

    dt = chain_time(level, d)
    print(f"level hash 2^20->2^19: {(n//2)/dt/1e6:.1f}M pairs/s  ({dt*1e3:.1f} ms)")

    # full tree
    from pil2_stark_tpu.stark import device as dev

    def tree(p):
        t = dev.merkelize(p, w, n)
        rlo, _ = t.levels[-1]
        return (p[0] ^ (rlo.reshape(-1)[0] & np.uint32(1)), p[1])

    dt = chain_time(tree, rows)
    print(f"full tree 2^20 x {w}: {n/dt/1e6:.1f}M leaves/s  ({dt*1e3:.1f} ms)")

    # planar pipeline twins (the production commit path)
    cols = (rows[0].T, rows[1].T)

    def leaves_p(c):
        d = jp._leaf_digests_planar(c, w, n, False)
        return (c[0] ^ (d[0].reshape(-1)[0] & np.uint32(1)), c[1])

    dt = chain_time(leaves_p, cols)
    print(f"planar leaf sponges 2^20 x {w}: {n/dt/1e6:.1f}M leaves/s  ({dt*1e3:.1f} ms)")

    dp = (d[0].T, d[1].T)

    def level_p(x):
        o = jp._hash_level_planar(x[0], x[1])
        pad = ((0, 0), (0, x[0].shape[1] - o[0].shape[1]))
        return (jnp.pad(o[0], pad) ^ (x[0] & np.uint32(1)), x[1])

    dt = chain_time(level_p, dp)
    print(f"planar level hash 2^20->2^19: {(n//2)/dt/1e6:.1f}M pairs/s  ({dt*1e3:.1f} ms)")

    def tree_p(c):
        t = dev.merkelize(c, w, n, planar=True)
        rlo, _ = t.levels[-1]
        return (c[0] ^ (rlo.reshape(-1)[0] & np.uint32(1)), c[1])

    dt = chain_time(tree_p, cols)
    print(f"planar full tree 2^20 x {w}: {n/dt/1e6:.1f}M leaves/s  ({dt*1e3:.1f} ms)")


def probe_ntt_parts():
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.ops import ntt, pallas_ntt

    rng = np.random.default_rng(0)

    # 2^24 full NTT (the headline)
    bits = 24
    n = 1 << bits
    pair = gl.from_u64(rng.integers(0, P, size=(n, 1), dtype=np.uint64))
    dt = chain_time(ntt._jit_ntt(bits), pair)
    print(f"ntt 2^24: {n/dt/1e9:.2f}G pts/s  ({dt*1e3:.1f} ms)")

    # base_grid alone at the LDE shapes: bits2=12, cols=8, n1=2^11
    for bits2, n_cols, n1 in ((12, 8, 1 << 11), (12, 1, 1 << 12)):
        m = (1 << bits2) * n_cols * n1
        x = gl.from_u64(
            rng.integers(0, P, size=(n_cols << bits2, n1), dtype=np.uint64)
        )
        fn = jax.jit(
            lambda a, b2=bits2, c=n_cols: pallas_ntt.base_grid(a, b2, c, False)
        )
        dt = chain_time(fn, x)
        print(
            f"base_grid 2^{bits2} cols={n_cols} n1={n1}: "
            f"{m/dt/1e9:.2f}G pts/s  ({dt*1e3:.1f} ms)"
        )

    # level_planar alone: bits1=11, n2=2^12, cols=8  (the 2^23 LDE level)
    bits1, n2, n_cols = 11, 1 << 12, 8
    n1 = 1 << bits1
    tw = ntt._twiddle_dev(bits1 + 12, bits1, False)
    x = gl.from_u64(rng.integers(0, P, size=(n1, n_cols * n2), dtype=np.uint64))
    fn = jax.jit(
        lambda a: pallas_ntt.level_planar(a, bits1, n2, n_cols, tw, False)
    )

    def step(a):
        o = fn(a)
        return (o[0].reshape(n1, n_cols * n2), o[1].reshape(n1, n_cols * n2))

    m = n1 * n2 * n_cols
    dt = chain_time(step, x)
    print(f"level_planar 2^{bits1} x {n_cols*n2}: {m/dt/1e9:.2f}G pts/s  ({dt*1e3:.1f} ms)")


def probe_lde():
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.ops import ntt

    rng = np.random.default_rng(0)
    bits, ext_bits, cols = 20, 23, 8
    n = 1 << bits
    pair = gl.from_u64(rng.integers(0, P, size=(n, cols), dtype=np.uint64))
    fn = ntt._jit_lde(bits, ext_bits, 7)

    def step(p):
        o = fn(p)
        return (o[0][:n], o[1][:n])

    dt = chain_time(step, pair)
    print(f"lde 2^20x8->2^23: {(1<<ext_bits)*cols/dt/1e9:.2f}G ext pts/s  ({dt*1e3:.1f} ms)")

    # iNTT half alone
    fni = ntt._jit_intt(bits)
    dt = chain_time(fni, pair)
    print(f"intt 2^20x8: {n*cols/dt/1e9:.2f}G pts/s  ({dt*1e3:.1f} ms)")

    # fwd 2^23 x8 alone
    pair23 = gl.from_u64(
        rng.integers(0, P, size=(1 << ext_bits, cols), dtype=np.uint64)
    )
    fnf = ntt._jit_ntt(ext_bits)
    dt = chain_time(fnf, pair23)
    print(f"ntt 2^23x8: {(1<<ext_bits)*cols/dt/1e9:.2f}G pts/s  ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.perf_counter()
    if which in ("poseidon", "all"):
        probe_poseidon()
    if which in ("merkle", "all"):
        probe_merkle_parts()
    if which in ("ntt", "all"):
        probe_ntt_parts()
    if which in ("lde", "all"):
        probe_lde()
    print(f"total {time.perf_counter()-t0:.1f}s")
