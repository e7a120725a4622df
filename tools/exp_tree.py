"""Tree-build overhead experiments (round 5): where do leaf sponges and
level hashes lose 2x vs the raw permutation kernel?"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import __graft_entry__  # noqa: F401

import jax
import jax.numpy as jnp

from pil2_stark_tpu.field import jax_gl as gl
from pil2_stark_tpu.hash import jax_poseidon as jp
from pil2_stark_tpu.hash import pallas_poseidon as pp

P = 0xFFFFFFFF00000001


def chain_time(fn, arg, k_long=5, reps=3):
    def chain(k):
        cur = arg
        for _ in range(k):
            cur = fn(cur)
        return int(np.asarray(cur[0].reshape(-1)[0]))

    chain(1)

    def timed(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_long) - timed(1)) / (k_long - 1)


@jax.jit
def level_noshuffle(dlo, dhi):
    """Timing probe: pair FIRST HALF with SECOND HALF lanes (slices only,
    wrong values for the real tree, same data volume)."""
    m = dlo.shape[1] // 2
    z = jnp.zeros((4, m), dtype=jnp.uint32)
    st = (
        jnp.concatenate([dlo[:, :m], dlo[:, m:], z], axis=0),
        jnp.concatenate([dhi[:, :m], dhi[:, m:], z], axis=0),
    )
    out = jp.permute_planar(st)
    return (out[0][:4], out[1][:4])


@functools.lru_cache(maxsize=None)
def _jit_leaf_loop(n_rc: int, chunk: int, n_chunks: int):
    """Leaf sponges via a static python loop (no scan, no moveaxis)."""
    def body(cols):
        lo, hi = cols
        outs = []
        for i in range(n_rc):
            blk = (lo[:, i * chunk : (i + 1) * chunk],
                   hi[:, i * chunk : (i + 1) * chunk])
            outs.append(jp.linear_hash_planar(blk, n_chunks * 8))
        return (
            jnp.concatenate([o[0] for o in outs], axis=1),
            jnp.concatenate([o[1] for o in outs], axis=1),
        )

    return jax.jit(body)


def main():
    rng = np.random.default_rng(0)
    n, w = 1 << 20, 8

    # --- level hash variants on (4, 2^20) digests
    d = gl.from_u64(rng.integers(0, P, size=(4, n), dtype=np.uint64))

    def mk(levfn):
        def step(x):
            o = levfn(x[0], x[1])
            pad = ((0, 0), (0, x[0].shape[1] - o[0].shape[1]))
            return (jnp.pad(o[0], pad) ^ (x[0] & np.uint32(1)), x[1])
        return step

    dt = chain_time(mk(jp._hash_level_planar), d)
    print(f"level interleaved : {(n//2)/dt/1e6:.1f}M pairs/s ({dt*1e3:.1f} ms)")
    dt = chain_time(mk(level_noshuffle), d)
    print(f"level noshuffle   : {(n//2)/dt/1e6:.1f}M pairs/s ({dt*1e3:.1f} ms)")

    # --- leaf sponge variants on (8, 2^20) cols
    cols = gl.from_u64(rng.integers(0, P, size=(w, n), dtype=np.uint64))
    chunk = pp._CHUNK

    def leaf_scan(c):
        dd = jp._leaf_digests_planar(c, w, n, False)
        return (c[0] ^ (dd[0].reshape(-1)[0] & np.uint32(1)), c[1])

    dt = chain_time(leaf_scan, cols)
    print(f"leaf scan         : {n/dt/1e6:.1f}M leaves/s ({dt*1e3:.1f} ms)")

    fn = _jit_leaf_loop(n // chunk, chunk, 1)

    def leaf_loop(c):
        dd = fn(c)
        return (c[0] ^ (dd[0].reshape(-1)[0] & np.uint32(1)), c[1])

    dt = chain_time(leaf_loop, cols)
    print(f"leaf loop         : {n/dt/1e6:.1f}M leaves/s ({dt*1e3:.1f} ms)")

    # --- one whole-leaf-set permute for reference (2^20 lanes)
    st = gl.from_u64(rng.integers(0, P, size=(12, n), dtype=np.uint64))
    fnp = jax.jit(lambda s: pp.permute_planes_pair(s))
    dt = chain_time(fnp, st)
    print(f"permute 2^20 lanes: {n/dt/1e6:.1f}M perms/s ({dt*1e3:.1f} ms)")


if __name__ == "__main__":
    main()


def main2():
    """Isolate the 2x chunked-permute loss: call overhead vs slice/concat
    vs grid pipelining."""
    rng = np.random.default_rng(0)
    n = 1 << 20
    st = gl.from_u64(rng.integers(0, P, size=(12, n), dtype=np.uint64))
    chunk = pp._CHUNK

    # t1: 16 calls, no slicing (same buffer, xor-chained to defeat CSE)
    @jax.jit
    def t1(s):
        lo, hi = s[0][:, :chunk], s[1][:, :chunk]
        acc = None
        for i in range(n // chunk):
            olo, ohi = pp._permute_planes(lo ^ np.uint32(i), hi, False)
            acc = olo if acc is None else acc ^ olo
        return (acc, ohi)

    dt = chain_time(t1, st)
    print(f"16 calls no-slice : {n/dt/1e6:.1f}M perms/s ({dt*1e3:.1f} ms)")

    # t2: one call, grid=512
    @jax.jit
    def t2(s):
        return pp._permute_planes(s[0], s[1], False)

    dt = chain_time(t2, st)
    print(f"one call grid 512 : {n/dt/1e6:.1f}M perms/s ({dt*1e3:.1f} ms)")

    # t3: slices + concat (production path)
    @jax.jit
    def t3(s):
        return pp.permute_planes_pair(s)

    dt = chain_time(t3, st)
    print(f"loop slice+concat : {n/dt/1e6:.1f}M perms/s ({dt*1e3:.1f} ms)")


if __name__ == "__main__" and "2" in sys.argv[1:]:
    main2()
