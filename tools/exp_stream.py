"""Manual double-buffered streaming wrapper for the Poseidon kernel.

Hypothesis: Pallas's auto-pipeliner on this runtime adds ~25 us/block of
non-overlapped DMA; a hand-rolled in/out DMA pipeline should stream at
the VMEM-resident compute rate (~17.5 us per 2048-lane block).
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

from pil2_stark_tpu.field import jax_gl as gl
from pil2_stark_tpu.hash import pallas_poseidon as pp
from pil2_stark_tpu.hash import poseidon_gl as ref

P = 0xFFFFFFFF00000001
T = 12
BLK = pp._BLOCK


def _compute_block(c_lo, c_hi, wq_m, wq_p, wq_s, x):
    """(24, BLK) -> (24, BLK) permutation (the production kernel body)."""
    outs = {}

    class R:
        def __init__(s, a):
            s.a = a

        def __getitem__(s, idx):
            return s.a

        @property
        def shape(s):
            return s.a.shape

    class W:
        def __setitem__(s, idx, v):
            outs["v"] = v

    pp._kernel(c_lo, c_hi, wq_m, wq_p, wq_s, R(x), W())
    return outs["v"]


def _make_stream_kernel(n_blocks: int):
    def kern(c_lo, c_hi, wq_m, wq_p, wq_s, x_hbm, out_hbm):
        def body(scr_in, scr_out, sem_in, sem_out):
            def in_dma(slot, i):
                return pltpu.make_async_copy(
                    x_hbm.at[:, pl.ds(i * BLK, BLK)],
                    scr_in.at[slot], sem_in.at[slot])

            def out_dma(slot, i):
                return pltpu.make_async_copy(
                    scr_out.at[slot],
                    out_hbm.at[:, pl.ds(i * BLK, BLK)],
                    sem_out.at[slot])

            in_dma(0, 0).start()

            def step(i, carry):
                cur = jax.lax.rem(i, 2)
                nxt = jax.lax.rem(i + 1, 2)

                @pl.when(i + 1 < n_blocks)
                def _():
                    in_dma(nxt, i + 1).start()

                in_dma(cur, i).wait()

                @pl.when(i >= 2)
                def _():
                    out_dma(cur, i - 2).wait()

                x = scr_in[cur]
                y = _compute_block(c_lo, c_hi, wq_m, wq_p, wq_s, x)
                scr_out[cur] = y
                out_dma(cur, i).start()
                return carry

            jax.lax.fori_loop(0, n_blocks, step, 0)
            if n_blocks >= 2:
                out_dma((n_blocks - 2) % 2, n_blocks - 2).wait()
            out_dma((n_blocks - 1) % 2, n_blocks - 1).wait()

        pl.run_scoped(
            body,
            scr_in=pltpu.VMEM((2, 2 * T, BLK), jnp.uint32),
            scr_out=pltpu.VMEM((2, 2 * T, BLK), jnp.uint32),
            sem_in=pltpu.SemaphoreType.DMA((2,)),
            sem_out=pltpu.SemaphoreType.DMA((2,)),
        )

    return kern


@functools.lru_cache(maxsize=None)
def build_stream(n_blocks: int):
    k = pp._const_planes()
    consts = tuple(jnp.asarray(v) for v in
                   (k["c"][0], k["c"][1], k["wq_m"], k["wq_p"], k["wq_s"]))
    n_c = k["c"][0].shape[1]

    def cspec(r, c):
        return pl.BlockSpec((r, c), lambda: (0, 0), memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    consts_spec = [cspec(16, n_c), cspec(16, n_c), cspec(128, 128),
                   cspec(128, 128), cspec(pp.RP * 128, 128)]
    return jax.jit(lambda x: pl.pallas_call(
        _make_stream_kernel(n_blocks),
        in_specs=consts_spec + [any_spec],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct((2 * T, n_blocks * BLK), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*consts, x))


def main():
    rng = np.random.default_rng(0)
    # correctness at 2^14
    n = 1 << 14
    states = rng.integers(0, P, size=(n, T), dtype=np.uint64)
    planes = states.T.copy()
    x = jnp.concatenate([
        jnp.asarray((planes & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((planes >> np.uint64(32)).astype(np.uint32))], axis=0)
    out = np.asarray(build_stream(n // BLK)(x))
    got = (out[:T].astype(np.uint64)
           | (out[T:].astype(np.uint64) << np.uint64(32))).T
    want = np.stack([ref.permute(states[i]) for i in range(64)])
    print("ok:", np.array_equal(got[:64], want))

    for bits in (16, 17, 20):
        n = 1 << bits
        st = gl.from_u64(rng.integers(0, P, size=(T, n), dtype=np.uint64))
        x = jnp.concatenate([st[0], st[1]], axis=0)
        fn = build_stream(n // BLK)

        def chain(k):
            cur = x
            for _ in range(k):
                cur = fn(cur)
            return int(np.asarray(cur[0, 0]))

        chain(1)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); chain(5); d5 = time.perf_counter() - t0
            t0 = time.perf_counter(); chain(1); d1 = time.perf_counter() - t0
            best = min(best, (d5 - d1) / 4)
        print(f"stream 2^{bits}: {n/best/1e6:.1f}M perms/s ({best*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
