"""Per-chip benchmark: Goldilocks NTT throughput (the #1 hot loop of STARK
proving, SURVEY.md §3.2) on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is defined
against the per-chip HBM roofline target from BASELINE.json: 70% of the
memory-bandwidth-bound points/s for a radix-2 NTT
(bytes ≈ 32·N·log2(N): 2 limb planes × u32 × read+write per stage).
vs_baseline = measured / (0.70 · roofline).
"""
from __future__ import annotations

import json
import time

import numpy as np

HBM_BYTES_PER_S = 819e9  # v5e (TPU v5 lite) HBM bandwidth
P = 0xFFFFFFFF00000001


def main():
    import jax
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.ops import ntt

    bits = 22
    cols = 1
    n = 1 << bits
    rng = np.random.default_rng(0)
    x = rng.integers(0, P, size=(n, cols), dtype=np.uint64)
    pair = gl.from_u64(x)
    fn = ntt._jit_ntt(bits)

    # The tunneled TPU runtime is fully async and host transfers ride the
    # network, so we time K-chained executions ending in a scalar readback
    # and difference two chain lengths to cancel constant overhead.
    def chain(k):
        cur = pair
        for _ in range(k):
            cur = fn(cur)
        return int(np.asarray(cur[0][0, 0]))

    chain(1)  # warmup/compile

    def timed(k, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(1)
    t_long = timed(9)
    dt = (t_long - t_short) / 8

    points_per_s = n * cols / dt

    roofline_time = 32.0 * n * bits / HBM_BYTES_PER_S
    roofline_pps = n / roofline_time
    vs_baseline = points_per_s / (0.70 * roofline_pps)

    print(
        json.dumps(
            {
                "metric": f"goldilocks_ntt_2^{bits}_points_per_s",
                "value": round(points_per_s),
                "unit": "points/s/chip",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
