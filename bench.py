"""Per-chip benchmark suite for the TPU-native STARK framework.

Prints one JSON line PER METRIC as it completes; the final line re-prints
the headline metric (the driver parses the last line).  The headline NTT
runs FIRST so a budget kill cannot lose it; every record carries its own
wall/compile cost and a physical-sanity guard rejects any rate >3x its own
roofline model (both round-3 failure modes).  Metrics follow BASELINE.md's
target configs:

1. goldilocks_ntt_2^24      — the #1 hot loop (SURVEY.md §3.2), 1 column.
2. lde_2^20x8               — multi-column low-degree extension (blowup 8x).
3. poseidon_merkle_2^20x8   — device-resident full tree build (leaves/s),
                              chained-readback timing (block_until_ready
                              returns early on the remote tunnel).
4. stark_prove_2^20         — full device-resident proof wall-clock on the
                              fibonacci machine at a 2^20-row trace, with
                              per-phase breakdown (VERDICT r1 item 1).

vs_baseline semantics (the reference publishes no numbers — BASELINE.md):
- NTT/LDE: measured / (0.70 × the per-stage traffic model): a radix-2
  network moves 16 bytes per point per stage (2 u32 limb planes,
  read+write), i.e. roofline_pps = HBM / (16·log2 N).  This is the
  implementation-bound model: under XLA each butterfly stage materializes
  to HBM.  The ideal four-step ceiling (every recursion level = one fused
  HBM sweep, `hbm_passes` total) is reported separately as
  `ideal_pass_frac` — the honest statement of remaining headroom for a
  Pallas VMEM-resident base kernel.
- Merkle: measured / (0.70 × the MXU-design compute model in
  bench_merkle): the Pallas kernel's VPU work (sboxes + limb
  extract/recombine around the MXU linear maps) ≈ 7.0e4 u32 ops per
  permutation against ≈ 3.85e12 VPU ops/s, ~2 permutations per leaf at
  width 8.  (The HBM bound is ~600× higher — hashing is compute-bound;
  the round-4 all-VPU model described a kernel that no longer exists.)
- prove: vs_baseline = stage-model roofline seconds / measured, over the
  dominant movements (stage LDEs + tree hash traffic + Q + FRI).
"""
from __future__ import annotations

import json
import time

import numpy as np

# Reuse the entry module's environment setup (persistent compilation cache +
# XLA:CPU workaround flags) — without the cache every bench run recompiles
# the full 2^20-2^24 program set through the remote-compile relay, which
# alone exceeds a 10-minute budget.
import __graft_entry__  # noqa: F401

HBM_BYTES_PER_S = 819e9  # v5e (TPU v5 lite) HBM bandwidth
P = 0xFFFFFFFF00000001


class CompileCounter:
    """Counts XLA backend compilations inside a `with` block via the JAX
    monitoring events — the recompilation guard: a warm pass that still
    compiles shows up as nonzero `recompiles` in the metric record, so a
    cache-key drift is attributable from BENCH_r*.json alone."""

    def __init__(self):
        self.count = 0
        self.seconds = 0.0

    def _listener(self, event, duration, **kw):
        if "compile" in event:
            self.count += 1
            self.seconds += duration

    def __enter__(self):
        import jax

        try:
            jax.monitoring.register_event_duration_secs_listener(self._listener)
            self._ok = True
        except Exception:
            self._ok = False
        return self

    def __exit__(self, *exc):
        if self._ok:
            try:
                from jax._src import monitoring as _m

                _m._unregister_event_duration_listener_by_callback(self._listener)
            except Exception:
                pass
        return False


def _emit(metric, value, unit, vs_baseline, **extra):
    """Build (do NOT print) a metric record; main() prints each record as
    soon as its bench completes, with wall/compile attribution attached."""
    rec = {
        "metric": metric,
        "value": round(value) if value > 100 else round(value, 4),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 4),
    }
    rec.update(extra)
    return rec


def _chain_time(fn, arg, k_short=1, k_long=9, reps=3):
    """Time k chained executions ending in a scalar readback; difference two
    chain lengths to cancel the tunnel's constant dispatch+readback cost."""

    def chain(k):
        cur = arg
        for _ in range(k):
            cur = fn(cur)
        return int(np.asarray(cur[0].reshape(-1)[0]))

    chain(1)  # warmup/compile

    def timed(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            chain(k)
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_long) - timed(k_short)) / (k_long - k_short)


def _ntt_passes(bits: int, base_bits: int) -> int:
    """HBM sweeps of the four-step recursion: each recursion level reads and
    writes the full array once for its base transforms and once for the
    twiddle+transpose relayout (the top level's transpose pairs fuse)."""
    levels = 1
    b = bits
    while b > base_bits:
        b = b - base_bits if b <= 2 * base_bits else b // 2
        levels += 1
    return 2 * levels - 1


def bench_ntt():
    import jax  # noqa: F401
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.ops import ntt

    bits, cols = 24, 1
    n = 1 << bits
    rng = np.random.default_rng(0)
    pair = gl.from_u64(rng.integers(0, P, size=(n, cols), dtype=np.uint64))
    dt = _chain_time(ntt._jit_ntt(bits), pair, k_long=5)
    pps = n * cols / dt
    passes = _ntt_passes(bits, ntt._BASE_BITS)
    stage_pps = HBM_BYTES_PER_S / (16.0 * bits)  # per-stage traffic model
    ideal_pps = HBM_BYTES_PER_S / (passes * 16.0)  # fused four-step ceiling
    return _emit(
        f"goldilocks_ntt_2^{bits}_points_per_s", pps, "points/s/chip",
        pps / (0.70 * stage_pps),
        ideal_pass_frac=round(pps / ideal_pps, 4), hbm_passes=passes,
    )


def bench_lde():
    import jax  # noqa: F401
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.ops import ntt

    bits, ext_bits, cols = 20, 23, 8
    n, ext_n = 1 << bits, 1 << ext_bits
    rng = np.random.default_rng(0)
    # planar (cols, n) layout — the production commit pipeline's LDE entry
    pair = gl.from_u64(rng.integers(0, P, size=(cols, n), dtype=np.uint64))
    fn = ntt._jit_lde_planar(bits, ext_bits, 7)

    # chained timing (same methodology as the NTT metric): fold one output
    # scalar back into the next input so the chain is data-dependent, and
    # difference two chain lengths to cancel the tunnel's constant
    # dispatch+readback latency (~60 ms — comparable to the kernel itself)
    def step(p):
        o = fn(p)
        return (p[0] ^ (o[0][0, 0] & np.uint32(1)), p[1])

    dt = _chain_time(step, pair, k_long=5)
    pps = ext_n * cols / dt  # extended points produced per second
    # per-stage model: iNTT stages sweep n rows, NTT stages ext_n rows;
    # normalized to extended points
    eff_stages = bits * (n / ext_n) + ext_bits
    stage_pps = HBM_BYTES_PER_S / (16.0 * eff_stages)
    eff_passes = (
        _ntt_passes(bits, ntt._BASE_BITS) * (n / ext_n)
        + _ntt_passes(ext_bits, ntt._BASE_BITS)
    )
    ideal_pps = HBM_BYTES_PER_S / (eff_passes * 16.0)
    return _emit(
        f"goldilocks_lde_2^{bits}x{cols}_to_2^{ext_bits}", pps,
        "ext points/s/chip", pps / (0.70 * stage_pps),
        ideal_pass_frac=round(pps / ideal_pps, 4),
    )


def bench_merkle():
    import jax  # noqa: F401
    from pil2_stark_tpu.field import jax_gl as gl
    from pil2_stark_tpu.stark import device as dev

    bits, cols = 20, 8
    n = 1 << bits
    rng = np.random.default_rng(0)
    # planar (cols, n) layout — the production commit pipeline's tree input
    pair = gl.from_u64(rng.integers(0, P, size=(cols, n), dtype=np.uint64))

    # Chained timing with a scalar readback, like the NTT metric:
    # block_until_ready returns before remote-tunnel work completes (the
    # round-3 1.67e9 leaves/s artifact was this), so each step folds the
    # previous root into the next input and the chain ends in a readback.
    def step(p):
        t = dev.merkelize(p, cols, n, planar=True)
        rlo, _ = t.levels[-1]
        return (p[0] ^ (rlo.reshape(-1)[0] & np.uint32(1)), p[1])

    dt = _chain_time(step, pair, k_short=1, k_long=5)
    leaves_per_s = n / dt
    # MXU-design compute model (round 5; the round-4 all-VPU model no
    # longer described the kernel).  Per permutation the Pallas kernel
    # (hash/pallas_poseidon.py) does ~118 element-sboxes x 4 GL muls x
    # ~90 u32 VPU ops plus 30 x (limb extract ~32 + recombine ~45) x 12
    # rows of matmul glue and ~6k ops of adds/selects ~= 7.0e4 u32
    # VPU-op-equivalents (the 30 linear maps themselves ride the MXU:
    # 128^2 x B MACs each, ~9% of the chip's int8 MAC budget — not the
    # binding resource).  v5e VPU ~= 4 ops/lane/cycle x 1024 lanes x
    # 0.94 GHz = 3.85e12 ops/s.  Tree perms/leaf at w=8: 1 leaf sponge +
    # (n-1)/n pair hashes ~= 2.0.
    vpu_ops = 3.85e12
    ops_per_perm = 7.0e4
    perms_per_leaf = 2.0
    model_leaves = vpu_ops / (ops_per_perm * perms_per_leaf)
    return _emit(
        f"poseidon_merkle_2^{bits}x{cols}_leaves_per_s", leaves_per_s,
        "leaves/s/chip", leaves_per_s / (0.70 * model_leaves),
        perms_per_s_equiv=round(leaves_per_s * perms_per_leaf),
        note="MXU-design VPU-bound model; see bench_merkle comments",
    )


def bench_prove():
    import jax  # noqa: F401
    from pil2_stark_tpu.compiler import pil1_parser
    from pil2_stark_tpu.models import fibonacci
    from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier

    n_bits = 20
    n = 1 << n_bits
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
    pil["name"] = "Fibonacci"
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    ss = {
        "nBits": n_bits,
        "nBitsExt": n_bits + 1,
        "nQueries": 32,
        "verificationHashType": "GL",
        "steps": [{"nBits": b} for b in range(n_bits + 1, 6, -4)],
    }
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)

    t0 = time.perf_counter()
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer,
        s["constTree"], (cm_cols.buffer, publics), backend="device",
    )
    cold = time.perf_counter() - t0
    with CompileCounter() as cc_warm:
        t0 = time.perf_counter()
        res = prover.prove(
            s["starkInfo"], s["expressionsInfo"], const_cols.buffer,
            s["constTree"], (cm_cols.buffer, publics), backend="device",
        )
        warm = time.perf_counter() - t0
    ok = verifier.verify(
        res["proof"], res["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
    assert ok, "proof failed to verify"

    phases = res.get("timings", {})
    # component model: per-stage NTT traffic for each LDE (iNTT at n +
    # NTT at ext_n) over the committed widths, + one read for hashing
    ext_n = 1 << (n_bits + 1)
    w_total = sum(
        s["starkInfo"]["mapSectionsN"][f"cm{i+1}"]
        for i in range(s["starkInfo"]["nStages"] + 1)
    ) + s["starkInfo"]["nConstants"]
    stage_bytes = 16.0 * w_total * (n * n_bits + ext_n * (n_bits + 1))
    hash_bytes = ext_n * w_total * 8.0
    roofline_s = (stage_bytes + hash_bytes) / HBM_BYTES_PER_S
    return _emit(
        f"stark_prove_fibonacci_2^{n_bits}_wall_s", warm, "s (warm)",
        roofline_s / warm / 0.70,
        cold_s=round(cold, 3), verified=bool(ok),
        # recompilation guard: a warm pass must hit the in-process jit
        # caches; nonzero recompiles = cache-key drift (the round-2 18.3s
        # regression would have been attributable from this field alone)
        recompiles_warm=cc_warm.count,
        recompile_s_warm=round(cc_warm.seconds, 2),
        phases={k: round(v, 3) for k, v in sorted(phases.items(), key=lambda kv: -kv[1])},
        unattributed_s=round(warm - sum(phases.values()), 3),
    )


def main():
    # The headline NTT metric runs FIRST so a budget kill mid-run still
    # leaves it on record (round-3 ran it last and lost it to rc=124);
    # if everything completes it is re-printed as the final line (the
    # driver parses the last line).
    headline = None
    for fn in (bench_ntt, bench_lde, bench_merkle, bench_prove):
        t0 = time.perf_counter()
        try:
            with CompileCounter() as cc:
                rec = fn()
        except Exception as e:  # keep earlier metrics on record
            print(
                json.dumps({
                    "metric": fn.__name__, "error": str(e)[:300],
                    "bench_wall_s": round(time.perf_counter() - t0, 1),
                }),
                flush=True,
            )
            continue
        # wall/compile attribution: a driver timeout is diagnosable from
        # the per-metric cost; compile_s ≈ cold cost (0 when the
        # persistent cache is warm)
        rec["bench_wall_s"] = round(time.perf_counter() - t0, 1)
        rec["compiles"] = cc.count
        rec["compile_s"] = round(cc.seconds, 1)
        # physical-sanity guard: a rate several times above its own
        # roofline model measures a broken timer, not the hardware
        # (round-3's async Merkle "271x" artifact)
        if rec["vs_baseline"] > 3.0:
            rec = {
                "metric": rec["metric"],
                "error": (
                    f"failed physical sanity: vs_baseline "
                    f"{rec['vs_baseline']} exceeds 3x the metric's own "
                    f"roofline model — timing artifact, not a result"
                ),
                "raw": rec,
            }
            print(json.dumps(rec), flush=True)
            continue
        print(json.dumps(rec), flush=True)
        if rec["metric"].startswith("goldilocks_ntt"):
            headline = rec
    if headline is not None:
        print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
