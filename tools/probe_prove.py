"""Fine-grained wall-clock attribution inside prove() at 2^20 on the TPU.

Monkeypatches the hot internals with timers (upload, LDE, tree, TAC, hints,
evals, fri, gathers) and prints the per-callsite totals of a WARM prove.
Run: python tools/probe_prove.py [n_bits]
"""
from __future__ import annotations

import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")
import __graft_entry__  # noqa: F401

import numpy as np

TIMES: dict[str, float] = defaultdict(float)
COUNTS: dict[str, int] = defaultdict(int)


def wrap(mod, name, label=None, sync=None):
    fn = getattr(mod, name)
    lab = label or f"{mod.__name__.split('.')[-1]}.{name}"

    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        if sync is not None:
            sync(out)
        TIMES[lab] += time.perf_counter() - t0
        COUNTS[lab] += 1
        return out

    setattr(mod, name, inner)
    return fn


def block(out):
    import jax

    jax.block_until_ready(out)


def main():
    n_bits = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from pil2_stark_tpu.compiler import pil1_parser
    from pil2_stark_tpu.models import fibonacci
    from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
    from pil2_stark_tpu.stark import device, hints
    from pil2_stark_tpu.ops import ntt as ntt_ops, jax_tac
    from pil2_stark_tpu.field import jax_gl as _jgl
    from pil2_stark_tpu.stark import fri as fri_mod

    n = 1 << n_bits
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
    pil["name"] = "Fibonacci"
    cc = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, cc.Fibonacci)
    cm = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm.Fibonacci, [1, 2])
    ss = {
        "nBits": n_bits, "nBitsExt": n_bits + 1, "nQueries": 32,
        "verificationHashType": "GL",
        "steps": [{"nBits": b} for b in range(n_bits + 1, 6, -4)],
    }
    s = stark_setup.stark_setup(cc.buffer, pil, ss)

    args = (s["starkInfo"], s["expressionsInfo"], cc.buffer, s["constTree"],
            (cm.buffer, [1, 2, out]))

    # cold pass (also primes every jit cache)
    t0 = time.perf_counter()
    prover.prove(*args, backend="device")
    print(f"cold: {time.perf_counter()-t0:.2f}s", flush=True)

    # instrument (sync on device-returning calls so time lands here)
    wrap(prover, "_jgl", None) if False else None
    orig_from = _jgl.from_u64

    def from_t(x):
        t0 = time.perf_counter()
        o = orig_from(x)
        block(o)
        TIMES["upload.from_u64"] += time.perf_counter() - t0
        COUNTS["upload.from_u64"] += 1
        return o

    prover._jgl.from_u64 = from_t

    wrap(ntt_ops, "lde", "lde", block)
    wrap(device, "merkelize", "merkelize",
         lambda t: block(t.levels[-1]))
    wrap(hints, "apply_hints", "hints")
    wrap(jax_tac, "make_executor", "tac.make_executor")
    wrap(jax_tac, "pack_inputs", "tac.pack_inputs")
    wrap(prover, "_compute_evals_device", "evals.device", block)
    wrap(prover, "_compute_q_device", "q.device")
    wrap(prover, "_compute_fri_pol", "friPol")
    wrap(device, "gather_group_proofs_multi", "queries.gather")
    wrap(fri_mod.FRI, "fold", "fri.fold")
    wrap(fri_mod.FRI, "proof_queries", "fri.proof_queries")
    wrap(device, "domain_consts", "init.domain_consts")

    t0 = time.perf_counter()
    res = prover.prove(*args, backend="device")
    warm = time.perf_counter() - t0
    print(f"warm: {warm:.2f}s")
    print("phases:", {k: round(v, 3) for k, v in sorted(
        res["timings"].items(), key=lambda kv: -kv[1]) if v > 0.02})
    attributed = 0.0
    for k in sorted(TIMES, key=lambda k: -TIMES[k]):
        if TIMES[k] < 0.01:
            continue
        print(f"  {k:28s} {TIMES[k]:7.3f}s  x{COUNTS[k]}")
        attributed += TIMES[k]
    print(f"  (instrumented sum {attributed:.2f}s of {warm:.2f}s)")
    ok = verifier.verify(res["proof"], res["publics"], s["constRoot"],
                         s["starkInfo"], s["verifierInfo"])
    print("verified:", ok)


if __name__ == "__main__":
    main()
