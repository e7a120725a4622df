"""Optimal im-pols selection (optImPols): never worse than the min-cut
heuristic, and the resulting setup still proves/verifies E2E."""
import numpy as np

from pil2_stark_tpu.compiler import pil1_parser
from pil2_stark_tpu.models import fibonacci, gadgets
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier


def _added_cols(si):
    im_cols = sum(p["dim"] for p in si["cmPolsMap"] if p.get("imPol"))
    return si["qDeg"] * si["qDim"] + im_cols


def _setup(pil_src, name, n, ss, options=None):
    pil = pil1_parser.compile_pil_source(pil_src)
    pil["name"] = name
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    return pil, const_cols


def test_opt_impols_fibonacci_e2e():
    n = 64
    pil, const_cols = _setup(fibonacci.pil_source(6), "Fibonacci", n, None)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]

    s_heur = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    pil2, const_cols2 = _setup(fibonacci.pil_source(6), "Fibonacci", n, None)
    fibonacci.build_constants(n, const_cols2.Fibonacci)
    s_opt = stark_setup.stark_setup(
        const_cols2.buffer, pil2, fibonacci.STARK_STRUCT,
        options={"optImPols": True},
    )
    assert _added_cols(s_opt["starkInfo"]) <= _added_cols(s_heur["starkInfo"])

    res = prover.prove(
        s_opt["starkInfo"], s_opt["expressionsInfo"], const_cols2.buffer,
        s_opt["constTree"], (cm_cols.buffer, publics),
    )
    assert verifier.verify(
        res["proof"], res["publics"], s_opt["constRoot"], s_opt["starkInfo"],
        s_opt["verifierInfo"],
    )


def test_opt_impols_gadgets_never_worse():
    """The 'all' machine has real shared subexpressions (plookup h1/h2,
    grand products) — the interesting case for the search."""
    n_bits = 6
    n = 1 << n_bits
    src = gadgets.all_source(n_bits)
    ss = gadgets.stark_struct(n_bits, n_bits + 2, n_queries=4)

    pil_h, const_h = _setup(src, "all", n, ss)
    s_heur = stark_setup.stark_setup(
        const_h.buffer, pil_h, ss, options={"skipConstTree": True}
    )
    pil_o, const_o = _setup(src, "all", n, ss)
    s_opt = stark_setup.stark_setup(
        const_o.buffer, pil_o, ss,
        options={"optImPols": True, "skipConstTree": True},
    )
    assert _added_cols(s_opt["starkInfo"]) <= _added_cols(s_heur["starkInfo"])
