"""Device TAC executor vs host path: the jax backend must produce a
bit-identical proof (same Q, FRI polynomial, roots, queries)."""
import json

import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier


def test_jax_backend_proof_bit_identical():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]

    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res_np = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    res_jax = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="jax",
    )

    def canon(o):
        if isinstance(o, np.ndarray):
            return [canon(x) for x in o.tolist()]
        if isinstance(o, (list, tuple)):
            return [canon(x) for x in o]
        if isinstance(o, dict):
            return {k: canon(v) for k, v in o.items()}
        if isinstance(o, (int, np.integer)):
            return int(o)
        return o

    assert canon(res_np["proof"]) == canon(res_jax["proof"])
    assert verifier.verify(
        res_jax["proof"], res_jax["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )
