"""Device-resident prover (backend="device") vs host path: proofs must be
bit-identical — every extended-domain buffer, tree, eval, FRI fold lives on
device, but the protocol math (stark_gen_helpers.js / fri.js semantics)
cannot change by a single bit."""
import numpy as np

from pil2_stark_tpu.compiler import pil1_parser
from pil2_stark_tpu.models import fibonacci, gadgets
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier


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


def _fib_setup():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    return s, const_cols, cm_cols, publics


def test_device_backend_proof_bit_identical():
    s, const_cols, cm_cols, publics = _fib_setup()
    res_np = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    res_dev = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="device",
    )
    assert canon(res_np["proof"]) == canon(res_dev["proof"])
    assert res_np["challenges"] == res_dev["challenges"]
    assert verifier.verify(
        res_dev["proof"], res_dev["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )


def test_device_backend_all_gadgets_machine():
    """The 'all' machine exercises plookup/permutation/connection hints,
    multi-stage commits and everyFrame boundaries on the device path."""
    n_bits = 8
    n = 1 << n_bits
    pil = pil1_parser.compile_pil_source(gadgets.all_source(n_bits))
    pil["name"] = "all"
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    gadgets.build_global_constants(n, const_cols.Global)
    gadgets.build_plookup_constants(n, const_cols.Plookup)
    gadgets.execute_plookup(n, cm_cols.Plookup)
    gadgets.execute_permutation(n, cm_cols.Permutation)
    gadgets.build_connection_constants(n, const_cols.Connection)
    gadgets.execute_connection(n, cm_cols.Connection)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]

    ss = gadgets.stark_struct(n_bits, n_bits + 2, n_queries=8)
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res_np = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    res_dev = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="device",
    )
    assert canon(res_np["proof"]) == canon(res_dev["proof"])
    assert verifier.verify(
        res_dev["proof"], res_dev["publics"], s["constRoot"], s["starkInfo"],
        s["verifierInfo"],
    )


def test_device_backend_split_linear_hash():
    s, const_cols, cm_cols, publics = _fib_setup()
    import copy

    ss = copy.deepcopy(fibonacci.STARK_STRUCT)
    ss["splitLinearHash"] = True
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    s2 = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res_np = prover.prove(
        s2["starkInfo"], s2["expressionsInfo"], const_cols.buffer, s2["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    res_dev = prover.prove(
        s2["starkInfo"], s2["expressionsInfo"], const_cols.buffer, s2["constTree"],
        (cm_cols.buffer, publics), backend="device",
    )
    assert canon(res_np["proof"]) == canon(res_dev["proof"])
