"""E2E STARK over the argument gadgets: plookup, permutation, connection,
and the combined machine — mirroring test/stark/stark_{plookup,permutation,
connection,all}.test.js (debug constraint check + prove + verify)."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.models import gadgets, fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier

# the plookup fixture's 16×16 table grid needs N = 256 rows (reference uses
# N=2^10 for sm_all; 2^8 is the smallest the data pattern supports)
N_BITS = 8
N = 1 << N_BITS


def _build(kind):
    if kind == "plookup":
        # plookup table grid needs N >= 256 in the reference shape; shrink
        # the grid for small N is handled in the builder via min()
        src = gadgets.plookup_source(N_BITS)
    elif kind == "permutation":
        src = gadgets.permutation_source(N_BITS)
    elif kind == "connection":
        src = gadgets.connection_source(N_BITS)
    elif kind == "all":
        src = gadgets.all_source(N_BITS)
    pil = pil1_parser.compile_pil_source(src)
    pil["name"] = kind

    const_cols = witness.generate_fixed_cols(pil["references"], N)
    cm_cols = witness.generate_wtns_cols(pil["references"], N)
    gadgets.build_global_constants(N, const_cols.Global)
    publics = []
    if kind in ("plookup", "all"):
        gadgets.build_plookup_constants(N, const_cols.Plookup)
        gadgets.execute_plookup(N, cm_cols.Plookup)
    if kind in ("permutation", "all"):
        gadgets.execute_permutation(N, cm_cols.Permutation)
    if kind in ("connection", "all"):
        gadgets.build_connection_constants(N, const_cols.Connection)
        gadgets.execute_connection(N, cm_cols.Connection)
    if kind == "all":
        fibonacci.build_constants(N, const_cols.Fibonacci)
        out = fibonacci.execute(N, cm_cols.Fibonacci, [1, 2])
        publics = [1, 2, out]
    return pil, const_cols, cm_cols, publics


@pytest.mark.parametrize("kind", ["plookup", "permutation", "connection", "all"])
def test_gadget_e2e(kind):
    pil, const_cols, cm_cols, publics = _build(kind)

    info = pilinfo.pil_info(pil, True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        const_cols.buffer,
        None,
        (cm_cols.buffer, publics),
        debug=True,
    )
    assert errors == [], errors[:3]

    ss = gadgets.stark_struct(N_BITS, N_BITS + 2, n_queries=8)
    s = stark_setup.stark_setup(const_cols.buffer, pil, ss)
    res = prover.prove(
        s["starkInfo"],
        s["expressionsInfo"],
        const_cols.buffer,
        s["constTree"],
        (cm_cols.buffer, publics),
    )
    assert verifier.verify(
        res["proof"],
        res["publics"],
        s["constRoot"],
        s["starkInfo"],
        s["verifierInfo"],
    )
