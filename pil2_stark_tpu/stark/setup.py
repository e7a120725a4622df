"""STARK setup: compile the constraint system, extend + Merkelize the fixed
columns.

Mirrors /root/reference/src/stark/stark_setup.js:10-57 with the chelpers
C++-codegen step replaced by our vectorized/JAX TAC executor (no codegen
artifact needed — the TAC programs are executed directly).
"""
from __future__ import annotations

import numpy as np

from ..compiler.pilinfo import pil_info as compile_pil_info
from ..ops import ntt as ntt_ops


def stark_setup(const_pols: np.ndarray, pil: dict, stark_struct: dict, options=None):
    """const_pols: (N, nConstants) u64.  Returns dict with starkInfo,
    expressionsInfo, verifierInfo, constTree, constRoot."""
    options = options or {}
    info = compile_pil_info(pil, stark=True, stark_struct=stark_struct, options=options)
    stark_info = info["pilInfo"]

    res = {
        "fixedPols": const_pols,
        "starkInfo": stark_info,
        "expressionsInfo": info["expressionsInfo"],
        "verifierInfo": info["verifierInfo"],
    }

    if not options.get("skipConstTree"):
        n_constants = len(stark_info["constPolsMap"])
        n_bits = stark_struct["nBits"]
        n_bits_ext = stark_struct["nBitsExt"]
        ext_n = 1 << n_bits_ext
        const_ext = ntt_ops.lde_u64(
            np.asarray(const_pols, dtype=np.uint64).reshape(1 << n_bits, n_constants),
            n_bits,
            n_bits_ext,
        )
        from ..hash.mh import build_mh

        mh = build_mh(stark_struct)
        tree = mh.merkelize(const_ext, n_constants, ext_n)
        res["constTree"] = tree
        res["constRoot"] = mh.root(tree)

    return res
