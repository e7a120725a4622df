"""Poseidon over BN254 — the recursion-tier hash (circomlib parameters).

Host-side python-int implementation (the BN128 tier operates on small
domains — SURVEY.md §7 phase 6).  Parameters: x^5 S-box, 8 full rounds,
per-t partial rounds (t = nInputs+1 ≤ 17); constants from
poseidon_bn128_constants.json: Grain-LFSR round constants validated against
the tables embedded in the reference repo (circuits.bn128/custom/
poseidon_constants_original.circom, t ∈ {3,5,7,9,17}; independently
confirmed by the canonical circomlib digest poseidon([1,2])).  The
merkleTreeCustom flag changes only sponge padding, not constants.

Semantics mirror circomlibjs buildPoseidon as used by
/root/reference/src/helpers/hash/merklehash/merklehash_bn128_p.js and
transcript.bn128.js: poseidon(inputs, initState, nOut).
"""
from __future__ import annotations

import functools
import json
import os

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
N_ROUNDS_F = 8
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]

_DATA = os.path.join(os.path.dirname(__file__), "poseidon_bn128_constants.json")


@functools.lru_cache(maxsize=None)
def _constants(t: int):
    with open(_DATA) as f:
        data = json.load(f)
    entry = data[str(t)]
    c = [int(v) for v in entry["C"]]
    m = [[int(v) for v in row] for row in entry["M"]]
    return c, m, N_ROUNDS_P[t - 2]


def _pow5(a: int) -> int:
    a2 = a * a % P
    a4 = a2 * a2 % P
    return a4 * a % P


def poseidon(inputs, init_state: int = 0, n_out: int = 1, custom: bool = False):
    """poseidon(inputs[t-1], capacity) -> state[0] (or first n_out)."""
    t = len(inputs) + 1
    if not 2 <= t <= 17:
        raise ValueError(f"Invalid poseidon width t={t}")
    c, m, rp = _constants(t)
    state = [int(init_state) % P] + [int(x) % P for x in inputs]
    half = N_ROUNDS_F // 2
    for r in range(N_ROUNDS_F + rp):
        state = [(s + c[r * t + i]) % P for i, s in enumerate(state)]
        if r < half or r >= half + rp:
            state = [_pow5(s) for s in state]
        else:
            state[0] = _pow5(state[0])
        state = [
            sum(m[i][j] * state[j] for j in range(t)) % P for i in range(t)
        ]
    if n_out == 1:
        return state[0]
    return state[:n_out]
