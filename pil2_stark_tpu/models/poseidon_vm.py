"""Poseidon verification machine — hash evaluation enforced by constraints.

The essence of the reference's C12/C18 custom-gate compressor machines
(/root/reference/src/compressor/compressor12.pil.ejs POSEIDONM/POSEIDONP/
PARTIALROUND gates): a trace whose rows hold successive Poseidon round
states, with fixed selector + constant columns making each row transition a
constraint.  A STARK over this machine proves knowledge of preimages /
correct hash evaluation — the building block for verifying Merkle paths
inside a proof (recursion).

Layout (32 rows per permutation, padded from the 30 rounds + output row):
  witness  s0..s11                 round-entry states
  fixed    C0..C11                 post-S-box add constants per row
           SC0..SC22               sparse partial-round row of the S table
           SELM, SELP, SELPART     round-type selectors
  row r -> r+1 transitions:
    SELM:    s'_j = Σ_k M[k][j]·(pow7(s_k) + C_k)     (full round, M mix)
    SELP:    same with the P matrix                    (the pre-partial mix)
    SELPART: x0 = pow7(s_0) + C_0
             s'_0 = Σ_j SC_j·(j==0 ? x0 : s_j)
             s'_k = s_k + x0·SC_{11+k}   (k ≥ 1)

Degree: pow7 (7) × selector (1) = 8 ≤ maxDeg 9 at blowup 8.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon_gl as pg

ROWS_PER_PERM = 32

PIL_SOURCE_HEADER = """
constant %N = 2**{n_bits};

namespace Global(%N);
    pol constant L1;

namespace PoseidonVM(%N);
    pol constant {fixed_decl};
    pol commit {witness_decl};
"""


def _pow7_expr(s):
    return f"({s}*{s}*{s}*{s}*{s}*{s}*{s})"


def pil_source(n_bits: int) -> str:
    fixed = [f"C{i}" for i in range(12)] + [f"SC{i}" for i in range(23)] + [
        "SELM",
        "SELP",
        "SELPART",
    ]
    witness = [f"s{i}" for i in range(12)]
    src = PIL_SOURCE_HEADER.format(
        n_bits=n_bits,
        fixed_decl=", ".join(fixed),
        witness_decl=", ".join(witness),
    )
    lines = []
    # t_k = pow7(s_k) + C_k  (shared sub-expressions as im pols)
    for k in range(12):
        lines.append(f"    pol t{k} = {_pow7_expr(f's{k}')} + C{k};")
    for mat, sel in ((pg.M, "SELM"), (pg.P, "SELP")):
        for j in range(12):
            terms = " + ".join(f"{int(mat[k][j])}*t{k}" for k in range(12))
            lines.append(f"    {sel}*(s{j}' - ({terms})) = 0;")
    # partial round
    lines.append(f"    pol x0 = {_pow7_expr('s0')} + C0;")
    new0 = " + ".join(
        ["SC0*x0"] + [f"SC{j}*s{j}" for j in range(1, 12)]
    )
    lines.append(f"    SELPART*(s0' - ({new0})) = 0;")
    for k in range(1, 12):
        lines.append(f"    SELPART*(s{k}' - s{k} - x0*SC{11 + k}) = 0;")
    return src + "\n".join(lines) + "\n"


def _round_schedule():
    """Per-row (type, C_row[12], S_row[23]) for one permutation's 32 rows."""
    C, S = pg.C, pg.S
    half = pg.N_ROUNDS_F // 2
    rows = []
    for r in range(half - 1):  # 3 full M rounds, C rows 1..3
        rows.append(("M", C[(r + 1) * 12 : (r + 2) * 12], None))
    rows.append(("P", C[half * 12 : (half + 1) * 12], None))
    for r in range(pg.N_ROUNDS_P):
        c_row = np.zeros(12, dtype=np.uint64)
        c_row[0] = C[(half + 1) * 12 + r]
        rows.append(("PART", c_row, S[23 * r : 23 * (r + 1)]))
    base = (half + 1) * 12 + pg.N_ROUNDS_P
    for r in range(half - 1):
        rows.append(("M", C[base + r * 12 : base + (r + 1) * 12], None))
    rows.append(("M", np.zeros(12, dtype=np.uint64), None))  # final, C=0
    assert len(rows) == 30
    return rows


def build_constants(n: int, pols) -> None:
    pols_c = [getattr(pols, f"C{i}") for i in range(12)]
    pols_sc = [getattr(pols, f"SC{i}") for i in range(23)]
    schedule = _round_schedule()
    for blk in range(n // ROWS_PER_PERM):
        base = blk * ROWS_PER_PERM
        for r, (kind, c_row, s_row) in enumerate(schedule):
            row = base + r
            for i in range(12):
                pols_c[i][row] = c_row[i]
            if s_row is not None:
                for i in range(23):
                    pols_sc[i][row] = s_row[i]
            pols.SELM[row] = 1 if kind == "M" else 0
            pols.SELP[row] = 1 if kind == "P" else 0
            pols.SELPART[row] = 1 if kind == "PART" else 0


def build_globals(n: int, pols) -> None:
    pols.L1[:] = 0
    pols.L1[0] = 1


def execute(n: int, pols, inputs: np.ndarray) -> np.ndarray:
    """inputs: (K, 12) initial states (K = n // 32 permutations).  Fills the
    witness trace and returns the (K, 12) final states (must equal the
    oracle permutation of inputs + initial C addition handled here)."""
    k = n // ROWS_PER_PERM
    inputs = np.asarray(inputs, dtype=np.uint64).reshape(k, 12)
    s_cols = [getattr(pols, f"s{i}") for i in range(12)]
    outs = np.zeros((k, 12), dtype=np.uint64)
    schedule = _round_schedule()
    for blk in range(k):
        base = blk * ROWS_PER_PERM
        # row 0 state: input + initial C (permute()'s pre-round addition)
        state = gl64.add(inputs[blk], pg.C[0:12])
        for r, (kind, c_row, s_row) in enumerate(schedule):
            for i in range(12):
                s_cols[i][base + r] = state[i]
            state = _apply_round(state, kind, c_row, s_row)
        # rows 30, 31: final state (and copy for padding; unconstrained)
        for i in range(12):
            s_cols[i][base + 30] = state[i]
            s_cols[i][base + 31] = state[i]
        outs[blk] = state
    return outs


def _apply_round(state, kind, c_row, s_row):
    t = gl64.add(pg._pow7(state), np.asarray(c_row, dtype=np.uint64))
    if kind in ("M", "P"):
        mat = pg.M if kind == "M" else pg.P
        out = np.zeros(12, dtype=np.uint64)
        for j in range(12):
            acc = np.uint64(0)
            for kk in range(12):
                acc = gl64.add(acc, gl64.mul(t[kk], np.uint64(int(mat[kk][j]))))
            out[j] = acc
        return out
    # partial: x0 = pow7(s0) + c0; new0 = Σ srow·[x0, s1..]; sk += x0·srow
    x0 = t[0]
    new0 = gl64.mul(x0, np.uint64(int(s_row[0])))
    for j in range(1, 12):
        new0 = gl64.add(new0, gl64.mul(state[j], np.uint64(int(s_row[j]))))
    out = state.copy()
    for kk in range(1, 12):
        out[kk] = gl64.add(out[kk], gl64.mul(x0, np.uint64(int(s_row[11 + kk]))))
    out[0] = new0
    return out
