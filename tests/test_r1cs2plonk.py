"""r1cs2plonk: plonk gates must reproduce the R1CS relation on a witness."""
import numpy as np

from pil2_stark_tpu.compiler.r1cs2plonk import r1cs2plonk

P = 0xFFFFFFFF00000001


def _eval_lc(lc, w):
    return sum(v * w[s] for s, v in lc.items()) % P


def _check_plonk(constraints, additions, w, n_vars):
    w = list(w) + [0] * (n_vars - len(w))
    for sl, sr, kl, kr in additions:
        # helper wire value (appended in order)
        so_val = (kl * w[sl] + kr * w[sr]) % P
        w[_next_unset(w)] = so_val
    for sl, sr, so, qm, ql, qr, qo, qc in constraints:
        v = (
            qm * w[sl] * w[sr] + ql * w[sl] + qr * w[sr] + qo * w[so] + qc
        ) % P
        assert v == 0, (sl, sr, so)
    return True


def _next_unset(w):
    # helper wires are appended past the original witness in creation order
    # — track via a sentinel None
    for i, v in enumerate(w):
        if v is None:
            return i
    raise AssertionError


def test_r1cs2plonk_satisfied():
    # witness: w = [1 (one), x, y, z, xy] with constraints:
    #   x*y = xy;  (x + 2y + 3) * z = xy + 5x
    x, y = 3, 7
    xy = x * y % P
    # choose z so the second constraint actually holds
    z = (xy + 5 * x) * pow(x + 2 * y + 3, P - 2, P) % P
    witness = [1, x, y, z, xy]
    constraints = [
        ({1: 1}, {2: 1}, {4: 1}),
        ({1: 1, 2: 2, 0: 3}, {3: 1}, {4: 1, 1: 5}),
    ]
    pc, pa, n_vars = r1cs2plonk(P, constraints, len(witness))
    w = witness + [None] * (n_vars - len(witness))
    assert _check_plonk(pc, pa, w, n_vars)


def test_r1cs2plonk_long_lc_additions():
    # a 7-term linear constraint forces addition-chain helper gates
    witness = [1] + [i + 2 for i in range(7)]
    total = sum((i + 1) * witness[i + 1] for i in range(7)) % P
    witness.append(total)
    lc = {i + 1: i + 1 for i in range(7)}
    lc[8] = P - 1
    constraints = [({}, {}, lc)]  # 0*0 = lc -> sum gate
    pc, pa, n_vars = r1cs2plonk(P, constraints, len(witness))
    assert len(pa) >= 2
    w = witness + [None] * (n_vars - len(witness))
    assert _check_plonk(pc, pa, w, n_vars)
