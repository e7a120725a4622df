"""Second fibv air (Fibonacci subproof): rowOffset zigzag decoding (+2/-1)
and faithful hint/constraint evaluation.

Note: the fixture's Fibonacci gsum hint declares numerator=5 while its gsum
constraint ends in `+ 1 === 0`; under the reference's own calculateS
semantics (gsum[i] += num/den, polutils.js:147-164) the constraint residual
is numerator+1 = 6 at every row — the dev fixture is internally
inconsistent.  We assert our engine reproduces exactly that residual, which
pins hint resolution + constraint evaluation against the reference
semantics (the Module air in test_pil2.py covers the consistent case)."""
import json

import numpy as np

from pil2_stark_tpu.compiler import pil2_frontend as pf
from pil2_stark_tpu.compiler.pilinfo import pil_info
from pil2_stark_tpu.stark import prover
from pil2_stark_tpu.field import gl64

PILOUT = "/root/reference/test/state_machines/pil2/sm_fibv/data/fibv.pilout"


def _collect_row_offsets(pil):
    offs = set()

    def walk(e):
        if not isinstance(e, dict):
            return
        for k, v in e.items():
            if k in ("fixedCol", "witnessCol") and isinstance(v, dict) and "rowOffset" in v:
                offs.add((k, v["rowOffset"]))
            elif isinstance(v, dict):
                walk(v)

    for e in pil["expressions"]:
        walk(e)
    return offs


def test_fibonacci_air_rowoffset_decoding():
    pilout = pf.load_pilout(PILOUT)
    pil = pf.select_air(pilout, 1, 1)
    offs = _collect_row_offsets(pil)
    # L1'2 (zigzag 4 -> +2) and 'gsum (zigzag 1 -> -1) from fibonacci.pil
    assert ("fixedCol", 2) in offs
    assert ("witnessCol", -1) in offs
    assert ("witnessCol", 1) in offs


def test_fibonacci_air_reproduces_fixture_inconsistency():
    pilout = pf.load_pilout(PILOUT)
    pil = pf.select_air(pilout, 1, 1)
    n = pil["numRows"]
    info = pil_info(pil, True, {}, {"debug": True}, pil2=True)

    in1, in2 = 1, 2
    a = np.zeros(n, dtype=np.uint64)
    b = np.zeros(n, dtype=np.uint64)
    b[0] = in1
    a[0] = in2
    for i in range(1, n):
        b[i] = a[i - 1]
        a[i] = gl64.add(gl64.mul(a[i - 1], a[i - 1]), gl64.mul(b[i - 1], b[i - 1]))
    cm1 = np.stack([a, b], axis=1)
    publics = [101, in1, in2, int(a[n - 1])]

    errors = prover.prove(
        info["pilInfo"],
        info["expressionsInfo"],
        pf.fixed_cols_array(pil),
        None,
        (cm1, publics),
        debug=True,
    )
    # every row of the gsum constraint evaluates to numerator+1 = 6 and all
    # other constraints hold
    gsum_errors = [e for e in errors if "fibonacci.pil:34" in e]
    other_errors = [e for e in errors if "fibonacci.pil:34" not in e]
    assert other_errors == [], other_errors[:3]
    assert gsum_errors and all("val=[6 0 0]" in e for e in gsum_errors)
