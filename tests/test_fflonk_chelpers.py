"""Fflonk chelpers twin: flatten/round-trip/execute parity.

Reference: fflonk_chelpers.js + compileCode_parser.js flatten each fflonk
TAC section into ops[]/args[] integer streams for a generated C++
interpreter.  Here the twin is fflonk/chelpers.py — these tests pin (a)
byte-level file round-trip, (b) stream execution bit-equal to the dict
executor on real stage codes, (c) an identical proof end-to-end through
the prover's chelpers path.
"""
import json
import random

import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.fflonk import chelpers
from pil2_stark_tpu.fflonk.prover import fflonk_prove
from pil2_stark_tpu.fflonk.shkey import fflonk_setup
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.ops.fft_bn128 import FR
from pil2_stark_tpu.protocol.shplonk import dev_ptau

N_BITS = 4
N = 1 << N_BITS


@pytest.fixture(scope="module")
def fib_setup():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(N_BITS))
    pil["name"] = "Fibonacci"
    info = pilinfo.pil_info(pil, stark=False)
    fflonk_info = info["pilInfo"]

    const_names = [p["name"] for p in fflonk_info["constPolsMap"]]
    const_pols = [[0] * len(const_names) for _ in range(N)]
    const_pols[0][const_names.index("Fibonacci.L1")] = 1
    const_pols[N - 1][const_names.index("Fibonacci.LLAST")] = 1

    cm_names = [p["name"] for p in fflonk_info["cmPolsMap"]
                if p["stage"] == 1]
    l1, l2 = [0] * N, [0] * N
    l2[0], l1[0] = 1, 2
    for i in range(1, N):
        l2[i] = l1[i - 1]
        l1[i] = (l1[i - 1] ** 2 + l2[i - 1] ** 2) % FR
    cm1 = np.empty((N, len(cm_names)), dtype=object)
    cm1[:, cm_names.index("Fibonacci.l1")] = l1
    cm1[:, cm_names.index("Fibonacci.l2")] = l2
    publics = [1, 2, l1[N - 1]]

    ptau = dev_ptau(4 * (N + 4) + 8 * N, tau=12345)
    zkey = fflonk_setup(const_pols, fflonk_info, ptau)
    return info, zkey, ptau, cm1, publics


def test_flatten_covers_all_sections(fib_setup):
    info = fib_setup[0]
    units = chelpers.build(info["expressionsInfo"])
    # every unit's ops/args stream lengths are mutually consistent
    for sec in ("imPols", "expressions", "constraints"):
        for u in units[sec]:
            expect = sum(3 * (1 + chelpers.N_SRC[chelpers.OPS[o]])
                         for o in u["ops"])
            assert len(u["args"]) == expect
    # the Q unit exists and is non-trivial
    q = next(u for u in units["expressions"]
             if u["expId"] == info["pilInfo"]["cExpId"])
    assert len(q["ops"]) > 0
    # source TAC instruction counts survive flattening
    for u, code in zip(units["imPols"], info["expressionsInfo"]["imPolsCode"]):
        assert len(u["ops"]) == len(code["code"])


def test_file_round_trip(fib_setup, tmp_path):
    info = fib_setup[0]
    path = str(tmp_path / "fib.fflonkchelpers.bin")
    written = chelpers.write_file(path, info["pilInfo"],
                                  info["expressionsInfo"])
    back = chelpers.read_file(path)
    assert back["pilPower"] == info["pilInfo"]["pilPower"]
    for sec in ("imPols", "expressions", "constraints"):
        assert len(back[sec]) == len(written[sec])
        for a, b in zip(back[sec], written[sec]):
            assert np.array_equal(a["ops"], b["ops"])
            assert np.array_equal(a["args"], b["args"])
            assert a["numbers"] == b["numbers"]
            assert a["tmpUsed"] == b["tmpUsed"]
    for a, b in zip(back["expressions"], written["expressions"]):
        assert a["expId"] == b["expId"]


def test_prove_identical_through_stream_interpreter(fib_setup):
    info, zkey, ptau, cm1, publics = fib_setup
    units = chelpers.build(info["expressionsInfo"])
    res_dict = fflonk_prove(zkey, ptau, info["pilInfo"],
                            info["expressionsInfo"], cm1, publics,
                            rng=random.Random(7))
    res_stream = fflonk_prove(zkey, ptau, info["pilInfo"],
                              info["expressionsInfo"], cm1, publics,
                              rng=random.Random(7), chelpers=units)
    a = json.dumps(res_dict["proof"], default=str, sort_keys=True)
    b = json.dumps(res_stream["proof"], default=str, sort_keys=True)
    assert a == b
    assert res_dict["publics"] == res_stream["publics"]


def test_cli_chelpers_emit(fib_setup, tmp_path):
    import subprocess
    import sys

    from pil2_stark_tpu.utils import serialization

    info = fib_setup[0]
    ffi = tmp_path / "fflonkinfo.json"
    exi = tmp_path / "expressionsinfo.json"
    out = tmp_path / "fib.fflonkchelpers.bin"
    serialization.dump_json(info["pilInfo"], str(ffi))
    serialization.dump_json(info["expressionsInfo"], str(exi))
    r = subprocess.run(
        [sys.executable, "-m", "pil2_stark_tpu", "fflonk-chelpers",
         "--fflonkinfo", str(ffi), "--expressionsinfo", str(exi),
         "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert out.exists()
    back = chelpers.read_file(str(out))
    assert back["pilPower"] == N_BITS
