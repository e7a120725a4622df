"""C12 compressor E2E: the full recursion chain, entirely in-repo.

fibonacci STARK proof
  → pil2circom-emitted verifier circuit
  → circom front-end (R1CS + custom gates + witness)
  → compressor12 setup (sMap / selectors / connection S pols)
  → exec (witness scatter)
  → debug constraint check + recursive STARK prove/verify.

Mirrors the reference's C12 npm chain (package.json fibonacci_C12_*,
SURVEY.md §3.4) with our circom_front replacing the external circom
compiler + circom_runtime WASM witness calculator.
"""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import (
    pil1_parser, pil2circom as p2c, circom_front as cf, compressor12, pilinfo,
)
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
from pil2_stark_tpu.utils import proof2zkin as p2z


@pytest.fixture(scope="module")
def chain():
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    publics = [1, 2, out]
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, publics), backend="numpy",
    )
    files = p2c.emit_circuit_files(s["constRoot"], s["starkInfo"], s["verifierInfo"])
    zkin = p2z.proof2zkin(res["proof"], s["starkInfo"])
    zkin["publics"] = [int(p) for p in publics]
    cc = cf.compile_and_witness(files, "verifier.circom", zkin)
    assert cc.check()
    setup12 = compressor12.setup(cc)
    cm = compressor12.exec_witness(
        cc.witness, setup12["plonkAdditions"], setup12["sMap"], setup12["nBits"]
    )
    c12_publics = [int(x) for x in cc.witness[1 : 1 + setup12["nPublics"]]]
    return cc, setup12, cm, c12_publics


def test_c12_constraints_hold(chain):
    cc, setup12, cm, c12_publics = chain
    info = pilinfo.pil_info(setup12["pil"], True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], setup12["constBuffer"], None,
        (cm, c12_publics), debug=True,
    )
    assert errors == [], errors[:3]


def test_c12_rejects_corrupted_witness(chain):
    cc, setup12, cm, c12_publics = chain
    bad = cm.copy()
    # find a row used by a custom gate and corrupt one wire
    row = int(np.argmax(setup12["sMap"][3][setup12["nPublics"] // 12 + 1 :])) + 1
    bad[row, 3] = (int(bad[row, 3]) + 1) % (2**64 - 2**32 + 1)
    info = pilinfo.pil_info(setup12["pil"], True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], setup12["constBuffer"], None,
        (bad, c12_publics), debug=True,
    )
    assert errors != []


def test_c12_exec_file_roundtrip(chain, tmp_path):
    cc, setup12, cm, c12_publics = chain
    path = str(tmp_path / "c12.exec")
    compressor12.write_exec_file(path, setup12["plonkAdditions"], setup12["sMap"])
    adds, smap = compressor12.read_exec_file(path)
    assert adds == [list(map(int, a)) for a in setup12["plonkAdditions"]]
    for j in range(12):
        assert np.array_equal(smap[j], setup12["sMap"][j])
    cm2 = compressor12.exec_witness(cc.witness, adds, smap, setup12["nBits"])
    assert np.array_equal(cm, cm2)


@pytest.mark.slow
def test_c12_recursive_stark(chain):
    """The recursive proof itself (slow: 2^13 machine, ~90 columns)."""
    cc, setup12, cm, c12_publics = chain
    ss12 = {
        "nBits": setup12["nBits"], "nBitsExt": setup12["nBits"] + 1,
        "nQueries": 8, "verificationHashType": "GL",
        "steps": [{"nBits": setup12["nBits"] + 1}, {"nBits": 9}, {"nBits": 4}],
    }
    s12 = stark_setup.stark_setup(setup12["constBuffer"], setup12["pil"], ss12)
    res12 = prover.prove(
        s12["starkInfo"], s12["expressionsInfo"], setup12["constBuffer"],
        s12["constTree"], (cm, c12_publics), backend="numpy",
    )
    assert verifier.verify(
        res12["proof"], res12["publics"], s12["constRoot"], s12["starkInfo"],
        s12["verifierInfo"],
    )
