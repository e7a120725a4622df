"""C18 compressor E2E: the 18-column recursion tier.

Same chain as tests/test_compressor12.py (fibonacci STARK proof → emitted
verifier circuit → circom front-end → compressor setup → exec → debug
constraint check → recursive STARK), with the denser C18 layout
(compressor18_setup.js / compressor18.pil.ejs): 3 plonk subsets per row,
2 CMuls per row, 6-row Poseidon, single-row TreeSelector4.
"""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import (
    pil1_parser, pil2circom as p2c, circom_front as cf, compressor12,
    compressor18, pilinfo,
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
    setup18 = compressor18.setup(cc)
    cm = compressor18.exec_witness(
        cc.witness, setup18["plonkAdditions"], setup18["sMap"], setup18["nBits"]
    )
    c18_publics = [int(x) for x in cc.witness[1 : 1 + setup18["nPublics"]]]
    return cc, setup18, cm, c18_publics


def test_c18_denser_than_c12(chain):
    cc, setup18, cm, _ = chain
    assert cm.shape[1] == 18
    setup12 = compressor12.setup(cc)
    # the denser layout must not use more rows than C12
    assert setup18["nUsed"] <= setup12["nUsed"]


def test_c18_constraints_hold(chain):
    cc, setup18, cm, c18_publics = chain
    info = pilinfo.pil_info(setup18["pil"], True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], setup18["constBuffer"], None,
        (cm, c18_publics), debug=True,
    )
    assert errors == [], errors[:3]


def test_c18_rejects_corrupted_witness(chain):
    cc, setup18, cm, c18_publics = chain
    bad = cm.copy()
    row = int(np.argmax(setup18["sMap"][3][setup18["nPublics"] // 12 + 1 :])) + 1
    bad[row, 3] = (int(bad[row, 3]) + 1) % (2**64 - 2**32 + 1)
    info = pilinfo.pil_info(setup18["pil"], True, {}, {"debug": True})
    errors = prover.prove(
        info["pilInfo"], info["expressionsInfo"], setup18["constBuffer"], None,
        (bad, c18_publics), debug=True,
    )
    assert errors != []


def test_c18_exec_file_roundtrip(chain, tmp_path):
    cc, setup18, cm, c18_publics = chain
    path = str(tmp_path / "c18.exec")
    compressor12.write_exec_file(path, setup18["plonkAdditions"], setup18["sMap"])
    adds, smap = compressor12.read_exec_file(path, n_cols=18)
    assert adds == [list(map(int, a)) for a in setup18["plonkAdditions"]]
    for j in range(18):
        assert np.array_equal(smap[j], setup18["sMap"][j])
    cm2 = compressor18.exec_witness(cc.witness, adds, smap, setup18["nBits"])
    assert np.array_equal(cm, cm2)


@pytest.mark.slow
def test_c18_recursive_stark(chain):
    cc, setup18, cm, c18_publics = chain
    ss18 = {
        "nBits": setup18["nBits"], "nBitsExt": setup18["nBits"] + 1,
        "nQueries": 8, "verificationHashType": "GL",
        "steps": [{"nBits": setup18["nBits"] + 1}, {"nBits": 9}, {"nBits": 4}],
    }
    s18 = stark_setup.stark_setup(setup18["constBuffer"], setup18["pil"], ss18)
    res18 = prover.prove(
        s18["starkInfo"], s18["expressionsInfo"], setup18["constBuffer"],
        s18["constTree"], (cm, c18_publics), backend="numpy",
    )
    assert verifier.verify(
        res18["proof"], res18["publics"], s18["constRoot"], s18["starkInfo"],
        s18["verifierInfo"],
    )
