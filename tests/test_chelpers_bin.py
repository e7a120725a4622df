"""`.chelpers.bin` artifact (compiler/chelpers_bin.py): the reference's
binary TAC streams (binFile.js byte layout, getParserArgs flattening with
getIdMaps register allocation) — write, read back, and check stream/
register-allocation invariants on two machines."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import chelpers_bin as cb
from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.models import fibonacci, gadgets


@pytest.fixture(scope="module", params=["fib", "all"])
def machine(request):
    if request.param == "fib":
        src, ss = fibonacci.pil_source(6), fibonacci.STARK_STRUCT
    else:
        src = gadgets.all_source(8)
        ss = {"nBits": 8, "nBitsExt": 9, "nQueries": 8,
              "verificationHashType": "GL",
              "steps": [{"nBits": 9}, {"nBits": 4}]}
    pil = pil1_parser.compile_pil_source(src)
    pil["name"] = request.param
    return pilinfo.pil_info(pil, True, ss)


def test_roundtrip(machine, tmp_path):
    path = str(tmp_path / "m.chelpers.bin")
    built = cb.write_chelpers_file(
        path, machine["pilInfo"], machine["expressionsInfo"]
    )
    back = cb.read_chelpers_file(path)
    assert len(back["imPolsInfo"]) == machine["pilInfo"]["nStages"]
    assert len(back["expsInfo"]) == len(built["expsInfo"])
    assert len(back["constraintsInfo"]) == len(
        machine["expressionsInfo"]["constraints"]
    )
    for a, b in zip(
        built["imPolsInfo"] + built["expsInfo"] + built["constraintsInfo"],
        back["imPolsInfo"] + back["expsInfo"] + back["constraintsInfo"],
    ):
        for k in ("ops", "args", "numbers", "constPolsIds", "cmPolsIds",
                  "challengeIds", "publicsIds", "subproofValuesIds"):
            assert [int(v) for v in a[k]] == [int(v) for v in b[k]], k


def test_ops_index_the_used_subset(machine, tmp_path):
    """ops bytes index the sorted used-op subset (the generated C++
    parser's switch order, stark_chelpers.js:136-150)."""
    path = str(tmp_path / "m.chelpers.bin")
    built = cb.write_chelpers_file(
        path, machine["pilInfo"], machine["expressionsInfo"]
    )
    n_used = len(built["opsUsed"])
    table = cb.get_all_operations()
    assert built["opsUsed"] == sorted(built["opsUsed"])
    assert all(0 <= o < len(table) for o in built["opsUsed"])
    for info in built["imPolsInfo"] + built["expsInfo"] + built["constraintsInfo"]:
        assert all(0 <= o < n_used for o in info["ops"])


def test_register_allocation_is_consistent():
    """getIdMaps live-range packing: registers never host two live tmps."""
    code = [
        {"op": "add", "dest": {"type": "tmp", "id": 0, "dim": 1},
         "src": [{"type": "public", "id": 0, "dim": 1},
                 {"type": "public", "id": 1, "dim": 1}]},
        {"op": "mul", "dest": {"type": "tmp", "id": 1, "dim": 1},
         "src": [{"type": "tmp", "id": 0, "dim": 1},
                 {"type": "tmp", "id": 0, "dim": 1}]},
        # tmp0 dead after row 1 -> tmp2 may reuse its register
        {"op": "mul", "dest": {"type": "tmp", "id": 2, "dim": 1},
         "src": [{"type": "tmp", "id": 1, "dim": 1},
                 {"type": "tmp", "id": 1, "dim": 1}]},
    ]
    id1d, id3d, n1, n3 = cb.get_id_maps(code)
    assert n3 == 0
    # reference semantics (helpers.js isIntersecting): segments touching
    # at an endpoint may share a register (srcs are read before the dest
    # is written) — the whole def-use chain packs into ONE register here
    assert n1 == 1
    assert id1d[0] == id1d[1] == id1d[2] == 0


def test_cli_buildchelpers(tmp_path):
    import subprocess, sys, os

    import json

    out = str(tmp_path / "fib.chelpers.bin")
    ss_path = str(tmp_path / "ss.json")
    json.dump(fibonacci.STARK_STRUCT, open(ss_path, "w"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pil2_stark_tpu", "buildchelpers",
         "--model", "fibonacci", "--nbits", "6", "--starkstruct", ss_path,
         "--chelpers", out],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert "ops used" in r.stdout
    back = cb.read_chelpers_file(out)
    assert back["expsInfo"]
