"""CLI surface tests — the __main__ subcommands chained the way the
reference's npm pipelines chain its main_*.js entry points.

The compressor-setup/compressor-exec wrappers share _compressor_like_setup
with final-setup (tested here); their C12-specific internals are covered
at library level by tests/test_compressor12.py (the CLI duplication of
that slow chain is deliberately skipped).
"""
import json
import os

import numpy as np
import pytest

from pil2_stark_tpu.__main__ import main
from pil2_stark_tpu.ops.fft_bn128 import FR

SS4 = {
    "nBits": 4, "nBitsExt": 5, "nQueries": 4,
    "verificationHashType": "GL",
    "steps": [{"nBits": 5}, {"nBits": 2}],
}

MUL3 = """
pragma circom 2.1.0;

template Mul3() {
    signal input x;
    signal input y;
    signal output out;
    signal t1 <== x * y;
    signal t2 <== t1 * t1 + x + 5;
    out <== t2 * y;
}

component main {public [x]} = Mul3();
"""


def _w(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)
    return str(path)


def test_pipeline_commands(tmp_path):
    """genstarkinfo / preparepil / genpilcode / calculateimpols
    (main_genstarkinfo.js, main_preparepil.js, main_genpilcode.js,
    main_calculateimpols.js)."""
    ss = _w(tmp_path / "ss.json", SS4)
    base = ["--model", "fibonacci", "--nbits", "4", "--starkstruct", ss]
    si = str(tmp_path / "si.json")
    ei = str(tmp_path / "ei.json")
    vi = str(tmp_path / "vi.json")
    main(["genstarkinfo", *base, "--starkinfo", si,
          "--expressionsinfo", ei, "--verifierinfo", vi])
    with open(si) as f:
        stark_info = json.load(f)
    assert stark_info["starkStruct"]["nBits"] == 4

    prepared = str(tmp_path / "prepared.json")
    main(["preparepil", *base, "-o", prepared])
    with open(prepared) as f:
        p = json.load(f)
    assert p["nConstraints"] > 0 and p["nStages"] >= 1
    assert p["nCommitments"] == 2  # fibonacci l1, l2

    ei2, vi2 = str(tmp_path / "ei2.json"), str(tmp_path / "vi2.json")
    main(["genpilcode", *base, "--expressionsinfo", ei2,
          "--verifierinfo", vi2])
    with open(ei2) as f:
        a = json.load(f)
    with open(ei) as f:
        b = json.load(f)
    assert a == b  # split pipeline emits the same code artifacts

    rep = str(tmp_path / "impols.json")
    main(["calculateimpols", *base, "-o", rep])
    with open(rep) as f:
        r = json.load(f)
    assert r["optimal"]["addedCols"] <= r["heuristic"]["addedCols"]


@pytest.fixture(scope="module")
def fib_proof_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fibcli")
    main(["prove", "--model", "fibonacci", "--nbits", "6",
          "--backend", "numpy", "--tmp", str(tmp)])
    return tmp


def test_prove_verify_cli(fib_proof_dir):
    d = str(fib_proof_dir)
    with pytest.raises(SystemExit) as e:
        main(["verify", "--proof", f"{d}/proof.json",
              "--publics", f"{d}/publics.json",
              "--verkey", f"{d}/verkey.json",
              "--starkinfo", f"{d}/starkinfo.json",
              "--verifierinfo", f"{d}/verifierinfo.json"])
    assert e.value.code == 0


def test_pil2circom_cli(fib_proof_dir, tmp_path):
    d = str(fib_proof_dir)
    out = str(tmp_path / "circuit")
    main(["pil2circom", "--starkinfo", f"{d}/starkinfo.json",
          "--verifierinfo", f"{d}/verifierinfo.json",
          "--verkey", f"{d}/verkey.json", "-o", out])
    files = os.listdir(out)
    assert "verifier.circom" in files and "poseidon.circom" in files
    with open(os.path.join(out, "verifier.circom")) as f:
        text = f.read()
    assert "component main {public [publics]}" in text
    # the zkin written by prove is consumable circuit input (key check)
    with open(f"{d}/zkin.json") as f:
        zkin = json.load(f)
    assert "publics" in zkin and "root1" in zkin


def test_prove_file_based_cli(tmp_path):
    """prove --pil-json/--const/--commit: the recursion-chain entry
    (main_prover.js on compressor output)."""
    from pil2_stark_tpu.compiler import pil1_parser
    from pil2_stark_tpu.models import fibonacci
    from pil2_stark_tpu.stark import witness

    n_bits, n = 4, 16
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(n_bits))
    pil["name"] = "Fibonacci"
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])

    pil_json = _w(tmp_path / "pil.json", pil)
    ss = _w(tmp_path / "ss.json", SS4)
    const_npy = str(tmp_path / "const.npy")
    commit_npy = str(tmp_path / "commit.npy")
    np.save(const_npy, const_cols.buffer)
    np.save(commit_npy, cm_cols.buffer)
    publics = _w(tmp_path / "publics.json", [str(x) for x in (1, 2, out)])

    d = str(tmp_path / "out")
    main(["prove", "--pil-json", pil_json, "--const", const_npy,
          "--commit", commit_npy, "--publics", publics,
          "--starkstruct", ss, "--backend", "numpy", "--tmp", d])
    with pytest.raises(SystemExit) as e:
        main(["verify", "--proof", f"{d}/proof.json",
              "--publics", f"{d}/publics.json",
              "--verkey", f"{d}/verkey.json",
              "--starkinfo", f"{d}/starkinfo.json",
              "--verifierinfo", f"{d}/verifierinfo.json"])
    assert e.value.code == 0


def test_final_fflonk_cli_chain(tmp_path):
    """final-setup → final-exec → fflonkinfo → fflonk-setup →
    fflonk-prove → fflonk-verify → export* — the complete on-chain leg
    as files (final/main_final_*.js + fflonk/main_*.js)."""
    d = tmp_path
    with open(d / "m.circom", "w") as f:
        f.write(MUL3)
    _w(d / "inputs.json", {"x": 3, "y": 4})

    pfx = str(d / "ff")
    main(["final-setup", "--circom-dir", str(d), "--entry", "m.circom",
          "--inputs", str(d / "inputs.json"), "--cols", "0",
          "--ncommitted", "6", "--out-prefix", pfx])
    main(["final-exec", "--exec", pfx + ".exec", "--wtns",
          pfx + ".wtns.json", "--meta", pfx + ".meta.json",
          "--commit", pfx + ".commit.json", "--publics",
          pfx + ".publics.json"])

    fi, ei, vi = (str(d / x) for x in
                  ("fflonkinfo.json", "ei.json", "vi.json"))
    main(["fflonkinfo", "--pil-json", pfx + ".pil.json", "--field", "fr",
          "--fflonkinfo", fi, "--expressionsinfo", ei,
          "--verifierinfo", vi])
    zk, pt, vk = (str(d / x) for x in
                  ("zkey.json", "ptau.json", "vk.json"))
    main(["fflonk-setup", "--fflonkinfo", fi, "--const",
          pfx + ".const.json", "--tau", "777", "--zkey", zk,
          "--ptau", pt, "--verificationkey", vk])
    proof, pub = str(d / "proof.json"), str(d / "proof.publics.json")
    main(["fflonk-prove", "--zkey", zk, "--ptau", pt, "--fflonkinfo", fi,
          "--expressionsinfo", ei, "--commit", pfx + ".commit.json",
          "--publics", pfx + ".publics.json", "--seed", "7",
          "--proof", proof, "--out-publics", pub])

    with pytest.raises(SystemExit) as e:
        main(["fflonk-verify", "--verificationkey", vk, "--fflonkinfo",
              fi, "--verifierinfo", vi, "--proof", proof,
              "--publics", pub])
    assert e.value.code == 0

    # wrong public rejected with exit code 1
    with open(pub) as f:
        pubs = json.load(f)
    bad = _w(d / "bad.publics.json",
             [str((int(pubs[0]) + 1) % FR)] + pubs[1:])
    with pytest.raises(SystemExit) as e:
        main(["fflonk-verify", "--verificationkey", vk, "--fflonkinfo",
              fi, "--verifierinfo", vi, "--proof", proof,
              "--publics", bad])
    assert e.value.code == 1

    # exports: vk from zkey matches setup's; calldata + contract emitted
    vk2 = str(d / "vk2.json")
    main(["exportverificationkey", "--zkey", zk, "--fflonkinfo", fi,
          "--verificationkey", vk2])
    with open(vk) as f1, open(vk2) as f2:
        assert json.load(f1) == json.load(f2)
    sol_path = str(d / "verifier.sol")
    main(["exportsolidityverifier", "--verificationkey", vk,
          "--fflonkinfo", fi, "--verifierinfo", vi, "-o", sol_path])
    with open(sol_path) as f:
        text = f.read()
    assert text.count("{") == text.count("}") and "verifyProof" in text
    cd_path = str(d / "calldata.txt")
    main(["exportcalldata", "--verificationkey", vk, "--proof", proof,
          "--publics", pub, "-o", cd_path])
    arrays = json.loads("[" + open(cd_path).read() + "]")
    assert all(h.startswith("0x") and len(h) == 66 for h in arrays[0])
