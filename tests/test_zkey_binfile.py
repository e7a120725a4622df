"""Pil-fflonk zkey binary artifact (fflonk/zkey_binfile.py): write the
reference's 'zkey' binfile layout (zkey_pilfflonk.js) from a real setup,
read it back, and prove/verify with the read-back key."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser, pilinfo
from pil2_stark_tpu.fflonk import zkey_binfile
from pil2_stark_tpu.fflonk.prover import fflonk_prove
from pil2_stark_tpu.fflonk.shkey import fflonk_setup, verification_key
from pil2_stark_tpu.fflonk.verifier import fflonk_verify
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.ops.fft_bn128 import FR
from pil2_stark_tpu.protocol.shplonk import dev_ptau

N_BITS = 4
N = 1 << N_BITS


@pytest.fixture(scope="module")
def fib_fr():
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


def test_zkey_roundtrip_fields(fib_fr, tmp_path):
    info, zkey, ptau, cm1, publics = fib_fr
    path = str(tmp_path / "fib.zkey")
    zkey_binfile.write_zkey(path, zkey, ptau)

    zk2, ptau2 = zkey_binfile.read_zkey(path)
    for k in ("power", "powerW", "nPublics", "maxQDegree"):
        assert zk2[k] == zkey[k], k
    assert zk2["X_2"] == zkey["X_2"]
    assert zk2["qNames"] == zkey["qNames"]
    assert len(zk2["f"]) == len(zkey["f"])
    for a, b in zip(zk2["f"], zkey["f"]):
        assert a["pols"] == b["pols"]
        assert a["openingPoints"] == b["openingPoints"]
        assert a["polDegrees"] == b["polDegrees"]
        assert a["c"] == b["c"] and a["composedLen"] == b["composedLen"]
        assert a["stages"] == b["stages"]
    assert set(zk2["constCommits"]) == set(zkey["constCommits"])
    for idx in zkey["constCommits"]:
        assert zk2["constCommits"][idx]["commit"] == \
            zkey["constCommits"][idx]["commit"]
        assert zk2["constCommits"][idx]["pol"] == \
            [int(v) % FR for v in zkey["constCommits"][idx]["pol"]]
    assert zk2["constPolsEvals"] == [int(v) % FR
                                     for v in zkey["constPolsEvals"]]
    assert zk2["constPolsEvalsExt"] == [int(v) % FR
                                        for v in zkey["constPolsEvalsExt"]]
    assert zk2["x_n"] == [int(v) % FR for v in zkey["x_n"]]
    assert set(zk2["constPolsCoefs"]) == set(zkey["constPolsCoefs"])
    for name, coefs in zkey["constPolsCoefs"].items():
        assert zk2["constPolsCoefs"][name] == [int(v) % FR for v in coefs]
    assert ptau2["g1"] == ptau["g1"]

    # vk-only read skips the prover sections
    vk, _ = zkey_binfile.read_zkey(path, vk_only=True)
    assert "constPolsEvals" not in vk and vk["X_2"] == zkey["X_2"]


def test_prove_with_readback_zkey(fib_fr, tmp_path):
    info, zkey, ptau, cm1, publics = fib_fr
    path = str(tmp_path / "fib.zkey")
    zkey_binfile.write_zkey(path, zkey, ptau)
    zk2, ptau2 = zkey_binfile.read_zkey(path)

    res = fflonk_prove(zk2, ptau2, info["pilInfo"],
                       info["expressionsInfo"], cm1, publics)
    vk = verification_key(zk2, info["pilInfo"])
    assert fflonk_verify(vk, info["pilInfo"], info["verifierInfo"],
                         res["proof"], res["publics"])
