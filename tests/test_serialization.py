"""Proof/zkin/artifact serialization round trips (JSON + binary consts)."""
import numpy as np
import pytest

from pil2_stark_tpu.compiler import pil1_parser
from pil2_stark_tpu.models import fibonacci
from pil2_stark_tpu.stark import witness, setup as stark_setup, prover, verifier
from pil2_stark_tpu.utils import serialization, proof2zkin


@pytest.fixture(scope="module")
def proven(tmp_path_factory):
    pil = pil1_parser.compile_pil_source(fibonacci.pil_source(6))
    pil["name"] = "Fibonacci"
    n = 64
    const_cols = witness.generate_fixed_cols(pil["references"], n)
    fibonacci.build_constants(n, const_cols.Fibonacci)
    cm_cols = witness.generate_wtns_cols(pil["references"], n)
    out = fibonacci.execute(n, cm_cols.Fibonacci, [1, 2])
    s = stark_setup.stark_setup(const_cols.buffer, pil, fibonacci.STARK_STRUCT)
    res = prover.prove(
        s["starkInfo"], s["expressionsInfo"], const_cols.buffer, s["constTree"],
        (cm_cols.buffer, [1, 2, out]),
    )
    return s, res, const_cols.buffer


def test_proof_json_roundtrip_verifies(proven, tmp_path):
    s, res, _ = proven
    p = tmp_path
    serialization.dump_proof(res["proof"], str(p / "proof.json"))
    serialization.dump_json(
        [str(int(x)) for x in res["publics"]], str(p / "publics.json")
    )
    serialization.dump_verkey(s["constRoot"], str(p / "verkey.json"))
    serialization.dump_json(s["starkInfo"], str(p / "starkinfo.json"))
    serialization.dump_json(s["verifierInfo"], str(p / "verifierinfo.json"))

    proof = serialization.load_proof(str(p / "proof.json"))
    publics = [int(x) for x in serialization.load_json(str(p / "publics.json"))]
    const_root = serialization.load_verkey(str(p / "verkey.json"))
    stark_info = serialization.load_json(str(p / "starkinfo.json"))
    verifier_info = serialization.load_json(str(p / "verifierinfo.json"))
    assert verifier.verify(proof, publics, const_root, stark_info, verifier_info)


def test_proof2zkin_shape(proven):
    s, res, _ = proven
    zkin = proof2zkin.proof2zkin(res["proof"], s["starkInfo"])
    ss = s["starkInfo"]["starkStruct"]
    nq = ss["nQueries"]
    assert len(zkin["s0_vals1"]) == nq
    assert len(zkin["s0_valsC"]) == nq
    assert len(zkin["finalPol"]) == 1 << ss["steps"][-1]["nBits"]
    for i in range(1, len(ss["steps"])):
        assert len(zkin[f"s{i}_vals"]) == nq
        assert len(zkin[f"s{i}_root"]) == 4
    assert all(isinstance(v, int) for v in zkin["root1"])


def test_const_file_roundtrip(proven, tmp_path):
    _, _, const_buffer = proven
    path = str(tmp_path / "consts.bin")
    serialization.write_const_file(path, const_buffer)
    header, const_n, const_ext = serialization.read_const_file(path)
    np.testing.assert_array_equal(const_n, const_buffer)
    assert const_ext is None
    assert header["nConstants"] == const_buffer.shape[1]


def test_const_file_error_handling(tmp_path):
    """Malformed / truncated containers fail loudly with context (VERDICT r1
    cleanup item), never with a cryptic reshape error."""
    import numpy as np
    import pytest

    from pil2_stark_tpu.utils import serialization as ser

    good = tmp_path / "good.const"
    const_n = np.arange(8 * 2, dtype=np.uint64).reshape(8, 2)
    ser.write_const_file(str(good), const_n)

    bad_magic = tmp_path / "bad_magic.const"
    bad_magic.write_bytes(b"XXXX" + good.read_bytes()[4:])
    with pytest.raises(ValueError, match="bad magic"):
        ser.read_const_file(str(bad_magic))

    truncated = tmp_path / "trunc.const"
    truncated.write_bytes(good.read_bytes()[:-16])
    with pytest.raises(ValueError, match="truncated"):
        ser.read_const_file(str(truncated))

    hdr_trunc = tmp_path / "hdr.const"
    hdr_trunc.write_bytes(good.read_bytes()[:6])
    with pytest.raises(ValueError, match="truncated"):
        ser.read_const_file(str(hdr_trunc))
