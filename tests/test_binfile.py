"""Reference binary-format interop (utils/binfile.py).

Checks the iden3 binfile container, pilcom .const layout, the 'cnts'
consts file (stark_constsPolsFile.js), the 'exec' final-tier binfile
(exec_helpers.js), and that hash/merkle.write_tree output obeys the
reference merklehash_p.js node-count/layout formula byte-for-byte.
"""
import numpy as np
import pytest

from pil2_stark_tpu.utils import binfile, serialization
from pil2_stark_tpu.hash import merkle
from pil2_stark_tpu.field import gl64


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "x.bin")
    secs = [(2, b"hello"), (3, b""), (5, bytes(range(17)))]
    binfile.write_bin_file(path, b"abcd", 7, secs, n_sections=5)
    magic, version, out = binfile.read_bin_file(path, b"abcd")
    assert magic == b"abcd" and version == 7
    assert out == {2: b"hello", 3: b"", 5: bytes(range(17))}


def test_container_errors(tmp_path):
    path = str(tmp_path / "bad.bin")
    binfile.write_bin_file(path, b"abcd", 1, [(2, b"xy")])
    with pytest.raises(ValueError, match="bad magic"):
        binfile.read_bin_file(path, b"zzzz")
    data = open(path, "rb").read()
    with open(path, "wb") as f:  # truncate inside the section payload
        f.write(data[:-1])
    with pytest.raises(ValueError, match="overruns"):
        binfile.read_bin_file(path, b"abcd")


def test_pilcom_const_layout(tmp_path):
    """Interleaved row-major: word i*nPols+p = value(row i, pol p)."""
    path = str(tmp_path / "a.const")
    pols = np.arange(24, dtype=np.uint64).reshape(8, 3)
    binfile.write_pilcom_const(path, pols)
    raw = np.fromfile(path, dtype="<u8")
    assert raw[0] == 0 and raw[1] == 1 and raw[2] == 2 and raw[3] == 3
    back = binfile.read_pilcom_const(path, 3)
    assert np.array_equal(back, pols)
    # and through the serialization front door (auto-detect fallback)
    header, const_n, ext = serialization.read_const_file(path, n_pols=3)
    assert header["pilcom"] and header["nBits"] == 3 and ext is None
    assert np.array_equal(const_n, pols)
    with pytest.raises(ValueError, match="not a multiple"):
        binfile.read_pilcom_const(path, 5)


def test_tree_file_matches_reference_layout(tmp_path):
    """write_tree output == merklehash_p.js writeToFile byte layout:
    [width,height] u64 header, elements, nodes with every level padded to
    an even digest count (_getNNodes)."""
    rng = np.random.default_rng(1)
    for height in (8, 33, 100):
        buff = rng.integers(0, gl64.P_INT, size=(height, 4), dtype=np.uint64)
        tree = merkle.merkelize(buff, 4, height, backend="np")
        nodes = tree.nodes_flat()
        assert nodes.size == binfile.get_n_nodes(height)
        path = str(tmp_path / f"t{height}.bin")
        merkle.write_tree(tree, path)
        raw = np.fromfile(path, dtype="<u8")
        assert raw[0] == 4 and raw[1] == height
        assert np.array_equal(raw[2:2 + 4 * height],
                              buff.reshape(-1))
        assert np.array_equal(raw[2 + 4 * height:], nodes)


def test_consts_binfile_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    n_bits, ext_bits, n_consts = 4, 6, 3
    fixed_ext = rng.integers(0, gl64.P_INT, size=(1 << ext_bits, n_consts),
                             dtype=np.uint64)
    tree = merkle.merkelize(fixed_ext, n_consts, 1 << ext_bits, backend="np")
    x_n = gl64.powers(gl64.w(n_bits), 1 << n_bits)
    x_ext = gl64.powers(gl64.w(ext_bits), 1 << ext_bits,
                        start=gl64.SHIFT_INT)
    path = str(tmp_path / "consts.cnts")
    binfile.write_consts_binfile(path, fixed_ext, tree, x_n, x_ext)

    out = binfile.read_consts_binfile(path)
    assert np.array_equal(out["fixedPolsEvals"], fixed_ext.reshape(-1))
    assert np.array_equal(out["x_n"], x_n)
    assert np.array_equal(out["x_ext"], x_ext)
    width, height, elements, nodes = out["tree"]
    tree2 = binfile.tree_from_consts(width, height, elements, nodes)
    assert np.array_equal(tree2.root, tree.root)
    # proofs from the rebuilt tree still verify
    val, proof = merkle.get_group_proof(tree2, 5)
    assert merkle.verify_group_proof(tree.root, proof, 5, val)


def test_exec_binfile_roundtrip(tmp_path):
    FR = (1 << 251) + 17  # any big prime-ish scalar domain for the test
    adds = [(1, 2, 12345, FR - 3), (4, 0, 7, 0)]
    s_map = [np.array([0, 1, 5, 9], dtype=np.uint64),
             np.array([2, 0, 0, 1], dtype=np.uint64)]
    path = str(tmp_path / "a.exec")
    binfile.write_exec_binfile(path, adds, s_map)
    adds2, smap2 = binfile.read_exec_binfile(path, n_cols=2)
    assert [tuple(a) for a in adds2] == adds
    assert all(np.array_equal(a, b) for a, b in zip(smap2, s_map))
    # through the final-tier front door (auto-detect by magic)
    from pil2_stark_tpu.final import exec as fexec
    adds3, smap3 = fexec.read_exec_file(path, n_cols=2)
    assert [tuple(a) for a in adds3] == adds
    with pytest.raises(ValueError, match="n_cols"):
        fexec.read_exec_file(path)


def test_final_write_ref_format_roundtrip(tmp_path):
    from pil2_stark_tpu.final import exec as fexec

    adds = [(3, 1, 11, 22)]
    s_map = [np.array([0, 2], dtype=np.uint64),
             np.array([1, 0], dtype=np.uint64),
             np.array([0, 0], dtype=np.uint64)]
    path = str(tmp_path / "f.exec")
    fexec.write_exec_file(path, adds, s_map, ref_format=True)
    assert binfile.is_bin_file(path, b"exec")
    adds2, smap2 = fexec.read_exec_file(path, n_cols=3)
    assert [tuple(a) for a in adds2] == adds
    assert all(np.array_equal(a, b) for a, b in zip(smap2, s_map))
