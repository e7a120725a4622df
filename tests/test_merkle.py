"""Merkle tree tests — mirror /root/reference/test/merklehash_p.test.js:
round-trip merkelize → getGroupProof → verifyGroupProof at power-of-two and
non-power heights (N=33 exercises the zero-digest padding), both linear-hash
layouts, JAX vs numpy backends, and file serialization."""
import numpy as np
import pytest

from pil2_stark_tpu.hash import merkle

P = 0xFFFFFFFF00000001


def _buff(height, width, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=(height, width), dtype=np.uint64)


@pytest.mark.parametrize("height,width", [(256, 9), (33, 5), (8, 3), (2, 12), (64, 1)])
@pytest.mark.parametrize("split", [False, True])
def test_merkle_roundtrip(height, width, split):
    buff = _buff(height, width, seed=height * 31 + width)
    tree = merkle.merkelize(buff, width, height, split_linear_hash=split)
    root = tree.root
    for idx in [0, 1, height // 2, height - 1]:
        values, proof = merkle.get_group_proof(tree, idx)
        assert merkle.verify_group_proof(root, proof, idx, values, split)
        # tamper
        bad = values.copy()
        bad[0] ^= np.uint64(1)
        assert not merkle.verify_group_proof(root, proof, idx, bad, split)


def test_merkle_jax_matches_numpy():
    buff = _buff(64, 7, seed=5)
    t_jax = merkle.merkelize(buff, 7, 64, backend="jax")
    t_np = merkle.merkelize(buff, 7, 64, backend="np")
    np.testing.assert_array_equal(t_jax.nodes_flat(), t_np.nodes_flat())


def test_merkle_node_count_matches_reference_rule():
    """nodes_flat length must equal merklehash_p.js _getNNodes(height*4)."""

    def get_n_nodes(n):
        next_n = ((n - 1) // 8 + 1) * 4
        acc = next_n * 2
        while n > 4:
            n = next_n
            next_n = ((n - 1) // 8 + 1) * 4
            if n > 4:
                acc += next_n * 2
            else:
                acc += 4
        return acc

    for height, width in [(2, 3), (3, 3), (5, 3), (33, 2), (256, 1), (100, 4)]:
        buff = _buff(height, width, seed=height)
        tree = merkle.merkelize(buff, width, height, backend="np")
        assert tree.nodes_flat().shape[0] == get_n_nodes(height * 4), height


def test_merkle_file_roundtrip(tmp_path):
    buff = _buff(33, 4, seed=9)
    tree = merkle.merkelize(buff, 4, 33)
    path = str(tmp_path / "tree.bin")
    merkle.write_tree(tree, path)
    tree2 = merkle.read_tree(path)
    assert tree2.width == tree.width and tree2.height == tree.height
    np.testing.assert_array_equal(tree2.elements, tree.elements)
    np.testing.assert_array_equal(tree2.nodes_flat(), tree.nodes_flat())
    values, proof = merkle.get_group_proof(tree2, 20)
    assert merkle.verify_group_proof(tree2.root, proof, 20, values)
