"""Poseidon-GL Merkle tree (arity 2 over 4-element digests).

Reproduces the reference's tree shape bit-exactly
(/root/reference/src/helpers/hash/merklehash/merklehash_p.js):

- leaves: linear hash of each `width`-element row (normal or split layout);
- every non-root level is padded with zero digests to an even count,
  per the `_getNNodes` rule nextN = (floor((n-1)/8)+1)*4 (merklehash_p.js:28-42);
- inner nodes: poseidon(left4 || right4, zero capacity)[:4];
- proofs: per-level sibling digest, sibling index idx^1 within the padded
  level (merklehash_p.js:142-168);
- serialization: header (width, height) u64 LE, then elements row-major,
  then the flat node buffer (padded levels concatenated, root last)
  (merklehash_p.js:228-278).

Hashing runs on the batched JAX kernels (jax_poseidon); a pure-numpy backend
is kept as the differential-test oracle, mirroring the reference's
useThreads=false path.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..field import jax_gl as gl
from . import jax_poseidon, linearhash, poseidon_gl

try:  # native C++ host kernels (bit-identical; used for proof verification)
    from ..runtime import native as _native

    _HAVE_NATIVE = _native.native_available()
except Exception:  # pragma: no cover
    _HAVE_NATIVE = False


def _host_linear_hash(rows: np.ndarray, split: bool) -> np.ndarray:
    if split:
        return linearhash.linear_hash_split(rows)
    if _HAVE_NATIVE:
        return _native.linear_hash(rows)
    return linearhash.linear_hash(rows)


def _host_hash_pair(inp: np.ndarray) -> np.ndarray:
    if _HAVE_NATIVE:
        return _native.merkle_level(inp.reshape(2, 4))[0]
    return poseidon_gl.hash_n(inp)


@dataclasses.dataclass
class MerkleTree:
    width: int
    height: int
    elements: np.ndarray  # (height, width) uint64, row-major
    levels: list  # [level0 (padded), ..., root (1,4)] each (n,4) uint64

    @property
    def root(self) -> np.ndarray:
        return self.levels[-1][0]

    def nodes_flat(self) -> np.ndarray:
        return np.concatenate([lvl.reshape(-1) for lvl in self.levels])


def _pad_even(digests: np.ndarray) -> np.ndarray:
    n = digests.shape[0]
    target = 2 * ((n + 1) // 2)
    if target == n:
        return digests
    out = np.zeros((target, 4), dtype=np.uint64)
    out[:n] = digests
    return out


def _leaf_digests(elements: np.ndarray, split: bool, backend: str) -> np.ndarray:
    if backend == "np":
        if _HAVE_NATIVE and not split:
            return _native.linear_hash(elements)
        fn = linearhash.linear_hash_split if split else linearhash.linear_hash
        return fn(elements)
    return jax_poseidon.linear_hash_u64(elements, split=split)


def _hash_pairs(level: np.ndarray, backend: str) -> np.ndarray:
    """level (2m, 4) -> (m, 4)."""
    pairs = level.reshape(-1, 8)
    if backend == "np":
        if _HAVE_NATIVE:
            return _native.merkle_level(level)
        return poseidon_gl.hash_n(pairs)
    out = jax_poseidon.permute_jit(
        gl.from_u64(np.concatenate(
            [pairs, np.zeros((pairs.shape[0], 4), dtype=np.uint64)], axis=1))
    )
    return gl.to_u64((out[0][:, :4], out[1][:, :4]))


# Below this height the device round trip + per-shape compile costs more
# than hashing on the host (native C++); production stage trees are far
# larger, FRI tail trees far smaller.
_DEVICE_MIN_HEIGHT = 2048


def merkelize(
    buff: np.ndarray,
    width: int,
    height: int,
    split_linear_hash: bool = False,
    backend: str = "auto",
) -> MerkleTree:
    elements = np.asarray(buff, dtype=np.uint64).reshape(height, width)
    if backend == "auto":
        backend = "jax" if height >= _DEVICE_MIN_HEIGHT else "np"
    if backend == "jax":
        # single-trace full-tree build (one compile per (H, W) shape)
        levels = jax_poseidon.merkle_levels_u64(elements, split_linear_hash)
        return MerkleTree(
            width=width, height=height, elements=elements, levels=levels
        )
    digests = _leaf_digests(elements, split_linear_hash, backend)
    levels = [_pad_even(digests)]
    n = height
    while n > 1:
        nxt = _hash_pairs(levels[-1], backend)
        n = nxt.shape[0]
        levels.append(_pad_even(nxt) if n > 1 else nxt)
    return MerkleTree(width=width, height=height, elements=elements, levels=levels)


def get_group_proof(tree: MerkleTree, idx: int):
    """Returns (row values, sibling path) as in merklehash_p.js:140-167."""
    if idx < 0 or idx >= tree.height:
        raise IndexError("Out of range")
    values = tree.elements[idx].copy()
    proof = []
    i = idx
    for lvl in tree.levels[:-1]:
        proof.append(lvl[i ^ 1].copy())
        i >>= 1
    return values, proof


def calculate_root_from_proof(
    proof, idx: int, values: np.ndarray, split_linear_hash: bool = False
) -> np.ndarray:
    """Recompute the root from a (values, siblings) proof — host path,
    merklehash_p.js:169-206."""
    values = np.array([int(v) for v in values], dtype=np.uint64).reshape(1, -1)
    h = _host_linear_hash(values, split_linear_hash)[0]
    for sib in proof:
        sib = np.array([int(v) for v in sib], dtype=np.uint64)
        if idx & 1:
            inp = np.concatenate([sib, h])
        else:
            inp = np.concatenate([h, sib])
        h = _host_hash_pair(inp)
        idx >>= 1
    return h


def verify_group_proof(
    root, proof, idx: int, values, split_linear_hash: bool = False
) -> bool:
    got = calculate_root_from_proof(proof, idx, values, split_linear_hash)
    return bool(np.array_equal(np.asarray(root, dtype=np.uint64), got))


# ---------------------------------------------------------------------------
# file round-trip (merklehash_p.js:228-278 layout)


def write_tree(tree: MerkleTree, path: str) -> None:
    with open(path, "wb") as f:
        np.array([tree.width, tree.height], dtype="<u8").tofile(f)
        tree.elements.astype("<u8").tofile(f)
        tree.nodes_flat().astype("<u8").tofile(f)


def read_tree(path: str) -> MerkleTree:
    with open(path, "rb") as f:
        width, height = (int(x) for x in np.fromfile(f, dtype="<u8", count=2))
        elements = np.fromfile(f, dtype="<u8", count=width * height).reshape(
            height, width
        )
        nodes = np.fromfile(f, dtype="<u8")
    levels = []
    n = height
    pos = 0
    while True:
        padded = 2 * ((n + 1) // 2) if n > 1 else 1
        levels.append(nodes[pos * 4 : (pos + padded) * 4].reshape(padded, 4))
        pos += padded
        if n <= 1:
            break
        n = (n + 1) // 2
    return MerkleTree(
        width=width,
        height=height,
        elements=elements.astype(np.uint64),
        levels=[l.astype(np.uint64) for l in levels],
    )
