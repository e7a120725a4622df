"""Merkle-hash backend selector — uniform API over the GL (Poseidon-GL,
arity 2) and BN128 (Poseidon-BN254, arity 16) tree implementations.

Counterpart of the MH selection in
/root/reference/src/stark/stark_gen_helpers.js:91-102: the prover, FRI and
verifier talk to this interface; `verificationHashType` in starkStruct picks
the backend (GL for STARK-inside-STARK recursion, BN128 for the final
recursion-to-SNARK tier).
"""
from __future__ import annotations

import numpy as np

from . import merkle as merkle_gl
from . import merkle_bn128
from .transcript import Transcript
from .transcript_bn128 import TranscriptBN128


class MerkleHashGL:
    hash_type = "GL"

    def __init__(self, split_linear_hash=False):
        self.split_linear_hash = split_linear_hash

    def merkelize(self, buff, width, height):
        return merkle_gl.merkelize(
            buff, width, height, split_linear_hash=self.split_linear_hash
        )

    def root(self, tree):
        return tree.root

    def get_group_proof(self, tree, idx):
        return self.get_group_proofs(tree, [idx])[0]

    def get_group_proofs(self, tree, idxs):
        """Batched query extraction — one device gather per tree for
        device-resident trees, a host loop otherwise."""
        from ..stark import device as _device

        if isinstance(tree, _device.DeviceTree):
            return [
                [values, proof]
                for values, proof in _device.gather_group_proofs(tree, idxs)
            ]
        return [list(merkle_gl.get_group_proof(tree, i)) for i in idxs]

    def verify_group_proof(self, root, proof, idx, values):
        return merkle_gl.verify_group_proof(
            root, proof, idx, values, self.split_linear_hash
        )

    def new_transcript(self):
        return Transcript()


class MerkleHashBN128:
    hash_type = "BN128"

    def __init__(self, arity=16, custom=False):
        self.arity = arity or 16
        self.custom = custom or False

    def merkelize(self, buff, width, height):
        return merkle_bn128.merkelize(buff, width, height, self.arity, self.custom)

    def root(self, tree):
        return tree.root

    def get_group_proof(self, tree, idx):
        values, proof = merkle_bn128.get_group_proof(tree, idx)
        return [values, proof]

    def get_group_proofs(self, tree, idxs):
        return [self.get_group_proof(tree, i) for i in idxs]

    def verify_group_proof(self, root, proof, idx, values):
        return merkle_bn128.verify_group_proof(
            root, proof, idx, values, self.arity, self.custom
        )

    def new_transcript(self):
        arity = self.arity if self.custom else 16
        return TranscriptBN128(arity, self.custom)


def build_mh(stark_struct: dict):
    hash_type = stark_struct.get("verificationHashType", "GL")
    if hash_type == "GL":
        return MerkleHashGL(stark_struct.get("splitLinearHash", False))
    if hash_type == "BN128":
        return MerkleHashBN128(
            stark_struct.get("merkleTreeArity", 16),
            stark_struct.get("merkleTreeCustom", False),
        )
    raise ValueError(f"Invalid Hash Type: {hash_type}")
