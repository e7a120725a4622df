"""Multi-chip Merkle build: shard-local subtrees + root reduction.

TPU-native counterpart of the reference's per-level worker fan-out
(/root/reference/src/helpers/hash/merklehash/merklehash_p.js:87-132,
SURVEY.md §2.7 P4): leaves are sharded by rows; each device linear-hashes
its rows and builds its subtree (power-of-two heights ⇒ the pair-padding
rule degenerates to a plain binary tree, so local level slices equal the
global level slices bit-exactly); the D subtree roots are all-gathered and
the top log2(D) levels computed replicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..hash import jax_poseidon


def _levels_to_root(dlo, dhi):
    """Binary-tree reduce (n, 4) digests to a single (1, 4) root digest."""
    while dlo.shape[0] > 1:
        left = (dlo[0::2], dhi[0::2])
        right = (dlo[1::2], dhi[1::2])
        dlo, dhi = jax_poseidon.hash_pairs(left, right)
    return dlo, dhi


def make_sharded_merkle_root(height: int, width: int, mesh: Mesh, axis: str = "x", split: bool = False):
    """Returns a jitted fn (lo, hi) (height, width) row-sharded -> root
    (4,) limb pair.  height must be a power of two divisible by the mesh
    axis size."""
    d = mesh.shape[axis]
    assert height % d == 0 and (height & (height - 1)) == 0

    def local_fn(lo, hi):
        digests = (
            jax_poseidon.linear_hash_split((lo, hi), width)
            if split
            else jax_poseidon.linear_hash((lo, hi), width)
        )
        sub_lo, sub_hi = _levels_to_root(*digests)
        # gather the D subtree roots and finish the top levels (replicated)
        roots_lo = jax.lax.all_gather(sub_lo[0], axis, axis=0)  # (d, 4)
        roots_hi = jax.lax.all_gather(sub_hi[0], axis, axis=0)
        top_lo, top_hi = _levels_to_root(roots_lo, roots_hi)
        return top_lo[0], top_hi[0]

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        # the top-of-tree hash after all_gather is computed identically on
        # every device; the static replication checker can't prove it
        check_vma=False,
    )
    return jax.jit(fn)
