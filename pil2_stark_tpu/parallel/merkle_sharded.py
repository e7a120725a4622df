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

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..hash import jax_poseidon
from .ntt_sharded import _axes_size, _norm_axes


def _levels_to_root(dlo, dhi):
    """Binary-tree reduce (n, 4) digests to a single (1, 4) root digest."""
    while dlo.shape[0] > 1:
        left = (dlo[0::2], dhi[0::2])
        right = (dlo[1::2], dhi[1::2])
        dlo, dhi = jax_poseidon.hash_pairs(left, right)
    return dlo, dhi


@functools.lru_cache(maxsize=None)
def make_sharded_merkle_levels(height: int, width: int, mesh: Mesh, axis=None, split: bool = False):
    """Full tree build on a row-sharded (height, width) leaf matrix.

    Returns a jitted fn -> list of digest levels, root last.  Levels with
    ≥ D nodes are produced as row-sharded global arrays (power-of-two
    heights make each device's local level a contiguous slice of the global
    level, so shard_map's P(axis) output IS the global level bit-exactly);
    the top log2(D) levels are computed replicated from the all-gathered
    subtree roots.  Level layout matches hash.merkle.merkelize /
    merklehash_p.js:28-42 (power-of-two heights never trigger the odd-pad
    rule)."""
    axis = _norm_axes(mesh, axis)
    d = _axes_size(mesh, axis)
    assert height % d == 0 and (height & (height - 1)) == 0
    local_h = height // d
    n_local_levels = local_h.bit_length() - 1  # levels below subtree roots

    def local_fn(lo, hi):
        dlo, dhi = (
            jax_poseidon.linear_hash_split((lo, hi), width)
            if split
            else jax_poseidon.linear_hash((lo, hi), width)
        )
        locals_ = [(dlo, dhi)]
        for _ in range(n_local_levels):
            dlo, dhi = jax_poseidon.hash_pairs((dlo[0::2], dhi[0::2]), (dlo[1::2], dhi[1::2]))
            locals_.append((dlo, dhi))
        sub_lo, sub_hi = locals_[-1]  # (1, 4) subtree root
        roots_lo = jax.lax.all_gather(sub_lo[0], axis, axis=0)  # (d, 4)
        roots_hi = jax.lax.all_gather(sub_hi[0], axis, axis=0)
        tops = []
        tlo, thi = roots_lo, roots_hi
        while tlo.shape[0] > 1:
            tlo, thi = jax_poseidon.hash_pairs((tlo[0::2], thi[0::2]), (tlo[1::2], thi[1::2]))
            tops.append((tlo, thi))
        return tuple(locals_[:-1]), tuple([(roots_lo, roots_hi)] + tops)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(
            tuple((P(axis, None), P(axis, None)) for _ in range(n_local_levels)),
            tuple((P(), P()) for _ in range(d.bit_length())),  # replicated tops
        ),
        check_vma=False,
    )
    jfn = jax.jit(fn)

    def build(lo, hi):
        sharded_levels, top_levels = jfn(lo, hi)
        return list(sharded_levels) + list(top_levels)

    return build


@functools.lru_cache(maxsize=None)
def make_sharded_merkle_root(height: int, width: int, mesh: Mesh, axis=None, split: bool = False):
    """Returns a jitted fn (lo, hi) (height, width) row-sharded -> root
    (4,) limb pair.  height must be a power of two divisible by the mesh
    axis size."""
    axis = _norm_axes(mesh, axis)
    d = _axes_size(mesh, axis)
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
