"""Cubic extension F_p[x]/(x^3 - x - 1) over jax_gl limb pairs.

A value is a GL pair ``(lo, hi)`` whose arrays carry a leading axis of size
d ∈ {1, 3}: d=1 is a base-field vector, d=3 an extension vector.  Mixed-dim
op semantics mirror the reference's dual representation (f3g.js:47-131):
e.g. base + ext touches only component 0.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import jax_gl as gl


def dim(a) -> int:
    return a[0].shape[0]


def lift(a, d: int = 1):
    """Add a leading dim axis to a plain gl vector."""
    return (a[0][None], a[1][None])


def comp(a, i: int):
    """i-th component as a plain gl vector (no leading axis)."""
    return (a[0][i], a[1][i])


def stack(rows):
    """Stack component gl vectors, broadcasting to a common shape (mixed
    base/ext ops produce differently-shaped components)."""
    import numpy as _np

    shape = _np.broadcast_shapes(*[r[0].shape for r in rows])
    return (
        jnp.stack([jnp.broadcast_to(r[0], shape) for r in rows]),
        jnp.stack([jnp.broadcast_to(r[1], shape) for r in rows]),
    )


def promote(a):
    """dim-1 -> dim-3 with zero high components."""
    if dim(a) == 3:
        return a
    z = jnp.zeros_like(a[0][0])
    return (
        jnp.stack([a[0][0], z, z]),
        jnp.stack([a[1][0], z, z]),
    )


def add(a, b):
    da, db = dim(a), dim(b)
    if da == db:
        return gl.add(a, b)
    if da == 1:
        a, b = b, a  # a is now dim3
    c0 = gl.add(comp(a, 0), comp(b, 0))
    return stack([c0, comp(a, 1), comp(a, 2)])


def sub(a, b):
    da, db = dim(a), dim(b)
    if da == db:
        return gl.sub(a, b)
    if da == 3:  # ext - base
        c0 = gl.sub(comp(a, 0), comp(b, 0))
        return stack([c0, comp(a, 1), comp(a, 2)])
    # base - ext
    c0 = gl.sub(comp(a, 0), comp(b, 0))
    return stack([c0, gl.neg(comp(b, 1)), gl.neg(comp(b, 2))])


def neg(a):
    return gl.neg(a)


def mul(a, b):
    da, db = dim(a), dim(b)
    if da == 1 or db == 1:
        return gl.mul(a, b)  # broadcasting (1,...)×(d,...) scalar action
    a0, a1, a2 = comp(a, 0), comp(a, 1), comp(a, 2)
    b0, b1, b2 = comp(b, 0), comp(b, 1), comp(b, 2)
    # Karatsuba with x^3 = x + 1 folding (f3g.js:94-102)
    A = gl.mul(gl.add(a0, a1), gl.add(b0, b1))
    B = gl.mul(gl.add(a0, a2), gl.add(b0, b2))
    C = gl.mul(gl.add(a1, a2), gl.add(b1, b2))
    D = gl.mul(a0, b0)
    E = gl.mul(a1, b1)
    F = gl.mul(a2, b2)
    G = gl.sub(D, E)
    c0 = gl.sub(gl.add(C, G), F)
    c1 = gl.sub(gl.sub(gl.add(A, C), gl.add(E, E)), D)
    c2 = gl.sub(B, G)
    return stack([c0, c1, c2])


def square(a):
    return mul(a, a)


def muladd(a, b, c):
    return add(mul(a, b), c)
