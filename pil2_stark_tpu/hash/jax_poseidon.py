"""Batched Poseidon-GL permutation + linear hashes in JAX (u32 limb pairs).

The production hashing path for Merkle tree builds: thousands of independent
states are permuted at once, each state a row of 12 GL elements held as
``(lo, hi)`` uint32 arrays of shape (B, 12).  Round structure matches the
reference schedule (/root/reference/src/helpers/hash/poseidon/poseidon.js:77-107)
with the same C/S/M/P optimized constant tables; digests are bit-identical to
the reference's golden vectors (test/poseidon.test.js:13-43).

TPU notes: everything is VPU element-wise math over the batch dimension; the
round loops are `lax.scan`s over stacked per-round constants so the traced
graph stays small.  The 12x12 MDS multiply is an unrolled sum of scaled
columns (GL has no native dtype, so MXU matmul does not apply without limb
decomposition — a later Pallas optimization).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import jax_gl as gl
from . import poseidon_gl as ref

T = 12
HALF_F = ref.N_ROUNDS_F // 2
RP = ref.N_ROUNDS_P


def _pair_const(arr: np.ndarray):
    # Kept as NUMPY limb pairs (not device arrays): _consts() may first be
    # called inside a jit trace, and caching traced values would leak tracers
    # across traces.  numpy constants are embedded per-trace by XLA.
    x = np.asarray(arr, dtype=np.uint64)
    return (
        (x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (x >> np.uint64(32)).astype(np.uint32),
    )


@functools.lru_cache(maxsize=None)
def _consts():
    C, S, M, P = ref.C, ref.S, ref.M, ref.P
    return {
        "c0": _pair_const(C[0:T]),
        # three first-half M-rounds: C rows 1..3
        "c_first": _pair_const(C[T : HALF_F * T].reshape(HALF_F - 1, T)),
        "c_p": _pair_const(C[HALF_F * T : (HALF_F + 1) * T]),
        "c_partial": _pair_const(C[(HALF_F + 1) * T : (HALF_F + 1) * T + RP]),
        "s_partial": _pair_const(S.reshape(RP, 2 * T - 1)),
        "c_second": _pair_const(
            C[(HALF_F + 1) * T + RP :].reshape(HALF_F - 1, T)
        ),
        "m": _pair_const(M),
        "p": _pair_const(P),
    }


def _pow7_all(state):
    return gl.pow7(state)


def _mat_mul(state, mat):
    """out[:, i] = Σ_j state[:, j] · mat[j, i] — unrolled over j."""
    mlo, mhi = mat
    acc = None
    for j in range(T):
        term = gl.mul(
            (state[0][:, j : j + 1], state[1][:, j : j + 1]),
            (mlo[j][None, :], mhi[j][None, :]),
        )
        acc = term if acc is None else gl.add(acc, term)
    return acc


def _full_rounds(state, c_rows, mat):
    def body(st, c):
        st = _pow7_all(st)
        st = gl.add(st, (c[0][None, :], c[1][None, :]))
        st = _mat_mul(st, mat)
        return st, None

    state, _ = jax.lax.scan(
        lambda st, c: body(st, c), state, (c_rows[0], c_rows[1])
    )
    return state


def _partial_rounds(state, k):
    def body(st, xs):
        c, s = xs
        slo, shi = s  # (23,) each
        x0 = gl.pow7((st[0][:, 0:1], st[1][:, 0:1]))
        x0 = gl.add(x0, (c[0][None, None], c[1][None, None]))
        st = (
            jnp.concatenate([x0[0], st[0][:, 1:]], axis=1),
            jnp.concatenate([x0[1], st[1][:, 1:]], axis=1),
        )
        # new0 = Σ_j st_j · S[23r + j]
        prods = gl.mul(st, (slo[None, :T], shi[None, :T]))
        new0 = (prods[0][:, 0:1], prods[1][:, 0:1])
        for j in range(1, T):
            new0 = gl.add(new0, (prods[0][:, j : j + 1], prods[1][:, j : j + 1]))
        # st[k] += st[0] · S[23r + T + k - 1]  for k=1..T-1
        addk = gl.mul(x0, (slo[None, T:], shi[None, T:]))
        rest = gl.add((st[0][:, 1:], st[1][:, 1:]), addk)
        st = (
            jnp.concatenate([new0[0], rest[0]], axis=1),
            jnp.concatenate([new0[1], rest[1]], axis=1),
        )
        return st, None

    state, _ = jax.lax.scan(
        body, state, ((k["c_partial"][0], k["c_partial"][1]),
                      (k["s_partial"][0], k["s_partial"][1])),
    )
    return state


# Tri-state override for the Pallas permutation kernel: None = auto (use
# the VMEM-resident kernel on TPU backends — one HBM read/write per state
# instead of one per round — the jnp scan chain elsewhere).  Mirrors the
# NTT gate (ops/ntt.py _FORCE_PALLAS_BASE); tests force both ways.
_FORCE_PALLAS: bool | None = None


def _pallas_enabled() -> bool:
    if _FORCE_PALLAS is not None:
        return _FORCE_PALLAS
    return jax.default_backend() == "tpu"


def permute(state):
    """Poseidon permutation on a batch: state = (lo, hi) uint32 (B, 12)."""
    if _pallas_enabled():
        from . import pallas_poseidon

        interp = None if _FORCE_PALLAS is None else (
            jax.default_backend() != "tpu"
        )
        return pallas_poseidon.permute_pair(state, interpret=interp)
    return _permute_jnp(state)


def _permute_jnp(state):
    """The pure-jnp/XLA oracle path (one fused stage per round)."""
    k = _consts()
    state = gl.add(state, (k["c0"][0][None, :], k["c0"][1][None, :]))
    state = _full_rounds(state, k["c_first"], k["m"])
    state = _pow7_all(state)
    state = gl.add(state, (k["c_p"][0][None, :], k["c_p"][1][None, :]))
    state = _mat_mul(state, k["p"])
    state = _partial_rounds(state, k)
    state = _full_rounds(state, k["c_second"], k["m"])
    state = _pow7_all(state)
    state = _mat_mul(state, k["m"])
    return state


@jax.jit
def permute_jit(state):
    return permute(state)


def hash_pairs(left, right):
    """poseidon(left4 || right4, zero capacity)[:4] on batches (B, 4)."""
    b = left[0].shape[0]
    z = jnp.zeros((b, 4), dtype=jnp.uint32)
    st = (
        jnp.concatenate([left[0], right[0], z], axis=1),
        jnp.concatenate([left[1], right[1], z], axis=1),
    )
    out = permute(st)
    return (out[0][:, :4], out[1][:, :4])


def linear_hash(rows, width: int):
    """Sponge over rows of `width` GL elements (linearhash.js:8-42).

    rows = (lo, hi) uint32 of shape (B, width).  Returns (B, 4) digests.
    Rows of width ≤ 4 are copied verbatim (zero-padded).
    """
    lo, hi = rows
    b = lo.shape[0]
    if width <= 4:
        pad = ((0, 0), (0, 4 - width))
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    n_chunks = -(-width // 8)
    pad = ((0, 0), (0, n_chunks * 8 - width))
    lo = jnp.pad(lo, pad).reshape(b, n_chunks, 8)
    hi = jnp.pad(hi, pad).reshape(b, n_chunks, 8)

    def body(st, chunk):
        clo, chi = chunk
        full = (
            jnp.concatenate([clo, st[0]], axis=1),
            jnp.concatenate([chi, st[1]], axis=1),
        )
        out = permute(full)
        return (out[0][:, :4], out[1][:, :4]), None

    z = jnp.zeros((b, 4), dtype=jnp.uint32)
    (dlo, dhi), _ = jax.lax.scan(
        body,
        (z, z),
        (jnp.moveaxis(lo, 1, 0), jnp.moveaxis(hi, 1, 0)),
    )
    return (dlo, dhi)


def linear_hash_split(rows, width: int, batch_size: int | None = None):
    """Two-level split linear hash (linearhash_gpu.js:31-68).

    Splits each row into chunks of `batch_size` elements, linear-hashes each
    chunk, then linear-hashes the concatenated 4-element digests.
    """
    if batch_size is None:
        batch_size = int(max(8, (width + 3) / 4))
    if width <= 4:
        return linear_hash(rows, width)
    lo, hi = rows
    digests_lo, digests_hi = [], []
    for start in range(0, width, batch_size):
        end = min(start + batch_size, width)
        d = linear_hash((lo[:, start:end], hi[:, start:end]), end - start)
        digests_lo.append(d[0])
        digests_hi.append(d[1])
    cat = (jnp.concatenate(digests_lo, axis=1), jnp.concatenate(digests_hi, axis=1))
    n = cat[0].shape[1]
    if n <= 4:
        return linear_hash(cat, n)
    return linear_hash(cat, n)


# ---------------------------------------------------------------------------
# planar pipeline (lanes = batch)
#
# The Pallas kernel's native state layout is (12, B) limb planes.  The
# row-major entry points above transpose (B, 12) <-> (12, B) around every
# dispatch — two relayout passes per permutation.  The planar commit
# pipeline (LDE planar output -> leaf sponge -> tree levels) keeps the
# batch on the lane axis end-to-end, so leaf absorption is a row slice and
# only the per-level sibling de-interleave pays a (cheap) lane shuffle.


def permute_planar(state):
    """Poseidon permutation on a PLANAR batch: (lo, hi) uint32 (12, B)."""
    if _pallas_enabled():
        from . import pallas_poseidon

        interp = None if _FORCE_PALLAS is None else (
            jax.default_backend() != "tpu"
        )
        return pallas_poseidon.permute_planes_pair(state, interpret=interp)
    out = _permute_jnp((state[0].T, state[1].T))
    return (out[0].T, out[1].T)


def linear_hash_planar(cols, width: int):
    """Sponge over planar columns: cols = (lo, hi) (width, B) -> (4, B)."""
    lo, hi = cols
    b = lo.shape[1]
    if width <= 4:
        pad = ((0, 4 - width), (0, 0))
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    n_chunks = -(-width // 8)
    pad = ((0, n_chunks * 8 - width), (0, 0))
    lo = jnp.pad(lo, pad).reshape(n_chunks, 8, b)
    hi = jnp.pad(hi, pad).reshape(n_chunks, 8, b)

    def body(st, chunk):
        clo, chi = chunk
        full = (
            jnp.concatenate([clo, st[0]], axis=0),
            jnp.concatenate([chi, st[1]], axis=0),
        )
        out = permute_planar(full)
        return (out[0][:4], out[1][:4]), None

    z = jnp.zeros((4, b), dtype=jnp.uint32)
    (dlo, dhi), _ = jax.lax.scan(body, (z, z), (lo, hi))
    return (dlo, dhi)


def linear_hash_split_planar(cols, width: int, batch_size: int | None = None):
    """Two-level split linear hash over planar columns (linearhash_gpu.js)."""
    if batch_size is None:
        batch_size = int(max(8, (width + 3) / 4))
    if width <= 4:
        return linear_hash_planar(cols, width)
    lo, hi = cols
    digests_lo, digests_hi = [], []
    for start in range(0, width, batch_size):
        end = min(start + batch_size, width)
        d = linear_hash_planar((lo[start:end], hi[start:end]), end - start)
        digests_lo.append(d[0])
        digests_hi.append(d[1])
    cat = (jnp.concatenate(digests_lo, axis=0),
           jnp.concatenate(digests_hi, axis=0))
    return linear_hash_planar(cat, cat[0].shape[0])


@jax.jit
def _hash_level_planar_jit(dlo, dhi):
    """Planar level (4, 2m) -> (4, m) parent digests, ONE dispatch.

    Siblings are ADJACENT LANES, so pairing is the (4, m, 2) reshape plus
    one lane de-interleave — cheaper than the row-major path's (m, 12)
    transpose in AND out of the kernel."""
    m = dlo.shape[1] // 2
    llo = dlo.reshape(4, m, 2)
    lhi = dhi.reshape(4, m, 2)
    z = jnp.zeros((4, m), dtype=jnp.uint32)
    st = (
        jnp.concatenate([llo[:, :, 0], llo[:, :, 1], z], axis=0),
        jnp.concatenate([lhi[:, :, 0], lhi[:, :, 1], z], axis=0),
    )
    out = permute_planar(st)
    return (out[0][:4], out[1][:4])


# NOTE (round 5): a bucketed-width variant of this dispatch (pad each
# level to one of 3 fixed widths to cap XLA program count) was tried and
# REVERTED: the Mosaic kernels are already bucket-shaped inside
# permute_planes_pair, so it only saved trivial XLA wrapper compiles,
# while its eager pad/slice dispatches tripled the per-tree dispatch
# count — which collapses throughput when the device tunnel's dispatch
# latency spikes (PROBES_r05.md chip-state variance note).
def _hash_level_planar(dlo, dhi):
    """Planar level (4, 2m) -> (4, m), one jit program per level size."""
    return _hash_level_planar_jit(dlo, dhi)


@functools.lru_cache(maxsize=None)
def _jit_leaf_all_planar(n_rc: int, chunk: int, n_chunks: int,
                         split_width: int):
    """All leaf sponges of a planar tree in ONE dispatch: (W, n_rc·chunk)
    columns scanned in contiguous lane blocks of `chunk`."""
    if split_width:
        inner = lambda cols: linear_hash_split_planar(cols, split_width)
    else:
        inner = lambda cols: linear_hash_planar(cols, n_chunks * 8)

    def body(cols):
        lo, hi = cols
        w = lo.shape[0]
        lo = jnp.moveaxis(lo.reshape(w, n_rc, chunk), 1, 0)
        hi = jnp.moveaxis(hi.reshape(w, n_rc, chunk), 1, 0)

        def step(_, blk):
            return None, inner(blk)

        _, (dlo, dhi) = jax.lax.scan(step, None, (lo, hi))
        return (
            jnp.moveaxis(dlo, 0, 1).reshape(4, n_rc * chunk),
            jnp.moveaxis(dhi, 0, 1).reshape(4, n_rc * chunk),
        )

    return jax.jit(body)


def _leaf_digests_planar(cols, width: int, height: int, split: bool):
    """(width, height) planar pair -> (4, height) digest pair."""
    lo, hi = cols
    if width <= 4:
        pad = ((0, 4 - width), (0, 0))
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    split_width = width if split else 0
    if not split:
        n_chunks = -(-width // 8)
        if width != n_chunks * 8:
            pad = ((0, n_chunks * 8 - width), (0, 0))
            lo = jnp.pad(lo, pad)
            hi = jnp.pad(hi, pad)
    else:
        n_chunks = 0
    chunk = min(_row_chunk(), height)
    total = -(-height // chunk) * chunk
    if total != height:
        pad = ((0, 0), (0, total - height))
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
    fn = _jit_leaf_all_planar(total // chunk, chunk, n_chunks, split_width)
    dlo, dhi = fn((lo, hi))
    return dlo[:, :height], dhi[:, :height]


def merkle_levels_planar(cols, width: int, height: int, split: bool = False):
    """Planar device Merkle build: cols (width, height) -> list of planar
    (4, n) digest levels, root last.  Bit-identical digests to
    merkle_levels(cols.T, ...) — same sponge, same even-padding rule."""
    dlo, dhi = _leaf_digests_planar(cols, width, height, split)
    levels = []
    n = height
    while n > 1:
        target = 2 * ((n + 1) // 2)
        if target != n:
            pad = ((0, 0), (0, target - n))
            dlo = jnp.pad(dlo, pad)
            dhi = jnp.pad(dhi, pad)
        levels.append((dlo, dhi))
        dlo, dhi = _hash_level_planar(dlo, dhi)
        n = (n + 1) // 2
    levels.append((dlo, dhi))
    return levels


# ---------------------------------------------------------------------------
# u64 conveniences


def permute_u64(state: np.ndarray) -> np.ndarray:
    return gl.to_u64(permute_jit(gl.from_u64(state)))


@functools.lru_cache(maxsize=None)
def _jit_linear_hash(width: int, split: bool):
    fn = linear_hash_split if split else linear_hash
    return jax.jit(lambda rows: fn(rows, width))


# ---------------------------------------------------------------------------
# chunked Merkle build
#
# Tree levels are hashed by dispatching a FIXED-SHAPE jitted pair-hash over
# chunks of the level, so the entire framework compiles exactly two Poseidon
# pair programs (big + small chunk) and one leaf program per sponge length —
# independent of tree height/width.  (Tracing the whole tree as one program
# inlines one permutation per level: a 2^20 tree is a ~20x-permute XLA graph
# that takes minutes to compile, PER (H, W) shape.  Chunked dispatch keeps
# every buffer device-resident and amortizes compiles across all trees.)

@jax.jit
def _hash_level_all(dlo, dhi):
    """(2m, 4) interleaved level -> (m, 4) parent digests, ONE dispatch.

    Sibling digests are CONSECUTIVE rows, so the pair layout is the free
    row-major reshape (2m, 4) -> (m, 8) — strided [0::2]/[1::2] slices
    (round 3) cost two full gather relayouts and ran the level hash at
    half the raw kernel rate.  jit specializes per level size, but the
    traced program is a single permutation, so compiles stay trivial;
    sizes are shared across every tree in the process (level m of a 2^21
    tree == level m+4 of a 2^17 tree).  Per-dispatch chunking (round 2)
    sent ~2·H/8192 programs per tree through the device tunnel — the
    dispatch storm, not hashing, dominated remote-device tree builds."""
    m = dlo.shape[0] // 2
    z = jnp.zeros((m, 4), dtype=jnp.uint32)
    st = (
        jnp.concatenate([dlo.reshape(m, 8), z], axis=1),
        jnp.concatenate([dhi.reshape(m, 8), z], axis=1),
    )
    out = permute(st)
    return (out[0][:, :4], out[1][:, :4])


def _hash_level(dlo, dhi):
    """One padded tree level (2m, 4) -> (m, 4)."""
    return _hash_level_all(dlo, dhi)


_ROW_CHUNK = 8192  # leaf rows per linear-hash dispatch (jnp path)


def _row_chunk() -> int:
    """Rows per scanned leaf-sponge block.  The Pallas path uses its own
    dispatch quantum so every scanned block fills the kernel's largest
    batch bucket exactly (an 8192-row block would pad 2x inside the
    16384 bucket); the jnp path keeps the smaller block that bounds its
    per-trace fusion size."""
    if _pallas_enabled():
        from . import pallas_poseidon

        return pallas_poseidon._CHUNK
    return _ROW_CHUNK


@functools.lru_cache(maxsize=None)
def _jit_leaf_chunk(n_chunks: int, split_width: int):
    """Leaf sponge over (R, n_chunks*8) rows.  Keyed by sponge length (not
    raw width): zero-padding a row to the next 8-multiple absorbs the same
    chunks, so width 5..8 share one program (linearhash.js pads likewise).
    split_width > 0 keys the split layout by its true width (the split
    boundaries depend on it)."""
    if split_width:
        return jax.jit(lambda rows: linear_hash_split(rows, split_width))
    return jax.jit(lambda rows: linear_hash(rows, n_chunks * 8))


@functools.lru_cache(maxsize=None)
def _jit_leaf_all(n_rc: int, chunk: int, n_chunks: int, split_width: int):
    """All leaf sponges of a tree in ONE dispatch: (n_rc·chunk, W) rows are
    scanned in row blocks of `chunk` inside the program (the traced body is
    one linear hash, so compiles stay cheap; n_rc is in the key but the
    program is a scan, not an unroll)."""
    if split_width:
        inner = lambda rows: linear_hash_split(rows, split_width)
    else:
        inner = lambda rows: linear_hash(rows, n_chunks * 8)

    def body(rows):
        lo, hi = rows
        w = lo.shape[1]
        lo = lo.reshape(n_rc, chunk, w)
        hi = hi.reshape(n_rc, chunk, w)

        def step(_, blk):
            return None, inner(blk)

        _, (dlo, dhi) = jax.lax.scan(step, None, (lo, hi))
        return dlo.reshape(n_rc * chunk, 4), dhi.reshape(n_rc * chunk, 4)

    return jax.jit(body)


def _leaf_digests_device(rows, width: int, height: int, split: bool):
    """(height, width) pair -> (height, 4) digest pair, one dispatch."""
    lo, hi = rows
    if width <= 4:
        pad = ((0, 0), (0, 4 - width))
        return (jnp.pad(lo, pad), jnp.pad(hi, pad))
    split_width = width if split else 0
    if not split:
        n_chunks = -(-width // 8)
        if width != n_chunks * 8:
            pad = ((0, 0), (0, n_chunks * 8 - width))
            lo = jnp.pad(lo, pad)
            hi = jnp.pad(hi, pad)
    else:
        n_chunks = 0
    chunk = min(_row_chunk(), height)
    total = -(-height // chunk) * chunk
    if total != height:
        pad = ((0, total - height), (0, 0))
        lo = jnp.pad(lo, pad)
        hi = jnp.pad(hi, pad)
    fn = _jit_leaf_all(total // chunk, chunk, n_chunks, split_width)
    dlo, dhi = fn((lo, hi))
    return dlo[:height], dhi[:height]


def merkle_levels(rows, width: int, height: int, split: bool = False):
    """Device Merkle tree build: leaf linear hashes + every level (with the
    reference's even-padding rule, merklehash_p.js:28-42).  Returns the list
    of (lo, hi) digest levels, root last — all device-resident."""
    dlo, dhi = _leaf_digests_device(rows, width, height, split)
    levels = []
    n = height
    while n > 1:
        target = 2 * ((n + 1) // 2)
        if target != n:
            pad = ((0, target - n), (0, 0))
            dlo = jnp.pad(dlo, pad)
            dhi = jnp.pad(dhi, pad)
        levels.append((dlo, dhi))
        dlo, dhi = _hash_level(dlo, dhi)
        n = (n + 1) // 2
    levels.append((dlo, dhi))
    return levels


def merkle_levels_u64(rows: np.ndarray, split: bool = False):
    """Host convenience: (H, W) u64 -> list of (n, 4) u64 levels."""
    from ..field import jax_gl as _gl

    rows = np.asarray(rows, dtype=np.uint64)
    levels = merkle_levels(
        _gl.from_u64(rows), rows.shape[1], rows.shape[0], split
    )
    return [_gl.to_u64(lvl) for lvl in levels]


def linear_hash_u64(rows: np.ndarray, split: bool = False) -> np.ndarray:
    rows = np.asarray(rows, dtype=np.uint64)
    out = _jit_linear_hash(rows.shape[1], split)(gl.from_u64(rows))
    return gl.to_u64(out)
