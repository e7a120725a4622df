"""Device-resident prover primitives: on-device Merkle trees, cubic-extension
inversion, geometric series, and reductions.

This is the layer that makes ``prove(backend="device")`` keep every extended-
domain buffer on the TPU across the whole stage loop (the reference's
equivalents are the BigBuffer stage arrays of
/root/reference/src/stark/stark_gen_helpers.js:104-137, which live in host
RAM because the reference is a CPU prover).  Host↔device traffic in the
steady state is limited to: the per-stage witness upload (N·w), Merkle roots
(4 u64 each), the evals vector, and the final query gathers — everything
else (LDE, tree builds, Q split, DEEP evals, xDivXSubXi, FRI folds) runs as
jitted XLA programs over u32 limb pairs.

Layouts follow the package conventions: a section buffer is a ``(lo, hi)``
uint32 pair shaped (rows, cols); a jax_f3 value carries a leading dim axis
(d, N) with d ∈ {1, 3}.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl64
from ..field import jax_gl as gl
from ..field import jax_f3 as jf3
from ..hash import jax_poseidon


# ---------------------------------------------------------------------------
# field helpers


def gl_inv(a):
    """Base-field inverse via exponentiation by p-2 (elementwise, VPU).
    ~95 GL muls per element — used once per proof on the xDivXSubXi table,
    where it replaces the host Montgomery batch inverse (a sequential scan
    that would not vectorize; f3g.js:370-385)."""
    return gl.exp_const(a, gl64.P_INT - 2)


def f3_inv(a):
    """Closed-form cubic-extension inverse (f3g.js:136-171) on a (3, N)
    jax_f3 value; one base-field inversion per element."""
    a0, a1, a2 = jf3.comp(a, 0), jf3.comp(a, 1), jf3.comp(a, 2)
    aa = gl.mul(a0, a0)
    ac = gl.mul(a0, a2)
    ba = gl.mul(a1, a0)
    bb = gl.mul(a1, a1)
    bc = gl.mul(a1, a2)
    cc = gl.mul(a2, a2)

    aaa = gl.mul(aa, a0)
    aac = gl.mul(aa, a2)
    abc = gl.mul(ba, a2)
    abb = gl.mul(ba, a1)
    acc = gl.mul(ac, a2)
    bbb = gl.mul(bb, a1)
    bcc = gl.mul(bc, a2)
    ccc = gl.mul(cc, a2)

    t = gl.sub(
        gl.add(gl.add(gl.add(abc, abc), abc), gl.add(abb, bcc)),
        gl.add(gl.add(gl.add(aaa, aac), gl.add(aac, acc)), gl.add(bbb, ccc)),
    )
    tinv = gl_inv(t)
    i1 = gl.mul(gl.sub(gl.add(bc, bb), gl.add(gl.add(aa, ac), gl.add(ac, cc))), tinv)
    i2 = gl.mul(gl.sub(ba, cc), tinv)
    i3 = gl.mul(gl.sub(gl.add(ac, cc), bb), tinv)
    return jf3.stack([i1, i2, i3])


def _f3_geometric_traced(pows2, o: int, bits: int):
    """Powers 1, xi, xi², … xi^{2^bits - 1} as a (3, n) jax_f3 value by
    log-doubling inside a trace: pows2 = (lo, hi) pair (n_openings, bits, 3)
    holding xi^(2^k) per opening.  log2(n) vectorized ext muls replace the
    reference's O(N) scalar loop (stark_gen_helpers.js:219-229)."""
    one = np.zeros((3, 1), dtype=np.uint64)
    one[0, 0] = 1
    acc = (
        jnp.asarray((one & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((one >> 32).astype(np.uint32)),
    )
    for k in range(bits):
        step = (pows2[0][o, k][:, None], pows2[1][o, k][:, None])  # (3, 1)
        nxt = jf3.mul(acc, step)
        acc = (
            jnp.concatenate([acc[0], nxt[0]], axis=1),
            jnp.concatenate([acc[1], nxt[1]], axis=1),
        )
    return acc


def f3_mul_rows(a, b):
    """Extension multiply on trailing-axis layout: a, b are (N, 3) pairs
    (the buffer/fri layout, vs jax_f3's leading (3, N) axis)."""
    at = (a[0].T, a[1].T)
    bt = (b[0].T, b[1].T)
    r = jf3.mul(at, bt)
    return (r[0].T, r[1].T)


def f3_add_rows(a, b):
    return gl.add(a, b)


def gl_sum0(a):
    """Tree-sum along axis 0 of a (n, ...) gl pair (mod-p associative)."""
    lo, hi = a
    while lo.shape[0] > 1:
        n = lo.shape[0]
        if n % 2:
            pad = [(0, 1)] + [(0, 0)] * (lo.ndim - 1)
            lo = jnp.pad(lo, pad)
            hi = jnp.pad(hi, pad)
        lo, hi = gl.add((lo[0::2], hi[0::2]), (lo[1::2], hi[1::2]))
    return (lo, hi)


def gl_sum1(a):
    """Tree-sum along axis 1 (lanes) of a (r, n) gl pair -> (r, 1).

    Folds CONTIGUOUS halves (GL addition is exactly associative, so the
    changed summation order is bit-identical): the round-4 (r, n/2, 2)
    interleave paid a stride-2 lane gather relayout at EVERY of the
    log2(n) levels — the dominant cost of the evals phase."""
    lo, hi = a
    while lo.shape[1] > 1:
        n = lo.shape[1]
        if n % 2:
            lo = jnp.pad(lo, ((0, 0), (0, 1)))
            hi = jnp.pad(hi, ((0, 0), (0, 1)))
            n += 1
        h = n // 2
        lo, hi = gl.add((lo[:, :h], hi[:, :h]), (lo[:, h:], hi[:, h:]))
    return (lo, hi)


# ---------------------------------------------------------------------------
# domain constants (x_n, x_ext, zerofier-inverse rows) built ON DEVICE
#
# Round 2 built these as numpy arrays and device_put them per prove() —
# ~70 MB for a 2^20 machine, several seconds through a remote-device
# tunnel.  Here the host supplies only O(bits) scalars (doubling powers,
# the periodic zh pattern, zerofier roots) and one jitted program expands
# them on device.


def _dev_powers_doubling(p2, bits: int):
    """1, g, g², …, g^{2^bits−1} as a (2^bits,) pair from the doubling
    scalars p2 = pair (bits,) holding g^(2^k)."""
    acc = (jnp.ones((1,), jnp.uint32), jnp.zeros((1,), jnp.uint32))
    for k in range(bits):
        nxt = gl.mul(acc, (p2[0][k], p2[1][k]))
        acc = (
            jnp.concatenate([acc[0], nxt[0]]),
            jnp.concatenate([acc[1], nxt[1]]),
        )
    return acc


@functools.lru_cache(maxsize=None)
def _jit_domain_consts(n_bits: int, n_bits_ext: int, boundaries: tuple):
    """boundaries: tuple of ("everyRow",) | ("firstRow",) | ("lastRow",) |
    ("everyFrame", offsetMin, offsetMax).  Returns a jitted
    (wn2, wext2, zh_pat, roots) -> (x_n, x_ext, Zi) program."""
    n, ext_n = 1 << n_bits, 1 << n_bits_ext
    extend = 1 << (n_bits_ext - n_bits)

    def body(wn2, wext2, zh_pat, roots):
        x_n = _dev_powers_doubling(wn2, n_bits)
        xe = _dev_powers_doubling(wext2, n_bits_ext)
        x_ext = gl.mul_const(xe, gl64.SHIFT_INT)
        zh_row = (
            jnp.tile(zh_pat[0], ext_n // extend),
            jnp.tile(zh_pat[1], ext_n // extend),
        )
        zi_lo, zi_hi = [], []
        ri = 0
        for b in boundaries:
            if b[0] == "everyRow":
                row = zh_row
            elif b[0] in ("firstRow", "lastRow"):
                r = (roots[0][ri], roots[1][ri])
                ri += 1
                row = gl_inv(gl.mul(gl.sub(x_ext, r), zh_row))
            else:  # everyFrame: product of (x - root), NOT inverted
                n_roots = b[1] + b[2]
                row = (jnp.ones((ext_n,), jnp.uint32),
                       jnp.zeros((ext_n,), jnp.uint32))
                for _ in range(n_roots):
                    r = (roots[0][ri], roots[1][ri])
                    ri += 1
                    row = gl.mul(row, gl.sub(x_ext, r))
            zi_lo.append(row[0])
            zi_hi.append(row[1])
        zi = (jnp.stack(zi_lo, axis=0), jnp.stack(zi_hi, axis=0))
        return x_n, x_ext, zi

    return jax.jit(body)


def domain_consts(n_bits: int, n_bits_ext: int, boundaries_list):
    """Host wrapper: normalize the boundary descriptors, build the tiny
    scalar inputs, run the device program.  Bit-exact with the numpy
    tables of ops/polutils.py (build_zh_inv / build_one_row_zerofier_inv /
    build_frame_zerofier_inv)."""
    n = 1 << n_bits
    key, roots = [], []
    for b in boundaries_list:
        name = b["name"]
        if name == "everyRow":
            key.append(("everyRow",))
        elif name == "firstRow":
            key.append(("firstRow",))
            roots.append(1)
        elif name == "lastRow":
            key.append(("lastRow",))
            roots.append(pow(gl64.w(n_bits), n - 1, gl64.P_INT))
        elif name == "everyFrame":
            key.append(("everyFrame", b["offsetMin"], b["offsetMax"]))
            for i in range(b["offsetMin"]):
                roots.append(pow(gl64.w(n_bits), i, gl64.P_INT))
            for i in range(b["offsetMax"]):
                roots.append(pow(gl64.w(n_bits), n - i - 1, gl64.P_INT))
        else:
            raise ValueError(f"Invalid boundary {name}")

    def dbl(g, bits):
        out = np.empty(bits, dtype=np.uint64)
        s = g
        for k in range(bits):
            out[k] = s
            s = (s * s) % gl64.P_INT
        return out

    extend_bits = n_bits_ext - n_bits
    sn = pow(gl64.SHIFT_INT, n, gl64.P_INT)
    zh_pat = gl64.inv(gl64.sub(
        gl64.mul(np.uint64(sn), gl64.powers(gl64.w(extend_bits), 1 << extend_bits)),
        np.uint64(1),
    ))
    fn = _jit_domain_consts(n_bits, n_bits_ext, tuple(key))
    return fn(
        gl.from_u64(dbl(gl64.w(n_bits), n_bits)),
        gl.from_u64(dbl(gl64.w(n_bits_ext), n_bits_ext)),
        gl.from_u64(zh_pat),
        gl.from_u64(np.asarray(roots or [0], dtype=np.uint64)),
    )


# ---------------------------------------------------------------------------
# DEEP evals + xDivXSubXi executors (cached per machine)

_EVALS_CACHE: dict = {}


def make_evals_executor(pil_info, stride: int, n_bits: int,
                        planar: bool = False):
    """One jitted program computing every evMap entry's opening evaluation:
    evals[k] = Σ_i pol_k[i·stride] · LEv_opening[i]  (the reference's row
    loop at stark_gen_helpers.js:250-264, as strided slices + vectorized
    extension muls + a tree reduction).  The LEv tables themselves
    (geometric series of xi per opening + iNTT, stark_gen_helpers.js:219-236)
    are built inside the same program from the xi^(2^k) doubling scalars.
    Inputs: sections (device pairs) and pows2 = pair (n_openings, n_bits, 3)."""
    from ..ops import ntt as ntt_ops
    from ..field import gl64

    key = (id(pil_info), stride, n_bits, planar)
    hit = _EVALS_CACHE.get(key)
    if hit is not None:
        return hit[0]

    ev_map = pil_info["evMap"]
    openings = list(pil_info["openingPoints"])
    cm_map = pil_info["cmPolsMap"]
    n = 1 << n_bits
    n_inv = pow(n, gl64.P_INT - 2, gl64.P_INT)

    def body(sections, pows2):
        lev_list = []
        for o in range(len(openings)):
            series = _f3_geometric_traced(pows2, o, n_bits)  # (3, N)
            if ntt_ops._planar_ok(n_bits):
                cp = ntt_ops._planar_ntt(series, n_bits, 3, True)
                coefs = cp if planar else (cp[0].T, cp[1].T)
            else:
                cp = ntt_ops._axis0_ntt(
                    (series[0].T, series[1].T), n_bits, True
                )
                coefs = (cp[0].T, cp[1].T) if planar else cp
            # planar: (3, N); row-major: (N, 3)
            lev_list.append(gl.mul_const(coefs, n_inv))

        # decimate each used section ONCE — the per-entry strided slices
        # each paid a full-lane gather relayout of the same section
        dec = {}
        if planar:
            for ev in ev_map:
                sec = ("const" if ev["type"] == "const"
                       else f"cm{cm_map[ev['id']]['stage']}")
                if sec not in dec:
                    slo, shi = sections[sec]
                    dec[sec] = (slo[:, ::stride], shi[:, ::stride])

        out_lo, out_hi = [], []
        for ev in ev_map:
            if ev["type"] == "const":
                sec, off, dim = "const", ev["id"], 1
            elif ev["type"] == "cm":
                p = cm_map[ev["id"]]
                sec, off, dim = f"cm{p['stage']}", p["stagePos"], p["dim"]
            else:
                raise ValueError(f"Invalid ev type: {ev['type']}")
            slo, shi = sections[sec]
            lev = lev_list[openings.index(ev["prime"])]
            if planar:
                dlo, dhi = dec[sec]
                if dim == 1:
                    col = (dlo[off, None, :], dhi[off, None, :])
                    prod = gl.mul(lev, col)  # (3, N) × (1, N)
                else:
                    col = (dlo[off : off + 3, :], dhi[off : off + 3, :])
                    prod = jf3.mul(col, lev)
                s = gl_sum1(prod)  # (3, 1)
                acc = (s[0].T, s[1].T)  # (1, 3)
            else:
                if dim == 1:
                    col = (slo[::stride, off, None], shi[::stride, off, None])
                    prod = gl.mul(lev, col)  # base × ext, componentwise
                else:
                    col = (slo[::stride, off : off + 3], shi[::stride, off : off + 3])
                    prod = f3_mul_rows(col, lev)
                acc = gl_sum0(prod)  # (1, 3)
            out_lo.append(acc[0])
            out_hi.append(acc[1])
        return (jnp.concatenate(out_lo, axis=0), jnp.concatenate(out_hi, axis=0))

    fn = jax.jit(body)
    _EVALS_CACHE[key] = (fn, pil_info)
    return fn


@functools.lru_cache(maxsize=None)
def _jit_xdiv(n_openings: int):
    """xDivXSubXi table (stark_gen_helpers.js:292-323): per opening,
    x/(x − xi·w^opening) over the extended coset — the batch inverse
    replaced by the closed-form cubic inverse (elementwise, VPU).
    Inputs: x (1, extN) base pair, xi3 (n_openings, 3) pair.
    Output: (extN, n_openings, 3) pair (the TAC executor layout)."""

    def body(x, xi3):
        vs_lo, vs_hi = [], []
        for i in range(n_openings):
            xi = (xi3[0][i][:, None], xi3[1][i][:, None])  # (3, 1)
            den = jf3.sub(x, xi)  # (3, extN)
            den_inv = f3_inv(den)
            v = jf3.mul(den_inv, x)  # (3, extN)
            vs_lo.append(v[0].T)  # (extN, 3)
            vs_hi.append(v[1].T)
        return (jnp.stack(vs_lo, axis=1), jnp.stack(vs_hi, axis=1))

    return jax.jit(body)


def compute_xdiv(x_pair, xi_list):
    """xi_list: host [(3,) u64] per opening point."""
    n_openings = len(xi_list)
    xi3 = gl.from_u64(np.asarray(xi_list, dtype=np.uint64).reshape(n_openings, 3))
    x = (x_pair[0][None, :], x_pair[1][None, :])
    return _jit_xdiv(n_openings)(x, xi3)


# ---------------------------------------------------------------------------
# device Merkle tree


@dataclasses.dataclass
class DeviceTree:
    """Poseidon-GL Merkle tree whose elements and digest levels stay on
    device; bit-identical shape to hash.merkle.MerkleTree (the reference's
    merklehash_p.js layout).  Only the root (4 u64) is pulled eagerly."""

    width: int
    height: int
    elements: tuple  # (lo, hi) pair (height, width) — or (width, height) planar
    levels: list  # [(lo, hi) (n, 4), ..., root (1, 4)] — planar: (4, n)
    planar: bool = False  # lanes-are-rows layout (planar commit pipeline)
    # uniform=True: every node of a level is the same digest (width-0
    # power-of-two trees), so each level is stored as ONE (1, 4) row and
    # gathers clamp their indices — materializing the broadcast levels
    # cost ~0.2 s per empty stage at 2^23
    uniform: bool = False

    @functools.cached_property
    def root(self) -> np.ndarray:
        r = gl.to_u64(self.levels[-1])
        return r[:, 0] if self.planar else r[0]


@functools.lru_cache(maxsize=None)
def _zero_digest_chain(height: int) -> np.ndarray:
    """Per-level digests of the all-zero-leaf tree (constant per height)."""
    from ..hash import poseidon_gl

    n_levels = height.bit_length()  # height = 2^k -> k+1 levels
    digests = np.zeros((n_levels, 4), dtype=np.uint64)
    for l in range(1, n_levels):
        digests[l] = poseidon_gl.hash_n(
            np.concatenate([digests[l - 1], digests[l - 1]])
        )
    return digests


def merkelize(elements, width: int, height: int, split: bool = False,
              planar: bool = False) -> DeviceTree:
    """elements: (lo, hi) pair (height, width) on device — or (width,
    height) with planar=True (the planar commit pipeline: LDE output and
    tree levels keep the row index on the lane axis, so the leaf sponge
    absorbs row slices and no transposes enter the Poseidon kernel)."""
    if planar and width > 0:
        levels = jax_poseidon.merkle_levels_planar(elements, width, height, split)
        return DeviceTree(width=width, height=height, elements=elements,
                          levels=levels, planar=True)
    if planar:  # zero-width planar trees reuse the uniform row-major build
        elements = (elements[0].T, elements[1].T)
    if width == 0 and height & (height - 1) == 0:
        # degenerate tree over empty rows at power-of-two height: every
        # node of a level is the SAME digest (leaf digest = zero row, no
        # odd-padding breaks uniformity), so one pair-hash per level
        # suffices.  The per-level digests are a tiny host chain; the full
        # broadcast levels materialize ON DEVICE in one jitted program —
        # round 2 uploaded ~2·height·32 B of identical host bytes through
        # the device tunnel, which alone cost seconds per empty stage.
        z = np.zeros((height, 0), dtype=np.uint64)
        chain = gl.from_u64(_zero_digest_chain(height))
        # one (1, 4) row per level; gathers clamp indices (uniform=True)
        n_levels = height.bit_length()
        levels = [
            (chain[0][l : l + 1], chain[1][l : l + 1])
            for l in range(n_levels)
        ]
        return DeviceTree(
            width=0, height=height, elements=gl.from_u64(z),
            levels=levels, uniform=True,
        )
    if width == 0:
        from ..hash import merkle as merkle_host

        z = np.zeros((height, 0), dtype=np.uint64)
        t = merkle_host.merkelize(z, 0, height, split_linear_hash=split, backend="np")
        return DeviceTree(
            width=0, height=height, elements=gl.from_u64(z),
            levels=[gl.from_u64(l) for l in t.levels],
        )
    levels = jax_poseidon.merkle_levels(elements, width, height, split)
    return DeviceTree(width=width, height=height, elements=elements, levels=levels)


def gather_group_proofs(tree: DeviceTree, idxs):
    """Returns [(values, [sibling digests])] per idx, matching
    merkle.get_group_proof (merklehash_p.js:142-168) bit-exactly."""
    return gather_group_proofs_multi([tree], [idxs])[0]


def _tree_flat_gather(elements, levels, idxs, planar: bool,
                      uniform: bool = False):
    """Values row + sibling path per query of one tree, as a flat
    (Q, width + 4·n_levels) pair (traced building block).  Planar trees
    gather lanes (axis 1) and transpose the tiny (span, Q) result — Q is
    nQueries, so the transpose is negligible next to the take.  Uniform
    trees store one row per level; every index maps to it."""
    ax = 1 if planar else 0
    parts_lo = [jnp.take(elements[0], idxs, axis=ax)]
    parts_hi = [jnp.take(elements[1], idxs, axis=ax)]
    cur = idxs
    for lvl in levels:
        sib_idx = (cur ^ 1) if not uniform else jnp.zeros_like(cur)
        parts_lo.append(jnp.take(lvl[0], sib_idx, axis=ax))
        parts_hi.append(jnp.take(lvl[1], sib_idx, axis=ax))
        cur = cur >> 1
    cat_ax = 0 if planar else 1
    lo = jnp.concatenate(parts_lo, axis=cat_ax)
    hi = jnp.concatenate(parts_hi, axis=cat_ax)
    if planar:
        lo, hi = lo.T, hi.T
    return (lo, hi)


@functools.partial(jax.jit, static_argnums=2)
def _jit_gather_multi(trees, idx_arrays, planar_flags):
    """ALL query gathers of ALL trees in ONE device program returning ONE
    flat (Q, Σ(width + 4·n_levels)) pair — a single dispatch and a single
    host transfer for the whole queries phase (the per-tree version cost
    one tunnel round-trip per tree: ~10 trees ≈ 0.45 s of the round-3
    2^20 prove)."""
    outs = [
        _tree_flat_gather(elements, levels, idxs, pl, un)
        for (elements, levels), idxs, (pl, un)
        in zip(trees, idx_arrays, planar_flags)
    ]
    return (
        jnp.concatenate([o[0] for o in outs], axis=1),
        jnp.concatenate([o[1] for o in outs], axis=1),
    )


def gather_group_proofs_multi(trees, idxs_list):
    """Batched gather_group_proofs over several DeviceTrees (one device
    program + one host transfer); returns one [(values, proof)] list per
    tree, bit-identical to per-tree gathers."""
    args = tuple(
        (t.elements, tuple(t.levels[:-1])) for t in trees
    )
    idx_arrays = tuple(
        jnp.asarray(np.asarray(i, dtype=np.int32)) for i in idxs_list
    )
    planar_flags = tuple((t.planar, t.uniform) for t in trees)
    flat_np = gl.to_u64(_jit_gather_multi(args, idx_arrays, planar_flags))
    results = []
    off = 0
    for t, idxs in zip(trees, idxs_list):
        w = t.width
        n_levels = len(t.levels) - 1
        span = w + 4 * n_levels
        out = []
        for qi in range(len(idxs)):
            row = flat_np[qi, off : off + span]
            proof = [
                row[w + 4 * l : w + 4 * (l + 1)].copy()
                for l in range(n_levels)
            ]
            out.append((row[:w].copy(), proof))
        results.append(out)
        off += span
    return results
