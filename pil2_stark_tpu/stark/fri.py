"""FRI low-degree test: fold, query extraction, verification.

Mirrors /root/reference/src/stark/fri.js: fold(step) groups the domain by
the next step size, per group iFFT(nX) + coset de-scale (shiftInv squared
per prior reduction) + Horner eval at the fold challenge; non-final steps
re-Merkelize the transposed groups 3-wide; queries walk the trees with
index folding q %= 2^nBits[step]; verify recomputes the fold point per
query and checks the final polynomial degree bound via iFFT zero-coefs.

The fold is vectorized: the per-group iFFTs are one batched NTT over groups
(columns = groups), the Horner eval a vectorized extension scan.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64, f3, vf3
from ..hash import merkle
from ..hash.mh import MerkleHashGL
from ..ops import ntt as ntt_ops


def _log2(n):
    return n.bit_length() - 1


class FRI:
    def __init__(self, stark_struct, mh=None, planar=False):
        self.in_n_bits = stark_struct["nBitsExt"]
        self.max_deg_n_bits = stark_struct["nBits"]
        self.n_queries = stark_struct["nQueries"]
        self.steps = stark_struct["steps"]
        self.mh = mh if mh is not None else MerkleHashGL(
            stark_struct.get("splitLinearHash", False)
        )
        # planar device folds: pol pairs are (3, n) limb planes and step
        # trees build planar — (n, 3) minor-dim-3 arrays tile terribly on
        # TPU (lane padding), so the extension axis leads throughout
        self.planar = planar

    def fold(self, step: int, pol, challenge):
        """pol: (len, 3) u64 — or a device (lo, hi) limb pair of that shape,
        in which case the whole fold (grouped iNTT, coset de-scale, Horner
        eval, transposed re-merkelization) runs on device and the returned
        pol is a device pair (host array for the final step, whose values
        feed the transcript).  Returns {pol, tree, proof}."""
        if isinstance(pol, tuple):
            return self._fold_device(step, pol, challenge)
        pol_bits = _log2(pol.shape[0])
        if step == 0:
            assert pol_bits == self.in_n_bits, "Invalid polynomial size"
        assert (1 << pol_bits) == pol.shape[0]

        shift_inv = gl64.SHIFT_INV_INT
        if step > 0:
            for _ in range(self.steps[0]["nBits"] - self.steps[step - 1]["nBits"]):
                shift_inv = (shift_inv * shift_inv) % gl64.P_INT

        reduction_bits = pol_bits - self.steps[step]["nBits"]
        pol2_n = 1 << (pol_bits - reduction_bits)
        n_x = pol.shape[0] // pol2_n

        if step == 0:
            pol2 = pol.copy()
        else:
            # groups: ppar[i] = pol[i*pol2N + g]  -> shape (nX, pol2N, 3)
            grouped = pol.reshape(n_x, pol2_n, 3)
            # batched iNTT over the group axis: treat (pol2N*3) as columns
            bits = _log2(n_x)
            coefs = ntt_ops.ntt_host_u64(
                grouped.reshape(n_x, pol2_n * 3), bits, inverse=True
            ).reshape(n_x, pol2_n, 3)
            # coefs[k] *= sinv_g^k where sinv_g = shift_inv * wi^g
            wi = gl64.w_inv(pol_bits)
            sinv = gl64.mul(
                np.uint64(shift_inv),
                gl64.powers(wi, pol2_n),
            )  # (pol2N,) per-group base
            # per-group scale factors: sinv_g^k for k in 0..nX-1
            # scale[k, g] = sinv[g]^k
            scale = np.ones((n_x, pol2_n), dtype=np.uint64)
            for k in range(1, n_x):
                scale[k] = gl64.mul(scale[k - 1], sinv)
            coefs = _scale_coefs(coefs, scale)
            # Horner eval at challenge over k axis
            pol2 = _eval_groups(coefs, challenge)

        if step != len(self.steps) - 1:
            n_groups = 1 << self.steps[step + 1]["nBits"]
            group_size = (1 << self.steps[step]["nBits"]) // n_groups
            buff = _transposed_buffer(pol2, self.steps[step + 1]["nBits"])
            tree = self.mh.merkelize(buff, 3 * group_size, n_groups)
            proof = {"root": self.mh.root(tree)}
        else:
            tree = None
            proof = [vf3.to_scalar(pol2[i]) for i in range(pol2.shape[0])]

        return {"pol": pol2, "tree": tree, "proof": proof}

    def _fold_device(self, step: int, pol, challenge):
        """Device-resident fold: pol is a (len, 3) limb pair.  Same math as
        the host path (fri.js:22-81), with the per-group iFFT batched as one
        axis-0 device NTT and the Horner eval unrolled over the (small)
        group-coefficient axis."""
        from ..field import jax_gl as gl
        from . import device as dev

        pol_bits = _log2(pol[0].shape[1 if self.planar else 0])
        if step == 0:
            assert pol_bits == self.in_n_bits, "Invalid polynomial size"

        shift_inv = gl64.SHIFT_INV_INT
        if step > 0:
            for _ in range(self.steps[0]["nBits"] - self.steps[step - 1]["nBits"]):
                shift_inv = (shift_inv * shift_inv) % gl64.P_INT

        reduction_bits = pol_bits - self.steps[step]["nBits"]
        pol2_n = 1 << (pol_bits - reduction_bits)
        n_x = pol[0].shape[0] // pol2_n

        if step == 0:
            pol2 = pol
        else:
            ch = gl.from_u64(
                np.asarray(f3.as3(challenge), dtype=np.uint64).reshape(3, 1)
            )
            # the de-scale table is static per (shape, step): it rides the
            # trace as an O(pol2_n) constant expanded on device — the old
            # path built the full (n_x, pol2_n) table on host and uploaded
            # it per fold (one tunnel round-trip each, ~64 ms apiece)
            pol2 = _jit_fold_eval(pol_bits, pol2_n, shift_inv,
                                  self.planar)(pol, ch)

        if step != len(self.steps) - 1:
            n_groups = 1 << self.steps[step + 1]["nBits"]
            group_size = (1 << self.steps[step]["nBits"]) // n_groups
            if self.planar:
                buff = _transposed_device_planar(
                    pol2, self.steps[step + 1]["nBits"])
            else:
                buff = _transposed_device(pol2, self.steps[step + 1]["nBits"])
            tree = dev.merkelize(
                buff, 3 * group_size, n_groups, self.mh.split_linear_hash,
                planar=self.planar,
            )
            return {"pol": pol2, "tree": tree, "proof": {"root": tree.root}}

        # final step: the polynomial values feed the transcript — pull host
        pol2_np = gl.to_u64(pol2)
        if self.planar:
            pol2_np = np.ascontiguousarray(pol2_np.T)  # (m, 3) host layout
        proof = [vf3.to_scalar(pol2_np[i]) for i in range(pol2_np.shape[0])]
        return {"pol": pol2_np, "tree": None, "proof": proof}

    def proof_queries(self, proof, trees, fri_queries):
        """fri.js:83-105 — mutates fri_queries (index folding) like the JS.

        All (tree, folded-index) jobs are collected first and extracted in
        ONE batched gather (one device program + one host transfer on the
        device backend — the per-tree version paid a tunnel round-trip per
        tree), then scattered back into the per-step proof layout."""
        jobs = []  # (tree, idxs tuple)
        for step in range(len(self.steps)):
            if step == 0:
                for t in trees[step]:
                    jobs.append((t, tuple(fri_queries)))
            else:
                for i in range(len(fri_queries)):
                    fri_queries[i] = fri_queries[i] % (1 << self.steps[step]["nBits"])
                jobs.append((trees[step], tuple(fri_queries)))

        per_job = self._gather_jobs(jobs)

        k = 0
        for step in range(len(self.steps)):
            if step == 0:
                n_t = len(trees[step])
                per_tree = per_job[:n_t]
                k = n_t
                proof[step]["polQueries"] = [
                    [per_tree[t][qi] for t in range(n_t)]
                    for qi in range(len(fri_queries))
                ]
            else:
                proof[step]["polQueries"] = per_job[k]
                k += 1

    def _gather_jobs(self, jobs):
        from ..stark import device as _device

        out = [None] * len(jobs)
        dev_jobs = []
        for j, (t, i) in enumerate(jobs):
            if (getattr(self.mh, "hash_type", None) == "GL"
                    and isinstance(t, _device.DeviceTree)):
                dev_jobs.append(j)
            else:
                # host trees (e.g. the const tree) gather in numpy — cheap
                out[j] = self.mh.get_group_proofs(t, list(i))
        if dev_jobs:
            # ALL device trees in ONE program + ONE transfer, even when
            # host trees are interleaved (the all-or-nothing gate used to
            # degrade to one tunnel round-trip per tree whenever the host
            # const tree was in the mix — i.e. on every single-chip proof)
            res = _device.gather_group_proofs_multi(
                [jobs[j][0] for j in dev_jobs],
                [list(jobs[j][1]) for j in dev_jobs],
            )
            for j, r in zip(dev_jobs, res):
                out[j] = [[v, p] for v, p in r]
        return out

    def verify(self, fri_challenges, fri_queries, proof, check_query):
        """fri.js:107-174.  proof is the prover's fri list: [step0, step1,
        ..., lastPol]."""
        assert len(proof) == len(self.steps) + 1, "Invalid proof size"
        fri_queries = list(fri_queries)

        pol_bits = self.in_n_bits
        shift = gl64.SHIFT_INT
        for si in range(len(self.steps)):
            proof_item = proof[si]
            reduction_bits = pol_bits - self.steps[si]["nBits"]
            for i in range(self.n_queries):
                pgroup_e = check_query(proof_item["polQueries"][i], fri_queries[i])
                if not pgroup_e:
                    return False
                pgroup_c = _ifft_scalars(pgroup_e)
                sinv = f3.inv1(
                    (shift * pow(gl64.w(pol_bits), fri_queries[i], gl64.P_INT))
                    % gl64.P_INT
                )
                ev = _eval_pol_scalar(pgroup_c, f3.mul(fri_challenges[si], sinv))

                if si < len(self.steps) - 1:
                    next_n_groups = 1 << self.steps[si + 1]["nBits"]
                    group_idx = fri_queries[i] // next_n_groups
                    vals = proof[si + 1]["polQueries"][i][0]
                    got = (
                        int(vals[group_idx * 3]),
                        int(vals[group_idx * 3 + 1]),
                        int(vals[group_idx * 3 + 2]),
                    )
                    if not f3.eq(got, ev):
                        return False
                else:
                    if not f3.eq(_as_tuple(proof[si + 1][fri_queries[i]]), ev):
                        return False

            def check_query_next(query, idx, _si=si):
                ok = self.mh.verify_group_proof(
                    proof[_si + 1]["root"], query[1], idx, query[0]
                )
                if not ok:
                    return False
                return _split3(query[0])

            check_query = check_query_next

            pol_bits = self.steps[si]["nBits"]
            for _ in range(reduction_bits):
                shift = (shift * shift) % gl64.P_INT

            if si < len(self.steps) - 1:
                for i in range(len(fri_queries)):
                    fri_queries[i] = fri_queries[i] % (1 << self.steps[si + 1]["nBits"])

        last_pol_e = proof[-1]
        deg_shift = self.in_n_bits - self.max_deg_n_bits
        max_deg = 0 if pol_bits - deg_shift < 0 else 1 << (pol_bits - deg_shift)

        last_pol_c = _ifft_scalars([_as_tuple(v) for v in last_pol_e])
        for i in range(max_deg + 1, len(last_pol_c)):
            if not f3.is_zero(last_pol_c[i]):
                return False
        return True


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _jit_fold_eval(pol_bits: int, pol2_n: int, shift_inv: int,
                   planar: bool = False):
    """Jitted grouped-iNTT + de-scale + Horner for one fold shape.  The
    (n_x, pol2_n) de-scale table expands in-trace from an O(pol2_n)
    constant row (sinv^k rows via n_x-1 fused vector muls).

    planar=True: pol is a (3, n) limb pair and the result stays (3,
    pol2_n) — the (n, 3) minor-dim-3 layout lane-pads on TPU."""
    import jax
    import jax.numpy as jnp

    from ..field import jax_gl as gl
    from ..field import jax_f3 as jf3

    n = 1 << pol_bits
    n_x = n // pol2_n
    bits = _log2(n_x)

    wi = gl64.w_inv(pol_bits)
    sinv = gl64.mul(np.uint64(shift_inv), gl64.powers(wi, pol2_n))
    sinv_c = (
        (sinv & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        (sinv >> np.uint64(32)).astype(np.uint32),
    )

    def scale_rows():
        rows_lo = [jnp.full((pol2_n,), 1, jnp.uint32)]
        rows_hi = [jnp.zeros((pol2_n,), jnp.uint32)]
        sv = (jnp.asarray(sinv_c[0]), jnp.asarray(sinv_c[1]))
        acc = (rows_lo[0], rows_hi[0])
        for _ in range(1, n_x):
            acc = gl.mul(acc, sv)
            rows_lo.append(acc[0])
            rows_hi.append(acc[1])
        return (jnp.stack(rows_lo), jnp.stack(rows_hi))

    def body(pol, ch):
        g = (pol[0].reshape(n_x, pol2_n * 3), pol[1].reshape(n_x, pol2_n * 3))
        coefs = ntt_ops.intt(g, bits)
        clo = coefs[0].reshape(n_x, pol2_n, 3)
        chi = coefs[1].reshape(n_x, pol2_n, 3)
        scale = scale_rows()
        clo, chi = gl.mul(
            (clo, chi), (scale[0][:, :, None], scale[1][:, :, None])
        )
        # (n_x, 3, pol2_n) for the leading-dim extension ops
        clo = jnp.moveaxis(clo, 2, 1)
        chi = jnp.moveaxis(chi, 2, 1)
        res = (clo[n_x - 1], chi[n_x - 1])
        for k in range(n_x - 2, -1, -1):
            res = jf3.add(jf3.mul(res, ch), (clo[k], chi[k]))
        return (res[0].T, res[1].T)  # (pol2_n, 3)

    def body_planar(pol, ch):
        # (3, n) -> (3, n_x, pol2_n): group g of the row-major layout is
        # rows [g*pol2_n, (g+1)*pol2_n) — a contiguous LANE block here
        p3 = (pol[0].reshape(3, n_x, pol2_n), pol[1].reshape(3, n_x, pol2_n))
        # grouped iNTT along the n_x axis: (n_x, 3*pol2_n) rows
        g = (
            jnp.moveaxis(p3[0], 1, 0).reshape(n_x, 3 * pol2_n),
            jnp.moveaxis(p3[1], 1, 0).reshape(n_x, 3 * pol2_n),
        )
        coefs = ntt_ops.intt(g, bits)
        clo = coefs[0].reshape(n_x, 3, pol2_n)
        chi = coefs[1].reshape(n_x, 3, pol2_n)
        scale = scale_rows()
        clo, chi = gl.mul(
            (clo, chi), (scale[0][:, None, :], scale[1][:, None, :])
        )
        res = (clo[n_x - 1], chi[n_x - 1])  # (3, pol2_n)
        for k in range(n_x - 2, -1, -1):
            res = jf3.add(jf3.mul(res, ch), (clo[k], chi[k]))
        return res  # (3, pol2_n) planar

    return jax.jit(body_planar if planar else body)


def _transposed_device_planar(pol2, transpose_bits: int):
    """Planar twin of _transposed_device: (3, n) pol -> (3·group_size,
    n_groups) planar tree leaves (leaf j holds groups g at rows g*3+k)."""
    import jax.numpy as jnp

    n = pol2[0].shape[1]
    w = 1 << transpose_bits
    h = n // w
    return (
        jnp.transpose(pol2[0].reshape(3, h, w), (1, 0, 2)).reshape(3 * h, w),
        jnp.transpose(pol2[1].reshape(3, h, w), (1, 0, 2)).reshape(3 * h, w),
    )


def _transposed_device(pol2, transpose_bits: int):
    """Device twin of _transposed_buffer (fri.js getTransposedBuffer)."""
    import jax.numpy as jnp

    n = pol2[0].shape[0]
    w = 1 << transpose_bits
    h = n // w
    return (
        jnp.transpose(pol2[0].reshape(h, w, 3), (1, 0, 2)).reshape(w, h * 3),
        jnp.transpose(pol2[1].reshape(h, w, 3), (1, 0, 2)).reshape(w, h * 3),
    )


def _as_tuple(v):
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    arr = np.asarray(v)
    return (int(arr[0]), int(arr[1]), int(arr[2]))


def _split3(arr):
    return [
        (int(arr[i]), int(arr[i + 1]), int(arr[i + 2])) for i in range(0, len(arr), 3)
    ]


def _scale_coefs(coefs, scale):
    """coefs[k, g] *= scale[k, g] (extension × base)."""
    return vf3.mul(coefs, scale)


def _eval_groups(coefs, challenge):
    """Horner over the k axis: result[g] = Σ coefs[k, g]·challenge^k."""
    n_x = coefs.shape[0]
    ch = np.array(challenge, dtype=np.uint64)
    res = coefs[n_x - 1]
    for k in range(n_x - 2, -1, -1):
        res = vf3.add(vf3.mul(res, ch), coefs[k])
    return res


def _transposed_buffer(pol2, transpose_bits):
    """fri.js getTransposedBuffer:187-202: row i of the tree gets elements
    pol2[j*w + i] for j in 0..h-1, flattened 3-wide."""
    n = pol2.shape[0]
    w = 1 << transpose_bits
    h = n // w
    # reshape (h, w, 3) -> transpose to (w, h, 3) -> rows of 3h
    return pol2.reshape(h, w, 3).transpose(1, 0, 2).reshape(w, h * 3)


def _ifft_scalars(vals):
    """In-memory scalar iNTT over extension values (small n), matching
    F.ifft (fft.js:165-174).  Pure-numpy host path (no JIT)."""
    n = len(vals)
    arr = np.array([f3.as3(v) for v in vals], dtype=np.uint64)
    bits = _log2(n)
    out = ntt_ops.ntt_host_u64(arr.reshape(n, 3), bits, inverse=True)
    return [tuple(int(x) for x in out[i]) for i in range(n)]


def _eval_pol_scalar(p, x):
    if len(p) == 0:
        return 0
    res = p[-1]
    for c in reversed(p[:-1]):
        res = f3.add(f3.mul(res, x), c)
    return res
