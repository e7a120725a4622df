"""Polynomial utilities: Horner eval, zerofier-inverse tables, lookup
multiset halves, grand product/sum columns.

Semantics mirror /root/reference/src/helpers/polutils.js (evalPol :9-16,
buildZhInv :39-55, buildOneRowZerofierInv :57-71, buildFrameZerofierInv
:74-102, calculateH1H2 :105-130, calculateZ :132-145, calculateS :147-164),
vectorized over numpy.  Zerofier tables are built on the extended (coset)
domain; grand product/sum are prefix scans over extension values.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64, vf3, f3


def pol_mul_axi(p, init, acc):
    """p[i] *= init·acc^i in place semantics (polutils.js:1-7); returns the
    scaled list (scalar f3 elements)."""
    r = init
    out = []
    for c in p:
        out.append(f3.mul(c, r))
        r = f3.mul(r, acc)
    return out


def extend_pol(p: np.ndarray, extend_bits: int = 1, shift: bool = True) -> np.ndarray:
    """Small LDE of a column (polutils.js:18-30): iNTT → scale by shift^i
    (or w[extendBits]^i) → zero-pad → NTT.  p is (N,) or (N,3) u64."""
    from . import ntt as ntt_ops

    n = p.shape[0]
    bits = n.bit_length() - 1
    coefs = ntt_ops.ntt_host_u64(p, bits, inverse=True)
    acc = gl64.SHIFT_INT if shift else gl64.w(extend_bits)
    scale = gl64.powers(acc, n)
    if p.ndim == 2:
        coefs = gl64.mul(coefs, scale[:, None])
        padded = np.zeros((n << extend_bits, p.shape[1]), dtype=np.uint64)
    else:
        coefs = gl64.mul(coefs, scale)
        padded = np.zeros(n << extend_bits, dtype=np.uint64)
    padded[:n] = coefs
    return ntt_ops.ntt_host_u64(padded, bits + extend_bits)


def eval_pol(p, x):
    """Horner; p is a list of scalar f3 elements (int or 3-tuple)."""
    if len(p) == 0:
        return 0
    res = p[-1]
    for c in reversed(p[:-1]):
        res = f3.add(f3.mul(res, x), c)
    return res


def build_zh_inv(n_bits: int, n_bits_ext: int) -> np.ndarray:
    """1/(x^N - 1) on the shifted extended domain, periodic pattern."""
    extend_bits = n_bits_ext - n_bits
    ext_n = 1 << n_bits_ext
    extend = 1 << extend_bits
    sn = pow(gl64.SHIFT_INT, 1 << n_bits, gl64.P_INT)
    w = gl64.powers(gl64.w(extend_bits), extend)
    xn = gl64.mul(np.uint64(sn), w)
    zh = gl64.sub(xn, np.uint64(1))
    zh_inv = gl64.inv(zh)
    return np.tile(zh_inv, ext_n // extend)


def build_one_row_zerofier_inv(zh_inv: np.ndarray, n_bits: int, n_bits_ext: int, row_index: int) -> np.ndarray:
    """1/((x - w^row)·ZhInv(x)) over the shifted extended domain."""
    ext_n = 1 << n_bits_ext
    root = pow(gl64.w(n_bits), row_index, gl64.P_INT)
    x = gl64.mul(np.uint64(gl64.SHIFT_INT), gl64.powers(gl64.w(n_bits_ext), ext_n))
    zh = gl64.mul(gl64.sub(x, np.uint64(root)), zh_inv)
    return gl64.inv(zh)


def build_frame_zerofier_inv(zh_inv: np.ndarray, n_bits: int, n_bits_ext: int, frame) -> np.ndarray:
    """Π (x - root_j) for the frame's excluded rows (NOT inverted — matches
    buildFrameZerofierInv which stores the product itself)."""
    ext_n = 1 << n_bits_ext
    n = 1 << n_bits
    roots = []
    for i in range(frame["offsetMin"]):
        roots.append(pow(gl64.w(n_bits), i, gl64.P_INT))
    for i in range(frame["offsetMax"]):
        roots.append(pow(gl64.w(n_bits), n - i - 1, gl64.P_INT))
    x = gl64.mul(np.uint64(gl64.SHIFT_INT), gl64.powers(gl64.w(n_bits_ext), ext_n))
    zi = np.ones(ext_n, dtype=np.uint64)
    for r in roots:
        zi = gl64.mul(zi, gl64.sub(x, np.uint64(r)))
    return zi


def calculate_h1h2(f, t):
    """Plookup multiset halves (polutils.js:105-130).

    f, t are length-N arrays of scalar values (ints; dim-1 only in PIL1).
    Returns (h1, h2).  Duplicate t values take the LAST index, as the JS
    idx_t assignment does; the merged list is sorted stably by index.
    """
    idx_t = {}
    s = []
    for i, v in enumerate(t):
        v = int(v) if not isinstance(v, tuple) else v
        idx_t[v] = i
        s.append((v, i))
    for i, v in enumerate(f):
        v = int(v) if not isinstance(v, tuple) else v
        if v not in idx_t:
            raise ValueError(f"Number not included: w={i}, value={v}")
        s.append((v, idx_t[v]))
    s.sort(key=lambda p: p[1])  # python sort is stable, like V8's
    n = len(f)
    h1 = [s[2 * i][0] for i in range(n)]
    h2 = [s[2 * i + 1][0] for i in range(n)]
    return h1, h2


def _prefix_mul(vals: np.ndarray) -> np.ndarray:
    """Inclusive prefix product of extension values, Hillis-Steele
    (O(N log N) vectorized passes)."""
    res = vals.copy()
    n = res.shape[0]
    shift = 1
    while shift < n:
        upd = vf3.mul(res[shift:], res[:-shift])
        res[shift:] = upd
        shift <<= 1
    return res


def calculate_z(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Grand product: z[0]=1, z[i]=z[i-1]·num[i-1]/den[i-1]
    (polutils.js:132-145).  num/den are (N,) or (N,3) arrays."""
    ratio = vf3.mul(num, vf3.inv(den))
    ratio3 = vf3.as3(ratio)
    shifted = np.empty_like(ratio3)
    shifted[0] = np.array([1, 0, 0], dtype=np.uint64)
    shifted[1:] = ratio3[:-1]
    return _prefix_mul(shifted)


def calculate_s(num, den: np.ndarray) -> np.ndarray:
    """Grand sum: s[i] = Σ_{k≤i} num/den[k] (polutils.js:147-164);
    num is a scalar (shared numerator)."""
    vals = vf3.as3(vf3.mul(vf3.from_scalar(num), vf3.inv(den)))
    if vals.ndim == 1:
        vals = np.broadcast_to(vals, den.shape[:1] + (3,)).copy()
    # prefix sum via Hillis-Steele with gl64.add
    res = vals.copy()
    n = res.shape[0]
    shift = 1
    while shift < n:
        res[shift:] = gl64.add(res[shift:], res[:-shift])
        shift <<= 1
    return res
