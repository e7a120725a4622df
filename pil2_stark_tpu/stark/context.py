"""Prover context: trace/extended buffers, zerofier tables, symbol tracking.

Mirrors initProverStark (/root/reference/src/stark/stark_gen_helpers.js:18-166)
with numpy (row-major (rows, cols)) buffers instead of interleaved
BigBuffers, and the symbol-readiness tracker of
src/prover/symbols_helpers.js:3-120.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..ops import polutils
from ..hash.mh import build_mh, MerkleHashGL


class ProverCtx:
    def __init__(self, pil_info, expressions_info, const_pols, const_tree, debug=False, backend="numpy", mesh=None):
        self.prover = "stark"
        self.pil_info = pil_info
        self.expressions_info = expressions_info
        self.debug = debug
        self.const_tree = const_tree
        self.trees = {}
        self.backend = backend
        self.device = backend == "device" and not debug
        self.mesh = mesh if self.device else None
        self.planar = False  # set True by the device init (single-chip)
        if mesh is not None and not self.device:
            raise ValueError("mesh requires backend='device'")

        ss = pil_info["starkStruct"]
        self.n_bits = ss["nBits"]
        self.N = 1 << self.n_bits
        self.tmp = []
        self.challenges = []
        self.challenges_fri_steps = []
        self.publics = [None] * pil_info["nPublics"]
        self.subproof_values = [0] * pil_info.get("nSubproofValues", 0)
        self.evals = []
        self.errors = []

        self.calculated = _init_calculated(pil_info)

        n_constants = pil_info["nConstants"]
        self.const_n = np.asarray(const_pols, dtype=np.uint64).reshape(self.N, n_constants)

        self.buffers = {}
        for i in range(pil_info["nStages"]):
            stage = i + 1
            w = pil_info["mapSectionsN"][f"cm{stage}"]
            self.buffers[f"cm{stage}_n"] = np.zeros((self.N, w), dtype=np.uint64)

        # x_n / x_ext host power tables are LAZY: the device backend
        # builds its own on-chip (device.domain_consts) and never touches
        # these, and the host log-doubling over 2^20+ rows costs seconds
        self._x_n = None
        self._x_ext = None

        for i in range(n_constants):
            self.calculated["const"][i] = True

        if not debug:
            self.n_bits_ext = ss["nBitsExt"]
            self.ext_N = 1 << self.n_bits_ext
            self.extend_bits = self.n_bits_ext - self.n_bits
            q_stage = pil_info["nStages"] + 1

            self.const_ext = const_tree.elements  # (extN, nConstants)
            if not self.device:
                # host extended-domain buffers; in device mode these live as
                # u32 limb pairs on the TPU (ctx.dsections / dq / df)
                for i in range(pil_info["nStages"] + 1):
                    stage = i + 1
                    w = pil_info["mapSectionsN"][f"cm{stage}"]
                    self.buffers[f"cm{stage}_ext"] = np.zeros((self.ext_N, w), dtype=np.uint64)
                self.q_ext = np.zeros((self.ext_N, pil_info["qDim"]), dtype=np.uint64)
                self.f_ext = np.zeros((self.ext_N, 3), dtype=np.uint64)

            boundaries = pil_info["boundaries"]
            if not self.device:
                # host zerofier tables; the device backend builds these ON
                # the device from O(bits) scalars (device.domain_consts)
                zh_inv = polutils.build_zh_inv(self.n_bits, self.n_bits_ext)
                self.Zi_ext = np.zeros((len(boundaries), self.ext_N), dtype=np.uint64)
                for i, b in enumerate(boundaries):
                    if b["name"] == "everyRow":
                        self.Zi_ext[i] = zh_inv
                    elif b["name"] == "firstRow":
                        self.Zi_ext[i] = polutils.build_one_row_zerofier_inv(
                            zh_inv, self.n_bits, self.n_bits_ext, 0
                        )
                    elif b["name"] == "lastRow":
                        self.Zi_ext[i] = polutils.build_one_row_zerofier_inv(
                            zh_inv, self.n_bits, self.n_bits_ext, self.N - 1
                        )
                    elif b["name"] == "everyFrame":
                        self.Zi_ext[i] = polutils.build_frame_zerofier_inv(
                            zh_inv, self.n_bits, self.n_bits_ext, b
                        )
                    else:
                        raise ValueError(f"Invalid boundary {b['name']}")

            n_openings = len(pil_info["openingPoints"])
            if not self.device:
                self.xDivXSubXi_ext = np.zeros((self.ext_N, n_openings, 3), dtype=np.uint64)

            if self.device:
                from ..field import jax_gl as _jgl

                if ss.get("verificationHashType", "GL") != "GL":
                    raise ValueError(
                        "backend='device' supports GL hash trees only "
                        "(the BN128 tier runs at small recursion sizes on host)"
                    )

                from . import device as _dev

                # x_n / x_ext / Zi rows expand on device from O(bits)
                # scalars — no bulk host->device table upload
                dx_n, dx_ext, dZi = _dev.domain_consts(
                    self.n_bits, self.n_bits_ext, boundaries
                )
                # const uploads are cached on the (long-lived) const tree:
                # re-proving with the same setup must not re-ride the tunnel
                cache = getattr(const_tree, "_dev_pairs", None)
                if cache is None:
                    cache = {}
                    try:
                        const_tree._dev_pairs = cache
                    except AttributeError:
                        pass
                # single-chip device proofs run the planar commit pipeline
                # (sections/trees keep rows on the lane axis end-to-end);
                # the mesh path stays row-major (sharded kernels' layout)
                self.planar = self.mesh is None
                shard_key = (
                    id(self.mesh) if self.mesh is not None else None,
                    self.planar,
                )
                dconst = cache.get(shard_key)
                if dconst is None:
                    if self.planar:
                        dconst = {
                            "n": _jgl.from_u64(
                                np.ascontiguousarray(self.const_n.T)),
                            "ext": _jgl.from_u64(
                                np.ascontiguousarray(self.const_ext.T)),
                        }
                    else:
                        dconst = {
                            "n": _jgl.from_u64(self.const_n),
                            "ext": _jgl.from_u64(self.const_ext),
                        }
                    cache[shard_key] = dconst

                if self.mesh is not None:
                    import jax
                    from jax.sharding import NamedSharding, PartitionSpec as _P

                    axes = tuple(self.mesh.axis_names)
                    self.row_sharding = NamedSharding(self.mesh, _P(axes, None))
                    rows1d = NamedSharding(self.mesh, _P(axes))

                    def _put(pair, sharding):
                        return (
                            jax.device_put(pair[0], sharding),
                            jax.device_put(pair[1], sharding),
                        )

                    if dconst.get("sharded") is None:
                        dconst["sharded"] = {
                            "n": _put(dconst["n"], self.row_sharding),
                            "ext": _put(dconst["ext"], self.row_sharding),
                        }
                    self.dsections = {
                        "n": {"const": dconst["sharded"]["n"]},
                        "ext": {"const": dconst["sharded"]["ext"]},
                    }
                    self.dx = {
                        "n": _put(dx_n, rows1d),
                        "ext": _put(dx_ext, rows1d),
                    }
                    # Zi is (nBoundaries, extN): shard the domain axis
                    self.dZi = _put(
                        dZi, NamedSharding(self.mesh, _P(None, axes))
                    )
                else:
                    self.row_sharding = None
                    self.dsections = {
                        "n": {"const": dconst["n"]},
                        "ext": {"const": dconst["ext"]},
                    }
                    self.dx = {"n": dx_n, "ext": dx_ext}
                    self.dZi = dZi
                self.dxdiv = None
                self.dq = None
                self.df = None

        self.mh = build_mh(ss) if not debug else MerkleHashGL()
        self.transcript = self.mh.new_transcript()
        self.fri_pol = {}
        self.fri_proof = {}
        self.fri_trees = {}

    # -- addressing ---------------------------------------------------------

    @property
    def x_n(self) -> np.ndarray:
        if self._x_n is None:
            self._x_n = gl64.powers(gl64.w(self.n_bits), self.N)
        return self._x_n

    @property
    def x_ext(self) -> np.ndarray:
        if self._x_ext is None:
            self._x_ext = gl64.mul(
                np.uint64(gl64.SHIFT_INT),
                gl64.powers(gl64.w(self.n_bits_ext), self.ext_N),
            )
        return self._x_ext

    def buffer(self, section: str, dom: str) -> np.ndarray:
        if section == "const":
            return self.const_n if dom == "n" else self.const_ext
        return self.buffers[f"{section}_{dom}"]

    def get_pol_ref(self, pol_id: int, dom: str, is_fixed=False):
        """prover_helpers.js:305-321 getPolRef."""
        deg = self.ext_N if dom == "ext" else self.N
        if is_fixed:
            buf = self.buffer("const", dom)
            return {
                "buffer": buf,
                "deg": deg,
                "offset": pol_id,
                "dim": 1,
                "stage": "const",
            }
        p = self.pil_info["cmPolsMap"][pol_id]
        section = f"cm{p['stage']}"
        return {
            "buffer": self.buffer(section, dom),
            "deg": deg,
            "offset": p["stagePos"],
            "dim": p["dim"],
            "stage": section,
        }

    def get_pol(self, pol_id: int, dom: str, is_fixed=False) -> np.ndarray:
        p = self.get_pol_ref(pol_id, dom, is_fixed)
        if p["dim"] == 1:
            return p["buffer"][:, p["offset"]].copy()
        return p["buffer"][:, p["offset"] : p["offset"] + p["dim"]].copy()

    def set_pol(self, pol_id: int, values, dom: str) -> None:
        p = self.get_pol_ref(pol_id, dom)
        arr = _to_array(values, p["dim"])
        if p["dim"] == 1:
            p["buffer"][:, p["offset"]] = arr
        else:
            p["buffer"][:, p["offset"] : p["offset"] + p["dim"]] = arr
        self.calculated["cm"][pol_id] = True

    # -- symbol tracking (symbols_helpers.js) -------------------------------

    def is_symbol_calculated(self, ref) -> bool:
        if ref["op"] == "tmp":
            return True
        return self.calculated[ref["op"]][ref["id"]]

    def set_symbol_calculated(self, ref) -> None:
        if ref["op"] == "tmp":
            return
        self.calculated[ref["op"]][ref["id"]] = True

    def stage_symbols_missing(self, stage: int) -> int:
        missing = 0
        for i, p in enumerate(self.pil_info["cmPolsMap"]):
            if p["stage"] != stage or p.get("imPol"):
                continue
            if not self.calculated["cm"][i]:
                missing += 1
        for i, c in enumerate(self.pil_info["challengesMap"]):
            if c["stage"] != stage:
                continue
            if not self.calculated["challenge"][i]:
                missing += 1
        if stage == 1:
            for i in range(len(self.pil_info["constPolsMap"])):
                if not self.calculated["const"][i]:
                    missing += 1
            for i in range(self.pil_info["nPublics"]):
                if not self.calculated["public"][i]:
                    missing += 1
        if stage == self.pil_info["nStages"]:
            for i in range(self.pil_info.get("nSubproofValues", 0)):
                if not self.calculated["subproofValue"][i]:
                    missing += 1
        return missing


def _init_calculated(pil_info):
    return {
        "public": [False] * pil_info["nPublics"],
        "const": [False] * pil_info["nConstants"],
        "subproofValue": [False] * pil_info.get("nSubproofValues", 0),
        "challenge": [False] * len(pil_info["challengesMap"]),
        "cm": [False] * len(pil_info["cmPolsMap"]),
    }


def _to_array(values, dim) -> np.ndarray:
    """Accept list of scalars / tuples or numpy arrays; promote dim-1
    entries of a dim-3 pol to (v, 0, 0) (prover_helpers.js setPol)."""
    if isinstance(values, np.ndarray):
        if dim == 3 and values.ndim == 1:
            out = np.zeros((values.shape[0], 3), dtype=np.uint64)
            out[:, 0] = values
            return out
        return values.astype(np.uint64, copy=False)
    n = len(values)
    if dim == 1:
        return np.array([int(v) % gl64.P_INT for v in values], dtype=np.uint64)
    out = np.zeros((n, 3), dtype=np.uint64)
    for i, v in enumerate(values):
        if isinstance(v, (tuple, list)):
            out[i] = [int(x) % gl64.P_INT for x in v]
        else:
            out[i, 0] = int(v) % gl64.P_INT
    return out
