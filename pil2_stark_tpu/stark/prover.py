"""STARK proof generation — the stage driver.

Mirrors /root/reference/src/prover/prover.js (proofGen) and the stage
implementations in src/stark/stark_gen_helpers.js: per Fiat-Shamir stage:
resolve hints to fixpoint → evaluate im-pols → LDE + Merkelize → absorb root
→ squeeze challenges; then Q split, DEEP evals (LEv iFFT trick), xDivXSubXi
batch-inverse table, FRI polynomial + folds + queries.

Bulk math runs on the JAX NTT/Poseidon kernels (ops.ntt, hash.merkle);
the transcript and per-stage control flow are host-side (tiny state),
exactly as the reference keeps them.
"""
from __future__ import annotations

import functools

import numpy as np

from ..field import gl64, f3, vf3
from ..field import jax_gl as _jgl
from ..utils.timing import PhaseTimer
from ..ops import ntt as ntt_ops
from ..ops import jax_tac
from . import device, expr_eval, hints
from .context import ProverCtx
from .fri import FRI


def prove(pil_info, expressions_info, const_pols, const_tree, inputs, debug=False, split_linear_hash=False, backend="numpy", logger=None, mesh=None, profile_dir=None, external_challenges=None):
    """proofGen (prover.js:7-131).  Returns {proof, publics, challenges,
    challengesFRISteps} or, in debug mode, the list of constraint errors.

    `inputs` = stage-1 witness columns as (N, nCm1basefield) array plus the
    publics values list: (cm1_values, publics).

    backend="jax" runs the big TAC programs (im-pols, composite constraint
    polynomial Q, FRI polynomial) as fused XLA computations on the device
    (ops.jax_tac) instead of the vectorized-numpy host path; results are
    bit-identical.

    backend="device" additionally keeps every extended-domain buffer on the
    device across the whole stage loop (stark/device.py): LDE, Merkle
    builds, the Q split, DEEP evals, xDivXSubXi and the FRI folds all run
    as XLA programs; host traffic is limited to per-stage witness uploads,
    roots, evals and query gathers.  Proofs are bit-identical to the host
    backends.

    mesh (backend="device" only): a jax.sharding.Mesh; the commit pipeline
    shards over ALL of its axes — a 1-axis ("x",) single-host mesh and a
    2-axis ("dcn", "ici") multi-host mesh (parallel/distributed.py) both
    work unchanged, collectives riding the hierarchy in mesh order.  The
    commit pipeline is sharded across it — stage LDEs run the four-step
    network with all_to_all transposes (parallel/ntt_sharded), tree builds
    as shard-local subtrees + replicated tops (parallel/merkle_sharded),
    and the TAC/Q/evals programs auto-partition via GSPMD from the section
    shardings.  FRI (small domains) runs replicated.  Proof bits are
    identical to the single-device backends.
    """
    if profile_dir:
        # XLA-level trace capture (device HLO timelines + host events),
        # viewable in xprof/tensorboard — the deep-observability layer on
        # top of the PhaseTimer wall-clock breakdown (SURVEY.md §5).
        import jax

        with jax.profiler.trace(profile_dir):
            return prove(pil_info, expressions_info, const_pols,
                         const_tree, inputs, debug=debug,
                         split_linear_hash=split_linear_hash,
                         backend=backend, logger=logger, mesh=mesh,
                         external_challenges=external_challenges)

    timer = PhaseTimer(logger)
    with timer.phase("init"):
        ctx = ProverCtx(
            pil_info, expressions_info, const_pols, const_tree, debug=debug,
            backend=backend, mesh=mesh,
        )
    ctx.timer = timer
    # vadcop coordinated challenges (main_prover.js --vadcopchallenges):
    # when the proof participates in a multi-subproof aggregation, every
    # subproof must see the SAME stage challenges (the gsum/gprod
    # arguments cancel across subproofs only under shared randomness), so
    # an outer orchestrator supplies them instead of this proof's own
    # transcript.  {"stages": [[(3-tuple), ...] per stage 1..nStages+3],
    # "friSteps": [...] one per FRI step + the query challenge}.
    ctx.external_challenges = external_challenges

    cm1_values, publics_inputs = inputs
    n_cm1 = sum(1 for c in pil_info["cmPolsMap"] if c["stage"] == 1)
    ctx.buffers["cm1_n"][:, : cm1_values.shape[1]] = cm1_values
    for i in range(n_cm1):
        ctx.set_symbol_calculated({"op": "cm", "id": i})

    for i in range(pil_info["nPublics"]):
        ctx.publics[i] = int(publics_inputs[i])
        ctx.set_symbol_calculated({"op": "public", "stage": 1, "id": i})

    challenge = None
    q_stage = pil_info["nStages"] + 1

    rng = np.random.default_rng(0xC0FFEE) if debug else None

    for stage in range(1, q_stage + 1):
        if stage == q_stage and debug:
            continue
        if _n_challenges(pil_info, stage) > 0:
            _set_challenges(stage, ctx, challenge, rng)
        with timer.phase(f"stage{stage}.witness"):
            _compute_stage(stage, ctx)

        if stage == 1 and not debug:
            _add_publics_transcript(ctx)

        if not debug:
            with timer.phase(f"stage{stage}.commit"):
                if stage == q_stage:
                    commits = _compute_q(ctx)
                else:
                    commits = _extend_and_merkelize(stage, ctx)
            _add_transcript(ctx.transcript, commits)
            if _n_challenges(pil_info, stage) > 0:
                challenge = ctx.transcript.get_field()
        else:
            challenge = _random_challenge(rng)

    if debug:
        return ctx.errors

    leftover = getattr(ctx, "dpending", None)
    if leftover:
        # planar TAC writes stage into dpending keyed by section and are
        # consumed by _extend_and_merkelize's cm{stage} pop — anything
        # still here targeted a section no commit consumed and would be
        # silently dropped (it also never reached host buffers)
        raise RuntimeError(
            f"planar device TAC writes to section(s) {sorted(leftover)} "
            "were never consumed by a stage commit"
        )

    evals_stage = pil_info["nStages"] + 2
    _set_challenges(evals_stage, ctx, challenge, rng)

    with timer.phase("evals"):
        evals_commits = _compute_evals(ctx)
    _add_transcript(ctx.transcript, evals_commits)
    challenge = ctx.transcript.get_field()

    fri_stage = pil_info["nStages"] + 3
    _set_challenges(fri_stage, ctx, challenge, rng)

    with timer.phase("friPol"):
        _compute_fri_pol(ctx)

    fri = FRI(pil_info["starkStruct"], ctx.mh, planar=getattr(ctx, "planar", False))
    ctx.fri_proof = {}
    ctx.fri_trees = {}
    ctx.fri_trees[0] = [ctx.trees[i + 1] for i in range(pil_info["nStages"] + 1)] + [
        ctx.const_tree
    ]
    ctx.fri_proof[0] = {}

    n_steps = len(pil_info["starkStruct"]["steps"])
    for step in range(n_steps):
        if external_challenges is not None:
            challenge = tuple(int(x) for x in external_challenges["friSteps"][step])
        else:
            challenge = ctx.transcript.get_field()
        ctx.challenges_fri_steps.append(challenge)
        with timer.phase(f"friFold{step}"):
            fold = fri.fold(step, ctx.fri_pol[step], challenge)
        ctx.fri_pol[step + 1] = fold["pol"]
        ctx.fri_proof[step + 1] = fold["proof"]
        if step < n_steps - 1:
            ctx.fri_trees[step + 1] = fold["tree"]
            commits = [fold["proof"]["root"]]
        else:
            if pil_info["starkStruct"].get("hashCommits"):
                commits = [_hash_commits(ctx, ctx.fri_pol[step + 1])]
            else:
                commits = [vf3.to_scalar(v) for v in ctx.fri_pol[step + 1]]
        _add_transcript(ctx.transcript, commits)

    if external_challenges is not None:
        challenge_queries = tuple(
            int(x) for x in external_challenges["friSteps"][n_steps]
        )
    else:
        challenge_queries = ctx.transcript.get_field()
    ctx.challenges_fri_steps.append(challenge_queries)

    fri_queries = _get_permutations(ctx, challenge_queries)

    fri_proof_list = [ctx.fri_proof[s] for s in range(n_steps + 1)]
    fri_trees_list = [ctx.fri_trees[s] for s in range(n_steps)]
    with timer.phase("queries"):
        fri.proof_queries(fri_proof_list, fri_trees_list, fri_queries)

    proof = {
        "evals": ctx.evals,
        "subproofValues": ctx.subproof_values,
        "fri": fri_proof_list,
    }
    for i in range(pil_info["nStages"] + 1):
        proof[f"root{i + 1}"] = ctx.mh.root(ctx.trees[i + 1])

    # stage{N}.upload was accumulated INSIDE the commit phase context
    # (see _extend_and_merkelize) — subtract it so the phase table
    # attributes tunnel IO separately from LDE+hash compute
    for key, t_up in list(timer.timings.items()):
        if key.endswith(".upload"):
            ckey = key.replace(".upload", ".commit")
            if ckey in timer.timings:
                timer.timings[ckey] = max(0.0, timer.timings[ckey] - t_up)

    return {
        "proof": proof,
        "publics": ctx.publics,
        "challenges": ctx.challenges,
        "challengesFRISteps": ctx.challenges_fri_steps,
        "timings": timer.summary(),
    }


# ---------------------------------------------------------------------------
# stages


def _n_challenges(pil_info, stage):
    return sum(1 for c in pil_info["challengesMap"] if c["stage"] == stage)


def _set_challenges(stage, ctx, challenge, rng):
    """setChallengesStark (stark_gen_helpers.js:414-439)."""
    n = _n_challenges(ctx.pil_info, stage)
    while len(ctx.challenges) < stage:
        ctx.challenges.append([])
    ctx.challenges[stage - 1] = []
    ext = getattr(ctx, "external_challenges", None)
    if ext is not None:
        ctx.challenges[stage - 1] = [
            tuple(int(x) for x in c) for c in ext["stages"][stage - 1]
        ]
        assert len(ctx.challenges[stage - 1]) == n, (stage, n)
    else:
        for i in range(n):
            if i > 0 or not challenge:
                ctx.challenges[stage - 1].append(ctx.transcript.get_field())
            else:
                ctx.challenges[stage - 1].append(challenge)
    q_stage = ctx.pil_info["nStages"] + 1
    if stage < q_stage:
        for i, c in enumerate(ctx.pil_info["challengesMap"]):
            if c["stage"] == stage:
                ctx.set_symbol_calculated({"op": "challenge", "stage": stage, "id": i})


def _random_challenge(rng):
    return tuple(
        int(rng.integers(0, 1 << 63)) % gl64.P_INT for _ in range(3)
    )


def _compute_stage(stage, ctx):
    """computeStage (prover.js:192-231)."""
    q_stage = ctx.pil_info["nStages"] + 1
    dom = "ext" if stage == q_stage else "n"

    if stage != q_stage:
        missing = ctx.stage_symbols_missing(stage)
        while missing > 0:
            hints.apply_hints(ctx, stage)
            updated = ctx.stage_symbols_missing(stage)
            if updated == missing:
                raise RuntimeError(
                    f"Something went wrong when calculating symbols for stage {stage}"
                )
            missing = updated
        if stage == q_stage - 1:
            code = ctx.expressions_info["imPolsCode"][stage - 1]
            if code["code"]:
                _run_code(ctx, code, dom)
    else:
        code = next(
            e
            for e in ctx.expressions_info["expressionsCode"]
            if e["expId"] == ctx.pil_info["cExpId"]
        )
        _run_code(ctx, code["code"], dom)

    if ctx.debug:
        for c in ctx.expressions_info["constraints"]:
            if c["stage"] != stage:
                continue
            ctx.errors.extend(expr_eval.check_constraint(ctx, c, dom))


def _run_code(ctx, code_obj, dom):
    """Dispatch a TAC program to the host (numpy) or device (XLA) backend."""
    if getattr(ctx, "backend", "numpy") not in ("jax", "device"):
        expr_eval.execute_code(ctx, code_obj, dom)
        return
    executor = jax_tac.make_executor(
        code_obj, dom, ctx.pil_info, ctx.n_bits,
        getattr(ctx, "n_bits_ext", None), planar=getattr(ctx, "planar", False)
    )
    out = executor(jax_tac.pack_inputs(ctx, dom))
    if ctx.device and dom == "ext":
        # fully device-resident: q/f stay as (d, extN) limb pairs
        if "q" in out:
            ctx.dq = out["q"]
        if "f" in out:
            ctx.df = out["f"]
        if out["cm"]:
            raise NotImplementedError(
                "ext-domain TAC cm writes are not used by the stark pipeline"
            )
        return
    if ctx.device and getattr(ctx, "planar", False) and dom == "n":
        # planar device mode: imPols outputs are already (d, N) planar
        # device pairs — stage them for _extend_and_merkelize to splice
        # into the section upload instead of paying a device->host
        # download AND a host->device re-upload per program
        pending = getattr(ctx, "dpending", None)
        if pending is None:
            pending = ctx.dpending = {}
        for (section, offset, dim), val in out["cm"].items():
            pending.setdefault(section, {})[offset] = (val, dim)
        return
    if "q" in out:
        q = _jgl.to_u64(out["q"]).T
        ctx.q_ext[:, : q.shape[1]] = q
    if "f" in out:
        ctx.f_ext[:, :] = _jgl.to_u64(out["f"]).T
    for (section, offset, dim), val in out["cm"].items():
        arr = _jgl.to_u64(val).T
        buf = ctx.buffers[f"{section}_{dom}"]
        if dim == 1:
            buf[:, offset] = arr[:, 0]
        else:
            buf[:, offset : offset + dim] = arr


def _extend_and_merkelize(stage, ctx):
    """LDE + Merkle build (stark_gen_helpers.js:388-412)."""
    buff_from = ctx.buffers[f"cm{stage}_n"]
    n_pols = ctx.pil_info["mapSectionsN"][f"cm{stage}"]
    if ctx.device:
        # one witness upload; LDE + full tree build stay on device.  The
        # "n"-domain pair is kept for later TAC programs (the q-1 imPols
        # executor reads every committed stage — without this cache each
        # stage section re-rode the host->device transport per program)
        if ctx.planar:
            # planar commit pipeline: the host transposes once (cheap) so
            # LDE -> leaf sponge -> tree levels run with rows on the lane
            # axis and ZERO on-device transposes.  Only columns the host
            # actually computed ride the tunnel: device-staged imPols
            # splice in place, empty sections never transfer (each
            # host->device round-trip costs ~60 ms of latency)
            import jax.numpy as _jnp

            import time as _time

            t_up0 = _time.perf_counter()
            pending = getattr(ctx, "dpending", {}).pop(f"cm{stage}", None)
            if not pending:
                if n_pols > 0:
                    dev_n = _jgl.from_u64(np.ascontiguousarray(buff_from.T))
                else:
                    dev_n = (_jnp.zeros((0, ctx.N), _jnp.uint32),
                             _jnp.zeros((0, ctx.N), _jnp.uint32))
            else:
                # ONE packed upload of the host-computed column ranges
                gaps, cursor = [], 0
                for offset in sorted(pending):
                    if offset > cursor:
                        gaps.append((cursor, offset))
                    cursor = offset + pending[offset][1]
                if cursor < n_pols:
                    gaps.append((cursor, n_pols))
                if gaps:
                    host_pack = _jgl.from_u64(np.ascontiguousarray(
                        np.concatenate(
                            [buff_from.T[a:b] for a, b in gaps], axis=0)))
                parts_lo, parts_hi = [], []
                cursor = off_h = 0
                for offset in sorted(pending):
                    if offset > cursor:
                        w = offset - cursor
                        parts_lo.append(host_pack[0][off_h:off_h + w])
                        parts_hi.append(host_pack[1][off_h:off_h + w])
                        off_h += w
                    val, dim = pending[offset]
                    parts_lo.append(val[0])
                    parts_hi.append(val[1])
                    cursor = offset + dim
                if cursor < n_pols:
                    w = n_pols - cursor
                    parts_lo.append(host_pack[0][off_h:off_h + w])
                    parts_hi.append(host_pack[1][off_h:off_h + w])
                dev_n = (
                    _jnp.concatenate(parts_lo, axis=0),
                    _jnp.concatenate(parts_hi, axis=0),
                ) if len(parts_lo) > 1 else (parts_lo[0], parts_hi[0])
            # attribute the witness transfer separately from LDE+hash:
            # the host->device tunnel (~18 MB/s) is IO, not compute, and
            # prove() subtracts this from the commit phase (BENCH phases)
            import jax as _jax

            _jax.block_until_ready(dev_n)
            t_up = _time.perf_counter() - t_up0
            tm = getattr(ctx, "timer", None)
            if tm is not None:
                key = f"stage{stage}.upload"
                tm.timings[key] = tm.timings.get(key, 0.0) + t_up
            ctx.dsections["n"][f"cm{stage}"] = dev_n
            if n_pols > 0:
                ext = ntt_ops.lde_planar(dev_n, ctx.n_bits, ctx.n_bits_ext)
            else:
                ext = (_jnp.zeros((0, ctx.ext_N), _jnp.uint32),
                       _jnp.zeros((0, ctx.ext_N), _jnp.uint32))
            tree = device.merkelize(
                ext, n_pols, ctx.ext_N, ctx.mh.split_linear_hash, planar=True
            )
            ctx.dsections["ext"][f"cm{stage}"] = ext
            ctx.trees[stage] = tree
            return [ctx.mh.root(ctx.trees[stage])]
        dev_n = _jgl.from_u64(buff_from)
        ctx.dsections["n"][f"cm{stage}"] = dev_n
        if ctx.mesh is not None:
            ext, tree = _extend_and_merkelize_sharded(ctx, dev_n, n_pols)
        else:
            if n_pols > 0:
                ext = ntt_ops.lde(dev_n, ctx.n_bits, ctx.n_bits_ext)
            else:
                ext = _jgl.from_u64(np.zeros((ctx.ext_N, 0), dtype=np.uint64))
            tree = device.merkelize(
                ext, n_pols, ctx.ext_N, ctx.mh.split_linear_hash
            )
        ctx.dsections["ext"][f"cm{stage}"] = ext
        ctx.trees[stage] = tree
        return [ctx.mh.root(ctx.trees[stage])]
    if n_pols > 0:
        ext = ntt_ops.lde_u64(buff_from, ctx.n_bits, ctx.n_bits_ext)
    else:
        ext = np.zeros((ctx.ext_N, 0), dtype=np.uint64)
    ctx.buffers[f"cm{stage}_ext"][:, :] = ext
    ctx.trees[stage] = ctx.mh.merkelize(ext, n_pols, ctx.ext_N)
    return [ctx.mh.root(ctx.trees[stage])]


def _extend_and_merkelize_sharded(ctx, dev_n, n_pols):
    """Mesh-sharded commit step: four-step LDE with all_to_all transposes +
    shard-local subtree Merkle build (parallel/*), bit-exact to the
    single-device path."""
    import jax

    from ..parallel import merkle_sharded, ntt_sharded

    if n_pols == 0:
        z = np.zeros((ctx.ext_N, 0), dtype=np.uint64)
        ext = tuple(jax.device_put(a, ctx.row_sharding) for a in _jgl.from_u64(z))
    else:
        dev_n = tuple(jax.device_put(a, ctx.row_sharding) for a in dev_n)
        lde_fn = ntt_sharded.make_sharded_lde(
            ctx.n_bits, ctx.n_bits_ext, n_pols, ctx.mesh
        )
        ext = lde_fn(*dev_n)
    tree = _merkelize_sharded(ctx, ext, n_pols)
    return ext, tree


def _merkelize_sharded(ctx, ext, n_pols):
    from ..parallel import merkle_sharded

    if n_pols == 0:
        return device.merkelize(ext, 0, ctx.ext_N, ctx.mh.split_linear_hash)
    build = merkle_sharded.make_sharded_merkle_levels(
        ctx.ext_N, n_pols, ctx.mesh, split=ctx.mh.split_linear_hash
    )
    levels = build(*ext)
    return device.DeviceTree(
        width=n_pols, height=ctx.ext_N, elements=ext, levels=levels
    )


def _compute_q(ctx):
    """computeQStark (stark_gen_helpers.js:168-208): iNTT(ext) of q, split
    into qDeg chunks scaled by shiftIn^p, NTT back, Merkelize."""
    pil_info = ctx.pil_info
    q_stage = pil_info["nStages"] + 1
    q_dim = pil_info["qDim"]
    q_deg = pil_info["qDeg"]

    shift_in_ = pow(pow(gl64.SHIFT_INT, gl64.P_INT - 2, gl64.P_INT), ctx.N, gl64.P_INT)
    if ctx.device:
        return _compute_q_device(ctx, q_stage, q_dim, q_deg, shift_in_)

    qq1 = ntt_ops.intt_u64(ctx.q_ext, ctx.n_bits_ext)  # (extN, qDim)

    shift_in = shift_in_
    # qq2[i, p*qDim + k] = qq1[p*N + i, k] * shiftIn^p
    qq2 = np.zeros((ctx.ext_N, q_dim * q_deg), dtype=np.uint64)
    cur_s = 1
    for p in range(q_deg):
        chunk = qq1[p * ctx.N : (p + 1) * ctx.N, :]
        qq2[: ctx.N, p * q_dim : (p + 1) * q_dim] = gl64.mul(
            chunk, np.uint64(cur_s)
        )
        cur_s = (cur_s * shift_in) % gl64.P_INT

    ext = ntt_ops.ntt_u64(qq2, ctx.n_bits_ext)
    ctx.buffers[f"cm{q_stage}_ext"][:, :] = ext

    n_pols_q = pil_info["mapSectionsN"].get(f"cm{q_stage}", 0)
    ctx.trees[q_stage] = ctx.mh.merkelize(ext, n_pols_q, ctx.ext_N)
    return [ctx.mh.root(ctx.trees[q_stage])]


@functools.lru_cache(maxsize=None)
def _jit_q_split(n_bits_ext: int, n_bits: int, q_dim: int, q_deg: int,
                 shift_in: int, planar_out: bool = False):
    """ONE jitted program for the whole computeQStark transform chain
    (iNTT(ext) → qDeg split scaled by shiftIn^p → NTT(ext)).  Keeping it a
    single program matters: the glue ops alone, run op-by-op, dispatch
    hundreds of per-primitive XLA compiles."""
    import jax
    import jax.numpy as jnp

    n = 1 << n_bits
    ext_n = 1 << n_bits_ext
    # shiftIn^p constants embedded per-trace as numpy limb pairs
    sp = gl64.powers(int(shift_in), q_deg)
    sp_lo = (sp & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sp_hi = (sp >> np.uint64(32)).astype(np.uint32)

    n_inv = pow(ext_n, gl64.P_INT - 2, gl64.P_INT)

    def body(dq):
        if ntt_ops._planar_ok(n_bits_ext):
            # dq is (qDim, extN) — already planar: iNTT along lanes,
            # split/scale in planar form, NTT back; ONE transpose at the
            # end for the tree-leaf row layout
            qq1 = ntt_ops._planar_ntt(dq, n_bits_ext, q_dim, True)
            qq1 = _jgl.mul_const(qq1, n_inv)
            lo = qq1[0][:, : q_deg * n].reshape(q_dim, q_deg, n)
            hi = qq1[1][:, : q_deg * n].reshape(q_dim, q_deg, n)
            lo, hi = _jgl.mul(
                (lo, hi), (sp_lo[None, :, None], sp_hi[None, :, None])
            )
            lo = jnp.moveaxis(lo, 0, 1).reshape(q_deg * q_dim, n)
            hi = jnp.moveaxis(hi, 0, 1).reshape(q_deg * q_dim, n)
            pad = ((0, 0), (0, ext_n - n))
            y = ntt_ops._planar_ntt(
                (jnp.pad(lo, pad), jnp.pad(hi, pad)),
                n_bits_ext, q_deg * q_dim, False,
            )
            return y if planar_out else (y[0].T, y[1].T)
        # (qDim, extN) -> (extN, qDim) for the axis-0 NTT
        qq1 = ntt_ops._axis0_ntt((dq[0].T, dq[1].T), n_bits_ext, True)
        qq1 = _jgl.mul_const(qq1, n_inv)
        # qq2[i, p*qDim + k] = qq1[p*N + i, k] * shiftIn^p  (rows >= qDeg*N
        # of qq1 are zero by the degree bound and are dropped)
        lo = qq1[0][: q_deg * n].reshape(q_deg, n, q_dim)
        hi = qq1[1][: q_deg * n].reshape(q_deg, n, q_dim)
        lo, hi = _jgl.mul(
            (lo, hi), (sp_lo[:, None, None], sp_hi[:, None, None])
        )
        lo = jnp.moveaxis(lo, 0, 1).reshape(n, q_deg * q_dim)
        hi = jnp.moveaxis(hi, 0, 1).reshape(n, q_deg * q_dim)
        pad = ((0, ext_n - n), (0, 0))
        y = ntt_ops._axis0_ntt(
            (jnp.pad(lo, pad), jnp.pad(hi, pad)), n_bits_ext, False
        )
        return (y[0].T, y[1].T) if planar_out else y

    return jax.jit(body)


def _compute_q_device(ctx, q_stage, q_dim, q_deg, shift_in):
    """Device-resident computeQStark: the whole iNTT(ext) → qDeg split
    scaled by shiftIn^p → NTT(ext) → tree chain runs as ONE XLA program
    over the (qDim, extN) q pair left by the cExp TAC executor."""
    n_pols_q = ctx.pil_info["mapSectionsN"].get(f"cm{q_stage}", 0)
    planar = getattr(ctx, "planar", False)
    ext = _jit_q_split(ctx.n_bits_ext, ctx.n_bits, q_dim, q_deg, shift_in,
                       planar_out=planar)(ctx.dq)
    ctx.dsections["ext"][f"cm{q_stage}"] = ext
    if ctx.mesh is not None:
        ctx.trees[q_stage] = _merkelize_sharded(ctx, ext, n_pols_q)
    else:
        ctx.trees[q_stage] = device.merkelize(
            ext, n_pols_q, ctx.ext_N, ctx.mh.split_linear_hash, planar=planar
        )
    return [ctx.mh.root(ctx.trees[q_stage])]


def _compute_evals(ctx):
    """computeEvalsStark (stark_gen_helpers.js:210-273)."""
    pil_info = ctx.pil_info
    evals_stage = pil_info["nStages"] + 1
    xi_challenge = ctx.challenges[evals_stage][0]

    openings = pil_info["openingPoints"]
    xis = []
    for opening in openings:
        w = pow(gl64.w(ctx.n_bits), abs(int(opening)), gl64.P_INT)
        if opening < 0:
            w = pow(w, gl64.P_INT - 2, gl64.P_INT)
        xis.append(f3.mul(f3.mul(xi_challenge, w), f3.inv1(gl64.SHIFT_INT)))

    if ctx.device:
        return _compute_evals_device(ctx, xis)

    lev = []
    for xi in xis:
        # geometric series xi^k as (N, 3) via log-doubling, then iNTT
        series = _f3_powers_np(xi, ctx.N)
        lev.append(ntt_ops.intt_u64(series, ctx.n_bits))

    ctx.evals = []
    stride = 1 << ctx.extend_bits
    for ev in pil_info["evMap"]:
        if ev["type"] == "const":
            cols = ctx.const_ext[::stride, ev["id"]]
        elif ev["type"] == "cm":
            p = ctx.get_pol_ref(ev["id"], "ext")
            if p["dim"] == 1:
                cols = p["buffer"][::stride, p["offset"]]
            else:
                cols = p["buffer"][::stride, p["offset"] : p["offset"] + p["dim"]]
        else:
            raise ValueError(f"Invalid ev type: {ev['type']}")
        lev_i = lev[openings.index(ev["prime"])]
        prod = vf3.mul(np.asarray(cols), lev_i)  # (N, 3)
        acc = _sum_ext(prod)
        ctx.evals.append(acc)

    if pil_info["starkStruct"].get("hashCommits"):
        return [_hash_commits(ctx, ctx.evals)]
    return list(ctx.evals)


def _f3_powers_np(xi, n):
    """Host geometric series 1, xi, …, xi^{n-1} as (n, 3) u64 by vectorized
    log-doubling (replaces the O(N) scalar loop the reference runs at
    stark_gen_helpers.js:219-229)."""
    out = np.zeros((n, 3), dtype=np.uint64)
    out[0] = (1, 0, 0)
    k = 1
    step = xi
    while k < n:
        m = min(k, n - k)
        out[k : k + m] = vf3.mul(out[:m], np.asarray(f3.as3(step), dtype=np.uint64))
        step = f3.square(step)
        k *= 2
    return out


def _compute_evals_device(ctx, xis):
    """Device-resident computeEvalsStark: geometric LEv tables, iNTTs and
    all evMap reductions run as ONE jitted program; the host only supplies
    the xi^(2^k) doubling scalars (3 u64 each per level)."""
    pil_info = ctx.pil_info
    pows2 = np.zeros((len(xis), ctx.n_bits, 3), dtype=np.uint64)
    for o, xi in enumerate(xis):
        s = xi
        for k in range(ctx.n_bits):
            pows2[o, k] = f3.as3(s)
            s = f3.square(s)

    stride = 1 << ctx.extend_bits
    executor = device.make_evals_executor(
        pil_info, stride, ctx.n_bits, planar=getattr(ctx, "planar", False)
    )
    out = executor(ctx.dsections["ext"], _jgl.from_u64(pows2))
    evals_np = _jgl.to_u64(out)  # (nEv, 3)
    ctx.evals = [tuple(int(x) for x in row) for row in evals_np]

    if pil_info["starkStruct"].get("hashCommits"):
        return [_hash_commits(ctx, ctx.evals)]
    return list(ctx.evals)


def _sum_ext(vals):
    """Tree-sum of (N, 3) extension values mod p."""
    arr = vf3.as3(vals)
    while arr.shape[0] > 1:
        if arr.shape[0] % 2:
            arr = np.concatenate(
                [arr, np.zeros((1, 3), dtype=np.uint64)], axis=0
            )
        arr = gl64.add(arr[0::2], arr[1::2])
    return tuple(int(x) for x in arr[0])


def _compute_fri_pol(ctx):
    """computeFRIStark (stark_gen_helpers.js:275-335)."""
    pil_info = ctx.pil_info
    stage = pil_info["nStages"] + 2
    evals_stage = pil_info["nStages"] + 1
    xi_challenge = ctx.challenges[evals_stage][0]

    xi_list = []
    for i, opening in enumerate(pil_info["openingPoints"]):
        w = pow(gl64.w(ctx.n_bits), abs(int(opening)), gl64.P_INT)
        if opening < 0:
            w = pow(w, gl64.P_INT - 2, gl64.P_INT)
        xi_list.append(f3.as3(f3.mul(xi_challenge, w)))

    if ctx.device:
        ctx.dxdiv = device.compute_xdiv(ctx.dx["ext"], xi_list)
    else:
        for i, xi3_t in enumerate(xi_list):
            xi3 = np.array(xi3_t, dtype=np.uint64)
            x = ctx.x_ext  # (extN,) base
            den = vf3.sub(x, xi3)  # (extN, 3)
            den_inv = vf3.inv(den)
            v = vf3.mul(den_inv, x)
            ctx.xDivXSubXi_ext[:, i, :] = v

    code = next(
        e
        for e in ctx.expressions_info["expressionsCode"]
        if e["expId"] == pil_info["friExpId"]
    )
    _run_code(ctx, code["code"], "ext")

    if ctx.device:
        if getattr(ctx, "planar", False):
            ctx.fri_pol = {0: ctx.df}  # (3, extN) planar pair, no transpose
        else:
            ctx.fri_pol = {0: (ctx.df[0].T, ctx.df[1].T)}  # (extN, 3) pair
    else:
        ctx.fri_pol = {0: ctx.f_ext.copy()}


def _add_publics_transcript(ctx):
    """addPublicsTranscript (prover.js:150-188), GL/no-hashCommits and
    hashCommits variants."""
    pil_info = ctx.pil_info
    commits = []
    const_root = ctx.mh.root(ctx.const_tree)
    if pil_info["starkStruct"].get("hashCommits"):
        commits.append(const_root)
        commits.append(_hash_commits(ctx, ctx.publics))
    else:
        commits.append(const_root)
        commits.extend(ctx.publics)
    _add_transcript(ctx.transcript, commits)


def _hash_commits(ctx, inputs):
    """calculateHashStark: absorb into a fresh transcript, return state."""
    t = ctx.mh.new_transcript()
    for v in inputs:
        t.put(_flatten(v))
    return t.get_state()


def _flatten(v):
    if isinstance(v, np.ndarray):
        return [int(x) for x in v.reshape(-1)]
    return v


def _add_transcript(transcript, inputs):
    for v in inputs:
        transcript.put(_flatten(v))


def _get_permutations(ctx, challenge):
    """getPermutationsStark: fresh transcript seeded with the query
    challenge."""
    t = ctx.mh.new_transcript()
    t.put(_flatten(challenge))
    ss = ctx.pil_info["starkStruct"]
    return t.get_permutations(ss["nQueries"], ss["steps"][0]["nBits"])


def print_pol(ctx, pol_id, row=-1):
    """Debug helper (stark_gen_helpers.js printPol:495-520): dump a
    committed column's values."""
    name = ctx.pil_info["cmPolsMap"][pol_id]["name"]
    pol = ctx.get_pol(pol_id, "n")
    print(f"... {name} ...:")
    for i in range(ctx.N):
        if row != -1 and i != row:
            continue
        print(f"Value at row {i} is {pol[i]}")


def print_pol_root(ctx, pol_id):
    """stark_gen_helpers.js printPolRoot: hash one column to compare traces
    across provers."""
    from ..hash import merkle as _merkle

    p = ctx.get_pol_ref(pol_id, "n")
    pol = ctx.get_pol(pol_id, "n").reshape(ctx.N, -1)
    tree = _merkle.merkelize(pol, p["dim"], ctx.N)
    name = ctx.pil_info["cmPolsMap"][pol_id]["name"]
    print(f"... {name}: {list(tree.root)}")
    return tree.root
