"""Multi-host distribution: jax.distributed + (dcn, ici) proof meshes.

The reference is a single-node prover (workerpool threads,
/root/reference/src/helpers/fft/fft_p.js); its scale-out story stops at
32 GB Node heaps.  This framework's distributed backend is JAX's native
one (SURVEY.md §2.7, §5 "Distributed communication backend"): every
host runs the same program, `jax.distributed.initialize` wires the
processes into one runtime, and a 2-axis ("dcn", "ici") Mesh places
cross-host traffic on the data-center network and intra-slice traffic on
ICI.  All sharded kernels (parallel/ntt_sharded, parallel/merkle_sharded)
and `prove(mesh=...)` are axis-agnostic: they shard over every mesh axis,
so the same code runs on a single-host ("x",) mesh, a forced virtual CPU
mesh (tests), or a multi-host (dcn, ici) mesh.

Communication placement per SURVEY §2.7:
- P1 NTT transposes: `all_to_all` over ("dcn", "ici") — the four-step's
  three transposes are the only cross-host traffic in a commit step.
- P4 Merkle root reduction: subtree roots `all_gather` (4 u64 per device)
  — negligible on DCN.
- P3/P5: row-local, no communication.

There is no NCCL/MPI here by design: XLA emits the collectives from the
shardings (BASELINE.md north star: ≥80 % scaling efficiency at 2 hosts;
the transposes move N·16 bytes × (d−1)/d per pass regardless of host
count, so efficiency is bandwidth-bound, not latency-bound, at 2^24).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, **kwargs):
    """Wire this process into a multi-host JAX runtime.

    A no-op when the runtime is already initialized or when running
    single-process with no coordinator (the common local case — tests and
    the single-chip bench never need it).  On a real pod slice the three
    arguments normally come from the scheduler's environment and can all
    be None (jax.distributed auto-detects on TPU pods)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except (ValueError, RuntimeError):
        if coordinator_address is not None:
            raise  # explicit request that failed — surface it
        # single-process / already-initialized: nothing to do


def proof_mesh(devices=None, hosts=None):
    """Build the canonical proof mesh.

    Single-process: a 1-axis ("ici",) mesh over the local devices.
    Multi-process (or hosts= forced): a ("dcn", "ici") mesh with the DCN
    axis spanning processes, so shardings put the slow hop on the outer
    axis.  `hosts` forces the dcn extent (used by tests to model 2 hosts
    on a virtual 8-device CPU mesh)."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    n_hosts = hosts if hosts is not None else jax.process_count()
    if n_hosts <= 1:
        return Mesh(np.array(devs), ("ici",))
    assert n % n_hosts == 0, "devices must divide evenly across hosts"
    grid = np.array(devs).reshape(n_hosts, n // n_hosts)
    return Mesh(grid, ("dcn", "ici"))
