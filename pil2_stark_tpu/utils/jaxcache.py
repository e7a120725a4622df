"""Persistent-XLA-cache setup shared by tests/conftest.py, bench.py and
__graft_entry__.py.

XLA:CPU AOT executables are machine- AND toolchain-specific: the compile
target bakes LLVM *tuning* features derived from the host CPU *model*
(e.g. ``+prefer-no-gather``/``+prefer-no-scatter`` on recent Xeons) that
are invisible in the /proc/cpuinfo ISA flag list, and the set depends on
the jaxlib/LLVM version.  Loading an entry produced under a different
(model, jaxlib) pair spends minutes per program in deserialize before
falling back to a fresh compile (cpu_aot_loader.cc mismatch spam) — the
round-3 driver artifacts timed out exactly this way.

The cache directory is therefore keyed by everything that can change the
baked target: jaxlib version, architecture, CPUID identity
(vendor/family/model/stepping — the input to LLVM's getHostCPUName and
thus to the tuning-feature set), and the ISA flag list.  Two processes
with the same key produce mutually loadable entries; any difference lands
in a different directory.

MUST be imported (and setup_cache called) before the first JAX backend
initialization in the process.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _cpu_identity() -> str:
    """vendor/family/model/stepping + ISA flags from /proc/cpuinfo."""
    keys = ("vendor_id", "cpu family", "model\t", "model ", "stepping", "flags")
    lines = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    lines.append(line.strip())
                if line.strip() == "" and lines:
                    break  # first core only — all cores identical
    except OSError:
        pass
    return "\n".join(lines)


def cache_key() -> str:
    try:
        import jaxlib

        jl = jaxlib.__version__
    except Exception:  # pragma: no cover
        jl = "unknown"
    raw = "\0".join(["v2", jl, platform.machine(), _cpu_identity()])
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def setup_cache() -> str:
    """Point JAX_COMPILATION_CACHE_DIR at the host/toolchain-keyed dir
    (unless the caller already set one) and return the directory used."""
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        # Sub-key by the JAX platform: axon (TPU-tunnel) sessions write
        # CPU AOT entries whose LLVM tuning features (+prefer-no-gather/
        # scatter) come from the REMOTE compile relay's host, and pure-CPU
        # processes then probe them with "machine feature not supported"
        # fallback spam on every load (the MULTICHIP_r04 tail).  Platform
        # families never share entries anyway, so give each its own dir.
        # The axon/default suffix is kept EMPTY so existing warm TPU
        # caches stay valid.
        plat = os.environ.get("JAX_PLATFORMS", "")
        suffix = "_cpu" if "cpu" in plat else ""
        os.environ["JAX_COMPILATION_CACHE_DIR"] = (
            f"/tmp/jax_cache_pil2stark_{cache_key()}{suffix}"
        )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return os.environ["JAX_COMPILATION_CACHE_DIR"]
