"""Test harness config: run JAX on CPU with 8 virtual devices so sharded
(multi-chip) code paths are exercised without TPU hardware.  A persistent
compilation cache makes repeated suite runs cheap (compiles dominate)."""
import hashlib
import os
import platform

os.environ["JAX_PLATFORMS"] = "cpu"
# Key the persistent cache by host CPU features: XLA:CPU AOT executables are
# machine-specific, and loading an entry produced on a different host (these
# runners migrate) spends minutes in deserialize before falling back — or
# risks SIGILL.
try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_mid = hashlib.sha256((platform.machine() + _flags).encode()).hexdigest()[:12]
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_cache_pil2stark_{_mid}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion emitters miscompile deep uint32 limb-arithmetic fusions
# interleaved with concat/slice (the cubic-extension mul pattern) into
# kernels that never terminate on some hosts — a 5-deep f3 mul chain hangs
# at EXECUTION time while compiling fine.  The classic emitters are correct
# (and only marginally slower); TPU codegen is unaffected.
if "xla_cpu_use_fusion_emitters" not in flags:
    flags = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize hook calls jax.config.update("jax_platforms", ...)
# at interpreter boot, which outranks the env var — override the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
