"""Test harness config: run JAX on CPU with 8 virtual devices so sharded
(multi-chip) code paths are exercised without TPU hardware.  A persistent
compilation cache makes repeated suite runs cheap (compiles dominate)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent cache keyed by (jaxlib, CPU identity) — entries from another
# machine or toolchain burn minutes in deserialize-then-fallback (see
# pil2_stark_tpu/utils/jaxcache.py).  jaxcache does not import jax, so the
# env vars land before the first backend read.
from pil2_stark_tpu.utils import jaxcache  # noqa: E402

jaxcache.setup_cache()

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
