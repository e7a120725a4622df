"""Test harness config: run JAX on CPU with 8 virtual devices so sharded
(multi-chip) code paths are exercised without TPU hardware.  A persistent
compilation cache makes repeated suite runs cheap (compiles dominate)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pil2stark")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize hook calls jax.config.update("jax_platforms", ...)
# at interpreter boot, which outranks the env var — override the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
