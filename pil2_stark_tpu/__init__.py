"""pil2_stark_tpu — TPU-native STARK proving framework.

Enables JAX's persistent compilation cache: graph compiles dominate
wall-clock on this stack (remote TPU compile relay, large fused tree/NTT
graphs), and the cache makes repeat runs cheap.  Done via config.update —
the environment variables are read too early here (jax is already imported
by the interpreter's site hooks).
"""
import os as _os

from pil2_stark_tpu.utils import jaxcache as _jaxcache

_CACHE_DIR = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/jax_cache_pil2stark_{_jaxcache.cache_key()}",
)

try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimization only
    pass
