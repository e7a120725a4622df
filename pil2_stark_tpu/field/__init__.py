from . import gl64, f3  # noqa: F401

# jax_gl / jax_f3 are imported lazily by consumers to keep host-only tools
# (e.g. setup pipelines) free of a JAX dependency at import time.
