from . import poseidon_gl  # noqa: F401
from . import linearhash  # noqa: F401
