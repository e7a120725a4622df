from .native import native_available, lib  # noqa: F401
