"""Structured per-phase timing — the observability gap called out in
SURVEY.md §5 (the reference has only ad-hoc debug logging; timer hooks exist
only in its generated C++).  Used by the prover to report a per-phase
breakdown alongside the proof, and by bench.py."""
from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    def __init__(self, logger=None):
        self.timings: dict[str, float] = {}
        self.logger = logger

    @contextlib.contextmanager
    def phase(self, name: str):
        # Label the phase in the xprof timeline too when a jax.profiler
        # trace is being captured (prove(profile_dir=...)); TraceAnnotation
        # is a no-op outside an active capture.
        import sys

        ann = contextlib.nullcontext()
        if "jax" in sys.modules:
            ann = sys.modules["jax"].profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        try:
            with ann:
                yield
        finally:
            dt = time.perf_counter() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            if self.logger:
                self.logger.debug(f"··· {name}: {dt * 1000:.1f} ms")

    def summary(self) -> dict[str, float]:
        return dict(sorted(self.timings.items(), key=lambda kv: -kv[1]))
