"""Logging / banner utilities (replaces reference ``pyfocusr/main.py:1-6``,
the reference's only logging facility) plus structured stage timing the
reference lacked (SURVEY §5.1 asks for structured timing of jit'd stages)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

__all__ = ["print_header", "StageTimer"]


def print_header(string: str) -> None:
    """Banner print — same output shape as reference ``main.py:1-6``."""
    print("=" * 72)
    print(string)
    print("=" * 72)


class StageTimer:
    """Wall-clock spans per pipeline stage, with optional jax.profiler traces.

    Usage::

        timer = StageTimer()
        with timer.span("eigensolve"):
            ...
        timer.report()
    """

    def __init__(self, enable_profiler: bool = False, verbose: bool = False):
        self.spans: List[tuple] = []
        self.enable_profiler = enable_profiler
        self.verbose = verbose

    @contextlib.contextmanager
    def span(self, name: str):
        ctx = contextlib.nullcontext()
        if self.enable_profiler:
            import jax

            ctx = jax.profiler.TraceAnnotation(name)
        t0 = time.perf_counter()
        try:
            with ctx:
                yield
        finally:
            # Record even when the body raises: the failing stage's partial
            # duration is exactly what a crash diagnosis needs.
            dt = time.perf_counter() - t0
            self.spans.append((name, dt))
            if self.verbose:
                print(f"[timing] {name}: {dt * 1000:.1f} ms")

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self.spans:
            out[name] = out.get(name, 0.0) + dt
        return out

    def report(self) -> None:
        print_header("Stage timings")
        for name, dt in self.totals().items():
            print(f"{name:40s} {dt * 1000:10.1f} ms")
