"""Tracing/profiling utilities.

The reference's observability is manual time.time() bracketing
(reference: SURVEY.md §5.1); the framework keeps those exact metric fields
and adds device-level tracing:

- ``trace(dir)``: context manager around jax.profiler.trace, producing a
  TensorBoard-loadable device trace (HLO timeline, per-op cost).
- ``StageTimer``: wall-clock stage accounting that also separates first-call
  (compile) time from warm execute time per stage label.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler device trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StageTimer:
    """Per-stage wall clock with compile/execute split.

    The first timed call for a (stage, tag) pair is attributed to compile
    (XLA traces+compiles on first call for each new shape); subsequent calls
    count as execute. ``tag`` is usually the padded batch shape.
    """

    def __init__(self):
        self.compile_sec: Dict[str, float] = defaultdict(float)
        self.execute_sec: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)
        self._seen: set = set()

    @contextlib.contextmanager
    def time(self, stage: str, tag: object = None) -> Iterator[None]:
        key = (stage, tag)
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.calls[stage] += 1
            if key in self._seen:
                self.execute_sec[stage] += dt
            else:
                self._seen.add(key)
                self.compile_sec[stage] += dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for stage in sorted(set(self.compile_sec) | set(self.execute_sec)):
            out[stage] = {
                "compile_sec": round(self.compile_sec[stage], 3),
                "execute_sec": round(self.execute_sec[stage], 3),
                "calls": self.calls[stage],
            }
        return out
