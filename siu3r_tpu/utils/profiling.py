"""Profiling / step-timing utilities (SURVEY.md §5.1 — the reference has
none; first-class here because hitting the passes/sec target requires
per-stage visibility).

``trace(dir)`` captures a jax.profiler trace viewable in TensorBoard /
Perfetto; ``StepTimer`` aggregates host-side stage timings with correct
device synchronization through the axon tunnel (block_until_ready does not
synchronize there — a host transfer does, see .claude/skills/verify)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of all computations producing ``tree``. Through the
    axon tunnel only a host transfer reliably synchronizes, so reduce one
    leaf to host."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


class StepTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                sync(result)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) for k in sorted(self.totals)
        }

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v * 1000:.1f}ms" for k, v in self.summary().items()
        )
