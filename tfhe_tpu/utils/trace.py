"""Workload tracing: PBS counting and timed spans.

TPU-native analog of the reference's ``PBS_COUNT`` instrumentation
(``tfhe/src/core_crypto/commons/mod.rs`` pbs counters used by
tfhe-benchmark to report per-op PBS budgets): every KS->PBS dispatch
records how many ciphertexts it bootstraps at the Python dispatch site
(counts are exact regardless of jit caching, since dispatch happens per
call, not per trace).

Usage::

    from tfhe_tpu.utils import trace
    trace.reset_pbs_count()
    ... run FHE ops ...
    trace.get_pbs_count()      # total ciphertext bootstraps dispatched

    with trace.span("fheuint64_mul") as s:
        ...
    s.pbs, s.seconds           # per-span counts + wall time

Spans nest; each span captures the PBS delta while it is open. There is
also a ``jax.profiler`` bridge: ``trace.profile(path)`` wraps a block in
a profiler trace for per-kernel TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

_PBS_COUNT = 0
_KS_COUNT = 0


def add_pbs(n: int) -> None:
    global _PBS_COUNT
    _PBS_COUNT += int(n)


def add_ks(n: int) -> None:
    global _KS_COUNT
    _KS_COUNT += int(n)


def get_pbs_count() -> int:
    return _PBS_COUNT


def get_ks_count() -> int:
    return _KS_COUNT


def reset_pbs_count() -> None:
    global _PBS_COUNT, _KS_COUNT
    _PBS_COUNT = 0
    _KS_COUNT = 0


@dataclass
class Span:
    name: str
    pbs: int = 0
    ks: int = 0
    seconds: float = 0.0
    children: List["Span"] = field(default_factory=list)

    def report(self, indent: int = 0) -> str:
        lines = [
            "%s%s: %d PBS, %d KS, %.3fs"
            % ("  " * indent, self.name, self.pbs, self.ks, self.seconds)
        ]
        for c in self.children:
            lines.append(c.report(indent + 1))
        return "\n".join(lines)


_SPAN_STACK: List[Span] = []


@contextlib.contextmanager
def span(name: str):
    """Record PBS/KS counts and wall time for a block; nests."""
    s = Span(name)
    if _SPAN_STACK:
        _SPAN_STACK[-1].children.append(s)
    _SPAN_STACK.append(s)
    pbs0, ks0, t0 = _PBS_COUNT, _KS_COUNT, time.perf_counter()
    try:
        yield s
    finally:
        s.pbs = _PBS_COUNT - pbs0
        s.ks = _KS_COUNT - ks0
        s.seconds = time.perf_counter() - t0
        _SPAN_STACK.pop()


@contextlib.contextmanager
def profile(log_dir: str):
    """jax.profiler bridge: capture a TPU trace viewable in TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
