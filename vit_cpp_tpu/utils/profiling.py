"""Tracing and timing utilities.

The reference's observability is coarse wall-clock timing via ggml_time_us
around load and predict (main.cpp:28, 55-64, 101-108 — SURVEY.md §5). The
TPU equivalents:

- `Timer` — the same load/processing/total millisecond report surface;
- `trace(dir)` — a `jax.profiler` trace context producing a TensorBoard/
  Perfetto trace of the device timeline (per-op HLO timings, the tool the
  reference never had).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class Timer:
    """Named wall-clock segments, reported like the reference CLI.

    >>> t = Timer()
    >>> with t.segment("model load"): ...
    >>> with t.segment("processing"): ...
    >>> t.report()  # prints 'timer: model load time = ... ms' etc.
    """

    def __init__(self):
        self._t0 = time.perf_counter()
        self.ms: Dict[str, float] = {}

    @contextlib.contextmanager
    def segment(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.ms[name] = self.ms.get(name, 0.0) + (
                time.perf_counter() - start
            ) * 1000.0

    def total_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1000.0

    def report(self, prefix: str = "timer", file=None) -> None:
        width = max((len(k) for k in self.ms), default=0)
        for name, ms in self.ms.items():
            print(f"{prefix}:    {name:<{width}} time = {ms:8.2f} ms", file=file)
        print(
            f"{prefix}:    {'total':<{width}} time = {self.total_ms():8.2f} ms",
            file=file,
        )


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler device trace; view with TensorBoard or Perfetto.

    No-op when log_dir is None, so call sites can keep an always-on
    `with trace(args.profile_dir):` without branching.
    """
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
