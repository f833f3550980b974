"""Profiling and debug instrumentation (SURVEY.md §5.1-5.2 rebuild items).

The reference has no tracing/profiling beyond tqdm. Here:
  - `trace(...)`: context manager around `jax.profiler` writing a
    Perfetto/TensorBoard-compatible trace directory;
  - `StepTimer`: rolling per-step wall-time stats with proper device sync;
  - `debug_mode()`: enables jax NaN/inf checking (the sanitizer analogue for
    a pure-XLA stack) plus disable_jit for interactive debugging.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "profile", host_tracer_level: int = 2):
    """Capture a profiler trace: view with TensorBoard or ui.perfetto.dev."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-time statistics for jitted steps.

    Call `sync_point(value)` with any device scalar from the step output to
    force completion before reading the clock (block_until_ready alone can
    return early on remote-execution backends).
    """

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)  # device -> host fetch = hard sync
        dt = time.perf_counter() - self._last
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else 0.0


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """NaN/inf checking (+ optionally eager execution) for debugging runs."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
            ctx.enter_context(jax.debug_infs(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield
