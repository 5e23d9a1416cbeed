"""Tracing / profiling — absent from the reference (SURVEY.md §5); here a
thin wrapper over ``jax.profiler`` producing Perfetto/TensorBoard traces,
plus a step-timing context for the points/sec/chip harness."""

from __future__ import annotations

import contextlib
import pathlib
import time

import jax

from gspn_tpu.utils.timing import sync


@contextlib.contextmanager
def trace(log_dir: str | pathlib.Path):
    """Capture a device trace: view with TensorBoard's profile plugin or
    Perfetto (trace.json.gz under ``log_dir``)."""
    pathlib.Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing with completion sync; reports points/sec."""

    def __init__(self, points_per_step: int, window: int = 20):
        self.pps = points_per_step
        self.window = window
        self._times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            sync(outputs)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean_step_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def points_per_sec(self) -> float:
        m = self.mean_step_s
        return self.pps / m if m > 0 else 0.0


def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTraceWindow:
    """Trace a contiguous window of training steps (the trainers'
    ``--profile-steps N`` flag): capture begins at the first post-warmup
    step (``start``) and ends ``count`` steps later. ``tick(i)`` is
    called once per step index; ``close()`` guarantees the trace is
    stopped even if training ends inside the window."""

    def __init__(self, log_dir, start: int, count: int):
        self.log_dir = pathlib.Path(log_dir)
        self.start = start
        self.count = count
        self._active = False

    def tick(self, i: int):
        if self.count <= 0:
            return
        if not self._active and i == self.start:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.log_dir))
            self._active = True
        elif self._active and i >= self.start + self.count:
            self.close()

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written under {self.log_dir}")
