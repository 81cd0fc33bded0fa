"""Profiling / tracing utilities.

Replaces the reference's ad-hoc ``TorchTimer``
(``mmdet3d/utils/timer.py:4-53``) and unused torch.profiler import
(SURVEY.md §5) with jax-native tooling: a device-synchronized step timer and
a context manager around ``jax.profiler`` producing Perfetto-compatible
traces.
"""
from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Rolling device-synchronized step timing with periodic reporting."""

    def __init__(self, name: str = "step", report_every: int = 50):
        self.name = name
        self.report_every = report_every
        self._count = 0
        self._acc = 0.0
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._acc += time.perf_counter() - self._t
        self._count += 1
        if self._count % self.report_every == 0:
            avg = self._acc / self.report_every
            self._acc = 0.0
            print(f"[{self.name}] avg {avg * 1000:.1f} ms "
                  f"over last {self.report_every} steps")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (view with Perfetto / TensorBoard).

    Usage:
        with trace("/tmp/jax-trace"):
            step_fn(...)  # traced region
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # some backends don't support tracing
        print(f"profiler unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                print(f"profiler stop failed: {e}")


def annotate(name: str):
    """Named trace span (jax.profiler.TraceAnnotation) for host-side code."""
    return jax.profiler.TraceAnnotation(name)
