"""Profiling helpers: jax.profiler traces + named host-side ranges.

TPU equivalent of the reference's NVTX range context manager + nsys workflow
(reference: vista_slam/utils/device.py:78-88, SURVEY.md section 5.1). The
per-stage wall-clock time_dict lives on OnlineSLAM with the same key schema
as the reference (slam.py:63-70).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace_range(name: str):
    """Named range visible in the jax profiler timeline (NVTX analog)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a full device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock stage timer with the reference's schema."""

    def __init__(self, *stages: str):
        self.times = dict.fromkeys(stages, 0.0)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[stage] = self.times.get(stage, 0.0) + time.time() - t0

    def summary(self) -> dict:
        out = dict(self.times)
        out["total"] = sum(self.times.values())
        return out
