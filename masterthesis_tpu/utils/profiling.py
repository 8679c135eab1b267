"""Profiling / tracing utilities.

TPU-native upgrade of the reference's rudimentary instrumentation (TimerBlock
console logger utils.py:150-173; per-forward wall-time + cuda-memory returns
base_model.py:112-128): ``jax.profiler`` trace capture (viewable in
TensorBoard/Perfetto), a per-step timer with proper ``block_until_ready``
synchronization, and device-memory queries.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Measures per-step wall time with device synchronization on demand.

    Unlike the reference's time.time() around async dispatch, ``lap(out)``
    blocks on the step's outputs so the measurement covers device execution.
    """

    def __init__(self, sync_every: int = 100):
        self.sync_every = sync_every
        self.reset()

    def reset(self):
        self._count = 0
        self._start = time.perf_counter()

    def lap(self, outputs=None) -> Optional[float]:
        """Count one step; returns steps/sec at each sync point, else None."""
        self._count += 1
        if self._count % self.sync_every == 0:
            if outputs is not None:
                jax.tree.map(
                    lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                    outputs,
                )
            dt = time.perf_counter() - self._start
            rate = self.sync_every / dt
            self._start = time.perf_counter()
            return rate
        return None


def device_memory_stats(device=None) -> dict:
    """Per-device memory stats (bytes_in_use etc.); {} if unsupported."""
    dev = device or jax.local_devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}


def device_memory_gb(device=None) -> float:
    return device_memory_stats(device).get("bytes_in_use", 0) / (1024**3)


class TimerBlock:
    """Console section logger: a heading line, then elapsed-stamped entries.

    Covers the job of the reference's console logger (utils.py:150-173) with
    one monotonic clock and no stored end-state; structured per-step timing
    lives in StepTimer above.
    """

    def __init__(self, title: str):
        self._t0 = time.perf_counter()
        print(title, flush=True)

    def __enter__(self) -> "TimerBlock":
        self._t0 = time.perf_counter()
        return self

    def log(self, message: str) -> None:
        dt = time.perf_counter() - self._t0
        stamp = f"{dt:.3f}s" if dt <= 60 else f"{dt / 60:.3f}m"
        print(f"  [{stamp}] {message}", flush=True)

    def __exit__(self, exc_type, exc, tb) -> None:
        self.log("Operation failed\n" if exc_type else "Operation finished\n")


class AverageMeter:
    """Streaming weighted mean of a scalar, with display formatting
    (reference utils.py:175-196's role; the mean is derived, not stored)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def update(self, val, n: int = 1) -> None:
        self.val = val
        self.sum += val * n
        self.count += n

    def __str__(self) -> str:
        spec = self.fmt.lstrip(":")
        return f"{self.name} {format(self.val, spec)} ({format(self.avg, spec)})"
