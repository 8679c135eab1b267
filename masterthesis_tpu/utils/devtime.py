"""Device-side timing via the JAX profiler (xplane parsing).

On this machine the TPU sits behind a relay whose per-dispatch overhead
(~2-16 ms) swamps wall-clock microbenchmarks. The profiler's device plane
records exact on-device module/op durations, so benchmarking here means:
trace a few calls, then read the module execution times out of the xplane.

Used by perf experiments and bench sanity checks; not on any hot path.
"""
from __future__ import annotations

import glob
import os
import tempfile
from collections import defaultdict
from typing import Callable, Dict


def _parse_xplane(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_module_times(trace_dir: str) -> Dict[str, list]:
    """Per-module on-device execution times (ms) from a profiler trace dir."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    out: Dict[str, list] = defaultdict(list)
    for p in paths:
        xsp = _parse_xplane(p)
        for plane in xsp.planes:
            if not plane.name.startswith("/device:"):
                continue
            ev_meta = {m: plane.event_metadata[m].name for m in plane.event_metadata}
            for line in plane.lines:
                if "Modules" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?").split("(")[0]
                    out[name].append(ev.duration_ps / 1e9)  # ms
    return dict(out)


def device_op_times(trace_dir: str) -> Dict[str, float]:
    """Total on-device time (ms) per HLO op name from the XLA Ops line."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    out: Dict[str, float] = defaultdict(float)
    for p in paths:
        xsp = _parse_xplane(p)
        for plane in xsp.planes:
            if not plane.name.startswith("/device:"):
                continue
            ev_meta = {m: plane.event_metadata[m].name for m in plane.event_metadata}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    out[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    return dict(out)


def measure(fns: Dict[str, Callable], iters: int = 3, trace_dir: str | None = None):
    """Run each named thunk ``iters`` times under one trace; return median
    on-device ms per call, keyed by the jit function's module name."""
    import statistics

    import jax

    td = trace_dir or tempfile.mkdtemp(prefix="devtime_")
    for fn in fns.values():
        jax.block_until_ready(fn())  # compile outside the trace
    import numpy as np
    import jax.numpy as jnp

    def _force(x):
        jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), x)

    for fn in fns.values():
        _force(fn())
    jax.profiler.start_trace(td)
    for fn in fns.values():
        outs = [fn() for _ in range(iters)]
        _force(outs[-1])
    jax.profiler.stop_trace()
    times = device_module_times(td)
    return {k: statistics.median(v) for k, v in times.items()}, td
