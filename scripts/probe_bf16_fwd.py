"""Round-5 probe: the BENCH_r04 flagship bf16 forward anomaly.

BENCH_r03 reported 1,196 img/s for the AdaINModel bf16 forward (batch 256,
256px); BENCH_r04 reported 698.55 on the same code path. This probe measures
both planes for the exact bench.py forward: wall-clock (the bench's method)
and the profiler device plane (utils/devtime.py), so we can tell whether the
regression is on-device (blocks.py changed the traced graph) or in the relay
(dispatch overhead / measurement glitch).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.arguments import default_test_args
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.utils import devtime


def main():
    batch, size = 256, 256
    args = default_test_args(
        crop_size=size, dim=64, latent_dim=8, num_domains=4, batch_size=batch,
        compute_dtype="bfloat16", logdir=None,
    )
    model = AdaINModel(args)
    state = model.initialize()
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (batch, size, size, 3), jnp.float32, -1.0, 1.0)
    z = model.get_z_random(rng, batch)
    c = jax.nn.one_hot(jnp.zeros((batch,), jnp.int32) + 3, args.num_domains)

    fwd = model._forward_random_jit
    np.asarray(fwd(state.params, img, z, c))  # compile

    # wall-clock, bench.py's exact method (chained dispatch, materialize last)
    rates = []
    for rep in range(3):
        iters = 30
        start = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(state.params, img, z, c)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = time.perf_counter() - start
        rates.append(batch * iters / dt)

    # device plane
    times, td = devtime.measure({"fwd": lambda: fwd(state.params, img, z, c)}, iters=5)
    dev = {k: round(v, 3) for k, v in times.items()}
    dev_ms = sum(v for k, v in times.items() if "jit__forward" in k or "forward" in k) or sum(times.values())

    print(json.dumps({
        "wall_rates_img_s": [round(r, 1) for r in rates],
        "device_modules_ms": dev,
        "device_rate_img_s": round(batch / (dev_ms / 1000.0), 1) if dev_ms else None,
        "trace_dir": td,
    }))


if __name__ == "__main__":
    main()
