"""Training-step throughput sweep over (batch, remat) on the flagship config.

VERDICT r2 #3: find the config that maximizes training img/s on one chip.
Prints one JSON line per config: wall it/s (chained dispatch, the honest
driver-visible number), img/s (= it/s * 2*batch: each step consumes batch
x1 + batch x2 rows), and on-device ms/iter from the profiler plane.

Usage: python scripts/train_sweep.py --configs 8,0 8,1 16,0 16,1 32,1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(batch: int, remat: bool, size: int = 256, iters: int = 20,
                 gan_step: str = "reference"):
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.utils import devtime

    args = default_train_args(
        crop_size=size, dim=64, latent_dim=8, num_domains=4,
        batch_size=batch, compute_dtype="bfloat16", use_dis_content=True,
        remat=remat, logdir=None, mode="train", gan_step=gan_step,
    )
    model = AdaINModel(args)
    state = model.initialize()
    rng = jax.random.PRNGKey(1)
    mk = lambda k: jax.random.uniform(  # noqa: E731
        jax.random.fold_in(rng, k), (batch, size, size, 3), jnp.float32, -1.0, 1.0
    )
    y = jax.nn.one_hot(jnp.arange(batch) % args.num_domains, args.num_domains)
    bd = {"x1": mk(0), "x2": mk(1), "y1": y, "y2": y[::-1]}

    t0 = time.perf_counter()
    state, logs = model._main_step(state, bd, rng, {})
    float(jnp.asarray(logs["total_g"], jnp.float32))
    compile_s = time.perf_counter() - t0

    # wall clock, chained dispatch
    start = time.perf_counter()
    for i in range(iters):
        state, logs = model._main_step(state, bd, jax.random.fold_in(rng, i), {})
    float(jnp.asarray(logs["total_g"], jnp.float32))
    dt = time.perf_counter() - start
    its = iters / dt

    # device plane
    import tempfile
    td = tempfile.mkdtemp(prefix="sweep_")
    jax.profiler.start_trace(td)
    for i in range(4):
        state, logs = model._main_step(state, bd, jax.random.fold_in(rng, 100 + i), {})
    float(jnp.asarray(logs["total_g"], jnp.float32))
    jax.profiler.stop_trace()
    dev_ms = sum(devtime.device_op_times(td).values()) / 4

    return {
        "batch": batch, "remat": remat, "size": size, "gan_step": gan_step,
        "wall_it_s": round(its, 3),
        "img_s": round(its * 2 * batch, 1),
        "device_ms_iter": round(dev_ms, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["8,0", "8,1", "16,0", "16,1", "32,1"],
                    help="list of batch,remat[,gan_step] tuples (step: r=reference f=fused)")
    ap.add_argument("--size", type=int, default=256)
    cli = ap.parse_args()
    out = []
    for c in cli.configs:
        parts = c.split(",")
        b, r = parts[0], parts[1]
        step = {"r": "reference", "f": "fused"}[parts[2]] if len(parts) > 2 else "reference"
        try:
            res = bench_config(int(b), bool(int(r)), size=cli.size, gan_step=step)
        except Exception as e:  # OOM at large batch is a finding, not a crash
            res = {"batch": int(b), "remat": bool(int(r)), "gan_step": step,
                   "error": repr(e)[:200]}
        out.append(res)
        print(json.dumps(res), flush=True)
    with open("/tmp/train_sweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
