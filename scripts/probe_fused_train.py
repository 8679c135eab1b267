"""Round-5 probe: does the differentiable whole-block resblock kernel pay
in the full training step? (VERDICT r4 ask #1.)

Times the flagship fused-GAN main step (AdaINModel, 256px, bf16, batch 8,
use_dis_content) with --fused_resblock auto vs off, wall-clock, on the real
chip. Device-plane attribution (layout-copy traffic — the failure mode that
killed per-conv QAT) comes separately from scripts/train_attrib.py.
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

from masterthesis_tpu.arguments import default_train_args
from masterthesis_tpu.models import AdaINModel


def time_step(fused: str, iters: int = 20):
    batch, size = 8, 256
    args = default_train_args(
        crop_size=size, dim=64, latent_dim=8, num_domains=4,
        batch_size=batch, compute_dtype="bfloat16", use_dis_content=True,
        logdir=None, mode="train", gan_step="fused", fused_resblock=fused,
    )
    model = AdaINModel(args)
    state = model.initialize()
    rng = jax.random.PRNGKey(1)
    mk = lambda k: jax.random.uniform(  # noqa: E731
        jax.random.fold_in(rng, k), (batch, size, size, 3), jnp.float32, -1.0, 1.0
    )
    y = jax.nn.one_hot(jnp.arange(batch) % args.num_domains, args.num_domains)
    bd = {"x1": mk(0), "x2": mk(1), "y1": y, "y2": y[::-1]}

    state, logs = model._main_step(state, bd, rng, {})  # compile
    v0 = float(jnp.asarray(logs["total_g"], jnp.float32))
    best = 0.0
    for _rep in range(2):
        start = time.perf_counter()
        for i in range(iters):
            state, logs = model._main_step(state, bd, jax.random.fold_in(rng, i), {})
        float(jnp.asarray(logs["total_g"], jnp.float32))
        dt = time.perf_counter() - start
        best = max(best, iters / dt)
    return best, v0


def main():
    off_rate, off_v0 = time_step("off")
    on_rate, on_v0 = time_step("auto")
    print(json.dumps({
        "composed_it_s": round(off_rate, 3),
        "fused_resblock_it_s": round(on_rate, 3),
        "speedup": round(on_rate / off_rate, 4),
        "total_g_first_iter": {"composed": off_v0, "fused": on_v0},
    }))


if __name__ == "__main__":
    main()
