"""Round-5 isolation probe: ONE fused resblock fwd+bwd vs composed XLA, on
the real TPU at the flagship training shape (batch 8, 64x64x256).

If the full-step probe (probe_fused_train.py) stalls in compile or loses
end-to-end, this separates the questions: does the mega-kernel itself (a)
compile in reasonable time, (b) beat XLA's composed resblock on the device
plane when measured alone, including its custom-VJP backward?
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

from masterthesis_tpu.ops.pallas.resblock_bf16 import fused_resblock, ref_resblock


def bench(fn, args, iters=30, reps=2):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, out)
    # relay-safe sync: materialize a scalar
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    b, h, w, c = 8, 64, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (3, 3, c, c), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (3, 3, c, c), jnp.float32) * 0.05
    gamma = jax.random.normal(ks[3], (b, c), jnp.float32) * 0.3
    beta = jax.random.normal(ks[4], (b, c), jnp.float32) * 0.3
    g = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)

    results = {}
    for name, op in (("fused", fused_resblock), ("composed", ref_resblock)):
        fwd = jax.jit(lambda x, w1, w2, gm, bt, op=op: op(x, w1, w2, gm, bt))

        def loss(x, w1, w2, gm, bt, op=op):
            y = op(x, w1, w2, gm, bt)
            return jnp.sum(y.astype(jnp.float32) * g)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        t0 = time.perf_counter()
        results[f"{name}_fwd_ms"] = round(bench(fwd, (x, w1, w2, gamma, beta)), 3)
        results[f"{name}_fwd_compile_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        results[f"{name}_fwdbwd_ms"] = round(bench(grad, (x, w1, w2, gamma, beta)), 3)
        results[f"{name}_fwdbwd_compile_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(results), flush=True)

    results["speedup_fwd"] = round(results["composed_fwd_ms"] / results["fused_fwd_ms"], 3)
    results["speedup_fwdbwd"] = round(
        results["composed_fwdbwd_ms"] / results["fused_fwdbwd_ms"], 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
