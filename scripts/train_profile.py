"""Device-plane profile of the full training step (VERDICT r2 #3).

Runs the flagship AdaINModel main step (D1+D2+G1+G2 + content-D confusion
term, one jitted donated call — reference base_model.py:461-470 iteration)
under the JAX profiler and prints:
  - total on-device ms/iter (the truth the 224 ms r2 number came from)
  - time grouped by op category (convolution fusions, plain fusions,
    optimizer-ish elementwise, copies, custom calls, ...)
  - top-N individual ops

Usage:
  python scripts/train_profile.py [--batch 8] [--size 256] [--iters 6]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def categorize(name: str) -> str:
    # categorize by the INSTRUCTION NAME only (the `%op = ` prefix) — the
    # full HLO string lists operands, and a fusion consuming a %copy-done
    # or %custom-call operand must not inherit that operand's category
    # (this bug once attributed 64 ms of backward fusions to "custom call").
    n = name.lower().split(" = ")[0].lstrip("%")
    if "fusion" in n:
        if "conv" in n:
            return "conv fusion"
        if "reduce" in n:
            return "reduce fusion"
        return "elementwise fusion"
    if n.startswith("convolution"):
        return "convolution"
    if n.startswith("custom-call"):
        return "custom call (pallas/conv-lib)"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reverse" in n:
        return "copy/layout"
    if "reduce" in n:
        return "reduce"
    if "scatter" in n or "dynamic-update" in n:
        return "scatter/dus"
    if "rng" in n or "random" in n:
        return "rng"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--gan_step", choices=["reference", "fused"], default="reference")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.utils import devtime

    args = default_train_args(
        crop_size=cli.size, dim=cli.dim, latent_dim=8, num_domains=4,
        batch_size=cli.batch, compute_dtype="bfloat16", use_dis_content=True,
        logdir=None, mode="train", gan_step=cli.gan_step,
    )
    model = AdaINModel(args)
    state = model.initialize()
    rng = jax.random.PRNGKey(1)
    mk = lambda k: jax.random.uniform(  # noqa: E731
        jax.random.fold_in(rng, k), (cli.batch, cli.size, cli.size, 3),
        jnp.float32, -1.0, 1.0,
    )
    y = jax.nn.one_hot(jnp.arange(cli.batch) % args.num_domains, args.num_domains)
    batch_dict = {"x1": mk(0), "x2": mk(1), "y1": y, "y2": y[::-1]}

    # compile + one forced run outside the trace
    st, logs = model._main_step(state, batch_dict, rng, {})
    float(jnp.asarray(logs["total_g"], jnp.float32))

    import tempfile
    td = tempfile.mkdtemp(prefix="train_prof_")
    jax.profiler.start_trace(td)
    for i in range(cli.iters):
        st, logs = model._main_step(st, batch_dict, jax.random.fold_in(rng, i), {})
    float(jnp.asarray(logs["total_g"], jnp.float32))
    jax.profiler.stop_trace()

    mods = devtime.device_module_times(td)
    ops = devtime.device_op_times(td)

    print("== modules (median ms/call) ==")
    import statistics
    for k, v in sorted(mods.items(), key=lambda kv: -statistics.median(kv[1])):
        print(f"  {statistics.median(v):9.3f}  x{len(v):<3d} {k}")

    per_iter = {k: v / cli.iters for k, v in ops.items()}
    total = sum(per_iter.values())
    print(f"\n== total on-device op time: {total:.1f} ms/iter "
          f"(batch {cli.batch}, {cli.size}px, {cli.iters} iters traced) ==")

    cats = {}
    for k, v in per_iter.items():
        cats[categorize(k)] = cats.get(categorize(k), 0.0) + v
    print("\n== by category ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:9.2f} ms  {100*v/total:5.1f}%  {k}")

    print(f"\n== top {cli.top} ops (ms/iter) ==")
    for k, v in sorted(per_iter.items(), key=lambda kv: -kv[1])[: cli.top]:
        print(f"  {v:8.3f}  {k[:140]}")

    n_ops = len(per_iter)
    print(f"\n== {n_ops} distinct ops in trace; trace dir {td} ==")
    print(json.dumps({"total_ms_per_iter": round(total, 2),
                      "n_ops": n_ops,
                      "categories": {k: round(v, 2) for k, v in cats.items()}}))


if __name__ == "__main__":
    main()
