"""Device-plane profile of the int8 serving forward (headline path).

Traces the flagship AdaINModel ``forward_random`` (content encode + AdaIN
decode — reference base_model.py:112-117) after int8 calibration and prints
per-op device time, grouped by category, plus the top-N individual ops — the
lens for finding whatever bf16/elementwise segments remain around the int8
Pallas kernels.

Usage:
  python scripts/serve_profile.py [--batch 256] [--size 256] [--iters 8]
  python scripts/serve_profile.py --no-int8    # profile the bf16 path
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_profile import categorize  # noqa: E402  (same attribution rules)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-int8", action="store_true",
                    help="profile the bf16 forward instead of int8 serving")
    ap.add_argument("--model", default="AdaINModel",
                    choices=["AdaINModel", "BaseModel"],
                    help="BaseModel profiles the concat decoder serving path")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from masterthesis_tpu.arguments import default_test_args
    from masterthesis_tpu.models import AdaINModel, BaseModel
    from masterthesis_tpu.utils import devtime

    model_cls = {"AdaINModel": AdaINModel, "BaseModel": BaseModel}[cli.model]
    extra = {"concat": True, "reparam": True} if cli.model == "BaseModel" else {}
    args = default_test_args(
        crop_size=cli.size, dim=cli.dim, latent_dim=8, num_domains=4,
        batch_size=cli.batch, compute_dtype="bfloat16", logdir=None, **extra,
    )
    model = model_cls(args)
    state = model.initialize()

    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(
        rng, (cli.batch, cli.size, cli.size, 3), jnp.float32, -1.0, 1.0
    )
    z = model.get_z_random(rng, cli.batch)
    c = jax.nn.one_hot(jnp.zeros((cli.batch,), jnp.int32) + 3, args.num_domains)

    if not cli.no_int8:
        rows = np.asarray(img[: min(cli.batch, 16)])
        calib = [b for b in np.array_split(rows, 2) if len(b)]
        model.calibrate_int8(state, calib)

    fwd = model._forward_random_jit
    np.asarray(fwd(state.params, img, z, c))  # compile + settle

    td = tempfile.mkdtemp(prefix="serve_prof_")
    jax.profiler.start_trace(td)
    out = None
    for _ in range(cli.iters):
        out = fwd(state.params, img, z, c)
    float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()

    mods = devtime.device_module_times(td)
    ops = devtime.device_op_times(td)

    print("== modules (median ms/call) ==")
    for k, v in sorted(mods.items(), key=lambda kv: -statistics.median(kv[1])):
        print(f"  {statistics.median(v):9.3f}  x{len(v):<3d} {k}")

    per_iter = {k: v / cli.iters for k, v in ops.items()}
    total = sum(per_iter.values())
    tag = "bf16" if cli.no_int8 else "int8"
    print(f"\n== total on-device op time: {total:.2f} ms/call "
          f"({tag}, batch {cli.batch}, {cli.size}px) "
          f"=> {cli.batch / total * 1000:.0f} img/s device ==")

    cats = {}
    for k, v in per_iter.items():
        cats[categorize(k)] = cats.get(categorize(k), 0.0) + v
    print("\n== by category ==")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:9.3f} ms  {100*v/total:5.1f}%  {k}")

    print(f"\n== top {cli.top} ops (ms/call) ==")
    for k, v in sorted(per_iter.items(), key=lambda kv: -kv[1])[: cli.top]:
        print(f"  {v:8.3f}  {k[:150]}")

    print(f"\n== {len(per_iter)} distinct ops; trace dir {td} ==")
    print(json.dumps({"total_ms_per_call": round(total, 3),
                      "img_per_s_device": round(cli.batch / total * 1000, 1),
                      "categories": {k: round(v, 3) for k, v in cats.items()}}))


if __name__ == "__main__":
    main()
