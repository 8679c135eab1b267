"""int8 serving quality on TRAINED weights (VERDICT r3 Next #5).

Round 3 proved the int8 serving path only on random-init params (PSNR gate
in bench.py). This measures the claim a user actually cares about: on a
trained checkpoint, the pixel-FID delta and output PSNR between the bf16
path and the calibrated int8 path, via the same `evaluate()` used by the
quality-trend harness.

Usage (after a quality_trend run has left checkpoints):
  python scripts/int8_quality.py --ckpt /tmp/quality_trend/exp_AdaINModel_s0/checkpoints/model_3000.ckpt \
      --dataroot /tmp/quality_trend/data --model AdaINModel [--size 128]
Writes benchmarks/int8_quality_r4.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--model", default="AdaINModel",
                    choices=["AdaINModel", "BaseModel"])
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--dim", type=int, default=64,
                    help="base channel width the checkpoint was trained at")
    ap.add_argument("--num_styles", type=int, default=2)
    ap.add_argument("--out", default="benchmarks/int8_quality_r5.json")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from masterthesis_tpu.arguments import default_test_args
    from masterthesis_tpu.data.datasets import ImageList
    from masterthesis_tpu.data.transforms import TrainTransform
    from masterthesis_tpu.evaluate import evaluate
    from masterthesis_tpu.models import AdaINModel, BaseModel

    model_cls = {"AdaINModel": AdaINModel, "BaseModel": BaseModel}[cli.model]
    args = default_test_args(
        dataroot=cli.dataroot, model=model_cls, batch_size=1, num_domains=4,
        dim=cli.dim, reparam=True, concat=True, compute_dtype="bfloat16",
        crop_size=cli.size, load_size=cli.size + 16, resume=cli.ckpt,
        logdir=None, mode="test", display_dir="/tmp/int8_quality_eval",
        fid_extractor="pixel",
    )
    model = model_cls(args)
    state = model.initialize()

    res_bf16 = evaluate(args, model, state, num_styles=cli.num_styles)

    # calibrate exactly like evaluate.main / sample.py do (2 batches of 8)
    mode_dir = os.path.join(cli.dataroot, "train")
    transform = TrainTransform(args.load_size, args.crop_size, train=False)
    calib = ImageList(mode_dir, transform=transform)
    imgs = np.stack([calib[i] for i in range(min(len(calib), 16))])
    model.calibrate_int8(state, [b for b in np.array_split(imgs, 2) if len(b)])

    # output PSNR on trained weights, identical inputs/styles both paths
    rng = jax.random.PRNGKey(0)
    batch = jnp.asarray(imgs[:8])
    z = model.get_z_random(rng, 8)
    trg = jax.nn.one_hot(jnp.zeros((8,), jnp.int32) + 1, 4)
    params = state.params if hasattr(state, "params") else state
    int8_out = np.asarray(model._forward_random_jit(params, batch, z, trg), np.float32)
    model.disable_int8()
    bf16_out = np.asarray(model._forward_random_jit(params, batch, z, trg), np.float32)
    model.calibrate_int8(state, [b for b in np.array_split(imgs, 2) if len(b)])
    mse = float(np.mean((int8_out - bf16_out) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))

    res_int8 = evaluate(args, model, state, num_styles=cli.num_styles)

    def mean_fid(res):
        return float(np.mean([r["fid"] for r in res.values()]))

    report = {
        "ckpt": cli.ckpt,
        "model": cli.model,
        "size": cli.size,
        "pixel_fid_bf16": round(mean_fid(res_bf16), 4),
        "pixel_fid_int8": round(mean_fid(res_int8), 4),
        "pixel_fid_delta": round(mean_fid(res_int8) - mean_fid(res_bf16), 4),
        "per_domain_bf16": {k: round(v["fid"], 4) for k, v in res_bf16.items()},
        "per_domain_int8": {k: round(v["fid"], 4) for k, v in res_int8.items()},
        "psnr_trained_weights_db": round(psnr, 2),
    }
    os.makedirs(os.path.dirname(cli.out), exist_ok=True)
    existing = {}
    if os.path.exists(cli.out):
        with open(cli.out) as f:
            existing = json.load(f)
    existing[cli.model] = report
    with open(cli.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
