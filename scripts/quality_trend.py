"""Quality trend line: train the flagship config and track FID / LPIPS-diversity.

Addresses the "no trained-model quality number" gap: real pretrained
Inception/LPIPS weights are not obtainable in this environment, so FID here
uses the FIXED random-weight Inception (seeded identically every run) —
meaningless in absolute terms but SELF-RELATIVE: the same command next round
must produce an equal-or-better trend or something regressed.

Builds a synthetic 4-domain dataset with learnable structure (domain =
distinct color cast + texture), trains `train.sh`'s flagship config
(AdaINModel, PairedDataset, content-D schedule, reparam, concat) for
--iters iterations, then evaluates every checkpoint with
masterthesis_tpu.evaluate (per-domain FID + LPIPS diversity).

Run: JAX_COMPILATION_CACHE_DIR=/tmp/tpu_jax_cache python scripts/quality_trend.py \
        --iters 3000 --size 128 --out /tmp/quality_trend
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOMAINS = ["cloud", "fog", "rain", "sun"]


def make_dataset(root: str, per_domain: int = 120, size: int = 160, seed: int = 0):
    """Domains share shape content but differ in color/texture statistics."""
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(seed)
    casts = {
        "cloud": (0.75, 0.75, 0.85),
        "fog": (0.9, 0.9, 0.9),
        "rain": (0.45, 0.5, 0.65),
        "sun": (1.0, 0.85, 0.55),
    }
    # val needs enough samples for a well-conditioned (sliced) FID covariance
    for mode, n in (("train", per_domain), ("val", 96)):
        for d in DOMAINS:
            out = os.path.join(root, mode, d)
            os.makedirs(out, exist_ok=True)
            for i in range(n):
                # shared content family: random rectangles + gradient sky
                img = np.zeros((size, size, 3), np.float32)
                sky = np.linspace(0.9, 0.4, size)[:, None]
                img[:] = sky[..., None]
                for _ in range(6):
                    x0, y0 = rng.integers(0, size - 20, 2)
                    w, h = rng.integers(10, size // 2, 2)
                    col = rng.uniform(0.1, 0.9, 3)
                    img[y0 : y0 + h, x0 : x0 + w] = col
                cast = np.array(casts[d])
                img = img * cast[None, None]
                if d == "fog":
                    img = img * 0.5 + 0.45
                if d == "rain":
                    streaks = (rng.random((size, size)) < 0.02).astype(np.float32)
                    img = np.clip(img - streaks[..., None] * 0.3, 0, 1)
                if d == "sun":
                    yy, xx = np.mgrid[0:size, 0:size] / size
                    img = np.clip(img + 0.25 * np.exp(-((yy - 0.2) ** 2 + (xx - 0.7) ** 2) * 8)[..., None], 0, 1)
                noise = rng.normal(0, 0.03, img.shape)
                arr = np.clip((img + noise) * 255, 0, 255).astype(np.uint8)
                im = Image.fromarray(arr)
                if d == "cloud":
                    im = im.filter(ImageFilter.GaussianBlur(1.2))
                im.save(os.path.join(out, f"img{i}.jpg"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--out", type=str, default="/tmp/quality_trend")
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--num_styles", type=int, default=2)
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; evaluate existing checkpoints")
    ap.add_argument("--seed", type=int, default=0,
                    help="training PRNG seed (run >=2 seeds for a noise floor)")
    ap.add_argument("--model", choices=["AdaINModel", "BaseModel"],
                    default="AdaINModel",
                    help="which flagship model family to trend")
    args_cli = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
    dataroot = os.path.join(args_cli.out, "data")
    if not os.path.isdir(dataroot):
        print("generating synthetic 4-domain dataset ...")
        make_dataset(dataroot, size=args_cli.size + 32)

    from masterthesis_tpu.arguments import default_test_args, default_train_args
    from masterthesis_tpu.data.datasets import PairedDataset
    from masterthesis_tpu.evaluate import evaluate
    from masterthesis_tpu.models import AdaINModel, BaseModel
    from masterthesis_tpu.train import Trainer

    model_cls = {"AdaINModel": AdaINModel, "BaseModel": BaseModel}[args_cli.model]
    run_name = f"exp_{args_cli.model}_s{args_cli.seed}"
    exp = os.path.join(args_cli.out, run_name)
    targs = default_train_args(
        dataroot=dataroot,
        model=model_cls,
        dataset=PairedDataset,
        batch_size=args_cli.batch_size,
        num_domains=4,
        use_dis_content=True,
        reparam=True,
        concat=True,
        compute_dtype="bfloat16",
        crop_size=args_cli.size,
        load_size=args_cli.size + 16,
        n_iters=args_cli.iters,
        max_iter=args_cli.iters,
        print_freq=200,
        save_freq=args_cli.ckpt_every,
        display_freq=args_cli.iters,
        num_workers=1,
        shuffle=True,
        logdir=None,
        exp_dir=args_cli.out,
        name=run_name,
        seed=args_cli.seed,
        checkpoint_dir=os.path.join(exp, "checkpoints"),
        display_dir=os.path.join(exp, "images"),
    )
    os.makedirs(targs.checkpoint_dir, exist_ok=True)
    os.makedirs(targs.display_dir, exist_ok=True)
    if not args_cli.eval_only:
        print(f"training {args_cli.iters} iters ...")
        Trainer().run(targs)

    # ---- evaluate every checkpoint ----
    rows = []
    for it in sorted(
        int(f.split("_")[1].split(".")[0])
        for f in os.listdir(targs.checkpoint_dir)
        if f.startswith("model_")
    ):
        eargs = default_test_args(
            dataroot=dataroot,
            model=model_cls,
            batch_size=1,
            num_domains=4,
            reparam=True,
            concat=True,
            compute_dtype="bfloat16",
            crop_size=args_cli.size,
            load_size=args_cli.size + 16,
            resume=os.path.join(targs.checkpoint_dir, f"model_{it}.ckpt"),
            logdir=None,
            mode="test",
            display_dir=os.path.join(exp, "eval"),
            # pixel-statistics FID (48-d thumbnail features): random-weight
            # Inception features collapse to ~constant (std ~1e-5) so any
            # Inception-based FID is exactly 0 here; pixel stats are the
            # honest weights-free self-relative trend metric
            fid_extractor="pixel",
        )
        model = model_cls(eargs)
        state = model.initialize()
        res = evaluate(eargs, model, state, num_styles=args_cli.num_styles)
        mean_fid = float(np.mean([r["fid"] for r in res.values()]))
        mean_div = float(np.mean([r["lpips_diversity"] for r in res.values()]))
        row = {"iter": it, "mean_fid": round(mean_fid, 2),
               "mean_lpips_diversity": round(mean_div, 4),
               "per_domain": {k: {m: round(float(v), 3) for m, v in r.items()}
                              for k, r in res.items()}}
        rows.append(row)
        print(json.dumps(row))
    trend_path = os.path.join(args_cli.out, f"trend_{run_name}.json")
    with open(trend_path, "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote", trend_path)


if __name__ == "__main__":
    main()
