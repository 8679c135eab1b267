"""Diagnose per-domain translation quality: compare generated vs real pixel
statistics for each target domain on the head-to-head checkpoints.

Loads a params_<it>.npz saved by reference_headtohead.py --side tpu, translates
val content into each domain, and prints per-channel mean/std of fakes vs
reals plus the pixel-FID evaluator's view. Saves a PNG contact sheet per
domain for eyeballing the failure mode.

Usage: python scripts/diag_domain_stats.py --ckpt /tmp/headtohead/tpu_ckpt/params_1000.npz
"""
from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quality_trend import DOMAINS  # noqa: E402
from reference_headtohead import CFG, eval_translator  # noqa: E402


def load_params(path):
    flat = dict(np.load(path))
    nested = {}
    for k, v in flat.items():
        keys = re.findall(r"\['([^']+)'\]", k)
        d = nested
        for kk in keys[:-1]:
            d = d.setdefault(kk, {})
        d[keys[-1]] = v
    return nested


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="/tmp/headtohead")
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--dtype", default="bfloat16")
    cli = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.data.datasets import ImageList
    from masterthesis_tpu.data.transforms import TrainTransform
    from masterthesis_tpu.models import AdaINModel

    targs = default_train_args(
        dataroot=os.path.join(cli.out, "data"), model=AdaINModel,
        crop_size=cli.size, load_size=cli.size + 16,
        use_dis_content=False, reparam=True, concat=False,
        compute_dtype=cli.dtype, mode="train", logdir=None,
        **{k: v for k, v in CFG.items() if k not in ("input_dim",)},
    )
    model = AdaINModel(targs)
    params = load_params(cli.ckpt)
    fwd = model._forward_random_jit

    transform = TrainTransform(cli.size + 16, cli.size, train=False)
    mode_dir = os.path.join(cli.out, "data", "val")
    rng = np.random.default_rng(123)

    print(f"{'domain':8} {'src':>12} {'fake mean (RGB)':>24} {'real mean (RGB)':>24} "
          f"{'fake std':>20} {'real std':>20}")
    from PIL import Image

    for t, domain in enumerate(sorted(DOMAINS)):
        real_paths = ImageList(os.path.join(mode_dir, domain)).dataset[:32]
        reals = np.stack([transform.load_file(p) for p in real_paths])
        content_paths = []
        for d2 in sorted(DOMAINS):
            if d2 != domain:
                content_paths += ImageList(os.path.join(mode_dir, d2)).dataset[:11]
        imgs = np.stack([transform.load_file(p) for p in content_paths[:32]]).astype(np.float32)
        z = rng.standard_normal((len(imgs), CFG["latent_dim"])).astype(np.float32)
        trg = np.tile(np.eye(4, dtype=np.float32)[t], (len(imgs), 1))
        fake = np.asarray(fwd(params, jnp.asarray(imgs), jnp.asarray(z),
                              jnp.asarray(trg)), np.float32)
        f01, r01 = (fake + 1) / 2, (reals + 1) / 2
        fm = f01.mean(axis=(0, 1, 2))
        rm = r01.mean(axis=(0, 1, 2))
        # per-image spatial std, averaged: the "contrast" statistic
        fs = f01.std(axis=(1, 2)).mean(axis=0)
        rs = r01.std(axis=(1, 2)).mean(axis=0)
        print(f"{domain:8} {'mixed':>12} "
              f"{np.round(fm, 3)!s:>24} {np.round(rm, 3)!s:>24} "
              f"{np.round(fs, 3)!s:>20} {np.round(rs, 3)!s:>20}")
        # contact sheet: top row fakes, bottom row reals
        n = 8
        strip_f = np.concatenate([f01[i] for i in range(n)], axis=1)
        strip_r = np.concatenate([r01[i] for i in range(n)], axis=1)
        sheet = np.clip(np.concatenate([strip_f, strip_r], axis=0) * 255, 0, 255)
        Image.fromarray(sheet.astype(np.uint8)).save(
            os.path.join(cli.out, f"diag_{domain}.png"))

    def translate(imgs, z, trg):
        return fwd(params, jnp.asarray(imgs), jnp.asarray(z), jnp.asarray(trg))

    fids = eval_translator(translate, os.path.join(cli.out, "data"),
                           cli.size + 16, cli.size)
    print("pixel-FID:", {k: round(v, 3) for k, v in fids.items()})


if __name__ == "__main__":
    main()
