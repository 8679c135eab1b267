"""Evaluation driver: translate a validation set and score it.

One-command version of the reference's manual eval workflow (translate with
sample.py, then run misc/compute_fid.py + misc/compute_lpips.py separately):
for each target domain, translate every validation image with N random
styles, write the outputs, and report

- FID(translated -> target-domain real images) per domain (metrics.fid), and
- mean pairwise LPIPS across the N styles per content image (diversity,
  the reference's multimodality measure).

Run: ``python -m masterthesis_tpu.evaluate --dataroot DATA --model AdaINModel
--resume ckpt --num_domains 4 ...`` — expects DATA/<mode>/<domain>/ dirs.
Supply --fid_weights / --lpips_weights npzs (tools/convert_weights.py) for
numbers comparable to pytorch-fid / the lpips package.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.arguments import TestArguments
from masterthesis_tpu.data.datasets import ImageList
from masterthesis_tpu.data.transforms import TrainTransform
from masterthesis_tpu.utils import TimerBlock, save_images


def evaluate(args, model, state, num_styles: int = 2):
    """Returns {domain_name: {'fid': float, 'lpips_diversity': float}}."""
    from masterthesis_tpu.metrics.fid import FID
    from masterthesis_tpu.metrics.lpips import make_lpips_fn

    rng = jax.random.PRNGKey(getattr(args, "seed", 0))
    mode_dir = os.path.join(args.dataroot, args.mode if args.mode != "test" else "val")
    if not os.path.isdir(mode_dir):
        mode_dir = os.path.join(args.dataroot, "train")
    domains = sorted(os.listdir(mode_dir))
    transform = TrainTransform(args.load_size, args.crop_size, train=False)
    lpips_fn = make_lpips_fn(getattr(args, "lpips_weights", None))
    results = {}
    for t, domain in enumerate(domains):
        fid = FID(weights_path=getattr(args, "fid_weights", None))
        # real images of the target domain
        real_ds = ImageList(os.path.join(mode_dir, domain), transform=transform)
        # content images: every OTHER domain
        content_paths = []
        for d2 in domains:
            if d2 != domain:
                content_paths += ImageList(os.path.join(mode_dir, d2)).dataset
        content_paths = content_paths[: len(real_ds)]
        trg = jnp.asarray(np.eye(args.num_domains, dtype=np.float32)[t][None])
        diversity = []
        for i, path in enumerate(content_paths):
            img = jnp.asarray(transform.load_file(path))[None]
            outs = []
            for s in range(num_styles):
                rng, k = jax.random.split(rng)
                z = model.get_z_random(k, 1)
                fake, _, _ = model.forward_random(state, img, z, trg)
                outs.append(np.asarray(fake[0], np.float32))
            if getattr(args, "save_visuals", False):
                names = [
                    os.path.join(args.display_dir, domain, f"{i}_{s}.jpg")
                    for s in range(num_styles)
                ]
                save_images(np.stack(outs), names)
            # FID update: both sides mapped [-1,1] -> [0,1] (TrainTransform
            # normalizes reals to [-1,1] too; InceptionV3 expects [0,1])
            real = np.asarray(real_ds[i % len(real_ds)], np.float32)
            fid.update(((np.stack(outs[:1]) + 1.0) / 2.0, (real[None] + 1.0) / 2.0))
            if num_styles > 1:
                d = lpips_fn(jnp.asarray(outs[0])[None], jnp.asarray(outs[1])[None])
                diversity.append(float(d[0]))
        results[domain] = {
            "fid": fid.compute(),
            "lpips_diversity": float(np.mean(diversity)) if diversity else float("nan"),
        }
    return results


def main():
    parser = TestArguments()
    parser.parser.add_argument("--fid_weights", type=str, default=None)
    parser.parser.add_argument("--lpips_weights", type=str, default=None)
    parser.parser.add_argument("--num_styles", type=int, default=2)
    args = parser.parse()
    with TimerBlock("Evaluating") as block:
        model = args.model(args)
        state = model.initialize()
        results = evaluate(args, model, state, num_styles=args.num_styles)
        for domain, metrics in results.items():
            block.log(f"{domain}: FID={metrics['fid']:.3f} "
                      f"LPIPS-diversity={metrics['lpips_diversity']:.4f}")


if __name__ == "__main__":
    main()
