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
    # FID feature space options:
    # - default: Inception-2048 (needs --fid_weights for reference-comparable
    #   numbers; with random weights deep-net features collapse to ~constant
    #   and FID degenerates to exactly 0 — measured std ~1e-5)
    # - 'pixel': FID over 4x4x3 thumbnail statistics (48-d) — weights-free,
    #   well-conditioned at ~100 samples, the honest self-relative TREND
    #   metric for this zero-egress environment
    # - fid_features=N: slice the Inception features to N dims
    fid_features = int(getattr(args, "fid_features", 0) or 0)
    fid_extractor = getattr(args, "fid_extractor", None)
    for t, domain in enumerate(domains):
        if fid_extractor == "pixel":
            def pixel_features(x):
                t4 = jax.image.resize(
                    x.astype(jnp.float32), (x.shape[0], 4, 4, x.shape[-1]), "linear"
                )
                return t4.reshape(x.shape[0], -1)

            fid = FID(num_features=48, feature_extractor=pixel_features)
        elif fid_features:
            from masterthesis_tpu.metrics.inception import make_inception_extractor

            base_extractor = make_inception_extractor(getattr(args, "fid_weights", None))
            fid = FID(
                num_features=fid_features,
                feature_extractor=lambda x: base_extractor(x)[:, :fid_features],
            )
        else:
            fid = FID(weights_path=getattr(args, "fid_weights", None))
        # real images of the target domain
        real_ds = ImageList(os.path.join(mode_dir, domain), transform=transform)
        # content images: every OTHER domain
        content_paths = []
        for d2 in domains:
            if d2 != domain:
                content_paths += ImageList(os.path.join(mode_dir, d2)).dataset
        content_paths = content_paths[: len(real_ds)]
        trg1 = np.eye(args.num_domains, dtype=np.float32)[t]
        diversity = []
        params = state.params if hasattr(state, "params") else state
        # batched evaluation: device dispatches per CHUNK, not per image —
        # a per-image loop pays the host/relay round trip hundreds of times
        # per domain and was the entire eval wall-clock
        eval_batch = int(getattr(args, "eval_batch", 8) or 8)
        # raw jitted forward when available: the timed forward_random
        # wrapper syncs + polls device memory per call, which through the
        # relay costs ~0.5 s/call
        fwd = getattr(model, "_forward_random_jit", None)

        def consume(p):
            """Pull a dispatched chunk to host and score it. Called one
            chunk LATE (one-deep pipeline, like sample.py's loop): the
            device computes chunk k while the host loads/scores k-1, so
            neither plane idles waiting for the other."""
            outs = [np.asarray(o, np.float32) for o in p["outs"]]
            if getattr(args, "save_visuals", False):
                for s in range(num_styles):
                    names = [
                        os.path.join(
                            args.display_dir, domain, f"{p['start'] + j}_{s}.jpg"
                        )
                        for j in range(p["bsz"])
                    ]
                    save_images(outs[s], names)
            # FID update: both sides mapped [-1,1] -> [0,1] (TrainTransform
            # normalizes reals to [-1,1] too; InceptionV3 expects [0,1])
            fid.update(((outs[0] + 1.0) / 2.0, (p["reals"] + 1.0) / 2.0))
            if p["dist"] is not None:
                diversity.extend(float(v) for v in np.asarray(p["dist"]))

        pending = None
        for start in range(0, len(content_paths), eval_batch):
            chunk = content_paths[start : start + eval_batch]
            imgs = jnp.asarray(
                np.stack([transform.load_file(p) for p in chunk])
            )
            bsz = imgs.shape[0]
            trg = jnp.asarray(np.tile(trg1, (bsz, 1)))
            outs = []
            for s in range(num_styles):
                rng, k = jax.random.split(rng)
                z = model.get_z_random(k, bsz)
                if fwd is not None:
                    fake = fwd(params, imgs, z, trg)
                else:
                    fake, _, _ = model.forward_random(state, imgs, z, trg)
                outs.append(fake)  # device ref — not materialized yet
            # LPIPS distance dispatched on the device refs directly (no
            # host round trip through np/jnp re-upload); f32 cast on device
            # preserves the old materialize-then-score numerics exactly
            dist = (
                lpips_fn(outs[0].astype(jnp.float32), outs[1].astype(jnp.float32))
                if num_styles > 1
                else None
            )
            reals = np.stack(
                [
                    np.asarray(real_ds[(start + j) % len(real_ds)], np.float32)
                    for j in range(bsz)
                ]
            )
            if pending is not None:
                consume(pending)
            pending = {"outs": outs, "dist": dist, "reals": reals,
                       "start": start, "bsz": bsz}
        if pending is not None:
            consume(pending)
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
    parser.parser.add_argument(
        "--fid_extractor", type=str, default=None, choices=[None, "pixel"],
        help="'pixel': weights-free 4x4 thumbnail-statistics FID (the "
        "self-relative trend metric; Inception FID needs --fid_weights)",
    )
    parser.parser.add_argument(
        "--fid_features", type=int, default=0,
        help="slice Inception features to N dims (small validation sets)",
    )
    args = parser.parse()
    with TimerBlock("Evaluating") as block:
        model = args.model(args)
        state = model.initialize()
        if getattr(args, "int8", False):
            block.log("Calibrating int8 serving path")
            mode_dir = os.path.join(
                args.dataroot, args.mode if args.mode != "test" else "val"
            )
            if not os.path.isdir(mode_dir):
                mode_dir = os.path.join(args.dataroot, "train")
            transform = TrainTransform(args.load_size, args.crop_size, train=False)
            calib = ImageList(mode_dir, transform=transform)
            # honor --int8_calib_batches (batch size 8, like sample.py's
            # loader batches) so evaluate-reported int8 quality matches what
            # sample serves with the same flag
            n_batches = max(1, int(getattr(args, "int8_calib_batches", 2)))
            k = min(len(calib), 8 * n_batches)
            imgs = np.stack([calib[i] for i in range(k)])
            batches = [b for b in np.array_split(imgs, n_batches) if len(b)]
            model.calibrate_int8(state, batches)
        results = evaluate(args, model, state, num_styles=args.num_styles)
        for domain, metrics in results.items():
            block.log(f"{domain}: FID={metrics['fid']:.3f} "
                      f"LPIPS-diversity={metrics['lpips_diversity']:.4f}")


if __name__ == "__main__":
    main()
