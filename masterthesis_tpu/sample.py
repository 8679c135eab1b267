"""Inference / sampling CLI.

Parity with reference src/sample.py:16-228: translate an image directory or a
video with reference-image or random styles; modes: per-target sampling,
image grid (rows=inputs, cols=targets) and multi-style grid; reports average
per-forward wall time + device memory like sample.py:173.

Run: ``python -m masterthesis_tpu.sample --dataroot ... --model AdaINModel
--resume ckpt --targets cloud fog rain sun ...``
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.arguments import TestArguments
from masterthesis_tpu.data.datasets import ImageList, VideoDataset
from masterthesis_tpu.data.loader import DataLoader
from masterthesis_tpu.data.transforms import EvalTransform, load_rgb
from masterthesis_tpu.utils import TimerBlock, save_image, save_images

DOMAIN_MAP = ["cloud", "fog", "rain", "sun"]


class Sampler:
    """Applies the model to a sample set of images or a video."""

    def __init__(self):
        self.transforms = EvalTransform()

    def load_dataset(self, args):
        with TimerBlock("Loading Dataset") as block:
            if os.path.isdir(args.dataroot):
                block.log("Load image dataset")
                dataset = ImageList(args.dataroot, transform=self.transforms)
            else:
                block.log("Load video dataset")
                dataset = VideoDataset(args.dataroot, transform=self.transforms)
            return DataLoader(
                dataset,
                batch_size=args.batch_size,
                num_workers=args.num_workers,
                drop_last=True,
            )

    def load_model(self, args):
        with TimerBlock("Creating model") as block:
            model = args.model(args)
            block.log("Initialize model")
            state = model.initialize()
            return model, state

    def load_image(self, args, img_path):
        arr = self.transforms(load_rgb(img_path))
        arr = np.repeat(arr[None], args.batch_size, axis=0)
        return jnp.asarray(arr)

    def load_target(self, args, trg):
        onehot = np.zeros((args.batch_size, args.num_domains), np.float32)
        onehot[:, int(trg)] = 1.0
        return jnp.asarray(onehot)

    def sample_batch(self, args, model, state, batch, trg, ref=None, z_sr=None, rng=None):
        trg_t = self.load_target(args, trg)
        if ref is not None:
            ref_img = self.load_image(args, ref)
            return model.forward_reference(state, jnp.asarray(batch), ref_img, trg_t, rng)
        if z_sr is not None:
            return model.forward_random(state, jnp.asarray(batch), z_sr, trg_t)
        raise ValueError("One of ref or z_sr values has to be provided.")

    def sample(self, args, model, state, dataloader, trgs=None, refs=None):
        """Per-target translation of every batch (reference sample.py:94-114)."""
        with TimerBlock("Running model"):
            rng = jax.random.PRNGKey(getattr(args, "seed", 0))
            if trgs is None:
                trgs = range(args.num_domains)
            if refs is not None:
                assert len(trgs) == len(refs), "target and reference should match the shape"
            for t, trg in enumerate(trgs):
                rng, k = jax.random.split(rng)
                z_sr = model.get_z_random(k, args.batch_size)
                for i, batch in enumerate(dataloader):
                    if refs is not None:
                        imgs, _, _ = self.sample_batch(args, model, state, batch, trg, ref=refs[t], rng=k)
                    else:
                        imgs, _, _ = self.sample_batch(args, model, state, batch, trg, z_sr=z_sr)
                    names = [
                        os.path.join(args.display_dir, str(trg), f"image{t}_{i}_{j}.jpg")
                        for j in range(len(imgs))
                    ]
                    save_images(np.asarray(imgs), names)

    def sample_diverse(self, args, model, state, dataloader, trgs=None, refs=None):
        """Diverse sampling variant: outputs under per-target-index dirs
        (reference sample.py:116-137)."""
        with TimerBlock("Running model"):
            rng = jax.random.PRNGKey(getattr(args, "seed", 0))
            if trgs is None:
                trgs = range(args.num_domains)
            if refs is not None:
                assert len(trgs) == len(refs), "target and reference should match the shape"
            for t, trg in enumerate(trgs):
                rng, k = jax.random.split(rng)
                z_sr = model.get_z_random(k, args.batch_size)
                for i, batch in enumerate(dataloader):
                    if refs is not None:
                        imgs, _, _ = self.sample_batch(args, model, state, batch, trg, ref=refs[t], rng=k)
                    else:
                        imgs, _, _ = self.sample_batch(args, model, state, batch, trg, z_sr=z_sr)
                    names = [
                        os.path.join(args.display_dir, str(t), f"{i}_{j}.jpg")
                        for j in range(len(imgs))
                    ]
                    save_images(np.asarray(imgs), names)

    def generate_image_grid(self, args, model, state, dataloader, refs=None, trgs=None):
        """rows=inputs, cols=targets grid + avg time/mem report
        (reference sample.py:139-174)."""
        exetimes, memory = [], []
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        z_sr = model.get_z_random(rng, args.batch_size) if refs is None else None
        if trgs is None:
            trgs = range(args.num_domains)
        if refs is not None:
            assert len(refs) == len(trgs), "Reference for each target class has to be provided"
        cols = []
        if refs is not None:
            # leading blank cell + reference images header row (sample.py:153-158)
            header = [np.ones_like(np.asarray(self.load_image(args, refs[0]))[:1])]
            for ref in refs:
                header.append(np.asarray(self.load_image(args, ref))[:1])
            cols.append(np.concatenate(header, axis=2))
        for i, batch in enumerate(dataloader):
            rows = [np.asarray(batch)]
            for t, trg in enumerate(trgs):
                if refs is not None:
                    imgs, dt, mem = self.sample_batch(args, model, state, batch, trg, ref=refs[t], rng=rng)
                else:
                    imgs, dt, mem = self.sample_batch(args, model, state, batch, trg, z_sr=z_sr)
                rows.append(np.asarray(imgs))
                exetimes.append(dt)
                memory.append(mem)
            cols.append(np.concatenate(rows, axis=2))
        images = np.concatenate(cols, axis=1)
        print(
            f"Avg execution time : {sum(exetimes) / len(exetimes)}, "
            f"device memory usage: {sum(memory) / len(memory)}"
        )
        save_image(images[0], "./grid.png")

    def generate_multiple_styles(self, args, model, state, image, trg, refs=None, n_samples=4):
        """1 content x n styles grid (reference sample.py:176-200)."""
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        images = []
        if isinstance(image, str):
            image = self.load_image(args, image)
        image = jnp.asarray(image)
        if refs is not None:
            n_samples = len(refs)
            for ref in refs:
                images.append(np.asarray(self.load_image(args, ref))[:1])
        images.append(np.asarray(image)[:1])
        for i in range(n_samples):
            rng, k = jax.random.split(rng)
            if refs is not None:
                imgs, _, _ = self.sample_batch(args, model, state, image, trg, ref=refs[i], rng=k)
            else:
                z_sr = model.get_z_random(k, image.shape[0])
                imgs, _, _ = self.sample_batch(args, model, state, image, trg, z_sr=z_sr)
            images.append(np.asarray(imgs)[:1])
        grid = np.concatenate(images, axis=0)
        save_image(grid, "./grid.png", nrow=len(images))

    def run(self):
        with TimerBlock("Starting sampling") as block:
            args = TestArguments().parse()
            model, state = self.load_model(args)
            dataloader = self.load_dataset(args)
            if args.targets is not None:
                args.targets = [DOMAIN_MAP.index(t) for t in args.targets]
            if args.gen_grid:
                block.log("Generating image grid")
                self.generate_image_grid(args, model, state, dataloader, args.reference, args.targets)
            elif args.gen_style:
                if not args.targets:
                    raise SystemExit(
                        "--gen_style needs a target domain: pass --targets <domain> "
                        f"(one of {DOMAIN_MAP})."
                    )
                block.log("Generating multiple style image grid")
                batch = next(iter(dataloader))
                self.generate_multiple_styles(
                    args, model, state, jnp.asarray(batch), args.targets[0], args.reference
                )
            else:
                block.log("Running sample")
                self.sample(args, model, state, dataloader, args.targets, args.reference)


if __name__ == "__main__":
    sampler = Sampler()
    sampler.run()
