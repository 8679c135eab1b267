"""Inference / sampling CLI.

Covers the reference sampler's capability surface (src/sample.py:16-228 —
per-target translation, diverse sampling, input-by-target grids, multi-style
grids, video-frame input, timing/memory reporting) on this framework's jitted
forward paths.

All device work happens inside ``forward_random`` / ``forward_reference``
(models/translation.py), each a single jitted call; the host side here only
loads batches and writes files.

Run: ``python -m masterthesis_tpu.sample --dataroot DIR_OR_VIDEO --model
AdaINModel --resume ckpt --targets fog sun ...``

Divergence from the reference: grids are written into the experiment's
display dir instead of the process working directory.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.arguments import TestArguments
from masterthesis_tpu.data.datasets import ImageList, VideoDataset
from masterthesis_tpu.data.loader import DataLoader
from masterthesis_tpu.data.transforms import EvalTransform, load_rgb
from masterthesis_tpu.utils import TimerBlock, save_image, save_images

#: domain index order used by --targets names
DOMAIN_MAP = ["cloud", "fog", "rain", "sun"]


def _one_hot(index: int, num_domains: int, batch: int) -> jnp.ndarray:
    onehot = np.zeros((batch, num_domains), np.float32)
    onehot[:, int(index)] = 1.0
    return jnp.asarray(onehot)


class Sampler:
    """Drives a trained model over an image directory or a video."""

    def __init__(self):
        self.transforms = EvalTransform()

    # ------------------------------------------------------------------ #
    # setup
    # ------------------------------------------------------------------ #
    def load_model(self, args):
        with TimerBlock("Building model") as block:
            model = args.model(args)
            block.log("Restoring parameters")
            state = model.initialize()
            return model, state

    def load_dataset(self, args):
        with TimerBlock("Opening input source") as block:
            if os.path.isdir(args.dataroot):
                block.log(f"Image directory: {args.dataroot}")
                dataset = ImageList(args.dataroot, transform=self.transforms)
            else:
                block.log(f"Video file: {args.dataroot}")
                dataset = VideoDataset(args.dataroot, transform=self.transforms)
            return DataLoader(
                dataset,
                batch_size=args.batch_size,
                num_workers=args.num_workers,
                drop_last=True,
            )

    def _style_image(self, args, path: str) -> jnp.ndarray:
        arr = self.transforms(load_rgb(path))
        return jnp.asarray(np.repeat(arr[None], args.batch_size, axis=0))

    def translate(self, args, model, state, batch, target: int,
                  style_path: Optional[str] = None, style_code=None, rng=None,
                  sync: bool = True):
        """One jitted translation of ``batch`` into ``target``; style comes
        from a reference image (style_path) or a latent code (style_code).
        Returns (images, seconds, device_GB) like the reference's timed
        forwards (base_model.py:112-128).

        ``sync=False`` skips the per-call device sync (timing reads 0): the
        call only ENQUEUES work and returns the device array, letting the
        batch loop pipeline dispatch k+1 against compute/readback of batch k
        (TPU executes in order, so a later materialization sees completed
        results)."""
        c_trg = _one_hot(target, args.num_domains, args.batch_size)
        params = state.params if hasattr(state, "params") else state
        if style_path is not None:
            ref_img = self._style_image(args, style_path)
            if not sync:
                if rng is None:
                    rng = jax.random.PRNGKey(0)
                out = model._forward_reference_jit(
                    params, jnp.asarray(batch), ref_img, c_trg, rng
                )
                return out, 0.0, 0.0
            return model.forward_reference(state, jnp.asarray(batch), ref_img, c_trg, rng)
        if style_code is not None:
            if not sync:
                out = model._forward_random_jit(
                    params, jnp.asarray(batch), style_code, c_trg
                )
                return out, 0.0, 0.0
            return model.forward_random(state, jnp.asarray(batch), style_code, c_trg)
        raise ValueError("provide a style reference image or a latent style code")

    # ------------------------------------------------------------------ #
    # modes
    # ------------------------------------------------------------------ #
    def _translate_all(self, args, model, state, dataloader, trgs, refs, name_fn):
        """Shared loop for sample/sample_diverse: every batch into every
        target, one fresh style per target, files named by ``name_fn``.

        ``--multi_iter N`` (> 0) renders N independently-drawn random styles
        per target instead of one, suffixing filenames with ``_s<k>`` (the
        reference parses the flag but never acts on it, arguments.py:130)."""
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        if trgs is None:
            trgs = range(args.num_domains)
        if refs is not None and len(refs) != len(trgs):
            raise ValueError(
                f"got {len(refs)} style references for {len(trgs)} targets"
            )
        multi = int(getattr(args, "multi_iter", 0) or 0)
        if refs is not None:
            # reference styles are deterministic — only ONE pass per target
            # runs, so the _s<k> suffix (random-style-iteration naming) does
            # not apply; keep ref naming identical to the non-multi_iter case
            multi = 0
        n_styles = max(1, multi)
        # one-deep pipeline: translate(sync=False) only enqueues, so batch
        # k+1's device work is dispatched before batch k is pulled to host
        # and JPEG-encoded — compute overlaps readback+encode throughout.
        pending = None
        for t, trg in enumerate(trgs):
            for s in range(n_styles):
                rng, key = jax.random.split(rng)
                style_code = model.get_z_random(key, args.batch_size)
                suffix = f"_s{s}" if multi > 0 else ""
                for i, batch in enumerate(dataloader):
                    if refs is not None:
                        imgs, _, _ = self.translate(
                            args, model, state, batch, trg,
                            style_path=refs[t], rng=key, sync=False,
                        )
                    else:
                        imgs, _, _ = self.translate(
                            args, model, state, batch, trg,
                            style_code=style_code, sync=False,
                        )
                    names = [name_fn(t, trg, i, j) for j in range(len(imgs))]
                    if suffix:
                        names = [
                            f"{os.path.splitext(n)[0]}{suffix}{os.path.splitext(n)[1]}"
                            for n in names
                        ]
                    if pending is not None:
                        save_images(np.asarray(pending[0]), pending[1])
                    pending = (imgs, names)
                if refs is not None:
                    break  # reference styles are deterministic; one pass per target
        if pending is not None:
            save_images(np.asarray(pending[0]), pending[1])

    def sample(self, args, model, state, dataloader, trgs=None, refs=None):
        """Per-target translation; outputs under display_dir/<domain-index>/
        (reference sample.py:94-114)."""
        with TimerBlock("Translating"):
            self._translate_all(
                args, model, state, dataloader, trgs, refs,
                lambda t, trg, i, j: os.path.join(
                    args.display_dir, str(trg), f"image{t}_{i}_{j}.jpg"
                ),
            )

    def sample_diverse(self, args, model, state, dataloader, trgs=None, refs=None):
        """Diverse variant: outputs under per-target-index dirs
        (reference sample.py:116-137)."""
        with TimerBlock("Translating (diverse)"):
            self._translate_all(
                args, model, state, dataloader, trgs, refs,
                lambda t, trg, i, j: os.path.join(args.display_dir, str(t), f"{i}_{j}.jpg"),
            )

    def generate_image_grid(self, args, model, state, dataloader, refs=None, trgs=None):
        """Grid with input rows and one column per target, plus a mean
        latency/memory report (reference sample.py:139-174)."""
        timings: List[float] = []
        mem_gb: List[float] = []
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        style_code = model.get_z_random(rng, args.batch_size) if refs is None else None
        if trgs is None:
            trgs = range(args.num_domains)
        if refs is not None and len(refs) != len(trgs):
            raise ValueError("each target needs a style reference image")
        columns = []
        if refs is not None:
            # header row: blank cell then the style reference images
            header = [np.ones_like(np.asarray(self._style_image(args, refs[0]))[:1])]
            header += [np.asarray(self._style_image(args, r))[:1] for r in refs]
            columns.append(np.concatenate(header, axis=2))
        for batch in dataloader:
            row = [np.asarray(batch)]
            for t, trg in enumerate(trgs):
                if refs is not None:
                    imgs, dt, mem = self.translate(
                        args, model, state, batch, trg, style_path=refs[t], rng=rng
                    )
                else:
                    imgs, dt, mem = self.translate(
                        args, model, state, batch, trg, style_code=style_code
                    )
                row.append(np.asarray(imgs))
                timings.append(dt)
                mem_gb.append(mem)
            columns.append(np.concatenate(row, axis=2))
        grid = np.concatenate(columns, axis=1)
        print(
            f"mean forward time: {np.mean(timings):.4f}s over {len(timings)} calls, "
            f"device memory: {np.mean(mem_gb):.3f} GB"
        )
        out = os.path.join(args.display_dir, "grid.png")
        save_image(grid[0], out)
        print(f"grid written to {out}")

    def sample_video(self, args, model, state, dataloader, trgs=None, refs=None):
        """Translate the input frame stream into one video per target domain.

        Wires ``--out_fmt video`` / ``--vid_fname`` through
        tools/videoreaders.FrameWriter — the reference imports FrameWriter and
        parses both flags but never writes a video (reference sample.py:11,
        arguments.py:126-127); here the flags do what they say. Frames are
        consumed in stream order with one fixed style per target so the output
        is temporally coherent."""
        from masterthesis_tpu.tools.videoreaders import FrameWriter
        from masterthesis_tpu.utils import tensor_to_image

        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        if trgs is None:
            trgs = range(args.num_domains)
        if refs is not None and len(refs) != len(trgs):
            raise ValueError(
                f"got {len(refs)} style references for {len(trgs)} targets"
            )
        fps = float(getattr(dataloader.dataset, "fps", 25.0))
        root, ext = os.path.splitext(args.vid_fname)
        with TimerBlock("Translating (video)") as block:
            for t, trg in enumerate(trgs):
                rng, key = jax.random.split(rng)
                style_code = model.get_z_random(key, args.batch_size)
                fname = f"{root}_{DOMAIN_MAP[trg]}{ext or '.avi'}"
                writer = FrameWriter(args.display_dir, outfmt="video",
                                     fname=fname, fps=fps)
                n = 0
                pending = None  # one-deep pipeline (see _translate_all)
                for batch in dataloader:
                    if refs is not None:
                        imgs, _, _ = self.translate(
                            args, model, state, batch, trg,
                            style_path=refs[t], rng=key, sync=False,
                        )
                    else:
                        imgs, _, _ = self.translate(
                            args, model, state, batch, trg,
                            style_code=style_code, sync=False,
                        )
                    if pending is not None:
                        for frame in np.asarray(pending):
                            writer.write(tensor_to_image(frame[None]), n)
                            n += 1
                    pending = imgs
                if pending is not None:
                    for frame in np.asarray(pending):
                        writer.write(tensor_to_image(frame[None]), n)
                        n += 1
                writer.close()
                block.log(
                    f"{n} frames -> {os.path.join(args.display_dir, fname)} @ {fps:g} fps"
                )

    def generate_multiple_styles(self, args, model, state, image, trg,
                                 refs: Optional[Sequence[str]] = None, n_samples: int = 4):
        """One content image rendered with n styles (reference
        sample.py:176-200)."""
        rng = jax.random.PRNGKey(getattr(args, "seed", 0))
        if isinstance(image, str):
            image = self._style_image(args, image)
        image = jnp.asarray(image)
        panels = []
        if refs is not None:
            n_samples = len(refs)
            panels += [np.asarray(self._style_image(args, r))[:1] for r in refs]
        panels.append(np.asarray(image)[:1])
        for s in range(n_samples):
            rng, key = jax.random.split(rng)
            if refs is not None:
                imgs, _, _ = self.translate(
                    args, model, state, image, trg, style_path=refs[s], rng=key
                )
            else:
                style_code = model.get_z_random(key, image.shape[0])
                imgs, _, _ = self.translate(
                    args, model, state, image, trg, style_code=style_code
                )
            panels.append(np.asarray(imgs)[:1])
        out = os.path.join(args.display_dir, "grid.png")
        save_image(np.concatenate(panels, axis=0), out, nrow=len(panels))
        print(f"style grid written to {out}")

    # ------------------------------------------------------------------ #
    # entry
    # ------------------------------------------------------------------ #
    def run(self):
        with TimerBlock("Sampling") as block:
            args = TestArguments().parse()
            # rebuild the eval pipeline at the requested serving resolution
            # (default stays the reference's 540x960, sample.py:48-53)
            self.transforms = EvalTransform(tuple(getattr(args, "sample_size", (540, 960))))
            model, state = self.load_model(args)
            dataloader = self.load_dataset(args)
            if getattr(args, "int8", False):
                block.log("Calibrating int8 serving path")
                batches = []
                for batch in dataloader:
                    batches.append(np.asarray(batch))
                    if len(batches) >= getattr(args, "int8_calib_batches", 2):
                        break
                model.calibrate_int8(state, batches)
            if args.targets is not None:
                args.targets = [DOMAIN_MAP.index(t) for t in args.targets]
            if args.gen_grid:
                block.log("Mode: image grid")
                self.generate_image_grid(args, model, state, dataloader,
                                         args.reference, args.targets)
            elif args.gen_style:
                if not args.targets:
                    raise SystemExit(
                        "--gen_style needs a target domain: pass --targets <domain> "
                        f"(one of {DOMAIN_MAP})."
                    )
                block.log("Mode: multi-style grid")
                batch = next(iter(dataloader))
                self.generate_multiple_styles(
                    args, model, state, jnp.asarray(batch), args.targets[0], args.reference
                )
            elif "video" in getattr(args, "out_fmt", "image"):
                block.log("Mode: video translation")
                self.sample_video(args, model, state, dataloader,
                                  args.targets, args.reference)
            else:
                block.log("Mode: per-target translation")
                self.sample(args, model, state, dataloader, args.targets, args.reference)


if __name__ == "__main__":
    Sampler().run()
