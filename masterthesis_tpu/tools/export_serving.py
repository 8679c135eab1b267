"""AOT serving-bundle export (``jax.export`` / StableHLO).

A deployment capability the reference has no analog of (its serving story is
"run sample.py with the training repo on the box",
/root/reference/src/sample.py:16-228): serialize the jitted inference
functions to StableHLO artifacts that replay WITHOUT the model-building code
— only jax and the bundle are needed at serving time. The int8 path exports
with its calibration constants baked in, so a calibrated bundle is
self-contained.

Bundle layout (one directory):
    manifest.json            shapes/dtypes, platform, int8 flag, git rev
    params.ckpt              model parameters (flax msgpack)
    forward_random.jaxexport      StableHLO: (params, img, z, c) -> imgs
    forward_reference.jaxexport   StableHLO: (params, src, ref, c, key_data)
                                  -> imgs (key_data = raw uint32 PRNG bits)

Replay:
    from masterthesis_tpu.tools.export_serving import load_bundle
    bundle = load_bundle("exported/")
    out = bundle.forward_random(img, z, c)          # params auto-bound

Artifacts are platform-specific (the manifest records the lowering
platform); export on the machine class you serve on.

CLI:
    python -m masterthesis_tpu.tools.export_serving \
        --model AdaINModel --resume ckpt --out exported/ \
        [--int8 --calib_dir imgs/ --int8_calib_batches 2] \
        [--batch_size 256 --crop_size 256]
"""
from __future__ import annotations

import json
import os
import subprocess
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.checkpoint import load_pytree, save_pytree

MANIFEST = "manifest.json"
PARAMS = "params.ckpt"


def _git_rev() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL,
        ).decode().strip()
    except Exception:
        return "unknown"


def export_bundle(
    model,
    state,
    out_dir: str,
    batch_size: int,
    crop_size: int,
    fns: Sequence[str] = ("forward_random", "forward_reference"),
) -> dict:
    """Export the model's inference functions + params as a serving bundle.

    ``model`` is a TranslationModel subclass instance; if
    ``model.calibrate_int8`` has been called, the exported graphs run the
    int8 serving path with the calibrated ranges baked in as constants.
    Returns the manifest dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    params = state.params if hasattr(state, "params") else state
    a = model.args
    b, s = int(batch_size), int(crop_size)
    dim_in = int(getattr(a, "input_dim", 3))
    nd = int(a.num_domains)
    latent = int(model.latent_dim)
    dtype = jnp.float32

    img = jax.ShapeDtypeStruct((b, s, s, dim_in), dtype)
    z = jax.ShapeDtypeStruct((b, latent), jnp.float32)
    c = jax.ShapeDtypeStruct((b, nd), jnp.float32)
    key_data = jax.ShapeDtypeStruct((2,), jnp.uint32)
    pspec = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)

    exported = {}
    if "forward_random" in fns:
        exported["forward_random"] = jax.export.export(
            jax.jit(model._forward_random_impl)
        )(pspec, img, z, c)
    if "forward_reference" in fns:
        # PRNG keys are passed as raw uint32 bits (typed key arrays don't
        # cross the export serialization boundary)
        def fwd_ref(p, src, ref, c_trg, kd):
            rng = jax.random.wrap_key_data(kd)
            return model._forward_reference_impl(p, src, ref, c_trg, rng)

        exported["forward_reference"] = jax.export.export(jax.jit(fwd_ref))(
            pspec, img, img, c, key_data
        )

    for name, exp in exported.items():
        with open(os.path.join(out_dir, f"{name}.jaxexport"), "wb") as f:
            f.write(exp.serialize())
    save_pytree(params, os.path.join(out_dir, PARAMS))

    manifest = {
        "model": type(model).__name__,
        "batch_size": b,
        "crop_size": s,
        "input_dim": dim_in,
        "num_domains": nd,
        "latent_dim": latent,
        "int8": bool(getattr(model, "quant_cols", None)),
        "functions": sorted(exported),
        "platforms": sorted(
            {p for e in exported.values() for p in e.platforms}
        ),
        "jax_version": jax.__version__,
        "framework_rev": _git_rev(),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServingBundle:
    """A loaded bundle: exported functions with params auto-bound."""

    def __init__(self, manifest: dict, params, fns: dict):
        self.manifest = manifest
        self.params = params
        self._fns = fns

    def forward_random(self, img, z, c):
        return self._fns["forward_random"].call(self.params, img, z, c)

    def forward_reference(self, img_src, img_ref, c_trg, rng=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        kd = jax.random.key_data(rng).astype(jnp.uint32).reshape(2)
        return self._fns["forward_reference"].call(
            self.params, img_src, img_ref, c_trg, kd
        )


def load_bundle(bundle_dir: str) -> ServingBundle:
    """Deserialize a bundle exported by :func:`export_bundle`.

    Needs only jax — no model classes, no arguments, no network code."""
    with open(os.path.join(bundle_dir, MANIFEST)) as f:
        manifest = json.load(f)
    params = load_pytree(os.path.join(bundle_dir, PARAMS))
    fns = {}
    for name in manifest["functions"]:
        with open(os.path.join(bundle_dir, f"{name}.jaxexport"), "rb") as f:
            fns[name] = jax.export.deserialize(f.read())
    return ServingBundle(manifest, params, fns)


def _calibrate_from_dir(model, state, calib_dir: str, n_batches: int,
                        crop_size: int, load_size: int) -> None:
    from masterthesis_tpu.data.datasets import ImageList
    from masterthesis_tpu.data.transforms import TrainTransform

    transform = TrainTransform(load_size, crop_size, train=False)
    ds = ImageList(calib_dir, transform=transform)
    k = min(len(ds), 8 * n_batches)
    if k == 0:
        raise ValueError(f"--calib_dir {calib_dir}: no images found")
    imgs = np.stack([ds[i] for i in range(k)])
    batches = [bb for bb in np.array_split(imgs, n_batches) if len(bb)]
    model.calibrate_int8(state, batches)


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    from masterthesis_tpu import models as model_zoo

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", default="AdaINModel",
                    choices=["AdaINModel", "BaseModel"])
    ap.add_argument("--resume", type=str, default=None,
                    help="model checkpoint (model_{it}.ckpt) to export")
    ap.add_argument("--out", type=str, required=True, help="bundle directory")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--load_size", type=int, default=286)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--latent_dim", type=int, default=8)
    ap.add_argument("--num_domains", type=int, default=4)
    ap.add_argument("--compute_dtype", type=str, default="bfloat16")
    ap.add_argument("--concat", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="calibrate + export the int8 serving path")
    ap.add_argument("--calib_dir", type=str, default=None,
                    help="image dir for int8 calibration (required w/ --int8)")
    ap.add_argument("--int8_calib_batches", type=int, default=2)
    ap.add_argument("--skip_reference", action="store_true",
                    help="export forward_random only")
    cli = ap.parse_args(argv)

    from masterthesis_tpu.arguments import default_test_args

    args = default_test_args(
        crop_size=cli.crop_size, load_size=cli.load_size, dim=cli.dim,
        latent_dim=cli.latent_dim, num_domains=cli.num_domains,
        batch_size=cli.batch_size, compute_dtype=cli.compute_dtype,
        concat=cli.concat, resume=cli.resume, logdir=None,
    )
    model = getattr(model_zoo, cli.model)(args)
    state = model.initialize()
    if cli.int8:
        if not cli.calib_dir:
            raise SystemExit("--int8 requires --calib_dir")
        _calibrate_from_dir(model, state, cli.calib_dir,
                            max(1, cli.int8_calib_batches),
                            cli.crop_size, cli.load_size)
    fns = ("forward_random",) if cli.skip_reference else (
        "forward_random", "forward_reference")
    manifest = export_bundle(model, state, cli.out, cli.batch_size,
                             cli.crop_size, fns=fns)
    print(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    main()
