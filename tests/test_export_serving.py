"""Serving-bundle export (tools/export_serving.py): the StableHLO artifacts
must replay the jitted inference paths exactly — float and calibrated-int8 —
and the CLI must round-trip a saved checkpoint into a loadable bundle."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.arguments import default_test_args
from masterthesis_tpu.checkpoint import save_pytree
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.tools.export_serving import (
    export_bundle,
    load_bundle,
    main as export_main,
)

B, S, DIM, LATENT, ND = 2, 64, 16, 8, 4


def _tiny_model():
    args = default_test_args(
        crop_size=S, dim=DIM, latent_dim=LATENT, num_domains=ND,
        batch_size=B, compute_dtype="float32", logdir=None,
    )
    model = AdaINModel(args)
    state = model.initialize()
    return model, state


def _inputs(seed=0):
    rng = jax.random.PRNGKey(seed)
    img = jax.random.uniform(rng, (B, S, S, 3), jnp.float32, -1.0, 1.0)
    z = jax.random.normal(jax.random.fold_in(rng, 1), (B, LATENT), jnp.float32)
    c = jax.nn.one_hot(jnp.arange(B) % ND, ND)
    return img, z, c


def test_bundle_replays_forward_random(tmp_path):
    model, state = _tiny_model()
    img, z, c = _inputs()
    manifest = export_bundle(model, state, str(tmp_path), B, S)
    assert manifest["int8"] is False
    assert set(manifest["functions"]) == {"forward_random", "forward_reference"}

    bundle = load_bundle(str(tmp_path))
    got = np.asarray(bundle.forward_random(img, z, c))
    want = np.asarray(model._forward_random_jit(state.params, img, z, c))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bundle_replays_forward_reference(tmp_path):
    model, state = _tiny_model()
    img, _, c = _inputs()
    ref = _inputs(seed=3)[0]
    export_bundle(model, state, str(tmp_path), B, S)
    bundle = load_bundle(str(tmp_path))
    rng = jax.random.PRNGKey(7)
    got = np.asarray(bundle.forward_reference(img, ref, c, rng))
    want = np.asarray(
        model._forward_reference_jit(state.params, img, ref, c, rng)
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_int8_bundle_bakes_calibration(tmp_path):
    model, state = _tiny_model()
    img, z, c = _inputs()
    model.calibrate_int8(state, [np.asarray(img)])
    manifest = export_bundle(model, state, str(tmp_path), B, S,
                             fns=("forward_random",))
    assert manifest["int8"] is True

    want = np.asarray(model._forward_random_jit(state.params, img, z, c))
    model.disable_int8()  # the bundle must still serve int8 numerics
    bundle = load_bundle(str(tmp_path))
    got = np.asarray(bundle.forward_random(img, z, c))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and differ from the float path (quantization is actually baked in)
    float_out = np.asarray(model._forward_random_jit(state.params, img, z, c))
    assert np.abs(got - float_out).max() > 1e-6


def test_cli_roundtrip(tmp_path, capsys):
    model, state = _tiny_model()
    ckpt = tmp_path / "model_0.ckpt"
    save_pytree(state.params, str(ckpt))
    out = tmp_path / "bundle"
    export_main([
        "--model", "AdaINModel", "--resume", str(ckpt), "--out", str(out),
        "--batch_size", str(B), "--crop_size", str(S), "--dim", str(DIM),
        "--latent_dim", str(LATENT), "--num_domains", str(ND),
        "--compute_dtype", "float32", "--skip_reference",
    ])
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["functions"] == ["forward_random"]
    assert os.path.exists(out / "forward_random.jaxexport")

    img, z, c = _inputs()
    bundle = load_bundle(str(out))
    want = np.asarray(model._forward_random_jit(state.params, img, z, c))
    got = np.asarray(bundle.forward_random(img, z, c))
    np.testing.assert_allclose(got, want, atol=1e-6)
