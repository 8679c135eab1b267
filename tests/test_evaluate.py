"""Evaluation driver: end-to-end FID + LPIPS-diversity report on synthetic data."""
import warnings

import numpy as np

from masterthesis_tpu.evaluate import evaluate
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.utils import AttributeDict

from conftest import make_image_tree, tiny_train_args


def test_evaluate_reports_per_domain(tmp_path):
    make_image_tree(tmp_path / "data", num_domains=2, per_domain=2, mode="val")
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        mode="test",  # model built test-mode (no discriminators)
        num_domains=2,
        load_size=36,
        crop_size=32,
        display_dir=str(tmp_path / "out"),
        save_visuals=False,
        fid_weights=None,
        lpips_weights=None,
    )
    model = AdaINModel(args)
    state = model.initialize()
    eval_args = AttributeDict(dict(args))
    eval_args["mode"] = "val"  # read DATA/val/<domain>
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random metric weights
        results = evaluate(eval_args, model, state, num_styles=2)
    assert set(results) == {"cloud", "fog"}
    for r in results.values():
        assert np.isfinite(r["fid"])
        assert np.isfinite(r["lpips_diversity"])


def test_evaluate_fid_zero_for_identity_translation(tmp_path):
    """Regression for the real/fake range mismatch: with two domains holding
    identical images and a model that returns its input unchanged, the
    evaluate-path FID must be ~0. The old code fed reals at [-1,1] but fakes
    at [0,1], which makes this fail with a large FID."""
    import jax.numpy as jnp

    # both domains contain the same files -> content(fog)==real(cloud)
    make_image_tree(tmp_path / "data", num_domains=1, per_domain=3, mode="val")
    src = tmp_path / "data" / "val" / "cloud"
    dst = tmp_path / "data" / "val" / "fog"
    dst.mkdir()
    for f in src.iterdir():
        (dst / f.name).write_bytes(f.read_bytes())

    class IdentityModel:
        def get_z_random(self, key, n):
            return jnp.zeros((n, 4), jnp.float32)

        def forward_random(self, state, img, z, trg):
            return img, 0.0, 0.0

    args = AttributeDict(
        dataroot=str(tmp_path / "data"),
        mode="val",
        num_domains=2,
        load_size=36,
        crop_size=32,
        seed=0,
        save_visuals=False,
        fid_weights=None,
        lpips_weights=None,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random metric weights
        results = evaluate(args, IdentityModel(), state=None, num_styles=1)
    for r in results.values():
        assert abs(r["fid"]) < 1e-3, r["fid"]


def test_evaluate_sliced_fid_features(tmp_path):
    """--fid_features slices the Inception features so small validation sets
    keep a well-conditioned covariance (full 2048-d FID degenerates to ~0
    when n << d)."""
    make_image_tree(tmp_path / "data", num_domains=2, per_domain=3, mode="val")
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        mode="test",
        num_domains=2,
        load_size=36,
        crop_size=32,
        display_dir=str(tmp_path / "out"),
        save_visuals=False,
        fid_weights=None,
        lpips_weights=None,
        fid_features=8,
    )
    model = AdaINModel(args)
    state = model.initialize()
    eval_args = AttributeDict(dict(args))
    eval_args["mode"] = "val"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        results = evaluate(eval_args, model, state, num_styles=2)
    for r in results.values():
        assert np.isfinite(r["fid"]) and r["fid"] > 0


def test_evaluate_pixel_fid_extractor(tmp_path):
    """Weights-free pixel-statistics FID: finite, positive, and sensitive to
    the domain color differences of the synthetic tree."""
    make_image_tree(tmp_path / "data", num_domains=2, per_domain=3, mode="val")
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        mode="test",
        num_domains=2,
        load_size=36,
        crop_size=32,
        display_dir=str(tmp_path / "out"),
        save_visuals=False,
        fid_weights=None,
        lpips_weights=None,
        fid_extractor="pixel",
    )
    model = AdaINModel(args)
    state = model.initialize()
    eval_args = AttributeDict(dict(args))
    eval_args["mode"] = "val"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        results = evaluate(eval_args, model, state, num_styles=2)
    for r in results.values():
        assert np.isfinite(r["fid"]) and r["fid"] > 0
