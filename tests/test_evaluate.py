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
