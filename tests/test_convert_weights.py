"""Weight-converter tests with synthetic torch-layout state dicts."""
import numpy as np

from masterthesis_tpu.tools.convert_weights import (
    convert_alexnet_lpips,
    convert_vgg,
)


def _vgg11_fake_sd():
    # torchvision vgg11.features conv indices
    idxs = [0, 3, 6, 8, 11, 13, 16, 18]
    chans = [(3, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512),
             (512, 512), (512, 512)]
    sd = {}
    rng = np.random.default_rng(0)
    for idx, (ci, co) in zip(idxs, chans):
        sd[f"features.{idx}.weight"] = rng.normal(size=(co, ci, 3, 3)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(size=(co,)).astype(np.float32)
    return sd


def test_convert_vgg_roundtrip(tmp_path):
    sd = _vgg11_fake_sd()
    out = convert_vgg(sd, "vgg11")
    assert out["conv1_1/kernel"].shape == (3, 3, 3, 64)  # OIHW -> HWIO
    np.testing.assert_allclose(
        out["conv2_1/kernel"][0, 0, 0, 0], sd["features.3.weight"][0, 0, 0, 0]
    )
    # load through the extractor
    import jax.numpy as jnp

    from masterthesis_tpu.models.losses import VGGFeatureExtractor, load_vgg_params

    np.savez(tmp_path / "vgg11.npz", **out)
    params = load_vgg_params(str(tmp_path / "vgg11.npz"), ("conv2_1",), "vgg11")
    mod = VGGFeatureExtractor(("conv2_1",), "vgg11")
    feats = mod.apply(params, jnp.zeros((1, 16, 16, 3)))
    assert feats[0].shape == (1, 16, 16, 128)


def test_convert_alexnet_lpips(tmp_path):
    rng = np.random.default_rng(1)
    idxs = [0, 3, 6, 8, 10]
    chans = [(3, 64, 11), (64, 192, 5), (192, 384, 3), (384, 256, 3), (256, 256, 3)]
    sd = {}
    for idx, (ci, co, k) in zip(idxs, chans):
        sd[f"features.{idx}.weight"] = rng.normal(size=(co, ci, k, k)).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.normal(size=(co,)).astype(np.float32)
    lp = {f"lin{i}.model.1.weight": np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
          for i, c in enumerate([64, 192, 384, 256, 256])}
    out = convert_alexnet_lpips(sd, lp)
    assert out["alex/conv0/kernel"].shape == (11, 11, 3, 64)
    assert out["lin2"].shape == (384,)
    # load into the LPIPS model
    import jax.numpy as jnp

    from masterthesis_tpu.metrics.lpips import LPIPS, load_lpips_params

    np.savez(tmp_path / "lpips.npz", **out)
    params = load_lpips_params(str(tmp_path / "lpips.npz"))
    model = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    d = model.apply({"params": params}, x, x)
    assert float(d[0]) == 0.0
