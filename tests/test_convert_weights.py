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


def test_basic_conv_matches_torch_conv_bn():
    """Numeric (not just shape) converter validation: torch Conv2d + BatchNorm2d
    (eval stats, eps 1e-3 — torchvision BasicConv2d) vs metrics.inception
    BasicConv on weights mapped by _basic_conv."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.metrics.inception import BasicConv
    from masterthesis_tpu.tools.convert_weights import _basic_conv

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(16, eps=1e-3)
    # non-trivial frozen stats
    bn.running_mean.data.normal_()
    bn.running_var.data.uniform_(0.5, 2.0)
    bn.weight.data.normal_()
    bn.bias.data.normal_()
    bn.eval()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 8, 10, 10)).astype(np.float32)
    with torch.no_grad():
        want = torch.relu(bn(conv(torch.from_numpy(x)))).numpy().transpose(0, 2, 3, 1)

    sd = {
        "m.conv.weight": conv.weight.detach().numpy(),
        "m.bn.weight": bn.weight.detach().numpy(),
        "m.bn.bias": bn.bias.detach().numpy(),
        "m.bn.running_mean": bn.running_mean.numpy(),
        "m.bn.running_var": bn.running_var.numpy(),
    }
    flat = {}
    _basic_conv(flat, "m", "m", sd)
    params = {
        "conv": {"kernel": jnp.asarray(flat["m/conv/kernel"])},
        "bn_scale": jnp.asarray(flat["m/bn_scale"]),
        "bn_bias": jnp.asarray(flat["m/bn_bias"]),
        "bn_mean": jnp.asarray(flat["m/bn_mean"]),
        "bn_var": jnp.asarray(flat["m/bn_var"]),
    }
    mod = BasicConv(16, (3, 3), stride=2, padding=1)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_vgg_conv_matches_torch():
    """Converted VGG conv layer reproduces torch Conv2d numerics through the
    extractor (orientation check beyond shapes)."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from masterthesis_tpu.models.losses import VGGFeatureExtractor, load_vgg_params

    sd = _vgg11_fake_sd()
    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (1, 3, 12, 12)).astype(np.float32)
    # torch side: first conv of vgg11.features on the ImageNet-normalized input
    x01 = (torch.from_numpy(x) + 1.0) / 2.0
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xn = (x01 - mean) / std
    with torch.no_grad():
        want = torch.conv2d(
            xn, torch.from_numpy(sd["features.0.weight"]),
            torch.from_numpy(sd["features.0.bias"]), padding=1,
        ).numpy().transpose(0, 2, 3, 1)

    import tempfile

    out = convert_vgg(sd, "vgg11")
    with tempfile.TemporaryDirectory() as d:
        np.savez(f"{d}/w.npz", **out)
        params = load_vgg_params(f"{d}/w.npz", ("conv1_1",), "vgg11")
    mod = VGGFeatureExtractor(("conv1_1",), "vgg11")
    got = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))[0])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
