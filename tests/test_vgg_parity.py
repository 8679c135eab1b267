"""VGG perceptual-loss parity vs the PyTorch reference (VERDICT r2 item 5).

The pretrained torchvision weights are unobtainable here (zero egress), so
the trunk is hand-built in plain torch (an ``nn.Sequential`` with the exact
torchvision ``vgg*().features`` layer order) and seeded with random weights;
the SAME weights are loaded into this framework's extractor. That makes the
comparison exercise everything except the weight values themselves: layer
indexing by name (reference loss.py:10-33), pool handling (loss.py:83-88),
ImageNet mean/std normalization (loss.py:94-99), feature instance-norm
(loss.py:127-129), and the weighted l1/l2 reduction (loss.py:130-134).

Reference bugs adjudicated here (documented divergences — this framework
implements the *intended* behavior, SURVEY.md §7 "faithful-vs-fixed"):

1. loss.py:84-89 + 101-104: with ``remove_pooling=True`` (the
   VGGPerceptualLoss default) the trunk is re-packed into a new Sequential,
   renumbering module keys — but ``forward`` still matches keys against the
   ORIGINAL indices. Any feature layer past pool1 (including the shipped
   default ``--vgg_layers conv5_4``) is therefore never collected and the
   reference perceptual loss is identically ZERO. This framework selects
   layers by name, so deep layers work (`test_reference_deep_layer_bug`).
2. loss.py:133 rebuilds the result via ``torch.tensor([...])``, detaching
   the graph — even where features ARE collected the reference loss
   contributes no gradient. This framework keeps the gradient
   (`test_vgg_gradient_divergence_documented`).
3. input range: the reference normalizes its [-1, 1] input with [0, 1]-range
   ImageNet stats as-is; this framework shifts to [0, 1] first.
   Equivalence used throughout: mine(2x-1) == ref(x).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF = "/root/reference/src"

VGG_CFGS = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


def _build_torch_vgg(vgg_type: str, seed: int) -> tnn.Sequential:
    """Plain-torch replica of ``torchvision.models.vgg*().features``."""
    torch.manual_seed(seed)
    layers, c_in = [], 3
    for v in VGG_CFGS[vgg_type]:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            conv = tnn.Conv2d(c_in, v, 3, padding=1)
            with torch.no_grad():
                conv.weight.normal_(0.0, 0.08)
                conv.bias.normal_(0.0, 0.02)
            layers.append(conv)
            layers.append(tnn.ReLU(inplace=True))
            c_in = v
    return tnn.Sequential(*layers)


def _install_reference_with_vgg(trunks: dict):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.models", "torchvision.models.vgg"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    tv = sys.modules["torchvision"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.models = sys.modules["torchvision.models"]
    vgg_mod = sys.modules["torchvision.models.vgg"]
    tv.models.vgg = vgg_mod
    for vgg_type, trunk in trunks.items():
        holder = types.SimpleNamespace(features=trunk)
        setattr(vgg_mod, vgg_type, lambda pretrained=True, _h=holder: _h)


def _flax_params_from_torch(trunk: tnn.Sequential, vgg_type: str) -> dict:
    """torch OIHW conv weights -> {name: {kernel HWIO, bias}} keyed by the
    reference layer names."""
    from masterthesis_tpu.models.losses import vgg_layer_names

    names = vgg_layer_names(vgg_type)
    params, li = {}, 0
    for mod in trunk:
        if isinstance(mod, tnn.Conv2d):
            name = names[li]
            assert name.startswith("conv"), name
            params[name] = {
                "kernel": np.asarray(
                    mod.weight.detach().permute(2, 3, 1, 0).numpy()
                ),
                "bias": np.asarray(mod.bias.detach().numpy()),
            }
            li += 2  # skip the relu name
        elif isinstance(mod, tnn.ReLU):
            pass
        elif isinstance(mod, tnn.MaxPool2d):
            li += 1
    return params


def _inputs(seed, n=2, size=16):
    r = np.random.default_rng(seed)
    x = r.uniform(-1, 1, (n, 3, size, size)).astype(np.float32)
    y = r.uniform(-1, 1, (n, 3, size, size)).astype(np.float32)
    return x, y


def _mine_inputs(x, y):
    import jax.numpy as jnp

    return (
        jnp.asarray(2.0 * x.transpose(0, 2, 3, 1) - 1.0),
        jnp.asarray(2.0 * y.transpose(0, 2, 3, 1) - 1.0),
    )


@pytest.mark.parametrize(
    "vgg_type,layers,weights,loss_fn,norm_feat",
    [
        # pre-pool1 layers are index-stable, so the reference collects them
        # even through its remove_pooling renumbering bug — value parity is
        # provable here for both loss types and the feature instance-norm.
        # conv-named layers are only unambiguous in last position: torchvision
        # (and this replica) uses inplace ReLUs, so a saved conv feature is
        # mutated into its relu by the next module — relu names are stable.
        ("vgg19", ["conv1_2"], [1.0], "l2", True),
        ("vgg16", ["relu1_1", "relu1_2"], [0.5, 2.0], "l1", False),
    ],
)
def test_vgg_perceptual_loss_value_parity(vgg_type, layers, weights, loss_fn,
                                          norm_feat):
    trunk = _build_torch_vgg(vgg_type, seed=5)
    _install_reference_with_vgg({vgg_type: trunk})
    from models.core import loss as ref_loss  # reference

    from masterthesis_tpu.models.losses import VGGPerceptualLoss

    ref = ref_loss.VGGPerceptualLoss(
        list(layers), list(weights), vgg_type=vgg_type, loss_fn=loss_fn,
        gpu_ids=[], norm_feat=norm_feat,
    )
    x, y = _inputs(11)
    with torch.no_grad():
        want = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    assert want > 0.0  # the reference really collected these layers

    mine = VGGPerceptualLoss(
        layers=tuple(layers), layer_weights=tuple(weights), vgg_type=vgg_type,
        loss_fn=loss_fn, norm_feat=norm_feat,
    )
    params = {"vgg": _flax_params_from_torch(trunk, vgg_type)}
    got = float(mine.apply({"params": params}, *_mine_inputs(x, y)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vgg_extractor_deep_feature_parity_with_pooling():
    """Full-depth feature parity is provable on the remove_pooling=False
    path, where the reference's index renumbering bug cannot bite: compare
    raw feature tensors at shallow+deep layers."""
    trunk = _build_torch_vgg("vgg16", seed=7)
    _install_reference_with_vgg({"vgg16": trunk})
    from models.core import loss as ref_loss

    from masterthesis_tpu.models.losses import VGGFeatureExtractor

    # relu names + a last-position conv: inplace ReLUs mutate saved conv
    # features that have a successor module (see parity test note above)
    layers = ["relu1_2", "relu3_3", "conv5_1"]
    ref = ref_loss.VGGFeatureExtractor(
        layers, vgg_type="vgg16", remove_pooling=False
    )
    x, _ = _inputs(13, n=1, size=32)
    with torch.no_grad():
        want = [f.numpy().transpose(0, 2, 3, 1) for f in ref(torch.from_numpy(x))]

    mine = VGGFeatureExtractor(
        feature_layers=tuple(layers), vgg_type="vgg16", remove_pooling=False
    )
    params = _flax_params_from_torch(trunk, "vgg16")
    xj, _ = _mine_inputs(x, x)
    got = mine.apply({"params": params}, xj)
    assert len(got) == len(want) == len(layers)
    for g, w in zip(got, want):
        # deep features reach O(100) magnitude with these random weights;
        # allow f32 accumulation-order noise
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-3, atol=2e-2)


def test_reference_deep_layer_bug():
    """The shipped default config (--vgg_layers conv5_4, remove_pooling=True)
    hits reference bug #1: the renumbered trunk never matches index 34, no
    features are collected, and the loss is identically 0. This framework
    returns a real nonzero distance for the same config."""
    trunk = _build_torch_vgg("vgg19", seed=5)
    _install_reference_with_vgg({"vgg19": trunk})
    from models.core import loss as ref_loss

    from masterthesis_tpu.models.losses import VGGPerceptualLoss

    ref = ref_loss.VGGPerceptualLoss(
        ["conv5_4"], [1.0], vgg_type="vgg19", loss_fn="l2", gpu_ids=[],
        norm_feat=True,
    )
    x, y = _inputs(17)
    with torch.no_grad():
        ref_val = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
    assert ref_val == 0.0  # bug reproduced exactly

    mine = VGGPerceptualLoss(
        layers=("conv5_4",), layer_weights=(1.0,), vgg_type="vgg19",
        loss_fn="l2", norm_feat=True,
    )
    params = {"vgg": _flax_params_from_torch(trunk, "vgg19")}
    got = float(mine.apply({"params": params}, *_mine_inputs(x, y)))
    assert got > 0.0


def test_vgg_gradient_divergence_documented():
    """Reference loss.py:133 detaches the graph (zero gradient even on
    layers it does collect); this framework's perceptual loss keeps it
    (translation.py divergence list)."""
    trunk = _build_torch_vgg("vgg11", seed=6)
    _install_reference_with_vgg({"vgg11": trunk})
    from models.core import loss as ref_loss

    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.models.losses import VGGPerceptualLoss

    ref = ref_loss.VGGPerceptualLoss(
        ["conv1_1"], [1.0], vgg_type="vgg11", loss_fn="l2", gpu_ids=[],
        norm_feat=False,
    )
    x, y = _inputs(12, n=1)
    y_t = torch.from_numpy(y)
    y_t.requires_grad_(True)
    out = ref(torch.from_numpy(x), y_t)
    assert float(out) > 0.0
    assert not out.requires_grad, "reference detach bug no longer present?"

    mine = VGGPerceptualLoss(
        layers=("conv1_1",), layer_weights=(1.0,), vgg_type="vgg11",
        loss_fn="l2", norm_feat=False,
    )
    params = {"vgg": _flax_params_from_torch(trunk, "vgg11")}
    xj, yj = _mine_inputs(x, y)
    g = jax.grad(lambda yy: mine.apply({"params": params}, xj, yy))(yj)
    assert float(jnp.max(jnp.abs(g))) > 0.0
