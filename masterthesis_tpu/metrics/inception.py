"""InceptionV3 feature extractor for FID (Flax, NHWC).

Architecture parity with the FID-standard InceptionV3 used by the reference
(src/metrics/inception.py:20-211): torchvision InceptionV3 with the TF-FID
patches — InceptionA/C avgpool branches use count_include_pad=False, there are
two E-block variants (E_1 avgpool / E_2 maxpool), inputs are resized to 299²
(bilinear, align_corners=False equivalent) and rescaled to (-1, 1), and the
output is the 2048-d global-average pool.

Pretrained FID weights cannot be downloaded in this environment (zero egress):
``make_inception_extractor(weights_path)`` loads an npz converted offline from
the TF-FID checkpoint; without it the extractor runs with random weights
(valid for pipeline tests, NOT for reporting real FID — supply weights).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from masterthesis_tpu.models.blocks import avg_pool2d

Dtype = Any


class BasicConv(nn.Module):
    """conv -> batchnorm(eps 1e-3, frozen stats) -> relu."""

    features: int
    kernel_size: tuple
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # inference-mode batchnorm: scale/bias/mean/var are loaded constants
        c = x.shape[-1]
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _max_pool(x, window=3, stride=2, padding=0):
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), pads
    )


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3", dtype=self.dtype)(b3)
        # FID patch: count_include_pad=False (reference inception.py:107-112)
        bp = avg_pool2d(x, 3, 1, padding=1, count_include_pad=False)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3", dtype=self.dtype)(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3", dtype=self.dtype)(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", dtype=self.dtype)(bd)
        # FID patch (reference inception.py:130-141)
        bp = avg_pool2d(x, 3, 1, padding=1, count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2", dtype=self.dtype)(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4", dtype=self.dtype)(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """E block; ``pool='avg'`` (E_1, count_include_pad=False) or ``'max'``
    (E_2) — reference inception.py:144-211."""

    pool: str = "avg"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a", dtype=self.dtype)(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b", dtype=self.dtype)(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", dtype=self.dtype)(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", dtype=self.dtype)(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = _max_pool(x, 3, 1, padding=1)
        else:
            bp = avg_pool2d(x, 3, 1, padding=1, count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="branch_pool", dtype=self.dtype)(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """FID InceptionV3 trunk -> 2048-d pooled features
    (reference inception.py:20-92)."""

    resize_input: bool = True
    normalize_input: bool = True  # [0,1] -> (-1,1) (inception.py:62-66)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            n = x.shape[0]
            x = jax.image.resize(x, (n, 299, 299, x.shape[-1]), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        d = self.dtype
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3", dtype=d)(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3", dtype=d)(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3", dtype=d)(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1", dtype=d)(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3", dtype=d)(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b", dtype=d)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=d)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=d)(x)
        x = InceptionB(name="Mixed_6a", dtype=d)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=d)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=d)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=d)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=d)(x)
        x = InceptionD(name="Mixed_7a", dtype=d)(x)
        x = InceptionE(pool="avg", name="Mixed_7b", dtype=d)(x)
        x = InceptionE(pool="max", name="Mixed_7c", dtype=d)(x)
        return jnp.mean(x, axis=(1, 2))  # (N, 2048)


def load_inception_params(npz_path: str):
    """Restore an InceptionV3 params pytree from a flat npz of
    'path/to/param' -> array entries (HWIO conv kernels)."""
    import numpy as np
    from flax import traverse_util

    data = np.load(npz_path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return traverse_util.unflatten_dict(flat)


def make_inception_extractor(
    weights_path: Optional[str] = None, dtype=jnp.float32, jit: bool = True,
    resize_input: bool = True,
):
    """Return a fn: [0,1] NHWC images -> (N, 2048) features.

    ``jit=False`` runs eagerly — useful on hosts where compiling the ~100-conv
    trunk is slower than op-by-op dispatch (e.g. 1-core CI).
    ``resize_input=False`` expects pre-resized 299x299 input (the clean-fid
    protocol resizes on host with PIL bicubic instead).
    """
    import warnings

    model = InceptionV3(dtype=dtype, resize_input=resize_input)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy)["params"]
    if weights_path:
        params = load_inception_params(weights_path)
    else:
        warnings.warn(
            "InceptionV3 running with RANDOM weights (no pretrained npz provided); "
            "FID values will not match the TF-FID reference."
        )

    def extract(x):
        if x.ndim == 3:
            x = x[None]
        return model.apply({"params": params}, x)

    return jax.jit(extract) if jit else extract
