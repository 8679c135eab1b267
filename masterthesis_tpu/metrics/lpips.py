"""LPIPS (AlexNet backbone) perceptual distance.

Capability parity with the reference's offline LPIPS tool
(src/misc/compute_lpips.py:1-39, lpips package with net='alex'): AlexNet
feature stacks, per-layer unit-normalization, learned 1x1 linear heads,
spatial average, summed over layers. Weights load from an npz converted
offline; without them the metric is a random-projection distance (pipeline
tests only).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# AlexNet feature config: (features, kernel, stride, padding)
_ALEX_LAYERS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool after these conv indices (torchvision alexnet.features)
_POOL_AFTER = {0, 1}


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)),
    )


class AlexNetFeatures(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, (f, k, s, p) in enumerate(_ALEX_LAYERS):
            x = nn.Conv(
                f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            outs.append(x)
            if i in _POOL_AFTER:
                x = _max_pool(x)
        return outs


class LPIPS(nn.Module):
    """Learned perceptual distance; inputs in [-1, 1] NHWC."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        # imagenet normalization used by lpips ('scaling layer')
        shift = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
        scale = jnp.array([0.458, 0.448, 0.450], jnp.float32)
        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b)
            w = self.param(f"lin{i}", nn.initializers.ones, (a.shape[-1],))
            # learned 1x1 head (non-negative weights in lpips) then spatial mean
            lin = jnp.sum(diff * jax.nn.relu(w), axis=-1)
            total = total + jnp.mean(lin, axis=(1, 2))
        return total


def load_lpips_params(npz_path: str):
    import numpy as np
    from flax import traverse_util

    data = np.load(npz_path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return traverse_util.unflatten_dict(flat)


def make_lpips_fn(weights_path: Optional[str] = None):
    """Return a jitted fn: ([-1,1] imgs, imgs) -> per-sample LPIPS."""
    import warnings

    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
    if weights_path:
        params = load_lpips_params(weights_path)
    else:
        warnings.warn(
            "LPIPS running with RANDOM weights (no pretrained npz provided); "
            "values will not match the lpips package."
        )

    @jax.jit
    def dist(x, y):
        return model.apply({"params": params}, x, y)

    return dist


def compute_lpips_from_dirs(dir0: str, dir1: str, out: Optional[str] = None,
                            weights_path: Optional[str] = None) -> float:
    """Directory-pair LPIPS scorer writing a txt report
    (reference misc/compute_lpips.py:1-39)."""
    import os

    import numpy as np

    from masterthesis_tpu.data.transforms import load_rgb, normalize, to_array

    fn = make_lpips_fn(weights_path)
    files = sorted(os.listdir(dir0))
    scores = []
    lines = []
    for fname in files:
        p1 = os.path.join(dir1, fname)
        if not os.path.exists(p1):
            continue
        img0 = normalize(to_array(load_rgb(os.path.join(dir0, fname))))[None]
        img1 = normalize(to_array(load_rgb(p1)))[None]
        d = float(fn(jnp.asarray(img0), jnp.asarray(img1))[0])
        scores.append(d)
        lines.append("%s: %.3f" % (fname, d))
        print(lines[-1])
    avg = float(np.mean(scores)) if scores else float("nan")
    if out:
        with open(out, "w") as f:
            f.write("%s: %.6f\n" % (files[-1] if files else "", avg))
    return avg
