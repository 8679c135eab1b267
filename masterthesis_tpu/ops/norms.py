"""Normalization ops for NHWC feature maps.

Semantics mirror the reference's norm layers (reference src/models/core/norm.py:5-33
and functions.py:11-26) re-expressed as pure JAX functions + thin Flax modules:

- ``instance_norm``: per-sample, per-channel over (H, W); eps 1e-5, no affine
  (torch ``InstanceNorm2d(affine=False, track_running_stats=False)``).
- ``layer_norm``: per-sample over (H, W, C) with per-channel affine
  (the reference's custom LayerNorm, norm.py:5-21).
- ``adain``: instance norm modulated by a style-predicted ``(1+gamma, beta)``
  (norm.py:23-33).

All stats are computed in float32 regardless of input dtype (bf16-safe) and the
result is cast back — on TPU the normalization fuses into neighbouring convs.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from masterthesis_tpu.ops.initializers import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)

Dtype = Any


def _moments(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    # centered (two-pass) variance: E[(x-mean)^2]. The one-pass E[x^2]-mean^2
    # form cancels catastrophically in f32 for near-constant inputs (variance
    # can come out below -eps -> rsqrt(NaN)); XLA fuses both passes anyway.
    #
    # Measured dead end (kept opt-in as ops/pallas/moments.py, r2): a Pallas
    # one-pass stats kernel hits ~1.07 ms/0.54 GB standalone (vs 6.9 ms for
    # the in-model XLA op) — but the in-model op is a conv+stats MULTI-OUTPUT
    # fusion running at ~90% MXU, i.e. the stats already ride the conv for
    # free on the VPU. Splitting them out adds a full extra HBM pass (+28 ms
    # end-to-end on the flagship forward). Profile before "optimizing" reduces.
    if _use_pallas_moments():
        from masterthesis_tpu.ops.pallas.moments import moments

        return moments(x, tuple(axes))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return mean, var


def _use_pallas_moments() -> bool:
    import os

    return os.environ.get("MT_PALLAS_MOMENTS") == "1"


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample per-channel normalization over spatial dims of NHWC input.

    Differentiable via an analytic custom VJP: autodiff through the two-pass
    moments builds ~5 spatial reductions plus their elementwise chains in the
    backward; the closed form needs 2 reductions and one apply pass. On the
    256px training step this is pure HBM-traffic savings (the step is
    bandwidth-bound in the norm backward, see BASELINE.md).
    """
    return _instance_norm_vjp(x, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _instance_norm_vjp(x, eps):
    mean, var = _moments(x, axes=(1, 2))
    y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + eps)
    return y.astype(x.dtype)


def _instance_norm_fwd(x, eps):
    mean, var = _moments(x, axes=(1, 2))
    rstd = jax_rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * rstd
    return y.astype(x.dtype), (x, mean, rstd)


def _instance_norm_bwd(eps, res, g):
    x, mean, rstd = res
    g32 = g.astype(jnp.float32)
    x_hat = (x.astype(jnp.float32) - mean) * rstd
    g_mean = jnp.mean(g32, axis=(1, 2), keepdims=True)
    gx_mean = jnp.mean(g32 * x_hat, axis=(1, 2), keepdims=True)
    dx = rstd * (g32 - g_mean - x_hat * gx_mean)
    return (dx.astype(x.dtype),)


_instance_norm_vjp.defvjp(_instance_norm_fwd, _instance_norm_bwd)


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
    stats: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Per-sample normalization over (H, W, C) with per-channel affine.

    ``stats``: optional per-sample f32 ``(sum, sumsq)`` of x (shape (N,)) —
    produced in-kernel by the int8 serving convs — replacing the full-output
    reduction (one-pass E[x^2]-mean^2 with a >=0 clamp: f32 sums + the norm
    eps keep the near-constant corner safe; see DESIGN.md on variance).
    """
    if stats is not None:
        n = float(x.shape[1] * x.shape[2] * x.shape[3])
        mean = (stats[0] / n).reshape(-1, 1, 1, 1)
        var = jnp.maximum(stats[1] / n - (stats[0] / n) ** 2, 0.0).reshape(-1, 1, 1, 1)
    elif scale is not None and bias is not None:
        # the trainable path: analytic custom VJP (see instance_norm)
        return _layer_norm_affine_vjp(x, scale, bias, eps)
    else:
        mean, var = _moments(x, axes=(1, 2, 3))
    y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_affine_vjp(x, scale, bias, eps):
    mean, var = _moments(x, axes=(1, 2, 3))
    y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _layer_norm_affine_fwd(x, scale, bias, eps):
    mean, var = _moments(x, axes=(1, 2, 3))
    rstd = jax_rsqrt(var + eps)
    y = (x.astype(jnp.float32) - mean) * rstd
    out = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    return out, (x, scale, bias, mean, rstd)


def _layer_norm_affine_bwd(eps, res, g):
    x, scale, bias, mean, rstd = res
    g32 = g.astype(jnp.float32)
    x_hat = (x.astype(jnp.float32) - mean) * rstd
    d_bias = jnp.sum(g32, axis=(0, 1, 2))
    d_scale = jnp.sum(g32 * x_hat, axis=(0, 1, 2))
    h = g32 * scale.astype(jnp.float32)
    h_mean = jnp.mean(h, axis=(1, 2, 3), keepdims=True)
    hx_mean = jnp.mean(h * x_hat, axis=(1, 2, 3), keepdims=True)
    dx = rstd * (h - h_mean - x_hat * hx_mean)
    return dx.astype(x.dtype), d_scale.astype(scale.dtype), d_bias.astype(bias.dtype)


_layer_norm_affine_vjp.defvjp(_layer_norm_affine_fwd, _layer_norm_affine_bwd)


def adain(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Adaptive instance norm: ``(1 + gamma) * IN(x) + beta``.

    ``gamma``/``beta`` have shape (N, C) and broadcast over H, W.
    """
    mean, var = _moments(x, axes=(1, 2))
    y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + eps)
    y = (1.0 + gamma.astype(jnp.float32))[:, None, None, :] * y
    y = y + beta.astype(jnp.float32)[:, None, None, :]
    return y.astype(x.dtype)


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(x)


class InstanceNorm(nn.Module):
    """Parameter-free instance normalization (NHWC)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return instance_norm(x, eps=self.eps)


class LayerNorm(nn.Module):
    """Reference-style LayerNorm: normalize over (H, W, C), per-channel affine.

    ``stats`` (optional per-sample (sum, sumsq)) skips the reduction pass —
    the int8 serving deconvs emit these from inside their Pallas kernel.
    """

    affine: bool = True
    eps: float = 1e-5
    # override the affine param length when x is in the int8 serving convs'
    # lane-packed layout (x.shape[-1] != true channel count)
    param_features: Optional[int] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, stats=None, defer=False):
        scale = bias = None
        c = self.param_features or x.shape[-1]
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
            bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if defer:
            # int8 serving: fold the whole LN into a per-(sample, channel)
            # affine the NEXT kernel applies as its prologue. Requires stats.
            n = float(np.prod(x.shape[1:]))
            s, sq = stats
            mean = s.astype(jnp.float32) / n
            var = jnp.maximum(sq.astype(jnp.float32) / n - mean**2, 0.0)
            inv = jax.lax.rsqrt(var + self.eps)
            g = (scale if scale is not None else jnp.ones((c,))).astype(jnp.float32)
            b = (bias if bias is not None else jnp.zeros((c,))).astype(jnp.float32)
            a = g[None, :] * inv[:, None]
            return a, b[None, :] - mean[:, None] * a
        return layer_norm(x, scale, bias, eps=self.eps, stats=stats)


class AdaptiveInstanceNorm(nn.Module):
    """AdaIN with a style->(gamma, beta) projection (reference norm.py:23-33).

    Calling the same module instance twice (as in AdaINResnetBlock,
    blocks.py:158-164) shares the projection parameters.
    """

    num_features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s):
        from masterthesis_tpu.ops.initializers import torch_linear_bias_init_for

        h = nn.Dense(
            2 * self.num_features,
            kernel_init=torch_linear_kernel_init,
            # torch nn.Linear default bias (reference norm.py:27 leaves the
            # AdaIN fc at torch defaults — matching the init distribution
            # matters for training-dynamics parity)
            bias_init=torch_linear_bias_init_for(int(s.shape[-1])),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="style_proj",
        )(s)
        gamma, beta = jnp.split(h, 2, axis=-1)
        # Pallas single-pass fused kernel on TPU; jnp fallback elsewhere
        # (both share the same custom VJP).
        from masterthesis_tpu.ops.pallas.adain import fused_adain

        return fused_adain(x, gamma, beta, self.eps)
