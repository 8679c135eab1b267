"""Weight initializers matching the reference's init semantics.

The reference (src/models/core/functions.py:72-94) applies the chosen scheme
only to modules whose class name starts with "Conv" (Conv2d/ConvTranspose2d):
  - normal:     N(0, gain)            (gain default 0.02)
  - xavier:     xavier_normal(gain)
  - kaiming:    kaiming_normal(fan_in, a=0)  == He normal
  - orthogonal: orthogonal(gain)
with conv biases zeroed. Linear layers keep PyTorch's default
``kaiming_uniform_(a=sqrt(5))`` (variance 1/(3*fan_in)) with
uniform(+-1/sqrt(fan_in)) bias — reproduced here so training dynamics match.

Flax conv kernels are (kh, kw, in, out); variance_scaling's fan computation
matches torch's fan_in = kh*kw*in for that layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn import initializers as ji


def get_conv_init(init_type: str | None, init_gain: float = 0.02):
    """Return a flax kernel initializer for conv layers."""
    if init_type is None:
        # torch default conv init: kaiming_uniform(a=sqrt(5)) -> var = 1/(3 fan_in)
        return ji.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    if init_type == "normal":
        return ji.normal(stddev=init_gain)
    if init_type == "xavier":
        # xavier_normal with gain: std = gain * sqrt(2/(fan_in+fan_out))
        return ji.variance_scaling(init_gain**2, "fan_avg", "truncated_normal")
    if init_type == "xavier_normal_exact":
        def init(key, shape, dtype=jnp.float32):
            fan_in = int(jnp.prod(jnp.array(shape[:-1])))
            fan_out = shape[-1] * int(jnp.prod(jnp.array(shape[:-2])))
            std = jnp.sqrt(2.0 / (fan_in + fan_out))
            return jax.random.normal(key, shape, dtype) * std

        return init
    if init_type == "kaiming":
        return ji.he_normal()
    if init_type == "orthogonal":
        return ji.orthogonal(scale=init_gain)
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


# PyTorch nn.Linear defaults: weight kaiming_uniform(a=sqrt(5)) = U(+-sqrt(1/fan_in)),
# bias U(+-1/sqrt(fan_in)).
torch_linear_kernel_init = ji.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in: int | None = None):
    # flax calls bias_init(key, (features,), dtype); fan_in is unknown here, so
    # approximate with zeros when not provided. Conv biases in the reference are
    # zeroed anyway (functions.py:87-88). For Linear biases use
    # ``torch_linear_bias_init_for(fan_in)`` — the reference leaves nn.Linear
    # at torch defaults (U(+-1/sqrt(fan_in)) bias), and matching it matters:
    # the style-MLP biases reach std ~0.17 at fan_in 36.
    if fan_in:
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return jnp.zeros(shape, dtype)


def torch_linear_bias_init_for(fan_in: int):
    """Fan-in-aware torch nn.Linear default bias init: U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        return torch_linear_bias_init(key, shape, dtype, fan_in=fan_in)

    return init
