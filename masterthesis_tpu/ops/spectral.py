"""Spectral normalization for conv kernels (functional Flax).

Parity with the reference's ``spectral_norm`` wrapper
(src/models/core/functions.py:113-121, torch.nn.utils.spectral_norm with one
power iteration, eps 1e-12). The power-iteration vector ``u`` lives in the
``"spectral"`` variable collection; it is updated only when that collection is
mutable (i.e. during training steps run with ``mutable=["spectral"]``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SpectralNorm(nn.Module):
    """Normalizes a kernel by its leading singular value via power iteration.

    The kernel is reshaped to (fan_in*kh*kw, out) and sigma estimated for the
    (out, rest) matricization — matching torch's dim=0 for Conv2d (and dim=1
    for ConvTranspose2d, which has the same "output channel" matricization in
    the flax (kh, kw, in, out) layout).
    """

    eps: float = 1e-12
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, kernel: jnp.ndarray) -> jnp.ndarray:
        out_features = kernel.shape[-1]
        w = kernel.reshape(-1, out_features).T  # (out, rest)
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2_normalize(
                jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0), (out_features,))
            ),
        )
        u = u_var.value
        w32 = w.astype(jnp.float32)
        for _ in range(self.n_power_iterations):
            v = _l2_normalize(w32.T @ u, self.eps)
            u = _l2_normalize(w32 @ v, self.eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ w32 @ v
        if self.is_mutable_collection("spectral"):
            u_var.value = u
        return (kernel.astype(jnp.float32) / sigma).astype(kernel.dtype)
