"""Fused-AdaIN kernel: value + custom-VJP gradient parity with the pure-jnp
reference implementation (the Pallas path itself runs on TPU; on CPU the
forward falls back to the reference while keeping the custom backward)."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.ops.norms import adain
from masterthesis_tpu.ops.pallas.adain import fused_adain


def _inputs(key=0, n=2, h=6, w=5, c=4):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(k1, (n, h, w, c)) * 2.0 + 1.0
    gamma = jax.random.normal(k2, (n, c)) * 0.3
    beta = jax.random.normal(k3, (n, c)) * 0.3
    return x, gamma, beta


def test_fused_adain_matches_reference_forward():
    x, gamma, beta = _inputs()
    np.testing.assert_allclose(
        np.asarray(fused_adain(x, gamma, beta)), np.asarray(adain(x, gamma, beta)), atol=1e-5
    )


def test_fused_adain_custom_vjp_matches_autodiff():
    x, gamma, beta = _inputs(1)

    def loss_fused(x, g, b):
        return jnp.sum(jnp.sin(fused_adain(x, g, b)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.sin(adain(x, g, b)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_adain_under_jit_and_grad():
    x, gamma, beta = _inputs(2)
    f = jax.jit(jax.grad(lambda x: jnp.mean(fused_adain(x, gamma, beta) ** 2)))
    g = f(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
