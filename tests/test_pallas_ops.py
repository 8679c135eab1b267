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


# --------------------------------------------------------------------------- #
# one-pass moments kernel (ops/pallas/moments.py) — interpret mode on CPU
# --------------------------------------------------------------------------- #
def _ref_moments(x, axes):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return mean, var


def test_pallas_moments_instance_norm_axes():
    from masterthesis_tpu.ops.pallas.moments import pallas_moments

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 128), jnp.float32)
    for layout in ("sbc", "bsc"):
        got = pallas_moments(x, (1, 2), interpret=True, layout=layout)
        assert got is not None
        mean, var = got
        ref_mean, ref_var = _ref_moments(x, (1, 2))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-5)
        np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var), atol=1e-4, rtol=1e-4)


def test_pallas_moments_layer_norm_axes():
    from masterthesis_tpu.ops.pallas.moments import pallas_moments

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 128), jnp.float32) * 1.5 + 0.3
    mean, var = pallas_moments(x, (1, 2, 3), interpret=True)
    ref_mean, ref_var = _ref_moments(x, (1, 2, 3))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var), atol=1e-4, rtol=1e-4)


def test_moments_custom_vjp_matches_autodiff():
    from masterthesis_tpu.ops.pallas.moments import moments

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4)) * 2.0 + 1.0

    def loss_custom(x):
        mean, var = moments(x, (1, 2))
        return jnp.sum(jnp.sin(mean) + jnp.cos(var))

    def loss_ref(x):
        mean, var = _ref_moments(x, (1, 2))
        return jnp.sum(jnp.sin(mean) + jnp.cos(var))

    g1 = jax.grad(loss_custom)(x)
    g2 = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_pallas_moments_near_constant_input():
    """The one-pass E[x^2]-mean^2 corner: near-constant inputs at
    bf16-realistic magnitudes must stay finite and close to the centered
    two-pass result once passed through rsqrt(var + eps) — the quantity the
    norm layers actually consume (see DESIGN.md "Performance decisions")."""
    from masterthesis_tpu.ops.pallas.moments import pallas_moments

    eps = 1e-5
    key = jax.random.PRNGKey(6)
    for base, jitter in [(3.0, 1e-3), (-7.5, 1e-4), (0.25, 0.0), (120.0, 1e-2)]:
        x32 = base + jitter * jax.random.normal(key, (2, 32, 32, 128), jnp.float32)
        x = x32.astype(jnp.bfloat16)
        got = pallas_moments(x, (1, 2), interpret=True)
        assert got is not None
        mean, var = got
        assert np.all(np.isfinite(np.asarray(mean)))
        assert np.all(np.asarray(var) >= 0.0), "clamp must keep var >= 0"
        ref_mean, ref_var = _ref_moments(x, (1, 2))
        rstd = np.asarray(jax.lax.rsqrt(var + eps))
        ref_rstd = np.asarray(jax.lax.rsqrt(ref_var + eps))
        assert np.all(np.isfinite(rstd))
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(ref_mean), rtol=2e-2, atol=2e-2
        )
        # rsqrt(var+eps) agreement: eps floors the denominator, so even full
        # cancellation in the one-pass form moves rstd by a bounded factor
        np.testing.assert_allclose(rstd, ref_rstd, rtol=0.15)
