"""Unit tests for core ops: norms, initializers, pooling, spectral norm."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.ops.norms import adain, instance_norm, layer_norm
from masterthesis_tpu.ops.initializers import get_conv_init
from masterthesis_tpu.ops.spectral import SpectralNorm
from masterthesis_tpu.models.blocks import avg_pool2d, depth_to_space, upsample_nearest


def test_instance_norm_zero_mean_unit_var():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 3.0 + 5.0
    y = instance_norm(x)
    mean = jnp.mean(y, axis=(1, 2))
    var = jnp.var(y, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), 1.0, atol=1e-3)


def test_layer_norm_affine_and_known_value():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3)) * 2.0 + 1.0
    y = layer_norm(x)
    # normalized over (H, W, C) per sample
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(1, 2, 3))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.var(y, axis=(1, 2, 3))), 1.0, atol=1e-3)
    scale = jnp.full((3,), 2.0)
    bias = jnp.full((3,), -1.0)
    y2 = layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y * 2.0 - 1.0), atol=1e-5)


def test_adain_known_value():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
    gamma = jnp.ones((2, 4)) * 0.5
    beta = jnp.ones((2, 4)) * 0.25
    y = adain(x, gamma, beta)
    expected = 1.5 * instance_norm(x) + 0.25
    np.testing.assert_allclose(np.asarray(y), np.asarray(expected), atol=1e-5)


def test_conv_init_distributions():
    key = jax.random.PRNGKey(3)
    shape = (3, 3, 64, 64)
    w = get_conv_init("normal", 0.02)(key, shape)
    assert abs(float(jnp.std(w)) - 0.02) < 0.002
    w = get_conv_init("kaiming")(key, shape)
    fan_in = 3 * 3 * 64
    assert abs(float(jnp.std(w)) - np.sqrt(2.0 / fan_in)) < 0.005
    w = get_conv_init("orthogonal", 1.0)(key, (1, 1, 64, 64)).reshape(64, 64)
    np.testing.assert_allclose(np.asarray(w @ w.T), np.eye(64), atol=1e-2)
    w = get_conv_init(None)(key, shape)  # torch default conv init
    bound = np.sqrt(1.0 / fan_in)
    assert float(jnp.max(jnp.abs(w))) <= bound + 1e-6


def test_avg_pool_count_include_pad():
    x = jnp.ones((1, 4, 4, 1))
    # padded corners: window 3 covers 4 real pixels
    y_inc = avg_pool2d(x, 3, 2, padding=1, count_include_pad=True)
    y_exc = avg_pool2d(x, 3, 2, padding=1, count_include_pad=False)
    assert abs(float(y_inc[0, 0, 0, 0]) - 4.0 / 9.0) < 1e-6
    assert abs(float(y_exc[0, 0, 0, 0]) - 1.0) < 1e-6


def test_depth_to_space_and_nearest():
    x = jnp.arange(16.0).reshape(1, 2, 2, 4)
    y = depth_to_space(x, 2)
    assert y.shape == (1, 4, 4, 1)
    # first 2x2 block comes from the first pixel's 4 channels
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, 0]), [[0, 1], [2, 3]])
    up = upsample_nearest(jnp.arange(4.0).reshape(1, 2, 2, 1), 2)
    np.testing.assert_allclose(np.asarray(up[0, :, :, 0]),
                               [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])


def test_spectral_norm_scales_to_unit_sigma():
    sn = SpectralNorm()
    kernel = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 8, 16)) * 5.0
    variables = sn.init(jax.random.PRNGKey(5), kernel)
    # run several power iterations by feeding back the mutable collection
    for _ in range(20):
        k_bar, variables = sn.apply(variables, kernel, mutable=["spectral"])
    w = np.asarray(k_bar).reshape(-1, 16)
    sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 0.05


def _plain_instance_norm(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def test_instance_norm_custom_vjp_matches_autodiff():
    """The analytic IN backward (norms._instance_norm_bwd) must equal plain
    autodiff through the two-pass moments to float tolerance."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 5, 4), jnp.float32) * 3.0 + 1.0
    ct = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 5, 4), jnp.float32)

    def loss_custom(x):
        return jnp.sum(instance_norm(x) * ct)

    def loss_plain(x):
        return jnp.sum(_plain_instance_norm(x) * ct)

    np.testing.assert_allclose(loss_custom(x), loss_plain(x), rtol=1e-6)
    g_c = jax.grad(loss_custom)(x)
    g_p = jax.grad(loss_plain)(x)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_p), rtol=1e-5, atol=1e-6)


def test_layer_norm_affine_custom_vjp_matches_autodiff():
    """Analytic affine-LN backward == autodiff for dx, dscale, dbias."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (3, 4, 5, 6), jnp.float32) * 2.0 - 0.5
    scale = jax.random.normal(jax.random.fold_in(key, 1), (6,)) * 0.3 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (6,)) * 0.1
    ct = jax.random.normal(jax.random.fold_in(key, 3), x.shape, jnp.float32)

    def plain(x, scale, bias, eps=1e-5):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 2, 3), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)

    def loss_custom(args):
        return jnp.sum(layer_norm(args[0], args[1], args[2]) * ct)

    def loss_plain(args):
        return jnp.sum(plain(*args) * ct)

    np.testing.assert_allclose(loss_custom((x, scale, bias)),
                               loss_plain((x, scale, bias)), rtol=1e-6)
    g_c = jax.grad(loss_custom)((x, scale, bias))
    g_p = jax.grad(loss_plain)((x, scale, bias))
    for a, b in zip(g_c, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
