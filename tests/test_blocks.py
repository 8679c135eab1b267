"""Shape/behavior tests for the block layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.models import blocks as B


def _init_apply(mod, *args, rngs=None, **kw):
    key = jax.random.PRNGKey(0)
    init_rngs = {"params": key}
    variables = mod.init(init_rngs, *args, **kw)
    return mod.apply(variables, *args, rngs=rngs, **kw)


def test_conv_block_shapes_and_padding_types():
    x = jnp.ones((2, 8, 8, 3))
    y = _init_apply(B.ConvBlock(6, 3, 2, 1, padding_type="reflect", norm="instance", activation="relu"), x)
    assert y.shape == (2, 4, 4, 6)
    y = _init_apply(B.ConvBlock(6, 7, 1, 3, padding_type="replicate"), x)
    assert y.shape == (2, 8, 8, 6)
    y = _init_apply(B.ConvBlock(6, 3, 2, 1), x)  # numeric padding
    assert y.shape == (2, 4, 4, 6)


def test_upsample_block_variants_double_resolution():
    x = jnp.ones((2, 4, 4, 8))
    for up_type in ("transpose", "nearest", "pixelshuffle"):
        kw = dict(norm="layer", activation="relu", up_type=up_type)
        if up_type == "transpose":
            y = _init_apply(B.UpsampleBlock(4, 3, 2, 1, 1, **kw), x)
        else:
            y = _init_apply(B.UpsampleBlock(4, 3, 1, 1, padding_type="reflect", **kw), x)
        assert y.shape == (2, 8, 8, 4), up_type
    # final 1x1 transpose head keeps resolution (reference decoder tail)
    y = _init_apply(B.UpsampleBlock(3, 1, 1, 0, activation="tanh", up_type="transpose"), x)
    assert y.shape == (2, 4, 4, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_resnet_blocks_preserve_shape():
    x = jnp.ones((2, 8, 8, 8))
    assert _init_apply(B.ResnetBlock(8), x).shape == x.shape
    assert _init_apply(B.DownResnetBlock(16, norm=None), x).shape == (2, 4, 4, 16)
    z = jnp.ones((2, 8))
    assert _init_apply(B.AdaINResnetBlock(8), x, z).shape == x.shape
    assert _init_apply(B.DecResnetBlock(8), x, z).shape == x.shape


def test_adain_resnet_block_shares_style_projection():
    mod = B.AdaINResnetBlock(8)
    variables = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 8)), jnp.ones((1, 8)))
    # one shared adain module -> exactly one style projection
    assert "adain" in variables["params"]
    assert list(variables["params"]["adain"].keys()) == ["style_proj"]


def test_gaussian_noise_train_vs_eval():
    mod = B.GaussianNoise()
    x = jnp.zeros((2, 4, 4, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out_eval = mod.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), 0.0)
    out_train = mod.apply(variables, x, deterministic=False, rngs={"noise": jax.random.PRNGKey(1)})
    assert float(jnp.std(out_train)) > 0.5


def test_dropout_needs_rng_only_in_train():
    mod = B.ResnetBlock(4, dropout=True)
    x = jnp.ones((1, 4, 4, 4))
    variables = mod.init(jax.random.PRNGKey(0), x)
    y_det = mod.apply(variables, x, deterministic=True)
    y_train = mod.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y_det.shape == y_train.shape


def test_highpass_flat_input_zero():
    mod = B.HighPass(w_hpf=1.0)
    x = jnp.ones((1, 6, 6, 2)) * 3.0
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)
    # interior of a constant image has zero high-frequency content
    np.testing.assert_allclose(np.asarray(y[0, 2:4, 2:4]), 0.0, atol=1e-5)


def test_conv_transpose_matches_torch_arithmetic():
    # k3 s2 p1 op1 -> exactly 2x (torch ConvTranspose2d arithmetic)
    x = jnp.ones((1, 5, 5, 2))
    y = _init_apply(B.ConvTranspose2d(2, 3, 2, 1, 1), x)
    assert y.shape == (1, 10, 10, 2)
    y = _init_apply(B.ConvTranspose2d(2, 1, 1, 0, 0), x)
    assert y.shape == (1, 5, 5, 2)


def test_subpixel_conv_transpose_exact():
    """The k3/s2/p1/op1 fast path must match lax.conv_transpose exactly."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6))
    ref = jax.lax.conv_transpose(
        x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = B._subpixel_conv_transpose(x, k, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
