"""Tests for int8-forward training (--int8_train, ops/qat.py).

The straight-through wrappers must (1) forward EXACTLY like the serving int8
path, (2) backward EXACTLY like the bf16/float reference convolution at the
saved unquantized inputs, and (3) drive a full QAT train step whose losses
stay within quantization noise of the plain step. On CPU the int8 forward is
the bit-exact jnp fallback of the Pallas kernels, so all of this pins the
real quantization math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.arguments import default_train_args
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.models.translation import GEN_NETS
from masterthesis_tpu.ops.qat import (
    int8_conv3x3_ste,
    int8_deconv_ste,
    qat_trace,
    qat_trace_mode,
)
from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3, int8_deconv


# --------------------------------------------------------------------------- #
# op level
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("padding_type,stride,bias", [
    ("reflect", 1, True),
    ("zero", 1, False),
    ("zero", 2, True),
])
def test_ste_conv_forward_matches_serving(padding_type, stride, bias):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 8, 8, 6))
    w = jax.random.normal(k2, (3, 3, 6, 5)) * 0.2
    b = jax.random.normal(k3, (5,)) * 0.1 if bias else None
    amax = jnp.max(jnp.abs(x))

    got = int8_conv3x3_ste(
        x, w, b, amax, padding_type=padding_type, stride=stride,
        out_dtype=jnp.float32,
    )
    want = int8_conv3x3(
        x, w, amax, b, padding_type=padding_type, stride=stride,
        out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("padding_type,stride", [("reflect", 1), ("zero", 2)])
def test_ste_conv_grad_is_float_conv_grad(padding_type, stride):
    """The backward is the vjp of the float conv at the unquantized inputs."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(k1, (2, 8, 8, 6))
    w = jax.random.normal(k2, (3, 3, 6, 5)) * 0.2
    b = jax.random.normal(k3, (5,)) * 0.1
    amax = jnp.max(jnp.abs(x))
    # fixed cotangent so both paths see the same upstream gradient
    pad = 1 if stride == 1 else 1
    out_shape = (2, 8 // stride, 8 // stride, 5)
    g = jax.random.normal(k4, out_shape)

    def ste_loss(x, w, b):
        y = int8_conv3x3_ste(
            x, w, b, amax, padding_type=padding_type, stride=stride,
            out_dtype=jnp.float32,
        )
        return jnp.sum(y * g)

    def ref_loss(x, w, b):
        mode = {"reflect": "reflect", "replicate": "edge"}.get(padding_type)
        xx = x
        p = pad
        if mode is not None:
            xx = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
            p = 0
        y = jax.lax.conv_general_dilated(
            xx, w, (stride, stride), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return jnp.sum(y * g)

    gs = jax.grad(ste_loss, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    for a_, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_ste_conv_amax_gets_zero_grad():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 4, 4)) * 0.2

    def loss(amax):
        return jnp.sum(
            int8_conv3x3_ste(x, w, None, amax, out_dtype=jnp.float32) ** 2
        )

    g = jax.grad(loss)(jnp.asarray(1.5, jnp.float32))
    assert float(g) == 0.0


def test_ste_deconv_forward_and_grad():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(4), 4)
    x = jax.random.normal(k1, (2, 6, 6, 8))
    w = jax.random.normal(k2, (3, 3, 8, 4)) * 0.2
    b = jax.random.normal(k3, (4,)) * 0.1
    amax = jnp.max(jnp.abs(x))

    got = int8_deconv_ste(x, w, b, amax, out_dtype=jnp.float32)
    want = int8_deconv(x, w, amax, b, out_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    g = jax.random.normal(k4, got.shape)

    def ste_loss(x, w, b):
        return jnp.sum(int8_deconv_ste(x, w, b, amax, out_dtype=jnp.float32) * g)

    def ref_loss(x, w, b):
        y = jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        return jnp.sum(y * g)

    gs = jax.grad(ste_loss, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    for a_, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_qat_trace_context_restores():
    assert not qat_trace_mode()
    with qat_trace():
        assert qat_trace_mode()
    assert not qat_trace_mode()


# --------------------------------------------------------------------------- #
# model level
# --------------------------------------------------------------------------- #
def tiny_args(**over):
    return default_train_args(
        crop_size=32, dim=8, latent_dim=4, num_domains=3, batch_size=2,
        compute_dtype="float32", use_dis_content=False, logdir=None,
        mode="train", **over,
    )


def make_batch(args, rng):
    b = args.batch_size
    k1, k2 = jax.random.split(rng)
    mk = lambda k: jax.random.uniform(  # noqa: E731
        k, (b, args.crop_size, args.crop_size, 3), jnp.float32, -1.0, 1.0
    )
    y = jax.nn.one_hot(jnp.arange(b) % args.num_domains, args.num_domains)
    return {"x1": mk(k1), "x2": mk(k2), "y1": y, "y2": y[::-1]}


@pytest.mark.parametrize("gan_step", ["reference", "fused"])
def test_int8_train_step_runs_close_to_bf16(gan_step):
    """A QAT step runs end to end, updates every net, and its losses sit
    within quantization noise of the plain step from the same state."""
    args = tiny_args(gan_step=gan_step, int8_train=True)
    model = AdaINModel(args)
    state = model.initialize()
    batch = make_batch(args, jax.random.PRNGKey(5))
    rng = jax.random.PRNGKey(6)

    # plain step first (fresh copies: the jitted step donates its input)
    plain_model = AdaINModel(tiny_args(gan_step=gan_step))
    plain_state = plain_model.initialize()
    _, plain_logs = plain_model._main_step(plain_state, batch, rng, {})

    cols = model.calibrate_quant_train(state, batch, jax.random.PRNGKey(7))
    assert cols["content_encoder"] and cols["decoder"]
    assert all(
        float(x) > 0
        for x in jax.tree_util.tree_leaves(cols)
    )
    before = {net: jax.tree.map(np.asarray, dict(state.params[net]))
              for net in GEN_NETS}
    new_state, logs = model.optimize_parameters(state, batch, 0, rng)

    for k, v in logs.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k
    assert set(logs.keys()) == set(plain_logs.keys())
    # int8 forward error is ~1% of activations; GAN losses at init are O(1),
    # so the two steps must agree loosely but systematically
    for k in ("g_adv", "g_cls", "l1_cc_rec", "total_g"):
        a_, b_ = float(logs[k]), float(plain_logs[k])
        np.testing.assert_allclose(a_, b_, rtol=0.15, atol=0.05), k
    for net, prev in before.items():
        after = jax.tree_util.tree_leaves(new_state.params[net])
        moved = any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(prev), after)
        )
        assert moved, f"{net} did not update"

    # refreshing the calibration keeps the same pytree structure (no retrace)
    cols2 = model.calibrate_quant_train(new_state, batch, jax.random.PRNGKey(8))
    assert jax.tree_util.tree_structure(cols) == jax.tree_util.tree_structure(cols2)


def test_int8_train_rejects_remat():
    with pytest.raises(ValueError):
        AdaINModel(tiny_args(int8_train=True, remat=True))
