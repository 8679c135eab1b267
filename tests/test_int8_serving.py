"""int8 serving path: calibration capture -> quantized inference.

On CPU the quantized convs run the exact jnp int8 reference (same integer
math as the TPU Pallas kernel, proven equivalent in test_conv_int8.py), so
these tests exercise the REAL serving flow end to end: Conv2d amax sow,
TranslationModel.calibrate_int8, the quant collection plumbing through
_apply, and the accuracy of the quantized forward vs the float forward.
"""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.models import AdaINModel

from conftest import make_batch, tiny_train_args


def _model_and_inputs(b=2):
    args = tiny_train_args(mode="test", batch_size=b)
    m = AdaINModel(args)
    state = m.initialize()
    img = make_batch(b=b)["x1"]
    rng = jax.random.PRNGKey(7)
    z = m.get_z_random(rng, b)
    c = jax.nn.one_hot(jnp.arange(b) % args.num_domains, args.num_domains)
    return m, state, img, z, c


def test_calibration_builds_quant_collections():
    m, state, img, z, c = _model_and_inputs()
    cols = m.calibrate_int8(state, [img, img * 0.5])
    assert set(cols) == {"content_encoder", "decoder"}
    leaves = jax.tree.leaves(cols["content_encoder"])
    assert leaves and all(np.asarray(v) > 0 for v in leaves)
    # every sown amax is a finite f32 scalar
    for v in jax.tree.leaves(cols["decoder"]):
        assert np.asarray(v).shape == () and np.isfinite(np.asarray(v))


def test_quantized_forward_close_to_float():
    m, state, img, z, c = _model_and_inputs()
    ref = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    m.calibrate_int8(state, [img])
    q = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    assert q.shape == ref.shape
    # tanh-bounded outputs in [-1, 1]: PSNR of the int8 path vs float
    mse = float(np.mean((q - ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 25.0, f"int8 serving degraded too far: PSNR={psnr:.1f} dB"


def test_disable_int8_restores_float_path():
    m, state, img, z, c = _model_and_inputs()
    ref = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    m.calibrate_int8(state, [img])
    m.disable_int8()
    back = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    np.testing.assert_allclose(back, ref, atol=1e-6)


def test_calibration_does_not_change_float_outputs():
    """The calib sow must be observation-only."""
    m, state, img, z, c = _model_and_inputs()
    z_c_plain = m.nets["content_encoder"].apply(
        {"params": state.params["content_encoder"]}, img, deterministic=True
    )
    z_c_calib, col = m.nets["content_encoder"].apply(
        {"params": state.params["content_encoder"]},
        img, deterministic=True, mutable=["calib"],
    )
    np.testing.assert_array_equal(np.asarray(z_c_plain), np.asarray(z_c_calib))
    assert jax.tree.leaves(col["calib"])


def test_quantized_forward_with_instance_dec_norm():
    """--dec_norm instance must serve int8 without the LayerNorm defer/packed
    chain (regression: the packed deconv layout used to leak into the
    InstanceNorm + 1x1 head and crash with a param-shape error)."""
    args = tiny_train_args(mode="test", batch_size=2, dec_norm="instance")
    m = AdaINModel(args)
    state = m.initialize()
    img = make_batch(b=2)["x1"]
    rng = jax.random.PRNGKey(11)
    z = m.get_z_random(rng, 2)
    c = jax.nn.one_hot(jnp.arange(2) % args.num_domains, args.num_domains)
    ref = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    m.calibrate_int8(state, [img])
    q = np.asarray(m._forward_random_jit(state.params, img, z, c), np.float32)
    assert q.shape == ref.shape
    mse = float(np.mean((q - ref) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
    assert psnr > 25.0, f"int8 with instance dec_norm degraded: PSNR={psnr:.1f} dB"
