"""int8 serving conv kernel (ops/pallas/conv_int8.py).

The Pallas kernel runs in interpret mode on CPU; its int32 accumulation must
match the lax int8 conv reference EXACTLY (integer math), and the end-to-end
quantize-conv-dequantize path must approximate the float conv.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.ops.pallas.conv_int8 import (
    int8_conv3x3,
    jnp_int8_conv,
    pallas_int8_conv3x3,
    quantize_act,
    quantize_weight,
)


def _data(key=0, b=2, h=8, w=8, c=8, co=8):
    r = np.random.default_rng(key)
    x = r.integers(-127, 128, (b, h, w, c)).astype(np.int8)
    wq = r.integers(-127, 128, (3, 3, c, co)).astype(np.int8)
    return jnp.asarray(x), jnp.asarray(wq)


@pytest.mark.parametrize("padding_type", ["reflect", "zero"])
def test_kernel_exact_integer_match(padding_type):
    x_q, w_q = _data()
    co = w_q.shape[-1]
    scale = jnp.ones((co,), jnp.float32)
    got = pallas_int8_conv3x3(
        x_q, w_q, scale, padding_type=padding_type, out_dtype=jnp.float32,
        interpret=True,
    )
    want = jnp_int8_conv(x_q, w_q, padding_type).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_scale_bias_epilogue():
    x_q, w_q = _data(1)
    co = w_q.shape[-1]
    scale = jnp.linspace(0.5, 2.0, co)
    bias = jnp.linspace(-1.0, 1.0, co)
    got = pallas_int8_conv3x3(
        x_q, w_q, scale, bias, padding_type="reflect", out_dtype=jnp.float32,
        interpret=True,
    )
    want = jnp_int8_conv(x_q, w_q, "reflect").astype(jnp.float32)
    want = want * scale[None, None, None, :] + bias[None, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_quantize_roundtrip_helpers():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8)) * 3.0
    q, s = quantize_act(x, jnp.max(jnp.abs(x)))
    assert q.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(q.astype(jnp.float32) * s), np.asarray(x), atol=float(s) * 0.51
    )
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 8))
    wq, sw = quantize_weight(w)
    np.testing.assert_allclose(
        np.asarray(wq.astype(jnp.float32) * sw[None, None, None]), np.asarray(w),
        atol=float(jnp.max(sw)) * 0.51,
    )


@pytest.mark.parametrize("padding_type", ["reflect", "zero"])
def test_int8_conv_approximates_float_conv(padding_type):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 8, 8, 16))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 16)) * 0.1
    got = int8_conv3x3(x, w, jnp.max(jnp.abs(x)), padding_type=padding_type,
                       out_dtype=jnp.float32)

    mode = {"reflect": "reflect"}.get(padding_type, "constant")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    dn = jax.lax.conv_dimension_numbers(xp.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(xp, w, (1, 1), "VALID", dimension_numbers=dn)
    err = np.abs(np.asarray(got) - np.asarray(want))
    rel = err.max() / (np.abs(np.asarray(want)).max() + 1e-9)
    assert rel < 0.05, f"int8 conv relative error too large: {rel}"


def test_int8_conv_grad_free_inference_only():
    # serving path: no custom VJP on purpose — differentiation should fail
    # loudly via int8 dtypes rather than silently produce wrong grads
    x_q, w_q = _data(4)
    out = jnp_int8_conv(x_q, w_q, "reflect")
    assert out.dtype == jnp.int32


def test_in_kernel_quantization_matches_external():
    """The kernel's fused quantize (round/clip during padding) must equal
    quantize_act + integer conv exactly."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 8, 8, 8)) * 2.0
    w = jax.random.normal(jax.random.PRNGKey(6), (3, 3, 8, 8)) * 0.1
    amax = jnp.max(jnp.abs(x))
    from masterthesis_tpu.ops.pallas.conv_int8 import INT8_MAX

    sx = amax / INT8_MAX
    w_q, sw = quantize_weight(w)
    scale = (sx * sw).astype(jnp.float32)
    got = pallas_int8_conv3x3(
        x, w_q, scale, padding_type="reflect", out_dtype=jnp.float32,
        interpret=True, inv_act_scale=1.0 / sx,
    )
    x_q, _ = quantize_act(x, amax)
    want = jnp_int8_conv(x_q, w_q, "reflect").astype(jnp.float32) * scale[None, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_kernel_prologue_and_stats_match_jnp_path():
    """Fused prologue (affine+relu before quantize) and in-kernel stats must
    equal the jnp fallback path exactly (identical rounding expressions)."""
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3

    key = jax.random.PRNGKey(8)
    b, hw, c = 2, 8, 8
    x = jax.random.normal(key, (b, hw, hw, c)) * 1.5
    w = jax.random.normal(jax.random.PRNGKey(9), (3, 3, c, c)) * 0.2
    amax = jnp.asarray(2.0, jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(10), (b, c)) * 0.3 + 1.0
    bsh = jax.random.normal(jax.random.PRNGKey(11), (b, c)) * 0.2

    y_k, s1_k, s2_k = int8_conv3x3(
        x, w, amax, padding_type="reflect", out_dtype=jnp.float32,
        interpret=True, prologue_scale=a, prologue_shift=bsh,
        prologue_relu=True, with_stats=True,
    )
    y_j, s1_j, s2_j = int8_conv3x3(
        x, w, amax, padding_type="reflect", out_dtype=jnp.float32,
        interpret=False, prologue_scale=a, prologue_shift=bsh,
        prologue_relu=True, with_stats=True,
    )
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_j), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_k), np.asarray(s2_j), rtol=1e-5, atol=1e-4)


def test_fused_resblock_serving_close_to_float():
    """ResnetBlock fused int8 serving vs its float path."""
    from masterthesis_tpu.models.blocks import ResnetBlock

    key = jax.random.PRNGKey(12)
    x = jax.random.normal(key, (2, 8, 8, 16))
    block = ResnetBlock(16)
    params = block.init(jax.random.PRNGKey(13), x)["params"]
    ref = block.apply({"params": params}, x)
    # calibrate
    _, cal = block.apply({"params": params}, x, mutable=["calib"])
    from masterthesis_tpu.models.quantize import extract_amax

    quant = extract_amax(cal["calib"])
    got = block.apply({"params": params, "quant": quant}, x)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale_ = np.abs(np.asarray(ref)).max()
    assert err / scale_ < 0.06, f"fused resblock serving error too large: {err/scale_}"


def test_fused_adain_resblock_serving_close_to_float():
    from masterthesis_tpu.models.blocks import AdaINResnetBlock

    key = jax.random.PRNGKey(14)
    x = jax.random.normal(key, (2, 8, 8, 16))
    z = jax.random.normal(jax.random.PRNGKey(15), (2, 256))
    block = AdaINResnetBlock(16)
    params = block.init(jax.random.PRNGKey(16), x, z)["params"]
    ref = block.apply({"params": params}, x, z)
    _, cal = block.apply({"params": params}, x, z, mutable=["calib"])
    from masterthesis_tpu.models.quantize import extract_amax

    quant = extract_amax(cal["calib"])
    got = block.apply({"params": params, "quant": quant}, x, z)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale_ = np.abs(np.asarray(ref)).max()
    assert err / scale_ < 0.06, f"fused adain serving error too large: {err/scale_}"


def _assert_resblock_close(got, want, rel_bound=0.02):
    """Kernel-vs-composed bound: the mega-kernel stores its intermediate h1
    as bf16 in VMEM scratch (by design, for the VMEM budget), the composed
    chain keeps f32 — measured ~0.8% max relative divergence at BOTH aligned
    (c=128) and lane-padded channel counts."""
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    scale = np.abs(np.asarray(want)).max()
    assert err / scale < rel_bound, f"kernel-vs-composed rel err {err/scale}"


def test_resblock_mega_kernel_matches_composed():
    """The single-launch resblock kernel (interpret; lane-padded at c=8) vs
    the composed int8_conv3x3 chain (jnp path): identical quantize
    expressions, bf16-intermediate tolerance."""
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_resblock

    key = jax.random.PRNGKey(20)
    b, hw, c = 2, 8, 8
    x = jax.random.normal(key, (b, hw, hw, c), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(21), (3, 3, c, c)) * 0.2
    w2 = jax.random.normal(jax.random.PRNGKey(22), (3, 3, c, c)) * 0.2
    gamma = jax.random.normal(jax.random.PRNGKey(23), (b, c)) * 0.3
    beta = jax.random.normal(jax.random.PRNGKey(24), (b, c)) * 0.2
    amax1, amax2 = jnp.asarray(3.0), jnp.asarray(4.0)

    got = int8_resblock(x, w1, w2, amax1, amax2, gamma, beta,
                        padding_type="reflect", relu_mid=True, interpret=True)
    want = int8_resblock(x, w1, w2, amax1, amax2, gamma, beta,
                         padding_type="reflect", relu_mid=True, interpret=False)
    _assert_resblock_close(got, want)


def test_resblock_mega_kernel_zero_style_is_plain_in():
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_resblock

    key = jax.random.PRNGKey(25)
    b, hw, c = 1, 8, 8
    x = jax.random.normal(key, (b, hw, hw, c), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(26), (3, 3, c, c)) * 0.2
    w2 = jax.random.normal(jax.random.PRNGKey(27), (3, 3, c, c)) * 0.2
    zero = jnp.zeros((b, c), jnp.float32)
    got = int8_resblock(x, w1, w2, 3.0, 3.0, zero, zero,
                        padding_type="zero", relu_mid=True, interpret=True)
    want = int8_resblock(x, w1, w2, 3.0, 3.0, zero, zero,
                         padding_type="zero", relu_mid=True, interpret=False)
    _assert_resblock_close(got, want)


def test_conv3x3_lane_padded_matches_jnp_path():
    """Channel lane-padding (misaligned C/Co zero-padded to the 128-lane
    width, BaseModel DecoderConcat shapes) must be EXACT vs the unpadded jnp
    int8 path — including fused prologue and the (sliced) in-kernel stats."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(31), 3)
    b, hw, c, co = 2, 8, 12, 20  # deliberately lane-misaligned, c != co
    x = jax.random.normal(k1, (b, hw, hw, c)) * 1.5
    w = jax.random.normal(k2, (3, 3, c, co)) * 0.2
    pa = 1.0 + 0.1 * jax.random.normal(k3, (b, c))
    pb = 0.1 * jax.random.normal(k3, (b, c))
    bias = jnp.linspace(-0.3, 0.3, co)
    amax = jnp.float32(2.0)
    y_k, s1_k, s2_k = int8_conv3x3(
        x, w, amax, bias=bias, padding_type="reflect", out_dtype=jnp.float32,
        interpret=True, prologue_scale=pa, prologue_shift=pb,
        prologue_relu=True, with_stats=True,
    )
    y_j, s1_j, s2_j = int8_conv3x3(
        x, w, amax, bias=bias, padding_type="reflect", out_dtype=jnp.float32,
        interpret=False, prologue_scale=pa, prologue_shift=pb,
        prologue_relu=True, with_stats=True,
    )
    assert y_k.shape == (b, hw, hw, co) and s1_k.shape == (b, co)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_j), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_k), np.asarray(s2_j), rtol=1e-5, atol=1e-4)


def test_resblock_lane_padded_matches_composed():
    """Lane-padded mega-kernel (misaligned channels) vs the composed jnp
    chain: IN over an all-zero padded channel must stay 0 through both convs
    and the residual add."""
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_resblock

    key = jax.random.PRNGKey(33)
    b, hw, c = 2, 8, 12  # lane-misaligned
    x = jax.random.normal(key, (b, hw, hw, c), jnp.float32)
    w1 = jax.random.normal(jax.random.PRNGKey(34), (3, 3, c, c)) * 0.2
    w2 = jax.random.normal(jax.random.PRNGKey(35), (3, 3, c, c)) * 0.2
    gamma = jax.random.normal(jax.random.PRNGKey(36), (b, c)) * 0.3
    beta = jax.random.normal(jax.random.PRNGKey(37), (b, c)) * 0.2
    got = int8_resblock(x, w1, w2, 3.0, 4.0, gamma, beta,
                        padding_type="reflect", relu_mid=True, interpret=True)
    want = int8_resblock(x, w1, w2, 3.0, 4.0, gamma, beta,
                         padding_type="reflect", relu_mid=True, interpret=False)
    assert got.shape == x.shape
    _assert_resblock_close(got, want)


# --------------------------------------------------------------------------- #
# int8 transposed conv (sub-pixel deconv kernel)
# --------------------------------------------------------------------------- #
def _float_conv_transpose(x, w, dtype=jnp.float32):
    return jax.lax.conv_transpose(
        x.astype(dtype), w.astype(dtype), strides=(2, 2),
        padding=((1, 2), (1, 2)),  # lo=k-1-p=1, hi=k-1-p+op=2
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_deconv_kernel_exact_integer_match():
    from masterthesis_tpu.ops.pallas.conv_int8 import (
        jnp_int8_deconv, pallas_int8_deconv, subpixel_weights,
    )

    r = np.random.default_rng(3)
    x_q = jnp.asarray(r.integers(-127, 128, (2, 8, 8, 8)).astype(np.int8))
    w_q = jnp.asarray(r.integers(-127, 128, (3, 3, 8, 8)).astype(np.int8))
    w4 = subpixel_weights(w_q)
    scale4 = jnp.ones((4 * 8,), jnp.float32)
    got = pallas_int8_deconv(
        x_q, w4, scale4, out_dtype=jnp.float32, interpret=True
    )
    want = jnp_int8_deconv(x_q, w4).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_jnp_int8_deconv_matches_float_conv_transpose():
    """The sub-pixel int8 math IS the transpose conv (integer weights)."""
    from masterthesis_tpu.ops.pallas.conv_int8 import jnp_int8_deconv, subpixel_weights

    r = np.random.default_rng(4)
    x_q = jnp.asarray(r.integers(-8, 9, (2, 6, 6, 4)).astype(np.int8))
    w_q = jnp.asarray(r.integers(-8, 9, (3, 3, 4, 4)).astype(np.int8))
    got = jnp_int8_deconv(x_q, subpixel_weights(w_q)).astype(jnp.float32)
    want = _float_conv_transpose(x_q, w_q)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_deconv_approximates_float():
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_deconv

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (2, 8, 8, 8)) * 1.5
    w = jax.random.normal(k2, (3, 3, 8, 8)) * 0.2
    bias = jnp.linspace(-0.5, 0.5, 8)
    got = int8_deconv(x, w, jnp.max(jnp.abs(x)), bias=bias, out_dtype=jnp.float32)
    want = _float_conv_transpose(x, w) + bias[None, None, None, :]
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.max() < 0.12, err.max()
    assert err.mean() < 0.02, err.mean()


def test_deconv_kernel_matches_jnp_fallback_with_stats_prologue():
    """In-kernel quantize + prologue affine/relu + stats == the unfused jnp
    path, bit-for-bit on the quantized values. Calls the kernel directly
    (small test channels fail the production eligibility gate)."""
    from masterthesis_tpu.ops.pallas.conv_int8 import (
        INT8_MAX, int8_deconv, pallas_int8_deconv, quantize_weight,
        subpixel_weights,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    x = jax.random.normal(k1, (2, 8, 8, 8)) * 2.0
    w = jax.random.normal(k2, (3, 3, 8, 8)) * 0.3
    pa = 1.0 + 0.1 * jax.random.normal(k3, (2, 8))
    pb = 0.1 * jax.random.normal(k3, (2, 8))
    amax = jnp.float32(2.5)
    w_q, sw = quantize_weight(w)
    y_k, s1_k, s2_k = pallas_int8_deconv(
        x, subpixel_weights(w_q), jnp.tile(amax / INT8_MAX * sw, 4),
        out_dtype=jnp.float32, interpret=True, inv_act_scale=INT8_MAX / amax,
        prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True,
    )
    y_j, s1_j, s2_j = int8_deconv(
        x, w, amax, prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True, out_dtype=jnp.float32, interpret=False,
    )
    np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_j))
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_j), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_k), np.asarray(s2_j), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("row_blocks", [2, 4])
def test_deconv_kernel_row_blocks(row_blocks):
    """Row-split grids (2/4-way) produce identical output to row_blocks=1."""
    from masterthesis_tpu.ops.pallas.conv_int8 import (
        pallas_int8_deconv, subpixel_weights,
    )

    r = np.random.default_rng(11)
    x_q = jnp.asarray(r.integers(-127, 128, (2, 8, 8, 8)).astype(np.int8))
    w_q = jnp.asarray(r.integers(-127, 128, (3, 3, 8, 8)).astype(np.int8))
    w4 = subpixel_weights(w_q)
    scale4 = jnp.ones((32,), jnp.float32)
    a = pallas_int8_deconv(x_q, w4, scale4, out_dtype=jnp.float32,
                           interpret=True, row_blocks=1)
    b = pallas_int8_deconv(x_q, w4, scale4, out_dtype=jnp.float32,
                           interpret=True, row_blocks=row_blocks)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_deconv_lane_padded_matches_jnp_path():
    """Unaligned channels (the BaseModel tail shape class) through the
    zero-padded kernel dispatch == the unfused jnp int8 math. The integer
    accumulators are identical; the f32 dequant epilogue's fma ordering
    differs at the last bit at the padded lane count, so the output check is
    a ~1-ulp allclose rather than bitwise."""
    from masterthesis_tpu.ops.pallas.conv_int8 import (
        deconv_eligible, deconv_pad_eligible, int8_deconv,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 3)
    c, co = 20, 10  # pads to 128 -> 64
    x = jax.random.normal(k1, (2, 8, 8, c)) * 2.0
    w = jax.random.normal(k2, (3, 3, c, co)) * 0.3
    bias = jnp.linspace(-0.3, 0.3, co)
    pa = 1.0 + 0.1 * jax.random.normal(k3, (2, c))
    pb = 0.1 * jax.random.normal(k3, (2, c))
    amax = jnp.float32(2.5)
    assert not deconv_eligible(x, co) and deconv_pad_eligible(x, co)
    y_k, s1_k, s2_k = int8_deconv(
        x, w, amax, bias=bias, out_dtype=jnp.float32, interpret=True,
        prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True,
    )
    y_j, s1_j, s2_j = int8_deconv(
        x, w, amax, bias=bias, out_dtype=jnp.float32, interpret=False,
        prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True,
    )
    assert y_k.shape == y_j.shape == (2, 16, 16, co)
    assert s1_k.shape == (2, 4 * co)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j),
                               rtol=1e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_j), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_k), np.asarray(s2_j), rtol=1e-5, atol=1e-4)


def test_int8_deconv_lane_padded_packed_out_returns_unpacked():
    """packed_out on a padded dispatch degrades safely to the unpacked
    layout (callers detect packing by shape)."""
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_deconv

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (1, 8, 8, 20))
    w = jax.random.normal(k2, (3, 3, 20, 10)) * 0.3
    y = int8_deconv(x, w, jnp.float32(2.0), out_dtype=jnp.float32,
                    interpret=True, packed_out=True)
    assert y.shape == (1, 16, 16, 10)


# --------------------------------------------------------------------------- #
# int8 stride-2 down conv (column-packed kernel)
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("padding_type", ["reflect", "zero"])
def test_downconv_kernel_exact_integer_match(padding_type):
    from masterthesis_tpu.ops.pallas.conv_int8 import (
        downconv_weights, jnp_int8_conv, pallas_int8_downconv,
    )

    r = np.random.default_rng(21)
    x_q = jnp.asarray(r.integers(-127, 128, (2, 8, 12, 64)).astype(np.int8))
    w_q = jnp.asarray(r.integers(-127, 128, (3, 3, 64, 128)).astype(np.int8))
    got = pallas_int8_downconv(
        x_q, downconv_weights(w_q), jnp.ones((128,), jnp.float32),
        padding_type=padding_type, out_dtype=jnp.float32, interpret=True,
    )
    want = jnp_int8_conv(x_q, w_q, padding_type, stride=2).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_downconv_kernel_matches_jnp_with_stats_prologue():
    """In-kernel quantize + prologue affine/relu + stats == the unfused jnp
    path, bit-for-bit on the quantized values."""
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(23), 3)
    x = jax.random.normal(k1, (2, 8, 8, 64)) * 2.0
    w = jax.random.normal(k2, (3, 3, 64, 128)) * 0.3
    pa = 1.0 + 0.1 * jax.random.normal(k3, (2, 64))
    pb = 0.1 * jax.random.normal(k3, (2, 64))
    bias = jnp.linspace(-0.2, 0.2, 128)
    amax = jnp.float32(2.5)
    y_k, s1_k, s2_k = int8_conv3x3(
        x, w, amax, bias=bias, padding_type="reflect", stride=2,
        out_dtype=jnp.float32, interpret=True,
        prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True,
    )
    y_j, s1_j, s2_j = int8_conv3x3(
        x, w, amax, bias=bias, padding_type="reflect", stride=2,
        out_dtype=jnp.float32, interpret=False,
        prologue_scale=pa, prologue_shift=pb, prologue_relu=True,
        with_stats=True,
    )
    # quantized values are identical; the fused dequant+bias FMA may round
    # differently from the unfused jnp expression by ~1 ulp
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_j), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1_k), np.asarray(s1_j), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2_k), np.asarray(s2_j), rtol=1e-5, atol=1e-4)


def test_int8_downconv_approximates_float():
    from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3

    k1, k2 = jax.random.split(jax.random.PRNGKey(27))
    x = jax.random.normal(k1, (2, 12, 12, 64)) * 1.5
    w = jax.random.normal(k2, (3, 3, 64, 128)) * 0.2
    got = int8_conv3x3(
        x, w, jnp.max(jnp.abs(x)), padding_type="reflect", stride=2,
        out_dtype=jnp.float32, interpret=True,
    )
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    want = jax.lax.conv_general_dilated(
        xp, w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    err = np.abs(np.asarray(got) - np.asarray(want))
    out_std = float(np.std(np.asarray(want)))
    # 9*64-term accumulation: quantization noise ~1% of the output scale
    assert err.max() < 0.08 * out_std, (err.max(), out_std)
    assert err.mean() < 0.015 * out_std, (err.mean(), out_std)


# --------------------------------------------------------------------------- #
# fused packed 1x1 head (deferred-LN affine + block-diag matmul in one pass)
# --------------------------------------------------------------------------- #
def test_packed_head_kernel_matches_xla_path():
    from masterthesis_tpu.ops.pallas.conv_int8 import pallas_packed_head

    k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(31), 5)
    b, h2, w, c = 2, 16, 128, 64
    co = 3
    x = (jax.random.normal(k1, (b, h2, w, 2 * c)) * 2.0).astype(jnp.float32)
    scale = jax.random.uniform(k2, (b, 2 * c), jnp.float32, 0.5, 1.5)
    shift = jax.random.normal(k3, (b, 2 * c)) * 0.3
    wk = jax.random.normal(k4, (c, co)) * 0.2
    bias = jax.random.normal(k5, (co,)) * 0.1
    w2 = jnp.zeros((2 * c, 2 * co), jnp.float32)
    w2 = w2.at[:c, :co].set(wk).at[c:, co:].set(wk)

    got = pallas_packed_head(
        x, scale, shift, w2, jnp.tile(bias, 2), relu=True, alpha=0.0,
        act="tanh", out_dtype=jnp.float32, interpret=True,
    )
    # channel-major full-lane output shape
    assert got.shape == (b, 2 * co, h2, w)
    got = jnp.moveaxis(got, 1, 3)

    # reference: the unfused XLA packed path (affine -> 1x1 conv -> bias ->
    # tanh); the trailing unpack reshape is identical row-major order
    y = x * scale[:, None, None, :] + shift[:, None, None, :]
    y = jnp.maximum(y, 0.0)
    want = jax.lax.conv_general_dilated(
        y, w2[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.tile(bias, 2)
    want = jnp.tanh(want)

    np.testing.assert_allclose(
        np.asarray(got.reshape(b, h2, 2 * w, co)),
        np.asarray(want.reshape(b, h2, 2 * w, co)),
        rtol=2e-2, atol=2e-2,
    )


def test_packed_head_kernel_lrelu_no_bias_no_act():
    from masterthesis_tpu.ops.pallas.conv_int8 import pallas_packed_head

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(32), 4)
    b, h2, w, c2, co2 = 1, 8, 128, 128, 6
    x = jax.random.normal(k1, (b, h2, w, c2))
    scale = jax.random.uniform(k2, (b, c2), jnp.float32, 0.5, 1.5)
    shift = jax.random.normal(k3, (b, c2)) * 0.2
    w2 = jax.random.normal(k4, (c2, co2)) * 0.1

    got = pallas_packed_head(
        x, scale, shift, w2, None, relu=True, alpha=0.2,
        out_dtype=jnp.float32, interpret=True,
    )
    y = x * scale[:, None, None, :] + shift[:, None, None, :]
    y = jnp.maximum(y, 0.2 * y)
    want = jnp.einsum("bhwc,cd->bhwd", y, w2)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(got, 1, 3)), np.asarray(want),
        rtol=2e-2, atol=2e-2,
    )
