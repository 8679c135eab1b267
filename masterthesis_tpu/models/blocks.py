"""Composable NHWC conv blocks (Flax).

Capability parity with reference src/models/core/blocks.py (ConvBlock:10,
UpsampleBlock:48, DownResnetBlock:93, ResnetBlock:121, AdaINResnetBlock:140,
DecResnetBlock:169) re-designed for TPU:

- NHWC layout (XLA's native conv layout on TPU; channels land on the 128-lane
  minor dimension).
- Explicit reflect/replicate padding folded in front of VALID convs (XLA fuses
  the pad into the conv window).
- Norm/activation as pure functions so everything fuses into the conv epilogue.
- ConvTranspose padding mapped from torch's (k, s, p, output_padding)
  arithmetic to explicit (lo, hi) padding.

Known divergences from the reference (intentional):
- `batch` norm uses batch statistics always (no running stats) — GAN training
  never evaluates with running stats in the reference configs.
- The reference's pixelshuffle UpsampleBlock (blocks.py:77-79) has a channel
  mismatch bug (conv to C then shuffle -> C/4); here the conv widens to 4*C so
  the block is usable.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from masterthesis_tpu.ops.initializers import (
    get_conv_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from masterthesis_tpu.ops.norms import InstanceNorm, LayerNorm
from masterthesis_tpu.ops.spectral import SpectralNorm

Dtype = Any

ACTIVATIONS = {
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
}


def get_activation(name: Optional[str]):
    """String -> activation fn (reference functions.py:28-43)."""
    if name is None:
        return None
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise NotImplementedError(f"activation type '{name}' is not supported at the moment")
    return ACTIVATIONS[name]


def pad2d(x: jnp.ndarray, pad: int, padding_type: Optional[str]) -> jnp.ndarray:
    """Spatial padding for NHWC input (reference functions.py:45-58)."""
    if pad == 0 or padding_type is None:
        return x
    widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if padding_type == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if padding_type == "replicate":
        return jnp.pad(x, widths, mode="edge")
    raise NotImplementedError(f"padding type '{padding_type}' is not supported at the moment")


def avg_pool2d(
    x: jnp.ndarray,
    window: int,
    stride: int,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jnp.ndarray:
    """NHWC average pooling with torch-style int padding semantics."""
    import numpy as np

    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    zero = np.zeros((), jnp.dtype(x.dtype))  # concrete 0 so autodiff sees a monoid sum
    summed = jax.lax.reduce_window(x, zero, jax.lax.add, dims, strides, pads)
    if count_include_pad or padding == 0:
        return summed / (window * window)
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, zero, jax.lax.add, dims, strides, pads)
    return summed / counts


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) equivalent: (N,H,W,C) -> (N,C)."""
    return jnp.mean(x, axis=(1, 2))


def upsample_nearest(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def depth_to_space(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, factor, factor, c // (factor * factor))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * factor, w * factor, c // (factor * factor))


class BatchNorm2d(nn.Module):
    """Affine batch normalization using batch statistics (see module docstring)."""

    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(0, 1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


def make_norm(name: Optional[str]):
    """String -> norm module factory (reference functions.py:11-26)."""
    if name is None:
        return None
    if name == "batch":
        return BatchNorm2d
    if name == "instance":
        return InstanceNorm
    if name == "layer":
        return LayerNorm
    raise NotImplementedError(f"norm type '{name}' is not supported at the moment")


def apply_pending(x, pending, dtype):
    """Apply a deferred per-(sample, channel) norm affine (+activation) from
    a previous serving block inline (the unfused fallback for consumers with
    no kernel prologue)."""
    y = x.astype(jnp.float32) * pending["scale"][:, None, None, :]
    y = y + pending["shift"][:, None, None, :]
    if pending.get("relu"):
        y = jnp.maximum(y, float(pending.get("alpha", 0.0)) * y)
    return y.astype(dtype)


class Conv2d(nn.Module):
    """Plain conv with optional spectral norm, torch-style int padding.

    ``padding_type`` (reflect/replicate) applies an explicit pad in front of a
    VALID conv, like the reference's pad layers (functions.py:45-58).

    Serving-time int8: when an ``{'quant': {'amax_in': ...}}`` collection is
    provided at apply time (built by ``TranslationModel.calibrate_int8``) and
    the conv is an eligible 3x3/stride-1, the call routes through the Pallas
    int8 implicit-GEMM kernel (ops/pallas/conv_int8.py, ~347 TOP/s on v5e vs
    ~181 TFLOP/s for the bf16 conv). With ``mutable=['calib']`` the conv sows
    the running amax of its input for that calibration.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    sn: bool = False
    init_type: Optional[str] = None
    init_gain: float = 0.02
    padding_type: Optional[str] = None
    # int8 serving: also return the kernel's in-kernel (sum, sumsq) spatial
    # stats as (y, sum, sumsq) so the parent block's norm can skip its
    # full-output reduction pass (see ConvBlock)
    serving_stats: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _int8_eligible(self, x) -> bool:
        if self.kernel_size != 3 or self.padding != 1 or self.sn:
            return False
        if self.stride == 1:
            # On TPU, int8 only pays through the Pallas kernel (as-is or
            # channel-lane-padded); XLA's own int8 conv path measured SLOWER
            # than bf16 (quantize / s32-materialize / dequant are separate
            # HBM passes), so off-kernel shapes stay bf16. Off-TPU the exact
            # jnp int8 fallback is fine (tests/mesh dryrun).
            import jax as _jax

            from masterthesis_tpu.ops.pallas.conv_int8 import (
                conv3x3_eligible,
                conv3x3_pad_eligible,
            )

            return (
                _jax.default_backend() != "tpu"
                or conv3x3_eligible(x, self.features)
                or conv3x3_pad_eligible(x, self.features)
            )
        if self.stride == 2:
            # stride-2 int8 is only worth it through the Pallas column-packed
            # kernel (ops/pallas/conv_int8.py pallas_int8_downconv). XLA's own
            # int8 down-conv path measured ~27 ms on v5e across quantize /
            # s32-materialize / dequant+stats fusions vs ~7 ms for the bf16
            # conv+stats fusions (the s32[B,128,128,128] intermediate alone is
            # a 2.1 GB round trip) — so off-kernel shapes stay bf16 on TPU.
            # Off-TPU the exact jnp int8 fallback is fine (tests/mesh dryrun).
            import jax as _jax

            from masterthesis_tpu.ops.pallas.conv_int8 import downconv_eligible

            return _jax.default_backend() != "tpu" or downconv_eligible(
                x, self.features
            )
        return False

    @nn.compact
    def __call__(self, x, pending=None):
        """``pending``: deferred norm+act from the previous serving block —
        ``{"scale": (B, C), "shift": (B, C), "relu": bool, "alpha": float}``
        applied as the int8 kernel's fused prologue (elsewhere inline)."""
        in_features = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            get_conv_init(self.init_type, self.init_gain),
            (k, k, in_features, self.features),
            self.param_dtype,
        )
        if self.sn:
            kernel = SpectralNorm(name="sn")(kernel)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        # calibration capture (not during init, where ALL collections are
        # mutable and degenerate zero-size probe shapes can appear)
        if self.is_mutable_collection("calib") and not self.is_initializing() and x.size:
            amax_src = apply_pending(x, pending, self.dtype) if pending else x
            self.sow(
                "calib",
                "amax_in",
                jnp.max(jnp.abs(amax_src)).astype(jnp.float32),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "amax_in") and self._int8_eligible(x):
            from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3

            amax = self.variable("quant", "amax_in", lambda: None).value
            from masterthesis_tpu.ops.qat import (
                int8_conv3x3_ste,
                qat_scope,
                qat_trace_mode,
            )

            if qat_trace_mode():
                # --int8_train: int8 forward, straight-through bf16 backward
                # routes the generator's forward convs onto the int8 MXU
                # inside the gradient graph. In-kernel stats are suppressed
                # (the parent block computes its norm the differentiable way).
                # Scope-excluded kinds fall through to the plain float conv
                # (each Pallas boundary costs XLA layout copies — see qat.py).
                if ("conv" if self.stride == 1 else "stride2") in qat_scope():
                    return int8_conv3x3_ste(
                        x, kernel, bias, amax,
                        padding_type=self.padding_type or "zero",
                        stride=self.stride, out_dtype=self.dtype,
                    )
            elif pending is None and not self.serving_stats:
                # serving convs without fused prologue/stats: same forward
                # numerics as the serving kernel, via the STE wrapper
                return int8_conv3x3_ste(
                    x, kernel, bias, amax,
                    padding_type=self.padding_type or "zero",
                    stride=self.stride, out_dtype=self.dtype,
                )
            else:
                pk = {}
                if pending is not None:
                    pk = dict(
                        prologue_scale=pending["scale"],
                        prologue_shift=pending["shift"],
                        prologue_relu=bool(pending.get("relu")),
                        prologue_alpha=float(pending.get("alpha", 0.0)),
                    )
                return int8_conv3x3(
                    x, kernel, amax, bias,
                    padding_type=self.padding_type or "zero", out_dtype=self.dtype,
                    stride=self.stride, with_stats=self.serving_stats, **pk,
                )
        if pending is not None:
            # deferred affine not consumed by an int8 kernel: apply inline
            x = apply_pending(x, pending, self.dtype)
        pad = self.padding
        if self.padding_type is not None:
            x = pad2d(x, pad, self.padding_type)
            pad = 0
        # NOTE: do NOT force preferred_element_type=f32 here — on TPU that
        # materializes an f32 output + cast and runs ~12x slower than native
        # bf16-out convs (MXU still accumulates in f32 internally).
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def _subpixel_conv_transpose(x, kernel, dtype):
    """Exact rewrite of conv_transpose(k=3, s=2, pad=(1,2)) as one small conv
    + depth_to_space.

    The input-dilated view multiplies 75% zeros on the MXU; decomposing the
    3x3 kernel into the four output phases gives a single VALID 2x2 conv to
    4*C_out channels on the undilated input (2.25x fewer MXU flops), then a
    free depth-to-space interleave. Phase taps (1-D, correlation view,
    lo=1/hi=2 padding): even out = x[i]*k[1]; odd out = x[i]*k[0] + x[i+1]*k[2].
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    w = jnp.zeros((2, 2, cin, 4 * cout), kernel.dtype)
    k = kernel
    # phase (0,0): even/even -> tap k[1,1] at (0,0)
    w = w.at[0, 0, :, 0 * cout : 1 * cout].set(k[1, 1])
    # phase (0,1): even/odd -> k[1,0] at (0,0), k[1,2] at (0,1)
    w = w.at[0, 0, :, 1 * cout : 2 * cout].set(k[1, 0])
    w = w.at[0, 1, :, 1 * cout : 2 * cout].set(k[1, 2])
    # phase (1,0): odd/even -> k[0,1] at (0,0), k[2,1] at (1,0)
    w = w.at[0, 0, :, 2 * cout : 3 * cout].set(k[0, 1])
    w = w.at[1, 0, :, 2 * cout : 3 * cout].set(k[2, 1])
    # phase (1,1): odd/odd -> 2x2 corners
    w = w.at[0, 0, :, 3 * cout : 4 * cout].set(k[0, 0])
    w = w.at[0, 1, :, 3 * cout : 4 * cout].set(k[0, 2])
    w = w.at[1, 0, :, 3 * cout : 4 * cout].set(k[2, 0])
    w = w.at[1, 1, :, 3 * cout : 4 * cout].set(k[2, 2])
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(1, 1),
        padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(y, 2)


class ConvTranspose2d(nn.Module):
    """Transposed conv with torch (k, s, p, output_padding) arithmetic.

    The (k=3, s=2, p=1, op=1) case — every stride-2 upsample in the decoders —
    takes the exact sub-pixel fast path above.

    Serving-time int8: with an ``{'quant': {'amax_in': ...}}`` collection
    (TranslationModel.calibrate_int8) the (3,2,1,1) case routes through the
    Pallas sub-pixel deconv kernel (ops/pallas/conv_int8.py int8_deconv, the
    int8 MXU at 2x the bf16 rate and 44% of the dilated form's MACs); with
    ``mutable=['calib']`` it sows its input amax like Conv2d."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    sn: bool = False
    init_type: Optional[str] = None
    init_gain: float = 0.02
    # int8 serving: also return the kernel's in-kernel (sum, sumsq) spatial
    # stats as (y, sum4, sumsq4) so the parent block's norm can skip its
    # full-output reduction pass (see UpsampleBlock)
    serving_stats: bool = False
    # int8 serving: allow the lane-packed (B, 2H, W, 2Co) output layout when
    # Co is below the 128-lane width — only safe when the consumer is the
    # packed-aware 1x1 head, not another spatial conv
    allow_packed: bool = False
    # int8 serving, packed 1x1 head only: the parent block's activation
    # (tanh), applied inside _packed_head (in-kernel on TPU) — the caller
    # must then skip its own activation
    fused_activation: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pending=None):
        """``pending``: deferred norm+act from the previous serving block —
        ``{"scale": (B, C), "shift": (B, C), "relu": bool, "packed": bool}``
        applied as the int8 kernel's fused prologue (elsewhere as a jnp
        elementwise pass). ``packed`` marks x in the lane-packed layout
        (only the 1x1 head accepts that)."""
        packed_in = bool(pending) and bool(pending.get("packed"))
        in_features = x.shape[-1] // 2 if packed_in else x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            get_conv_init(self.init_type, self.init_gain),
            (k, k, in_features, self.features),
            self.param_dtype,
        )
        if self.sn:
            kernel = SpectralNorm(name="sn")(kernel)
        if packed_in:
            return self._packed_head(x, kernel, pending)
        is_up3 = (k, self.stride, self.padding, self.output_padding) == (3, 2, 1, 1)
        if self.is_mutable_collection("calib") and not self.is_initializing() and x.size and is_up3:
            self.sow(
                "calib",
                "amax_in",
                jnp.max(jnp.abs(x)).astype(jnp.float32),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        # On TPU, int8 deconv only pays through the Pallas sub-pixel kernel at
        # NATIVELY lane-aligned shapes. The zero-channel-padded variant
        # (conv_int8.deconv_pad_eligible — exact; built for the BaseModel
        # DecoderConcat tail's 276->138 / 146->73 upsamples) is a measured
        # dead end at those shapes and defaults OFF: padding Co 73->128
        # (1.75x waste) / 138->192 pushes the padded deconv to 29.4 ms where
        # the XLA bf16 deconv + fused epilogue ran the whole tail cheaper,
        # and the kernel boundary un-fuses the downstream affine/concat/head
        # chain into ~95 ms of standalone elementwise+copy passes at
        # 256^2/128^2 (serve_profile r5: BaseModel int8 965 img/s padded vs
        # 1,374 aligned-only). MT_INT8_DECONV_PAD=1 re-enables it for
        # experiments. Shapes the aligned kernel rejects stay bf16 rather
        # than hitting the slow XLA int8 path. Off-TPU the exact jnp
        # fallback serves the tests.
        import jax as _jax

        deconv_ok = True
        if is_up3 and _jax.default_backend() == "tpu":
            from masterthesis_tpu.ops.pallas.conv_int8 import (
                deconv_eligible,
                deconv_pad_eligible,
            )

            deconv_ok = deconv_eligible(x, self.features) or (
                os.environ.get("MT_INT8_DECONV_PAD") == "1"
                and deconv_pad_eligible(x, self.features)
            )
        # declared once up front: the QAT scope gate below may fall through to
        # the float path, which must not re-declare the name (Flax forbids it)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if self.has_variable("quant", "amax_in") and is_up3 and not self.sn and deconv_ok:
            from masterthesis_tpu.ops.pallas.conv_int8 import int8_deconv

            amax = self.variable("quant", "amax_in", lambda: None).value
            from masterthesis_tpu.ops.qat import (
                int8_deconv_ste,
                qat_scope,
                qat_trace_mode,
            )

            if qat_trace_mode():
                # --int8_train: int8 sub-pixel forward, straight-through bf16
                # backward; stats and the packed layout are serving-only and
                # suppressed under QAT. Scope-excluded deconvs fall through
                # to the float path (see qat.py on the layout-copy tax).
                if "deconv" in qat_scope():
                    return int8_deconv_ste(
                        x, kernel, bias, amax, out_dtype=self.dtype
                    )
            elif pending is None and not self.serving_stats and not self.allow_packed:
                return int8_deconv_ste(x, kernel, bias, amax, out_dtype=self.dtype)
            else:
                pk = {}
                if pending is not None:
                    # previous block's deferred LN+relu -> fused kernel prologue
                    pk = dict(
                        prologue_scale=pending["scale"],
                        prologue_shift=pending["shift"],
                        prologue_relu=bool(pending.get("relu")),
                    )
                return int8_deconv(
                    x, kernel, amax, bias, out_dtype=self.dtype,
                    with_stats=self.serving_stats, packed_out=self.allow_packed,
                    **pk,
                )
        if pending is not None:
            # deferred affine not consumed by an int8 kernel: apply inline
            x = apply_pending(x, pending, self.dtype)
        use_subpixel = os.environ.get("MT_SUBPIXEL_UP") == "1"
        # NOTE: measured on v5e the sub-pixel rewrite is ~8% SLOWER end-to-end
        # (1104 vs 1195 img/s) — XLA's input-dilated conv already skips the
        # zeros; the d2s interleave costs more than it saves. Kept opt-in.
        if use_subpixel and (k, self.stride, self.padding, self.output_padding) == (3, 2, 1, 1):
            y = _subpixel_conv_transpose(x, kernel, self.dtype)
        else:
            lo = k - 1 - self.padding
            hi = k - 1 - self.padding + self.output_padding
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides=(self.stride, self.stride),
                padding=((lo, hi), (lo, hi)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y

    def _packed_head(self, x, kernel, pending):
        """1x1 head on the int8 serving convs' lane-packed layout.

        x (B, 2H, W, 2C): channels [0:C] feed even output columns, [C:2C]
        odd. Applies the deferred LN affine (+relu), then the 1x1 conv as a
        block-diagonal (2C, 2*out) matmul so even/odd columns never mix, and
        unpacks with the free trailing reshape. Avoids the ~23 ms of f32
        relayout copies the unpacked path costs at flagship shapes (r3
        device profile)."""
        if self.kernel_size != 1 or self.stride != 1:
            raise ValueError("packed input is only supported by the 1x1 head")
        c = kernel.shape[2]
        co = self.features
        b, hh, ww, _ = x.shape
        w = kernel[0, 0]  # (C, out)
        w2 = jnp.zeros((2 * c, 2 * co), kernel.dtype)
        w2 = w2.at[:c, :co].set(w).at[c:, co:].set(w)
        bias = (
            self.param("bias", nn.initializers.zeros, (co,), self.param_dtype)
            if self.use_bias
            else None
        )
        import jax as _jax

        from masterthesis_tpu.ops.pallas.conv_int8 import (
            packed_head_eligible,
            pallas_packed_head,
        )

        if (
            _jax.default_backend() == "tpu"
            and self.fused_activation in (None, "tanh")
            and packed_head_eligible(x, 2 * co)
        ):
            # ONE Pallas pass: deferred-LN affine + relu + block-diag 1x1
            # matmul + bias + tanh — replaces the standalone affine pass, the
            # XLA head conv, and the downstream tanh over a 6-lane (21x
            # HBM-padded) tensor (~13 -> ~3.5 ms at flagship shapes, r4
            # device profiles). Emits channel-major (B, 2Co, H2, W) so every
            # HBM tile is full-lane; one small transpose unpacks it.
            y = pallas_packed_head(
                x, pending["scale"], pending["shift"], w2,
                jnp.tile(bias.astype(jnp.float32), 2) if bias is not None else None,
                relu=bool(pending.get("relu")),
                alpha=float(pending.get("alpha", 0.0)),
                act=self.fused_activation,
                out_dtype=self.dtype,
            )
            y = jnp.moveaxis(y, 1, 3)  # (B, H2, W, 2Co)
        else:
            y = apply_pending(x, pending, self.dtype)
            y = jax.lax.conv_general_dilated(
                y, w2[None, None].astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + jnp.tile(bias.astype(self.dtype), 2)
            act = get_activation(self.fused_activation)
            if act is not None:
                y = act(y)
        return y.reshape(b, hh, 2 * ww, co)


class Dense(nn.Module):
    """Linear layer with torch nn.Linear default init."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from masterthesis_tpu.ops.initializers import torch_linear_bias_init_for

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_linear_kernel_init,
            # torch default bias U(+-1/sqrt(fan_in)) — fan_in known at trace
            bias_init=torch_linear_bias_init_for(int(x.shape[-1])),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class ConvBlock(nn.Module):
    """pad -> (SN)conv -> norm -> activation (reference blocks.py:10-46).

    int8 serving chain (``defer_norm``, set by ContentEncoder when serving):
    the conv requests in-kernel (sum, sumsq) stats, the parameter-free
    instance norm is folded into a per-(sample, channel) affine, and instead
    of applying it here the block returns ``(y, pending)`` so the NEXT conv
    fuses it into its kernel prologue — like the decoder tail's LayerNorm
    deferral (UpsampleBlock)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = False
    norm: Optional[str] = None
    activation: Optional[str] = None
    padding_type: Optional[str] = None
    sn: bool = False
    init_type: Optional[str] = None
    init_gain: float = 0.02
    defer_norm: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pending=None):
        out = Conv2d(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=self.use_bias,
            sn=self.sn,
            init_type=self.init_type,
            init_gain=self.init_gain,
            padding_type=self.padding_type,
            serving_stats=self.norm == "instance",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, pending=pending)
        stats = None
        if isinstance(out, tuple):
            y, s1, s2 = out
            n = float(y.shape[1] * y.shape[2])
            stats = (s1 / n, jnp.maximum(s2 / n - jnp.square(s1 / n), 0.0))
        else:
            y = out
        deferable = self.defer_norm and self.norm == "instance" and (
            self.activation in (None, "relu", "lrelu")
        )
        if deferable and stats is None:
            # bf16 conv (e.g. the 7x7 stem) feeding a fused consumer: compute
            # the per-(sample, channel) moments here (XLA fuses the reduction
            # into the conv epilogue) and defer the apply
            from masterthesis_tpu.ops.norms import _moments

            mean, var = _moments(y, axes=(1, 2))
            stats = (mean.reshape(y.shape[0], -1), var.reshape(y.shape[0], -1))
        if stats is not None:
            mean, var = stats
            eps = 1e-5
            a = jax.lax.rsqrt(var + eps)
            b = -mean * a
            if deferable:
                return y, {
                    "scale": a,
                    "shift": b,
                    "relu": self.activation is not None,
                    "alpha": 0.01 if self.activation == "lrelu" else 0.0,
                }
            y = apply_pending(y, {"scale": a, "shift": b}, self.dtype)
        elif self.norm is not None:
            norm_cls = make_norm(self.norm)
            y = norm_cls(name="norm")(y)
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        return y


class UpsampleBlock(nn.Module):
    """transpose / nearest+conv / conv+pixelshuffle upsampling
    (reference blocks.py:48-91)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = False
    norm: Optional[str] = None
    activation: Optional[str] = None
    padding_type: Optional[str] = None
    sn: bool = False
    up_type: str = "transpose"
    init_type: Optional[str] = None
    init_gain: float = 0.02
    # int8 serving (set by _DecoderTail): hand the LayerNorm+relu to the next
    # block as a per-(sample, channel) affine instead of applying it here —
    # the consumer fuses it into its kernel prologue
    defer_norm: bool = False
    # int8 serving: let the deconv emit its lane-packed layout (last up
    # block only — the packed-aware consumer is the 1x1 head)
    allow_packed: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pending=None):
        common = dict(
            sn=self.sn,
            init_type=self.init_type,
            init_gain=self.init_gain,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if pending is not None and "transpose" not in self.up_type:
            # deferred affine from a previous serving block; this up type
            # has no fused consumer — apply it inline
            x = apply_pending(x, pending, self.dtype)
            pending = None
        if "transpose" in self.up_type:
            # int8 serving: ask the deconv kernel for in-kernel (sum, sumsq)
            # stats when a LayerNorm follows — the norm then skips its
            # full-output reduction (the f32 relayout copies it forces cost
            # ~23 ms at flagship shapes, r3 device profile)
            want_stats = self.norm == "layer"
            # packed 1x1 head: the activation is applied inside _packed_head
            # (fused into the Pallas kernel on TPU) — skip it here
            packed_in = bool(pending) and bool(pending.get("packed"))
            act_in_head = packed_in and self.norm is None
            out = ConvTranspose2d(
                self.features,
                self.kernel_size,
                self.stride,
                self.padding,
                self.output_padding,
                use_bias=self.use_bias,
                serving_stats=want_stats,
                allow_packed=self.allow_packed,
                fused_activation=self.activation if act_in_head else None,
                name="conv",
                **common,
            )(x, pending=pending)
            if act_in_head:
                return out
            if isinstance(out, tuple):
                y, s1, s2 = out
                norm_cls = make_norm(self.norm)
                # per-sample totals over the 4 phase groups x Co channels
                stats = (jnp.sum(s1, axis=-1), jnp.sum(s2, axis=-1))
                packed = y.shape[-1] != self.features
                if self.defer_norm and self.activation in ("relu", None):
                    a, b = norm_cls(
                        name="norm", param_features=self.features
                    )(y, stats=stats, defer=True)
                    if packed:
                        a = jnp.tile(a, (1, 2))
                        b = jnp.tile(b, (1, 2))
                    return y, {
                        "scale": a,
                        "shift": b,
                        "relu": self.activation == "relu",
                        "packed": packed,
                    }
                y = norm_cls(name="norm")(y, stats=stats)
                act = get_activation(self.activation)
                return act(y) if act is not None else y
            y = out
        elif "nearest" in self.up_type:
            y = upsample_nearest(x, 2)
            y = ConvBlock(
                self.features,
                self.kernel_size,
                1,
                self.padding,
                use_bias=self.use_bias,
                padding_type=self.padding_type,
                name="conv",
                **common,
            )(y)
        elif "pixelshuffle" in self.up_type:
            y = ConvBlock(
                self.features * 4,
                self.kernel_size,
                1,
                self.padding,
                use_bias=self.use_bias,
                padding_type=self.padding_type,
                name="conv",
                **common,
            )(x)
            y = depth_to_space(y, 2)
        else:
            raise NotImplementedError(f"Mode {self.up_type} is not supported at the moment")
        norm_cls = make_norm(self.norm)
        if norm_cls is not None:
            y = norm_cls(name="norm")(y)
        act = get_activation(self.activation)
        if act is not None:
            y = act(y)
        return y


class DownResnetBlock(nn.Module):
    """Pre-activation residual downsampling block (reference blocks.py:93-119)."""

    features: int
    norm: Optional[str] = "instance"
    activation: Optional[str] = "lrelu"
    padding_type: Optional[str] = "reflect"
    use_bias: bool = True
    init_type: Optional[str] = None
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = x
        norm_cls = make_norm(self.norm)
        if norm_cls is not None:
            h = norm_cls(name="pre_norm")(h)
        act = get_activation(self.activation)
        h = act(h)
        # Reference runtime quirk (verified by tests/test_parity_reference.py):
        # its pre-activation is LeakyReLU(inplace=True) applied directly to the
        # block input (blocks.py:109), so by the time `self.shortcut(x)` runs,
        # x has already been activated in place — unless a (non-inplace)
        # pre-norm produced a fresh tensor first. Match that behavior exactly.
        shortcut_in = x if norm_cls is not None else h
        h = ConvBlock(
            in_features,
            3,
            1,
            1,
            use_bias=self.use_bias,
            norm=self.norm,
            activation=self.activation,
            padding_type=self.padding_type,
            name="conv1",
            **common,
        )(h)
        h = ConvBlock(
            self.features,
            3,
            1,
            1,
            use_bias=self.use_bias,
            padding_type=self.padding_type,
            name="conv2",
            **common,
        )(h)
        h = avg_pool2d(h, 2, 2)
        s = avg_pool2d(shortcut_in, 2, 2)
        s = Conv2d(self.features, 1, 1, 0, use_bias=self.use_bias, name="shortcut", **common)(s)
        return h + s


def _int8_block_serving(q) -> bool:
    """Whether a resblock should take the fused int8 serving path.

    Never under a QAT (--int8_train) trace: the whole-block kernel is
    non-differentiable; under QAT the block decomposes into ConvBlocks whose
    Conv2d children route through the straight-through int8 wrappers.
    """
    from masterthesis_tpu.ops.qat import qat_trace_mode

    if qat_trace_mode():
        return False
    try:
        return bool(q) and "conv1" in q and "conv2" in q
    except Exception:
        return False


class ResnetBlock(nn.Module):
    """Standard 2-conv residual block (reference blocks.py:121-138)."""

    features: int
    dropout: bool = False
    norm: Optional[str] = "instance"
    padding_type: Optional[str] = "reflect"
    activation: Optional[str] = "relu"
    init_type: Optional[str] = None
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _serving_int8(self, x, q):
        """Fused int8 serving: on TPU the WHOLE block (conv1 -> IN -> relu ->
        conv2 -> IN -> +x) is one kernel launch per image with the
        intermediate living only in VMEM (ops/pallas/conv_int8.py
        pallas_int8_resblock); off-TPU the identical math composes from
        int8_conv3x3 calls."""
        from masterthesis_tpu.ops.pallas.conv_int8 import int8_resblock

        p = self.variables["params"]
        zero = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
        return int8_resblock(
            x,
            p["conv1"]["conv"]["kernel"], p["conv2"]["conv"]["kernel"],
            q["conv1"]["conv"]["amax_in"], q["conv2"]["conv"]["amax_in"],
            gamma=zero, beta=zero,
            padding_type=self.padding_type,
            relu_mid=self.activation == "relu",
        )

    def _fused_train(self, x):
        """Differentiable whole-block mega-kernel (training path): conv1 ->
        IN -> relu -> conv2 -> IN -> +x as ONE Pallas launch per image in the
        forward and one in the backward (ops/pallas/resblock_bf16.py; autodiff
        equality pinned in tests/test_resblock_bf16.py). Block-boundary-only
        interfaces avoid the per-conv layout-copy tax that killed --int8_train
        as a speed lever (BASELINE.md round-4 training section)."""
        from masterthesis_tpu.ops.pallas.resblock_bf16 import fused_resblock

        p = self.variables["params"]
        zero = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
        return fused_resblock(
            x.astype(self.dtype),
            p["conv1"]["conv"]["kernel"], p["conv2"]["conv"]["kernel"],
            zero, zero,
            padding_type=self.padding_type, relu_mid=True,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from masterthesis_tpu.ops.pallas.conv_int8 import resblock_serving_profitable
        from masterthesis_tpu.ops.pallas.resblock_bf16 import (
            fused_train_active,
            resblock_train_eligible,
        )

        q = self.variables.get("quant", {})
        if (
            _int8_block_serving(q)
            and self.norm == "instance"
            and self.activation == "relu"
            and not self.dropout
            and resblock_serving_profitable(x)
        ):
            return self._serving_int8(x, q)
        if (
            not self.is_initializing()  # init runs composed: creates params
            and fused_train_active()
            and self.norm == "instance"
            and self.activation == "relu"
            and not self.dropout
            and self.padding_type in ("reflect", "zero", None)
            and resblock_train_eligible(x)
        ):
            return self._fused_train(x)
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = ConvBlock(
            self.features,
            3,
            1,
            1,
            norm=self.norm,
            activation=self.activation,
            padding_type=self.padding_type,
            name="conv1",
            **common,
        )(x)
        h = ConvBlock(
            self.features,
            3,
            1,
            1,
            norm=self.norm,
            padding_type=self.padding_type,
            name="conv2",
            **common,
        )(h)
        if self.dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return x + h


class AdaINResnetBlock(nn.Module):
    """Residual block with shared AdaIN modulation after each conv
    (reference blocks.py:140-167; the single `norm` module is shared by both
    convs, so the style projection parameters are shared too)."""

    features: int
    dropout: bool = False
    padding_type: Optional[str] = "reflect"
    activation: Optional[str] = "relu"
    init_type: Optional[str] = None
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _serving_int8(self, x, z, q):
        """Fused int8 serving: the shared AdaIN (style-projected gamma/beta
        around instance-norm stats) and both convs run as ONE kernel launch
        per image on TPU (see pallas_int8_resblock); the style projection is
        computed here from the same shared ``adain/style_proj`` params the
        float path uses."""
        from masterthesis_tpu.ops.pallas.conv_int8 import int8_resblock

        p = self.variables["params"]
        sp = p["adain"]["style_proj"]
        h = z.astype(jnp.float32) @ sp["kernel"].astype(jnp.float32) + sp["bias"]
        gamma, beta = jnp.split(h, 2, axis=-1)  # (B, C) each, shared by both
        return int8_resblock(
            x,
            p["conv1"]["conv"]["kernel"], p["conv2"]["conv"]["kernel"],
            q["conv1"]["conv"]["amax_in"], q["conv2"]["conv"]["amax_in"],
            gamma=gamma, beta=beta,
            padding_type=self.padding_type,
            relu_mid=self.activation == "relu",
        )

    def _fused_train(self, x, z):
        """Differentiable whole-block mega-kernel (training path), the AdaIN
        variant: the shared style projection is computed here (grads flow to
        both z and style_proj through the matmul; gamma/beta enter the kernel
        as custom_vjp primals with analytic gradients). See
        ResnetBlock._fused_train on why whole-block interfaces."""
        from masterthesis_tpu.ops.pallas.resblock_bf16 import fused_resblock

        p = self.variables["params"]
        sp = p["adain"]["style_proj"]
        h = z.astype(jnp.float32) @ sp["kernel"].astype(jnp.float32) + sp[
            "bias"
        ].astype(jnp.float32)
        gamma, beta = jnp.split(h, 2, axis=-1)  # (B, C) each, shared by both
        return fused_resblock(
            x.astype(self.dtype),
            p["conv1"]["conv"]["kernel"], p["conv2"]["conv"]["kernel"],
            gamma, beta,
            padding_type=self.padding_type,
            relu_mid=self.activation == "relu",
        )

    @nn.compact
    def __call__(self, x, z, deterministic: bool = True):
        from masterthesis_tpu.ops.norms import AdaptiveInstanceNorm
        from masterthesis_tpu.ops.pallas.conv_int8 import resblock_serving_profitable
        from masterthesis_tpu.ops.pallas.resblock_bf16 import (
            fused_train_active,
            resblock_train_eligible,
        )

        q = self.variables.get("quant", {})
        if (
            _int8_block_serving(q)
            and self.activation in ("relu", None)
            and not self.dropout
            and resblock_serving_profitable(x)
        ):
            return self._serving_int8(x, z, q)
        if (
            not self.is_initializing()  # init runs composed: creates params
            and fused_train_active()
            and self.activation in ("relu", None)
            and not self.dropout
            and self.padding_type in ("reflect", "zero", None)
            and resblock_train_eligible(x)
        ):
            return self._fused_train(x, z)
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        norm = AdaptiveInstanceNorm(
            self.features, dtype=self.dtype, param_dtype=self.param_dtype, name="adain"
        )
        act = get_activation(self.activation)
        h = ConvBlock(self.features, 3, 1, 1, padding_type=self.padding_type, name="conv1", **common)(x)
        h = norm(h, z)
        h = act(h)
        h = ConvBlock(self.features, 3, 1, 1, padding_type=self.padding_type, name="conv2", **common)(h)
        h = norm(h, z)
        if self.dropout:
            h = nn.Dropout(0.5, deterministic=deterministic)(h)
        return x + h


class DecResnetBlock(nn.Module):
    """Residual block with per-block style chunk injected via channel concat +
    1x1 bottlenecks (reference blocks.py:169-208)."""

    features: int
    norm: Optional[str] = "instance"
    padding_type: Optional[str] = "reflect"
    dropout: bool = False
    init_type: Optional[str] = None
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, deterministic: bool = True):
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        n, h_dim, w_dim, _ = x.shape
        z_map = jnp.broadcast_to(z[:, None, None, :], (n, h_dim, w_dim, z.shape[-1])).astype(x.dtype)
        norm_cls = make_norm(self.norm)

        def mix(name, inp):
            cat = jnp.concatenate([inp, z_map], axis=-1)
            y = Conv2d(cat.shape[-1], 1, 1, 0, name=f"{name}_a", **common)(cat)
            y = nn.relu(y)
            y = Conv2d(self.features, 1, 1, 0, name=f"{name}_b", **common)(y)
            return nn.relu(y)

        out = ConvBlock(self.features, 3, 1, 1, padding_type=self.padding_type, name="conv1", **common)(x)
        if norm_cls is not None:
            out = norm_cls(name="norm1")(out)
        out = mix("block1", out)
        out = ConvBlock(self.features, 3, 1, 1, padding_type=self.padding_type, name="conv2", **common)(out)
        if norm_cls is not None:
            out = norm_cls(name="norm2")(out)
        out = mix("block2", out)
        if self.dropout:
            out = nn.Dropout(0.5, deterministic=deterministic)(out)
        return x + out


class GaussianNoise(nn.Module):
    """Additive standard normal noise during training
    (reference misc.py:18-25); uses the 'noise' rng stream."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic:
            return x
        noise = jax.random.normal(self.make_rng("noise"), x.shape, dtype=x.dtype)
        return x + noise


class HighPass(nn.Module):
    """Depthwise 3x3 high-pass filter (reference misc.py:6-16)."""

    w_hpf: float = 1.0

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        filt = (
            jnp.array([[-1, -1, -1], [-1, 8.0, -1], [-1, -1, -1]], dtype=x.dtype) / self.w_hpf
        )
        kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1, groups=c
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
