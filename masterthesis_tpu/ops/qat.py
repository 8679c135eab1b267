"""Quantization-aware training: int8 forward convs, straight-through backward.

The round-3 roofline (BASELINE.md) left one named training-throughput lever
unbanked: run the generator's forward convs on the int8 MXU path (~2x the
bf16 rate through the Pallas kernels, ops/pallas/conv_int8.py) while keeping
the backward in bf16. This module provides the autodiff plumbing:

- ``int8_conv3x3_ste`` / ``int8_deconv_ste`` are ``jax.custom_vjp`` wrappers
  whose FORWARD is the exact serving int8 path (quantize -> int8 MXU ->
  dequant; Pallas on TPU, the bit-exact jnp int8 fallback elsewhere) and
  whose BACKWARD is the vjp of the bf16 reference convolution evaluated at
  the UNQUANTIZED saved inputs — the standard straight-through estimator
  (Bengio et al. 2013; the same recipe FP8 training frameworks use for the
  quantize step). Gradients w.r.t. the activation amax are zero.

Activation scales come from delayed calibration: ``TranslationModel.
calibrate_quant_train`` (models/translation.py) refreshes per-conv amax
from a recent batch every ``--int8_calib_freq`` iterations and the train
step consumes them as dynamic jit inputs — no recompile on refresh.

The reference framework has no quantized training (torch, CUDA,
src/models/base_model.py trains fp32); this is a TPU-native addition gated
by the head-to-head quality harness (scripts/reference_headtohead.py).
"""
from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_PAD_MODE = {"reflect": "reflect", "replicate": "edge"}

# --------------------------------------------------------------------------- #
# QAT trace mode
# --------------------------------------------------------------------------- #
# The decoder/encoder serving chains (deferred norms, in-kernel stats, packed
# layouts) are wired with always-on module flags that only ACT when the quant
# collection is present — correct for inference, but under --int8_train the
# quant collection is present inside a GRADIENT graph where those kernels are
# non-differentiable. Tracing is single-threaded, so a plain module global
# set around the train-step body lets Conv2d/ConvTranspose2d suppress the
# serving-only paths and always take the straight-through wrappers.
_qat_mode = False

# Which conv kinds the QAT trace quantizes. Every Pallas custom call inside
# the gradient graph pins its operands/results to the default layout, and XLA
# harmonizes with physical copies — measured at ~17 GB/step (~40 ms) with all
# kinds on at the flagship config, which more than erases the int8 MXU win
# (micro-benched 1.15-1.36x for 3x3 convs, ~1x for deconvs, at train shapes).
# The scope lets --int8_train keep only the boundaries that pay for
# themselves: "conv" (stride-1 3x3, the resblock bulk), "stride2" (encoder
# down-convs), "deconv" (decoder upsamples).
_qat_scope = frozenset({"conv", "stride2", "deconv"})


def qat_trace_mode() -> bool:
    """True while a QAT (--int8_train) step body is being traced."""
    return _qat_mode


def qat_scope() -> frozenset:
    """Conv kinds the QAT trace routes through the int8 STE wrappers."""
    return _qat_scope


def parse_qat_scope(scope) -> frozenset:
    """Parse ``--int8_train_scope``: "all" or a comma list of
    conv/stride2/deconv. Pure — each model stores its own parsed scope and
    passes it to ``qat_trace``, so two models with different scopes in one
    process don't clobber each other."""
    if scope in (None, "all", ""):
        return frozenset({"conv", "stride2", "deconv"})
    kinds = frozenset(s.strip() for s in str(scope).split(",") if s.strip())
    bad = kinds - {"conv", "stride2", "deconv"}
    if bad:
        raise ValueError(f"unknown --int8_train_scope kinds: {sorted(bad)}")
    return kinds


@contextlib.contextmanager
def qat_trace(scope: frozenset | None = None):
    """Mark the enclosed trace as quantization-aware training.

    ``scope`` (from ``parse_qat_scope``) applies for the duration of this
    trace only — the globals exist because tracing is single-threaded and the
    Flax modules have no config channel, but they never outlive the context,
    so they can't leak between model instances."""
    global _qat_mode, _qat_scope
    prev_mode, prev_scope = _qat_mode, _qat_scope
    _qat_mode = True
    if scope is not None:
        _qat_scope = scope
    try:
        yield
    finally:
        _qat_mode, _qat_scope = prev_mode, prev_scope


@functools.lru_cache(maxsize=None)
def _conv3x3_ste(padding_type: str, stride: int, out_dtype_name: str,
                 has_bias: bool):
    """custom_vjp int8 3x3 conv for one static (pad, stride, dtype) config."""
    out_dtype = jnp.dtype(out_dtype_name)

    def ref_conv(x, kernel, bias):
        # the bf16 reference path, byte-for-byte the Conv2d float branch
        # (models/blocks.py Conv2d.__call__): explicit reflect/edge pad in
        # front of a VALID conv, zero padding folded into the conv itself
        pad = 1
        if padding_type in _PAD_MODE:
            x = jnp.pad(
                x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=_PAD_MODE[padding_type]
            )
            pad = 0
        y = jax.lax.conv_general_dilated(
            x.astype(out_dtype),
            kernel.astype(out_dtype),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if has_bias:
            y = y + bias.astype(out_dtype)
        return y

    @jax.custom_vjp
    def f(x, kernel, bias, amax):
        from masterthesis_tpu.ops.pallas.conv_int8 import int8_conv3x3

        return int8_conv3x3(
            x, kernel, amax, bias if has_bias else None,
            padding_type=padding_type, out_dtype=out_dtype, stride=stride,
        )

    def fwd(x, kernel, bias, amax):
        return f(x, kernel, bias, amax), (x, kernel, bias, amax)

    def bwd(res, g):
        x, kernel, bias, amax = res
        # straight-through: differentiate the float conv at the saved
        # (unquantized) inputs; the quantizer passes gradients unchanged
        _, vjp = jax.vjp(ref_conv, x, kernel, bias)
        dx, dk, db = vjp(g.astype(out_dtype))
        return dx, dk, db, jnp.zeros_like(amax)

    f.defvjp(fwd, bwd)
    return f


def int8_conv3x3_ste(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    amax,
    *,
    padding_type: str = "zero",
    stride: int = 1,
    out_dtype=jnp.bfloat16,
):
    """3x3 conv: int8 forward (serving kernels), bf16 straight-through grad.

    Differentiable w.r.t. ``x``/``kernel``/``bias``; ``amax`` (the calibrated
    per-tensor activation range) gets a zero cotangent. Forward output is
    IDENTICAL to the serving ``int8_conv3x3`` call with the same arguments.
    """
    f = _conv3x3_ste(
        padding_type or "zero", int(stride), jnp.dtype(out_dtype).name,
        bias is not None,
    )
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), jnp.float32)
    return f(x, kernel, bias, jnp.asarray(amax, jnp.float32))


@functools.lru_cache(maxsize=None)
def _deconv_ste(out_dtype_name: str, has_bias: bool):
    """custom_vjp int8 sub-pixel deconv (the k=3, s=2, p=1, op=1 upsample)."""
    out_dtype = jnp.dtype(out_dtype_name)

    def ref_deconv(x, kernel, bias):
        # the ConvTranspose2d float branch for (3, 2, 1, 1):
        # lo = k-1-p = 1, hi = lo + output_padding = 2
        y = jax.lax.conv_transpose(
            x.astype(out_dtype),
            kernel.astype(out_dtype),
            strides=(2, 2),
            padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if has_bias:
            y = y + bias.astype(out_dtype)
        return y

    @jax.custom_vjp
    def f(x, kernel, bias, amax):
        return f_fwd_only(x, kernel, bias, amax)

    def f_fwd_only(x, kernel, bias, amax):
        from masterthesis_tpu.ops.pallas.conv_int8 import int8_deconv

        return int8_deconv(
            x, kernel, amax, bias if has_bias else None, out_dtype=out_dtype
        )

    def fwd(x, kernel, bias, amax):
        return f_fwd_only(x, kernel, bias, amax), (x, kernel, bias, amax)

    def bwd(res, g):
        x, kernel, bias, amax = res
        _, vjp = jax.vjp(ref_deconv, x, kernel, bias)
        dx, dk, db = vjp(g.astype(out_dtype))
        return dx, dk, db, jnp.zeros_like(amax)

    f.defvjp(fwd, bwd)
    return f


def int8_deconv_ste(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    amax,
    *,
    out_dtype=jnp.bfloat16,
):
    """(3,2,1,1) transposed conv: int8 sub-pixel forward, bf16 STE grad."""
    f = _deconv_ste(jnp.dtype(out_dtype).name, bias is not None)
    if bias is None:
        bias = jnp.zeros((kernel.shape[-1],), jnp.float32)
    return f(x, kernel, bias, jnp.asarray(amax, jnp.float32))
