"""Differentiable bf16 residual-block mega-kernels (training path).

The round-3 roofline (BASELINE.md) named one large unbanked training lever:
a differentiable analog of the serving ``pallas_int8_resblock`` — the whole
block

    out = x + norm2(conv2(relu(norm1(conv1(x)))))

as ONE Pallas launch per image in the forward AND one in the backward, with
norm_i = instance-norm stats modulated by a shared style affine
``(1+gamma)*x_hat + beta`` (gamma = beta = 0 for the plain-IN encoder block,
the style projection for AdaIN decoder blocks — reference
src/models/core/blocks.py:121-167).

Why a whole-block kernel instead of per-op kernels: every Pallas custom call
pins its operands/results to the default layout, and XLA harmonizes layouts
with physical copies. Measured on the --int8_train per-conv wrappers at the
flagship config: ~17 GB of copy traffic per step (~40 ms), more than the int8
MXU win. A whole-block kernel has only block-boundary interfaces; chained
resblocks (4 encoder + 4 decoder in the flagship) hand tensors to each other
in matching default layouts, so the copies never materialize — and the norm
stats / affine / relu / residual elementwise passes stay in VMEM instead of
round-tripping HBM.

Semantics match the composed float path (``ConvBlock`` twice + analytic-VJP
norms): bf16 convs with f32 MXU accumulation, f32 centered two-pass moments
over the compute-dtype conv outputs, eps 1e-5, reflect/zero padding (the
corner fill order equals ``jnp.pad``'s per-axis reflect). The backward is the
exact analytic VJP of that composition — the same closed-form instance-norm
backward as ops/norms.py — with the conv gradients computed as in-kernel
9-tap contractions; equality with ``jax.grad`` of the composition is pinned
in tests/test_resblock_bf16.py.

Forward saves (h1, h2, stats) as custom_vjp residuals: the raw conv outputs
are materialized by the baseline XLA path anyway, and saving them lets the
backward skip any conv recomputation (a conv at these shapes costs ~10x the
HBM write of its output).
"""
from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_MODE = "auto"  # auto (TPU only) | on | off | interpret (tests)
_TRAIN_TRACE = False  # inside a training-step trace (set by TranslationModel)


def set_fused_resblock(mode: str) -> None:
    """Configure routing: auto (on-TPU), on, off, interpret (CPU tests)."""
    global _MODE
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(f"unknown fused_resblock mode: {mode}")
    _MODE = mode


def fused_resblock_wanted() -> bool:
    """Whether model blocks should route through the fused training kernel."""
    if _MODE == "off":
        return False
    if _MODE in ("on", "interpret"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@contextlib.contextmanager
def fused_train_trace():
    """Mark the enclosing trace as a TRAINING step: inside this context the
    resblock modules route through the fused differentiable kernel (when
    ``fused_resblock_wanted()`` and the shape is eligible). Serving/forward
    traces stay on the composed XLA path — the kernel materializes (h1, h2,
    stats) as custom_vjp residuals, which pure inference doesn't want.
    Entered by TranslationModel around the jitted step bodies (the step is
    traced ONCE, so a trace-time flag is sufficient, like ops/qat.py)."""
    global _TRAIN_TRACE
    prev = _TRAIN_TRACE
    _TRAIN_TRACE = True
    try:
        yield
    finally:
        _TRAIN_TRACE = prev


def fused_train_active() -> bool:
    """Whether a resblock module being traced right now should take the fused
    training kernel: inside a training trace, not under QAT (--int8_train
    wants per-conv int8 forwards instead), and routing enabled."""
    if not _TRAIN_TRACE:
        return False
    from masterthesis_tpu.ops.qat import qat_trace_mode

    if qat_trace_mode():
        return False
    return fused_resblock_wanted()


def _interpret() -> bool:
    return _MODE == "interpret"


def _train_fits(h: int, w: int, c: int) -> bool:
    # 4 bf16 scratch buffers of ~(h+4)(w+4)c plus 4 I/O blocks of hwc and two
    # f32 (9, c, c) grad accumulators must fit VMEM with pipeline headroom.
    per_buf = (h + 4) * (w + 4) * c * 2
    return (
        h >= 8
        and w >= 8
        and h * w * c * 2 <= 4_700_000
        and 8 * per_buf + 2 * 9 * c * c * 4 <= 60_000_000
    )


def resblock_train_eligible(x: jnp.ndarray) -> bool:
    """Shape gate for the fused training resblock (no lane padding here:
    misaligned channel counts keep the composed float path)."""
    if x.ndim != 4:
        return False
    _, h, w, c = x.shape
    return c % 128 == 0 and _train_fits(h, w, c)


# --------------------------------------------------------------------------- #
# reference composition (tests + semantics spec)
# --------------------------------------------------------------------------- #
_PAD_MODE = {"reflect": "reflect", "replicate": "edge"}


def _pad(x: jnp.ndarray, padding_type: Optional[str]) -> jnp.ndarray:
    mode = _PAD_MODE.get(padding_type or "zero")
    if mode is not None:
        return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _conv_valid(xp: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def ref_resblock(x, w1, w2, gamma, beta, padding_type="reflect",
                 relu_mid=True, eps=1e-5):
    """Pure-jnp composition with the float path's semantics (bf16 convs, f32
    centered moments, shared style affine). The kernels must match this and
    its ``jax.grad``."""
    out, _, _, _ = ref_resblock_aux(
        x, w1, w2, gamma, beta, padding_type, relu_mid, eps
    )
    return out


def ref_resblock_aux(x, w1, w2, gamma, beta, padding_type="reflect",
                     relu_mid=True, eps=1e-5):
    cd = x.dtype
    g32 = gamma.astype(jnp.float32)[:, None, None, :]
    b32 = beta.astype(jnp.float32)[:, None, None, :]

    def norm_apply(hh):
        h32 = hh.astype(jnp.float32)
        mean = jnp.mean(h32, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(h32 - mean), axis=(1, 2), keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        return (1.0 + g32) * ((h32 - mean) * rstd) + b32, mean, rstd

    h1 = _conv_valid(_pad(x, padding_type).astype(cd), w1.astype(cd))
    n1, m1, r1 = norm_apply(h1)
    # jax.nn.relu (not jnp.maximum): its grad at exactly 0 is 0, matching the
    # kernel's (n1 > 0) mask and the model's get_activation("relu")
    a1 = jax.nn.relu(n1) if relu_mid else n1
    h2 = _conv_valid(_pad(a1.astype(cd), padding_type), w2.astype(cd))
    n2, m2, r2 = norm_apply(h2)
    out = (x.astype(jnp.float32) + n2).astype(x.dtype)
    stats = jnp.concatenate(
        [m1[:, 0, :, :], r1[:, 0, :, :], m2[:, 0, :, :], r2[:, 0, :, :]],
        axis=1,
    ).astype(jnp.float32)  # (B, 4, C)
    return out, h1, h2, stats


# --------------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------------- #
def _row_chunks(n: int, rc: int):
    """(start, size) pairs covering [0, n) in chunks of rc (last may be short)."""
    return [(r, min(rc, n - r)) for r in range(0, n, rc)]


def _make_fwd_kernel(h, w, c, padding_type, io_dtype, rc, relu_mid, eps):
    from jax.experimental import pallas as pl

    n = float(h * w)

    def _fill_pad(rows_fn, padded):
        for r, sz in _row_chunks(h, rc):
            padded[pl.ds(1 + r, sz), 1 : w + 1, :] = rows_fn(r, sz)
        if padding_type == "reflect":
            padded[0, 1 : w + 1, :] = padded[2, 1 : w + 1, :]
            padded[h + 1, 1 : w + 1, :] = padded[h - 1, 1 : w + 1, :]
            padded[:, 0, :] = padded[:, 2, :]
            padded[:, w + 1, :] = padded[:, w - 1, :]
        else:
            zrow = jnp.zeros((w + 2, c), io_dtype)
            padded[0, :, :] = zrow
            padded[h + 1, :, :] = zrow
            zcol = jnp.zeros((h + 2, c), io_dtype)
            padded[:, 0, :] = zcol
            padded[:, w + 1, :] = zcol

    def _conv(padded, w_ref, tap0, store):
        """9-tap conv; store(r, y_f32) per chunk; returns spatial sum (1, C)
        of the ROUNDED (io_dtype) outputs — matches downstream moments on the
        stored values."""
        acc = None
        for r, sz in _row_chunks(h, rc):
            s = None
            for dy in range(3):
                for dx in range(3):
                    a = padded[pl.ds(dy + r, sz), pl.ds(dx, w), :]
                    d = jax.lax.dot_general(
                        a, w_ref[tap0 + dy * 3 + dx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s = d if s is None else s + d
            y = s.astype(io_dtype)
            store(r, sz, y)
            ps = jnp.sum(y.astype(jnp.float32), axis=(0, 1))[None, :]
            acc = ps if acc is None else acc + ps
        return acc

    def _centered_var(read, mean):
        acc = None
        for r, sz in _row_chunks(h, rc):
            d = read(r, sz).astype(jnp.float32) - mean[0][None, None, :]
            ps = jnp.sum(d * d, axis=(0, 1))[None, :]
            acc = ps if acc is None else acc + ps
        return acc / n

    def kernel(x_ref, w_ref, gamma_ref, beta_ref,
               o_ref, h1_ref, h2_ref, stats_ref, padded):
        gam = gamma_ref[0].astype(jnp.float32)[0]  # (C,)
        bet = beta_ref[0].astype(jnp.float32)[0]
        s = 1.0 + gam

        # conv1 from padded x
        _fill_pad(lambda r, sz: x_ref[0, pl.ds(r, sz), :, :].astype(io_dtype),
                  padded)
        sum1 = _conv(
            padded, w_ref, 0,
            lambda r, sz, y: h1_ref.__setitem__(
                (0, pl.ds(r, sz), slice(None), slice(None)), y
            ),
        )
        mean1 = sum1 / n
        var1 = _centered_var(
            lambda r, sz: h1_ref[0, pl.ds(r, sz), :, :], mean1
        )
        rstd1 = jax.lax.rsqrt(var1 + eps)

        # norm1 + relu -> padded, conv2
        a1s = (s[None, :] * rstd1)[0]
        b1s = bet - mean1[0] * a1s

        def a1_rows(r, sz):
            hh = h1_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            v = hh * a1s[None, None, :] + b1s[None, None, :]
            if relu_mid:
                v = jnp.maximum(v, 0.0)
            return v.astype(io_dtype)

        _fill_pad(a1_rows, padded)
        sum2 = _conv(
            padded, w_ref, 9,
            lambda r, sz, y: h2_ref.__setitem__(
                (0, pl.ds(r, sz), slice(None), slice(None)), y
            ),
        )
        mean2 = sum2 / n
        var2 = _centered_var(
            lambda r, sz: h2_ref[0, pl.ds(r, sz), :, :], mean2
        )
        rstd2 = jax.lax.rsqrt(var2 + eps)

        # epilogue: out = x + (1+gamma) * (h2 - mean2) * rstd2 + beta
        a2s = (s[None, :] * rstd2)[0]
        b2s = bet - mean2[0] * a2s
        for r, sz in _row_chunks(h, rc):
            y2 = h2_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            res = x_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            o_ref[0, pl.ds(r, sz), :, :] = (
                res + y2 * a2s[None, None, :] + b2s[None, None, :]
            ).astype(io_dtype)

        stats_ref[0, 0:1, :] = mean1
        stats_ref[0, 1:2, :] = rstd1
        stats_ref[0, 2:3, :] = mean2
        stats_ref[0, 3:4, :] = rstd2

    return kernel


def pallas_resblock_fwd(x, w_taps, gamma, beta, padding_type, relu_mid,
                        eps, interpret=False):
    """Forward mega-kernel. Returns (out, h1, h2, stats(B,4,C) f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    rc = next(r for r in (16, 8, 4, 2, 1) if h % r == 0)
    io_dtype = x.dtype
    kernel = _make_fwd_kernel(
        h, w, c, padding_type or "zero", io_dtype, rc, relu_mid, eps
    )
    blk = lambda: pl.BlockSpec(  # noqa: E731
        (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sty = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            blk(),
            pl.BlockSpec((18, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            sty(),
            sty(),
        ],
        out_specs=[
            blk(),
            blk(),
            blk(),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), io_dtype),
            jax.ShapeDtypeStruct((b, h, w, c), io_dtype),
            jax.ShapeDtypeStruct((b, h, w, c), io_dtype),
            jax.ShapeDtypeStruct((b, 4, c), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), io_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * w * 9 * c * c,
            bytes_accessed=5 * x.size * x.dtype.itemsize + w_taps.size * 2,
            transcendentals=2 * b * c,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        x,
        w_taps,
        gamma.astype(jnp.float32).reshape(b, 1, c),
        beta.astype(jnp.float32).reshape(b, 1, c),
    )


# --------------------------------------------------------------------------- #
# backward kernel
# --------------------------------------------------------------------------- #
def _make_bwd_kernel(h, w, c, padding_type, io_dtype, rc, relu_mid, eps):
    from jax.experimental import pallas as pl

    n = float(h * w)
    reflect = padding_type == "reflect"

    def _fill_pad1(rows_fn, padded):
        """pad-by-1 fill (same border semantics as the forward)."""
        for r, sz in _row_chunks(h, rc):
            padded[pl.ds(1 + r, sz), 1 : w + 1, :] = rows_fn(r, sz)
        if reflect:
            padded[0, 1 : w + 1, :] = padded[2, 1 : w + 1, :]
            padded[h + 1, 1 : w + 1, :] = padded[h - 1, 1 : w + 1, :]
            padded[:, 0, :] = padded[:, 2, :]
            padded[:, w + 1, :] = padded[:, w - 1, :]
        else:
            zrow = jnp.zeros((w + 2, c), io_dtype)
            padded[0, :, :] = zrow
            padded[h + 1, :, :] = zrow
            zcol = jnp.zeros((h + 2, c), io_dtype)
            padded[:, 0, :] = zcol
            padded[:, w + 1, :] = zcol

    def _tap_grads(pad_a, buf_d, dw_ref):
        """dW[dy,dx] += sum_chunks a_window^T @ d  (f32 accumulation)."""
        for dy in range(3):
            for dx in range(3):
                acc = None
                for r, sz in _row_chunks(h, rc):
                    a = pad_a[pl.ds(dy + r, sz), pl.ds(dx, w), :]
                    d = buf_d[pl.ds(r, sz), :, :]
                    a2 = a.reshape(sz * w, c)
                    d2 = d.reshape(sz * w, c)
                    t = jax.lax.dot_general(
                        a2, d2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = t if acc is None else acc + t
                ti = dy * 3 + dx
                dw_ref[ti, :, :] = dw_ref[ti, :, :] + acc

    def _fullcorr(pad_g, wf_ref, buf_p):
        """buf_p[p,q,:] = sum_taps pad_g[p+ty, q+tx] @ wf[ty*3+tx]
        over output rows p in [0, h+2), cols q in [0, w+2)."""
        for p, sz in _row_chunks(h + 2, rc):
            s = None
            for ty in range(3):
                for tx in range(3):
                    a = pad_g[pl.ds(p + ty, sz), pl.ds(tx, w + 2), :]
                    d = jax.lax.dot_general(
                        a, wf_ref[ty * 3 + tx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s = d if s is None else s + d
            buf_p[pl.ds(p, sz), :, :] = s.astype(io_dtype)

    def _pad_adjoint_fold(buf_p):
        """In-place adjoint of the pad fill (reflect folds; zero is a no-op
        beyond dropping borders, which the reader does)."""
        if not reflect:
            return
        # adjoint of the column fill (which ran last in the forward)
        buf_p[:, 2, :] = buf_p[:, 2, :] + buf_p[:, 0, :]
        buf_p[:, w - 1, :] = buf_p[:, w - 1, :] + buf_p[:, w + 1, :]
        # adjoint of the row fill (interior cols only)
        buf_p[2, 1 : w + 1, :] = buf_p[2, 1 : w + 1, :] + buf_p[0, 1 : w + 1, :]
        buf_p[h - 1, 1 : w + 1, :] = (
            buf_p[h - 1, 1 : w + 1, :] + buf_p[h + 1, 1 : w + 1, :]
        )

    def kernel(x_ref, h1_ref, h2_ref, g_ref, stats_ref, gamma_ref, beta_ref,
               w1f_ref, w2f_ref,
               dx_ref, dw1_ref, dw2_ref, dgb_ref,
               pad_a, pad_g, buf_d, buf_p):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)

        mean1 = stats_ref[0, 0:1, :][0]
        rstd1 = stats_ref[0, 1:2, :][0]
        mean2 = stats_ref[0, 2:3, :][0]
        rstd2 = stats_ref[0, 3:4, :][0]
        gam = gamma_ref[0].astype(jnp.float32)[0]  # (C,)
        bet = beta_ref[0].astype(jnp.float32)[0]
        s = 1.0 + gam

        def yhat2(r, sz):
            h2r = h2_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            return (h2r - mean2[None, None, :]) * rstd2[None, None, :]

        # ---- norm2 backward, pass A: spatial sums
        sg = None
        sgy = None
        for r, sz in _row_chunks(h, rc):
            g32 = g_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            y2 = yhat2(r, sz)
            a = jnp.sum(g32, axis=(0, 1))[None, :]
            bb = jnp.sum(g32 * y2, axis=(0, 1))[None, :]
            sg = a if sg is None else sg + a
            sgy = bb if sgy is None else sgy + bb
        dgamma = sgy
        dbeta = sg
        gm = sg / n
        gym = sgy / n

        # ---- pass B: dh2 -> buf_d and zero-padded pad_g
        pad_g[...] = jnp.zeros((h + 4, w + 4, c), io_dtype)
        c2 = s * rstd2
        for r, sz in _row_chunks(h, rc):
            g32 = g_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            y2 = yhat2(r, sz)
            dh2 = c2[None, None, :] * (
                g32 - gm[0][None, None, :] - y2 * gym[0][None, None, :]
            )
            dh2b = dh2.astype(io_dtype)
            buf_d[pl.ds(r, sz), :, :] = dh2b
            pad_g[pl.ds(2 + r, sz), 2 : w + 2, :] = dh2b

        # ---- a1 (recomputed) padded -> pad_a; dW2 taps
        a1s = s * rstd1
        b1s = bet - mean1 * a1s

        def a1_rows(r, sz):
            h1r = h1_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            v = h1r * a1s[None, None, :] + b1s[None, None, :]
            if relu_mid:
                v = jnp.maximum(v, 0.0)
            return v.astype(io_dtype)

        _fill_pad1(a1_rows, pad_a)
        _tap_grads(pad_a, buf_d, dw2_ref)

        # ---- da1 = pad-adjoint(fullcorr(dh2, w2 flipped-T))
        _fullcorr(pad_g, w2f_ref, buf_p)
        _pad_adjoint_fold(buf_p)

        # ---- norm1 backward with relu mask; da1 rows read from buf_p core
        def dn1_rows(r, sz):
            d = buf_p[pl.ds(1 + r, sz), 1 : w + 1, :].astype(jnp.float32)
            if relu_mid:
                h1r = h1_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
                nv = h1r * a1s[None, None, :] + b1s[None, None, :]
                d = jnp.where(nv > 0.0, d, 0.0)
            return d

        def yhat1(r, sz):
            h1r = h1_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            return (h1r - mean1[None, None, :]) * rstd1[None, None, :]

        sd = None
        sdy = None
        for r, sz in _row_chunks(h, rc):
            d = dn1_rows(r, sz)
            y1 = yhat1(r, sz)
            a = jnp.sum(d, axis=(0, 1))[None, :]
            bb = jnp.sum(d * y1, axis=(0, 1))[None, :]
            sd = a if sd is None else sd + a
            sdy = bb if sdy is None else sdy + bb
        dgamma = dgamma + sdy
        dbeta = dbeta + sd
        dm = sd / n
        dym = sdy / n

        pad_g[...] = jnp.zeros((h + 4, w + 4, c), io_dtype)
        c1 = s * rstd1
        for r, sz in _row_chunks(h, rc):
            d = dn1_rows(r, sz)
            y1 = yhat1(r, sz)
            dh1 = c1[None, None, :] * (
                d - dm[0][None, None, :] - y1 * dym[0][None, None, :]
            )
            dh1b = dh1.astype(io_dtype)
            buf_d[pl.ds(r, sz), :, :] = dh1b
            pad_g[pl.ds(2 + r, sz), 2 : w + 2, :] = dh1b

        # ---- xp -> pad_a; dW1 taps
        _fill_pad1(
            lambda r, sz: x_ref[0, pl.ds(r, sz), :, :].astype(io_dtype), pad_a
        )
        _tap_grads(pad_a, buf_d, dw1_ref)

        # ---- dx = g + pad-adjoint(fullcorr(dh1, w1 flipped-T)) core
        _fullcorr(pad_g, w1f_ref, buf_p)
        _pad_adjoint_fold(buf_p)
        for r, sz in _row_chunks(h, rc):
            core = buf_p[pl.ds(1 + r, sz), 1 : w + 1, :].astype(jnp.float32)
            g32 = g_ref[0, pl.ds(r, sz), :, :].astype(jnp.float32)
            dx_ref[0, pl.ds(r, sz), :, :] = (g32 + core).astype(io_dtype)

        dgb_ref[0, 0:1, :] = dgamma
        dgb_ref[0, 1:2, :] = dbeta

    return kernel


def pallas_resblock_bwd(x, h1, h2, g, stats, gamma, beta, w1f, w2f,
                        padding_type, relu_mid, eps, interpret=False):
    """Backward mega-kernel. Returns (dx, dw1(9,C,C) f32, dw2, dgb(B,2,C))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    rc = next(r for r in (16, 8, 4, 2, 1) if h % r == 0)
    io_dtype = x.dtype
    kernel = _make_bwd_kernel(
        h, w, c, padding_type or "zero", io_dtype, rc, relu_mid, eps
    )
    blk = lambda: pl.BlockSpec(  # noqa: E731
        (1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sty = lambda: pl.BlockSpec(  # noqa: E731
        (1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    taps = lambda: pl.BlockSpec(  # noqa: E731
        (9, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            blk(), blk(), blk(), blk(),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            sty(), sty(),
            taps(), taps(),
        ],
        out_specs=[
            blk(),
            taps(),
            taps(),
            pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), io_dtype),
            jax.ShapeDtypeStruct((9, c, c), jnp.float32),
            jax.ShapeDtypeStruct((9, c, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), io_dtype),
            pltpu.VMEM((h + 4, w + 4, c), io_dtype),
            pltpu.VMEM((h, w, c), io_dtype),
            pltpu.VMEM((h + 2, w + 2, c), io_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * h * w * 9 * c * c,
            bytes_accessed=6 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x, h1, h2, g,
        stats,
        gamma.astype(jnp.float32).reshape(b, 1, c),
        beta.astype(jnp.float32).reshape(b, 1, c),
        w1f, w2f,
    )


# --------------------------------------------------------------------------- #
# custom_vjp wrapper
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=None)
def _fused_fn(padding_type: str, relu_mid: bool, eps: float, interpret: bool):
    def _taps(w1, w2, cd):
        c = w1.shape[2]
        return jnp.concatenate(
            [w1.astype(cd).reshape(9, c, c), w2.astype(cd).reshape(9, c, c)],
            axis=0,
        )

    def _flipT(wk, cd):
        c = wk.shape[2]
        return (
            jnp.flip(wk, (0, 1)).transpose(0, 1, 3, 2).astype(cd).reshape(9, c, c)
        )

    def _fwd_impl(x, w1, w2, gamma, beta):
        return pallas_resblock_fwd(
            x, _taps(w1, w2, x.dtype), gamma, beta,
            padding_type, relu_mid, eps, interpret=interpret,
        )

    @jax.custom_vjp
    def f(x, w1, w2, gamma, beta):
        out, _, _, _ = _fwd_impl(x, w1, w2, gamma, beta)
        return out

    def fwd(x, w1, w2, gamma, beta):
        out, h1, h2, stats = _fwd_impl(x, w1, w2, gamma, beta)
        return out, (x, w1, w2, gamma, beta, h1, h2, stats)

    def bwd(res, g):
        x, w1, w2, gamma, beta, h1, h2, stats = res
        cd = x.dtype
        dx, dw1, dw2, dgb = pallas_resblock_bwd(
            x, h1, h2, g.astype(cd), stats, gamma, beta,
            _flipT(w1, cd), _flipT(w2, cd),
            padding_type, relu_mid, eps, interpret=interpret,
        )
        c = w1.shape[2]
        dw1 = dw1.reshape(3, 3, c, c).astype(w1.dtype)
        dw2 = dw2.reshape(3, 3, c, c).astype(w2.dtype)
        dgamma = dgb[:, 0, :].astype(gamma.dtype)
        dbeta = dgb[:, 1, :].astype(beta.dtype)
        return dx, dw1, dw2, dgamma, dbeta

    f.defvjp(fwd, bwd)
    return f


def fused_resblock(x, w1, w2, gamma, beta, padding_type="reflect",
                   relu_mid=True, eps=1e-5, interpret=None):
    """Whole-resblock fused training op (forward + analytic backward, one
    Pallas launch per image each way).

    x: (B, H, W, C) compute-dtype; w1/w2: (3, 3, C, C) params; gamma/beta:
    (B, C) shared style affine (zeros for plain instance norm). Matches
    ``ref_resblock`` and its autodiff (pinned in tests/test_resblock_bf16.py).
    """
    if interpret is None:
        interpret = _interpret()
    if padding_type == "replicate":
        raise ValueError("fused_resblock supports reflect/zero padding only")
    f = _fused_fn(padding_type or "zero", bool(relu_mid), float(eps),
                  bool(interpret))
    return f(x, w1, w2, gamma, beta)
