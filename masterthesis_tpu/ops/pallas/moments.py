"""Pallas TPU kernel: one-pass spatial moment sums for instance/layer norm.

Why this exists: profiling the flagship forward (256px AdaINModel, batch 256)
showed **67% of device time in XLA's ``convert_reduce_fusion`` ops** — the
instance-norm mean/variance reductions. XLA's reduce codegen on these
(B,H,W,C)->(B,C) reductions reaches only ~100-180 GB/s effective on v5e
(~820 GB/s HBM), i.e. the whole model was bottlenecked on norm statistics,
not convolutions. The normalization *apply* is free (XLA fuses it into the
neighbouring convs); only the statistics pass needs a kernel.

This kernel reads the feature map ONCE, tile by tile, and accumulates
``sum(x)`` and ``sum(x^2)`` per (sample, channel) in float32 VMEM
accumulators — a single bandwidth-bound pass. mean/variance/rsqrt are then
assembled in jnp on the tiny (B, C) result, and the elementwise normalize
fuses downstream as before.

Variance uses the one-pass form E[x^2] - mean^2, clamped at >= 0. Sums
accumulate in f32 over <=64k elements (relative error ~1e-5, inside the
reference-parity tolerance); the clamp plus the norm eps keep the
near-constant-input corner finite.

Used by ``ops.norms._moments`` on TPU; plain jnp elsewhere. The reference
counterpart is torch ``InstanceNorm2d`` statistics (reference
src/models/core/norm.py:23-33, functions.py:11-26).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _make_sums_kernel(tb: int):
    from jax.experimental import pallas as pl

    def kernel(x_ref, sum_ref, sq_ref, acc_s, acc_q):
        """Accumulate per-(sample, channel) sums over the S grid axis.

        x_ref: (TB, TS, C) block of the (B, S, C) input. acc_s/acc_q are
        persistent (B, C) f32 VMEM scratch accumulators (tiny: B*C*4 bytes);
        the out refs are written once at the very last grid step, which keeps
        the DMA pipeline free of out-block flushes.
        """
        i, j = pl.program_id(0), pl.program_id(1)
        nb, ns = pl.num_programs(0), pl.num_programs(1)
        x = x_ref[...]
        # squares in input precision, accumulation in f32: avoids a full f32
        # block temp in VMEM; bf16 squaring adds ~1e-4 relative var error
        # (round-to-nearest over >=1k samples), inside parity tolerance.
        part_sum = jnp.sum(x, axis=1, dtype=jnp.float32)
        part_sq = jnp.sum(x * x, axis=1, dtype=jnp.float32)
        row = i * tb

        @pl.when(j == 0)
        def _():
            acc_s[pl.ds(row, tb), :] = part_sum
            acc_q[pl.ds(row, tb), :] = part_sq

        @pl.when(j != 0)
        def _():
            acc_s[pl.ds(row, tb), :] += part_sum
            acc_q[pl.ds(row, tb), :] += part_sq

        @pl.when((i == nb - 1) & (j == ns - 1))
        def _():
            sum_ref[...] = acc_s[...]
            sq_ref[...] = acc_q[...]

    return kernel


def _pick(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def spatial_sums(x3: jnp.ndarray, interpret: bool = False):
    """(B, S, C) -> (sum, sumsq), both f32 (B, C), in one HBM pass.

    Returns None if the shape does not tile cleanly (caller falls back to jnp).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, c = x3.shape
    tb = _pick(b, (8, 4, 2, 1))
    # keep in-block + its bf16 square temp + double buffering well under VMEM
    budget = 1024 * 1024 // max(1, tb * c * x3.dtype.itemsize)
    ts = _pick(s, [t for t in (512, 256, 128, 64, 32, 16, 8) if t <= max(budget, 8)])
    if ts == 0:
        return None
    grid = (b // tb, s // ts)
    out_shape = jax.ShapeDtypeStruct((b, c), jnp.float32)
    return pl.pallas_call(
        _make_sums_kernel(tb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ts, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * c,
            bytes_accessed=x3.size * x3.dtype.itemsize + 2 * b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x3)


def _make_sums_kernel_sbc():
    from jax.experimental import pallas as pl

    def kernel(x_ref, sum_ref, sq_ref, acc_s, acc_q):
        """(TS, B, C) blocks of an (S, B, C) input; accumulate (B, C) sums.

        This layout exists because XLA assigns conv outputs the
        {3,0,2,1} layout (C on lanes, B on sublanes, spatial major) —
        logically transposing NHWC to (H*W, B, C) makes that physical layout
        the default one, so the kernel consumes the conv output with NO
        layout-conversion copy, and the reduction over the major axis is
        pure full-tile adds.
        """
        j, ns = pl.program_id(0), pl.num_programs(0)
        x = x_ref[...]
        part_sum = jnp.sum(x, axis=0, dtype=jnp.float32)
        part_sq = jnp.sum(x * x, axis=0, dtype=jnp.float32)

        @pl.when(j == 0)
        def _():
            acc_s[...] = part_sum
            acc_q[...] = part_sq

        @pl.when(j != 0)
        def _():
            acc_s[...] += part_sum
            acc_q[...] += part_sq

        @pl.when(j == ns - 1)
        def _():
            sum_ref[...] = acc_s[...]
            sq_ref[...] = acc_q[...]

    return kernel


def spatial_sums_sbc(x_sbc: jnp.ndarray, interpret: bool = False):
    """(S, B, C) -> (sum, sumsq) f32 (B, C) — conv-layout-native variant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s, b, c = x_sbc.shape
    budget = 1024 * 1024 // max(1, b * c * x_sbc.dtype.itemsize)
    ts = _pick(s, [t for t in (128, 64, 32, 16, 8, 4, 2) if t <= max(budget, 2)])
    if ts == 0:
        return None
    out_shape = jax.ShapeDtypeStruct((b, c), jnp.float32)
    return pl.pallas_call(
        _make_sums_kernel_sbc(),
        grid=(s // ts,),
        in_specs=[
            pl.BlockSpec((ts, b, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * c,
            bytes_accessed=x_sbc.size * x_sbc.dtype.itemsize + 2 * b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_sbc)


def moments_eligible(x: jnp.ndarray, axes) -> bool:
    """Pallas path: 4-D NHWC spatial (1,2) or full (1,2,3) reduction on TPU."""
    if x.ndim != 4 or tuple(axes) not in ((1, 2), (1, 2, 3)):
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    b, h, w, c = x.shape
    # tiny maps are not worth a kernel launch; odd channel counts under-use
    # lanes; the (B, C) f32 scratch accumulators must stay far under VMEM
    return (
        h * w >= 1024
        and c % 8 == 0
        and _pick(b, (8, 4, 2, 1)) > 0
        and b * c * 4 * 2 <= 2 * 1024 * 1024
    )


def pallas_moments(x: jnp.ndarray, axes, interpret: bool = False, layout: str = "sbc"):
    """mean/var over ``axes`` with keepdims=True via the one-pass kernel.

    axes (1, 2): per-(sample, channel) — instance norm.
    axes (1, 2, 3): per-sample — the reference's custom layer norm.
    ``layout='sbc'`` (default) feeds the kernel an (H*W, B, C) logical view,
    which matches XLA's conv-output physical layout bit-for-bit (transpose
    becomes free); 'bsc' keeps the NHWC-native view.
    """
    b, h, w, c = x.shape
    if layout == "sbc":
        sums = spatial_sums_sbc(
            x.transpose(1, 2, 0, 3).reshape(h * w, b, c), interpret=interpret
        )
    else:
        sums = spatial_sums(x.reshape(b, h * w, c), interpret=interpret)
    if sums is None:
        return None
    s1, s2 = sums
    if tuple(axes) == (1, 2, 3):
        s1 = jnp.sum(s1, axis=1, keepdims=True)  # (B, 1)
        s2 = jnp.sum(s2, axis=1, keepdims=True)
        n = h * w * c
        mean = (s1 / n).reshape(b, 1, 1, 1)
        var = (s2 / n).reshape(b, 1, 1, 1) - jnp.square(mean)
    else:
        n = h * w
        mean = (s1 / n).reshape(b, 1, 1, c)
        var = (s2 / n).reshape(b, 1, 1, c) - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def _jnp_moments(x: jnp.ndarray, axes):
    # centered two-pass variance (cancellation-safe); XLA fuses both passes
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def moments(x: jnp.ndarray, axes):
    """mean/var of ``x`` over ``axes`` (keepdims) — Pallas one-pass on TPU."""
    if moments_eligible(x, axes):
        out = pallas_moments(x, axes)
        if out is not None:
            return out
    return _jnp_moments(x, axes)


def _moments_fwd(x, axes):
    mean, var = moments(x, axes)
    return (mean, var), (x, mean)


def _moments_bwd(axes, residuals, grads):
    # d mean / dx = 1/N ; d var / dx = 2 (x - mean) / N  (the indirect path
    # through mean cancels). Elementwise — XLA fuses it into the surrounding
    # backward convs, so no kernel is needed here.
    x, mean = residuals
    d_mean, d_var = grads
    n = 1
    for a in axes:
        n *= x.shape[a]
    dx = (d_mean + 2.0 * (x.astype(jnp.float32) - mean) * d_var) / n
    return (dx.astype(x.dtype),)


moments.defvjp(_moments_fwd, _moments_bwd)
