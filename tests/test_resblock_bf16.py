"""Tests for the differentiable resblock mega-kernels (ops/pallas/resblock_bf16).

The fused op must match the composed float path — forward values AND the full
gradient set (dx, dw1, dw2, dgamma, dbeta) against ``jax.grad`` of the pure
jnp reference — since the training path routes real resblocks through it on
TPU. All tests run the kernels in interpret mode on CPU at float32, where the
comparison is tight.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.ops.pallas.resblock_bf16 import (
    fused_resblock,
    ref_resblock,
    ref_resblock_aux,
    resblock_train_eligible,
    pallas_resblock_fwd,
    set_fused_resblock,
    fused_resblock_wanted,
)


def _inputs(seed=0, b=2, h=8, w=8, c=128, style=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    w1 = jax.random.normal(ks[1], (3, 3, c, c)) * 0.05
    w2 = jax.random.normal(ks[2], (3, 3, c, c)) * 0.05
    if style:
        gamma = jax.random.normal(ks[3], (b, c)) * 0.3
        beta = jax.random.normal(ks[4], (b, c)) * 0.3
    else:
        gamma = jnp.zeros((b, c))
        beta = jnp.zeros((b, c))
    return x, w1, w2, gamma, beta


@pytest.mark.parametrize("padding_type,relu_mid,style", [
    ("reflect", True, True),
    ("reflect", False, False),
    ("zero", True, False),
])
def test_fwd_matches_reference(padding_type, relu_mid, style):
    x, w1, w2, gamma, beta = _inputs(style=style)
    got = fused_resblock(
        x, w1, w2, gamma, beta, padding_type=padding_type,
        relu_mid=relu_mid, interpret=True,
    )
    want = ref_resblock(
        x, w1, w2, gamma, beta, padding_type=padding_type, relu_mid=relu_mid
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_fwd_aux_outputs_match_reference():
    x, w1, w2, gamma, beta = _inputs(seed=1)
    c = x.shape[-1]
    taps = jnp.concatenate(
        [w1.astype(x.dtype).reshape(9, c, c), w2.astype(x.dtype).reshape(9, c, c)]
    )
    out, h1, h2, stats = pallas_resblock_fwd(
        x, taps, gamma, beta, "reflect", True, 1e-5, interpret=True
    )
    rout, rh1, rh2, rstats = ref_resblock_aux(x, w1, w2, gamma, beta)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(rh1), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(rh2), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(rstats), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rout), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("padding_type,relu_mid,style", [
    ("reflect", True, True),
    ("reflect", True, False),
    ("reflect", False, True),
    ("zero", True, True),
])
def test_grads_match_autodiff_of_reference(padding_type, relu_mid, style):
    x, w1, w2, gamma, beta = _inputs(seed=2, style=style)
    g = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss_fused(x, w1, w2, gamma, beta):
        y = fused_resblock(
            x, w1, w2, gamma, beta, padding_type=padding_type,
            relu_mid=relu_mid, interpret=True,
        )
        return jnp.sum(y * g)

    def loss_ref(x, w1, w2, gamma, beta):
        y = ref_resblock(
            x, w1, w2, gamma, beta, padding_type=padding_type,
            relu_mid=relu_mid,
        )
        return jnp.sum(y * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, w2, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, w2, gamma, beta)
    names = ["dx", "dw1", "dw2", "dgamma", "dbeta"]
    for name, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4 * scale,
                                   err_msg=name)


def test_batch_weight_grad_accumulates_across_images():
    """dW must be the SUM over the batch (the grid accumulates in the out
    block across sequential programs)."""
    x, w1, w2, gamma, beta = _inputs(seed=3, b=3)
    g = jax.random.normal(jax.random.PRNGKey(10), x.shape, jnp.float32)

    def loss(w1):
        y = fused_resblock(x, w1, w2, gamma, beta, interpret=True)
        return jnp.sum(y * g)

    dw_full = jax.grad(loss)(w1)
    # per-image sum of single-image calls
    acc = np.zeros_like(np.asarray(w1))
    for i in range(x.shape[0]):
        def loss_i(w1, i=i):
            y = fused_resblock(
                x[i : i + 1], w1, w2, gamma[i : i + 1], beta[i : i + 1],
                interpret=True,
            )
            return jnp.sum(y * g[i : i + 1])

        acc += np.asarray(jax.grad(loss_i)(w1))
    np.testing.assert_allclose(np.asarray(dw_full), acc, rtol=2e-3, atol=1e-4)


def test_eligibility_and_mode():
    assert resblock_train_eligible(jnp.zeros((1, 64, 64, 256), jnp.bfloat16))
    assert not resblock_train_eligible(jnp.zeros((1, 64, 64, 268), jnp.bfloat16))
    assert not resblock_train_eligible(jnp.zeros((1, 4, 4, 128), jnp.bfloat16))
    set_fused_resblock("off")
    assert not fused_resblock_wanted()
    set_fused_resblock("interpret")
    assert fused_resblock_wanted()
    set_fused_resblock("auto")  # restore

    with pytest.raises(ValueError):
        set_fused_resblock("bogus")
    with pytest.raises(ValueError):
        x, w1, w2, gamma, beta = _inputs()
        fused_resblock(x, w1, w2, gamma, beta, padding_type="replicate",
                       interpret=True)


def test_main_step_routes_and_matches_composed():
    """Integration: --fused_resblock routes eligible training resblocks in
    the REAL jitted main step through the mega-kernel (counted via a probe
    wrapper), and the step's losses match the composed path at bf16
    tolerance. crop 32 / dim 32 puts every resblock at (B, 8, 8, 128) —
    exactly the eligibility floor."""
    import masterthesis_tpu.ops.pallas.resblock_bf16 as rb
    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel

    def args(fused):
        return default_train_args(
            crop_size=32, dim=32, latent_dim=4, num_domains=3, batch_size=2,
            compute_dtype="bfloat16", use_dis_content=False, logdir=None,
            mode="train", gan_step="fused", fused_resblock=fused,
        )

    rng0 = jax.random.PRNGKey(11)
    b = 2
    mk = lambda k: jax.random.uniform(  # noqa: E731
        jax.random.fold_in(rng0, k), (b, 32, 32, 3), jnp.float32, -1.0, 1.0
    )
    y = jax.nn.one_hot(jnp.arange(b) % 3, 3)
    batch = {"x1": mk(0), "x2": mk(1), "y1": y, "y2": y[::-1]}
    step_rng = jax.random.PRNGKey(5)

    calls = {"n": 0}
    real = rb.fused_resblock

    def probe(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    set_fused_resblock("interpret")
    rb.fused_resblock = probe
    try:
        model_on = AdaINModel(args("auto"))
        state_on = model_on.initialize(jax.random.PRNGKey(3))
        state_on, logs_on = model_on._main_step(state_on, batch, step_rng, {})
        n_traced = calls["n"]
    finally:
        rb.fused_resblock = real
        set_fused_resblock("auto")

    assert n_traced > 0, "fused kernel never engaged in the main step trace"

    model_off = AdaINModel(args("off"))
    state_off = model_off.initialize(jax.random.PRNGKey(3))
    state_off, logs_off = model_off._main_step(state_off, batch, step_rng, {})

    assert set(logs_on) == set(logs_off)
    for k in ("total_g", "d_adv", "l1_self_rec", "l1_cc_rec"):
        a = float(jnp.asarray(logs_on[k], jnp.float32))
        o = float(jnp.asarray(logs_off[k], jnp.float32))
        assert abs(a - o) <= 0.03 * max(abs(o), 1.0), (k, a, o)
