"""Tests for the fused GAN step (--gan_step fused).

The fused step (translation.py _main_step_fused_impl) shares the G phase-1
forward with the D updates through a saved vjp instead of the reference's
separate _make_d_fakes pass. These tests pin:

1. the vjp split is EXACTLY the chain rule: grad(_g1_loss) equals the
   composition of grad-through-adv-term and the saved forward vjp when no D
   update happens in between;
2. a full fused step runs, returns the same log keys as the reference step,
   and updates every net's parameters;
3. the split loss helpers recompose to the original totals.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.arguments import default_train_args
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.models.translation import GEN_NETS


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


def test_vjp_split_matches_direct_grad():
    """With no D update between forward and adv, the fused-step gradient
    composition must equal jax.grad of the monolithic _g1_loss."""
    args = tiny_args()
    model = AdaINModel(args)
    state = model.initialize()
    params = dict(state.params)
    batch = make_batch(args, jax.random.PRNGKey(0))
    img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
    c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
    b = args.batch_size
    gp = {k: params[k] for k in GEN_NETS}

    def direct(gparams):
        p = {**params, **gparams}
        total, _ = model._g1_loss(p, {}, img, c_org, b, None, {}, train=False)
        return total

    g_direct = jax.grad(direct)(gp)

    def fwd(gparams):
        p = {**params, **gparams}
        return model._g1_forward(p, {}, img, c_org, b, None, {}, train=False)

    (aux_total, img_fake, z_pack, g_logs), vjp = jax.vjp(fwd, gp)

    def adv(fake):
        a, c = model._g_adv_loss(params, {}, img, fake, c_org, "discriminator1")
        return a + c

    fake_cot = jax.grad(adv)(img_fake)
    cot = (
        jnp.ones_like(aux_total),
        fake_cot,
        jax.tree.map(jnp.zeros_like, z_pack),
        jax.tree.map(jnp.zeros_like, g_logs),
    )
    (g_split,) = vjp(cot)

    flat_a = jax.tree_util.tree_leaves(g_direct)
    flat_b = jax.tree_util.tree_leaves(g_split)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6)


def test_loss_split_recomposes():
    """_g1_forward + adv == _g1_loss and _g2_forward + adv == _g2_loss."""
    args = tiny_args()
    model = AdaINModel(args)
    state = model.initialize()
    params = dict(state.params)
    batch = make_batch(args, jax.random.PRNGKey(1))
    img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
    c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
    b = args.batch_size

    aux, img_fake, _, _ = model._g1_forward(params, {}, img, c_org, b, None, {}, train=False)
    adv, cls = model._g_adv_loss(params, {}, img, img_fake, c_org, "discriminator1")
    total, logs = model._g1_loss(params, {}, img, c_org, b, None, {}, train=False)
    np.testing.assert_allclose(float(aux + adv + cls), float(total), rtol=1e-6)
    assert float(logs["total_g"]) == pytest.approx(float(total))

    z = model.get_z_random(jax.random.PRNGKey(2), b)
    aux2, img_random, _ = model._g2_forward(params, {}, img, c_org, b, z, None, {}, train=False)
    adv2, cls2 = model._g2_adv(params, {}, img, img_random, c_org)
    total2, _ = model._g2_loss(params, {}, img, c_org, b, z, None, {}, train=False)
    np.testing.assert_allclose(float(aux2 + adv2 + cls2), float(total2), rtol=1e-6)


@pytest.mark.parametrize("model_kwargs", [{}, {"dis_sn": True}])
def test_fused_step_runs_and_updates(model_kwargs):
    args = tiny_args(gan_step="fused", **model_kwargs)
    model = AdaINModel(args)
    state = model.initialize()
    ref_args = tiny_args(**model_kwargs)
    ref_model = AdaINModel(ref_args)
    ref_state = ref_model.initialize()

    batch = make_batch(args, jax.random.PRNGKey(3))
    rng = jax.random.PRNGKey(4)
    # snapshot before the call: the step donates its input state
    before = {net: jax.tree.map(np.asarray, dict(state.params[net]))
              for net in ("discriminator1", "discriminator2", *GEN_NETS)}
    step0 = int(state.step)
    new_state, logs = model._main_step(state, batch, rng, {})
    _, ref_logs = ref_model._main_step(ref_state, batch, rng, {})

    # same observable log surface as the reference step
    assert set(logs.keys()) == set(ref_logs.keys())
    for k, v in logs.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k
    # every net actually moved
    for net, prev in before.items():
        after = jax.tree_util.tree_leaves(new_state.params[net])
        moved = any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree_util.tree_leaves(prev), after)
        )
        assert moved, f"{net} did not update"
    assert int(new_state.step) == step0 + 1
