"""Lockstep training-dynamics probe: reference torch vs this framework.

The loss-value parity suite (tests/test_parity_reference.py) freezes weights
and never runs torch backward — gradient/update parity was unproven. This
probe ports one initial weight set into both frameworks, disables every
stochastic draw except an injected z sequence shared by both sides, then runs
N REAL optimizer iterations in lockstep and reports, per iteration:

  - each side's loss values,
  - per-net max|param delta| between the two frameworks.

Divergence localizes the first bad gradient to a (net, iteration).

Run: python scripts/dynamics_probe.py [--iters 6] [--model BaseModel --concat]
"""
from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = "/root/reference/src"

B, H, IMG_C, DIM, LAT, DOM = 2, 64, 3, 16, 8, 4


def install_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.models", "torchvision.models.vgg"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.models"].vgg = sys.modules["torchvision.models.vgg"]
    import torch

    orig = torch.Tensor.get_device
    torch.Tensor.get_device = (
        lambda self: "cpu" if isinstance(orig(self), int) and orig(self) < 0 else orig(self)
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--model", choices=["AdaINModel", "BaseModel"],
                    default="AdaINModel")
    ap.add_argument("--concat", action="store_true")
    cli = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    install_reference()
    import torch

    import models as ref_models
    from models.core import networks as ref_nets

    from types import SimpleNamespace

    args = SimpleNamespace(
        latent_dim=LAT, input_dim=IMG_C, dim=DIM, num_domains=DOM,
        enc_norm="instance", up_type="transpose", dec_norm="layer",
        use_dropout=False, mode="train", ms_dis=False, dis_norm=None,
        dis_sn=False, crop_size=H, use_dis_content=False, lr=cli.lr, beta1=0.5,
        beta2=0.999, wd=1e-4, gan_mode="vanilla", use_ragan=False,
        vgg_loss=None, logdir="/tmp/probe_logs", batch_size=B,
        lambda_cls=1.0, lambda_cls_G=5.0, lambda_rec=10.0,
        reparam=True, concat=cli.concat, num_scales=3, d_iter=3,
        resume=None, resume_opt=None, init_type="normal", init_gain=0.02,
        gpu_ids=[], last_iter=-1, lr_policy="lambda",
        n_iters=10_000, n_iter_decay=10_000, checkpoint_dir="/tmp/probe_ckpt",
    )
    torch.manual_seed(42)
    ref = getattr(ref_models, cli.model)(args)
    ref.initialize()

    # determinism: identity noise, mu-only reparam, injected z sequence
    r = np.random.default_rng(7)
    z_seq = [r.normal(size=(B, LAT)).astype(np.float32) for _ in range(4 * cli.iters)]
    z_iter = iter(z_seq)
    from models.core import misc as ref_misc

    ref_misc.GaussianNoiseLayer.forward = lambda self, x: x
    ref_nets.GaussianNoiseLayer.forward = lambda self, x: x
    ref_nets.ReparameterizedStyleEncoder.reparameterize = (
        lambda self, mu, logvar: mu
    )
    draws_t = []

    def ref_z(bs, dim):
        z = next(z_iter)
        draws_t.append(z)
        return torch.from_numpy(z)

    ref.get_z_random = ref_z

    # ---- our side: same weights ---------------------------------------- #
    import jax.numpy as jnp

    import masterthesis_tpu.models as my_models
    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models.functions import apply_updates
    from masterthesis_tpu.models.translation import GEN_NETS
    from masterthesis_tpu.tools.port_reference import import_net_params

    targs = default_train_args(
        dim=DIM, latent_dim=LAT, num_domains=DOM, crop_size=H, batch_size=B,
        mode="train", gan_mode="vanilla", reparam=True, concat=cli.concat,
        use_dis_content=False, lambda_cls=1.0, lambda_cls_G=5.0,
        lambda_rec=10.0, compute_dtype="float32", logdir=None,
    )
    mine = getattr(my_models, cli.model)(targs)
    state = mine.initialize()
    params = {
        name: import_net_params(mine.nets[name], ref.model[name].state_dict())
        for name in mine.nets
    }
    opt_state = {name: mine.tx[name].init(params[name]) for name in params}
    lr = jnp.float32(cli.lr)

    # fixed batch (reused every iteration — isolates update math from data)
    x1 = r.uniform(-1, 1, (B, IMG_C, H, H)).astype(np.float32)
    x2 = r.uniform(-1, 1, (B, IMG_C, H, H)).astype(np.float32)
    y1 = np.eye(DOM, dtype=np.float32)[[0, 1]]
    y2 = np.eye(DOM, dtype=np.float32)[[2, 3]]
    img = jnp.asarray(np.concatenate([x1, x2]).transpose(0, 2, 3, 1))
    c_org = jnp.asarray(np.concatenate([y1, y2]))
    ref.set_inputs({
        "x1": torch.from_numpy(x1), "x2": torch.from_numpy(x2),
        "y1": torch.from_numpy(y1), "y2": torch.from_numpy(y2),
    })

    def compare_params():
        """max |delta| per net between frameworks (in ported space)."""
        out = {}
        for name in params:
            ported = import_net_params(mine.nets[name], ref.model[name].state_dict())
            deltas = jax.tree.map(
                lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))),
                params[name], ported,
            )
            leaves = jax.tree_util.tree_leaves(deltas)
            out[name] = max(leaves) if leaves else 0.0
        return out

    import jax as _jax

    for it in range(1, cli.iters + 1):
        # ---------------- reference iteration ---------------- #
        ref.optimize_parameters(it)
        ref_losses = {k: float(v) for k, v in ref.loss.items()
                      if k in ("d_adv", "g_adv", "g_cls", "l1_cc_rec",
                               "l1_self_rec", "gan2", "l1_recon_z", "total_g")}
        z_d, z_g2 = draws_t[-2], draws_t[-1]

        # ---------------- our iteration (same draws) ---------------- #
        logs = {}
        z_dj = jnp.asarray(z_d)
        img_fake, img_random = mine._make_d_fakes(
            params, {}, img, c_org, B, z_dj, None, train=False
        )
        for d_name, fake in (("discriminator1", img_fake),
                             ("discriminator2", img_random)):
            (_, d_logs), grads = _jax.value_and_grad(
                mine._d_loss, argnums=1, has_aux=True
            )(d_name, params[d_name], params, {}, img, fake, c_org)
            params[d_name], opt_state[d_name] = apply_updates(
                mine.tx[d_name], grads, opt_state[d_name], params[d_name], lr
            )
            logs.update(d_logs)

        def g1_loss(gp):
            p = {**params, **gp}
            return mine._g1_loss(p, {}, img, c_org, B, None, {}, train=False)

        gp = {k: params[k] for k in GEN_NETS}
        (_, g_logs), grads = _jax.value_and_grad(g1_loss, has_aux=True)(gp)
        for k in GEN_NETS:
            params[k], opt_state[k] = apply_updates(
                mine.tx[k], grads[k], opt_state[k], params[k], lr
            )
        logs.update(g_logs)

        z_g2j = jnp.asarray(z_g2)

        def g2_loss(gp2):
            p = {**params, **gp2}
            return mine._g2_loss(p, {}, img, c_org, B, z_g2j, None, {}, train=False)

        gp2 = {k: params[k] for k in ("content_encoder", "decoder")}
        (_, g2_logs), grads2 = _jax.value_and_grad(g2_loss, has_aux=True)(gp2)
        for k in ("content_encoder", "decoder"):
            params[k], opt_state[k] = apply_updates(
                mine.tx[k], grads2[k], opt_state[k], params[k], lr
            )
        logs.update(g2_logs)

        my_losses = {k: round(float(logs[k]), 5) for k in ref_losses if k in logs}
        drift = compare_params()
        print(f"== iter {it} ==")
        print("  ref :", {k: round(v, 5) for k, v in ref_losses.items()})
        print("  mine:", my_losses)
        print("  max|param drift|:", {k: f"{v:.2e}" for k, v in drift.items()})


if __name__ == "__main__":
    main()
