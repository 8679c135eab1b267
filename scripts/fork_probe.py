"""Round-5 fork probe: lockstep BaseModel run THROUGH the 500->750 window.

VERDICT r4 Missing #1: at the h2h scale every tpu BaseModel run degrades
further than every torch reference run after the shared iter-250 peak, with
complete rank separation at iters 750/1000 — systematic, not chaos. The r4
lockstep probe only covered 40 iterations with constant lr; the fork window
sits where the h2h config's linear lr decay begins (n_iter_decay = 500).

This probe runs BOTH frameworks for --iters (default 760) REAL optimizer
iterations from the same init, on the same real-image stream
(reference_headtohead.data_feed), with every stochastic draw shared
(identity noise, mu-only reparam, injected z sequence) and our side driven
by the reference's OWN per-iteration lr — so any systematic update-math
difference (Adam state evolution, D-side accumulation, decay handling)
shows up as monotone per-net drift growth and one-sided loss divergence,
while a loss-landscape fork shows up as exponential-but-symmetric drift.

Ref: /root/reference/src/models/base_model.py:168-205 (D update), :266-366
(G update), :461-470 (step order).

Run: python scripts/fork_probe.py --iters 760 --out benchmarks/fork_probe_r5.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dynamics_probe import install_reference  # noqa: E402
from reference_headtohead import CFG, data_feed, make_dataset  # noqa: E402

LOSS_KEYS = ("d_adv", "g_adv", "g_cls", "l1_cc_rec", "l1_self_rec",
             "gan2", "l1_recon_z", "total_g")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=760)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--model", default="BaseModel",
                    choices=["AdaINModel", "BaseModel"])
    ap.add_argument("--sched_iters", type=int, default=1000,
                    help="schedule horizon (decay from half of this)")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--data", type=str, default="/tmp/fork_probe_data")
    ap.add_argument("--out", type=str, default="benchmarks/fork_probe_r5.json")
    cli = ap.parse_args()

    B, H, DIM, LAT, DOM = 2, cli.size, cli.dim, 8, 4
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    install_reference()
    import torch

    torch.manual_seed(42)
    import models as ref_models
    from models.core import misc as ref_misc
    from models.core import networks as ref_nets

    args = types.SimpleNamespace(
        latent_dim=LAT, input_dim=3, dim=DIM, num_domains=DOM,
        enc_norm="instance", up_type="transpose", dec_norm="layer",
        use_dropout=False, mode="train", ms_dis=False, dis_norm=None,
        dis_sn=False, crop_size=H, use_dis_content=False, lr=1e-4, beta1=0.5,
        beta2=0.999, wd=1e-4, gan_mode="vanilla", use_ragan=False,
        vgg_loss=None, logdir="/tmp/fork_probe_logs", batch_size=B,
        lambda_cls=1.0, lambda_cls_G=5.0, lambda_rec=10.0,
        reparam=True, concat=True, num_scales=3, d_iter=3,
        resume=None, resume_opt=None, init_type="normal", init_gain=0.02,
        gpu_ids=[], last_iter=-1, lr_policy="lambda",
        # the h2h schedule: linear decay starting at sched_iters/2
        n_iters=cli.sched_iters, n_iter_decay=cli.sched_iters // 2,
        checkpoint_dir="/tmp/fork_probe_ckpt",
    )
    ref = getattr(ref_models, cli.model)(args)
    ref.initialize()

    # shared stochastic draws: identity noise, mu-only reparam, injected z
    r = np.random.default_rng(7)
    z_seq = [r.normal(size=(B, LAT)).astype(np.float32)
             for _ in range(4 * cli.iters)]
    z_iter = iter(z_seq)
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

    # ---- our side: ported init, jitted reference-order iteration -------- #
    import jax.numpy as jnp

    import masterthesis_tpu.models as my_models
    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models.functions import apply_updates
    from masterthesis_tpu.models.translation import GEN_NETS
    from masterthesis_tpu.tools.port_reference import import_net_params

    targs = default_train_args(
        dim=DIM, latent_dim=LAT, num_domains=DOM, crop_size=H, batch_size=B,
        mode="train", gan_mode="vanilla", reparam=True, concat=True,
        use_dis_content=False, lambda_cls=1.0, lambda_cls_G=5.0,
        lambda_rec=10.0, compute_dtype="float32", logdir=None,
        fused_resblock="off",  # lockstep vs torch: composed float path
    )
    mine = getattr(my_models, cli.model)(targs)
    mine.initialize()
    params = {
        name: import_net_params(mine.nets[name], ref.model[name].state_dict())
        for name in mine.nets
    }
    opt_state = {name: mine.tx[name].init(params[name]) for name in params}

    def iteration(params, opt_state, img, c_org, z_d, z_g2, lr):
        """One reference-order iteration: D1/D2 on separate fakes, then the
        two-phase G update — mirrors base_model.py:461-470 exactly."""
        logs = {}
        img_fake, img_random = mine._make_d_fakes(
            params, {}, img, c_org, B, z_d, None, train=False
        )
        params = dict(params)
        opt_state = dict(opt_state)
        for d_name, fake in (("discriminator1", img_fake),
                             ("discriminator2", img_random)):
            (_, d_logs), grads = jax.value_and_grad(
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
        (_, g_logs), grads = jax.value_and_grad(g1_loss, has_aux=True)(gp)
        for k in GEN_NETS:
            params[k], opt_state[k] = apply_updates(
                mine.tx[k], grads[k], opt_state[k], params[k], lr
            )
        logs.update(g_logs)

        def g2_loss(gp2):
            p = {**params, **gp2}
            return mine._g2_loss(p, {}, img, c_org, B, z_g2, None, {},
                                 train=False)

        gp2 = {k: params[k] for k in ("content_encoder", "decoder")}
        (_, g2_logs), grads2 = jax.value_and_grad(g2_loss, has_aux=True)(gp2)
        for k in ("content_encoder", "decoder"):
            params[k], opt_state[k] = apply_updates(
                mine.tx[k], grads2[k], opt_state[k], params[k], lr
            )
        logs.update(g2_logs)
        return params, opt_state, logs

    step_jit = jax.jit(iteration)

    # ---- real data stream, shared by both sides ------------------------ #
    if not os.path.isdir(cli.data):
        print("generating dataset ...", flush=True)
        make_dataset(cli.data, size=cli.size + 32)
    feed_args = types.SimpleNamespace(
        dataroot=cli.data, mode="train", load_size=cli.size + 16,
        crop_size=cli.size, no_flip=False, batch_size=B, num_domains=DOM,
        select_domains=None,
    )
    feed = data_feed(feed_args, seed=0)

    def port_all():
        # deep-copy: state_dict() tensors REFERENCE the live torch params and
        # np.asarray shares their storage, so a view-imported leaf kept as
        # prev_ref would mutate in place as torch trains — upd_ref would then
        # read exactly 0 for every view-only net (the r5 partial run's
        # content_encoder/discriminator zeros were this artifact)
        return {
            name: jax.tree.map(
                lambda a: np.array(a, copy=True),
                import_net_params(mine.nets[name],
                                  ref.model[name].state_dict()),
            )
            for name in params
        }

    def net_stats(a, b):
        """(max |a-b|, ||a-b||_F / ||b||_F) over a net's leaves."""
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        mx, d2, n2 = 0.0, 0.0, 0.0
        for x, y in zip(la, lb):
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            mx = max(mx, float(np.max(np.abs(x - y))) if x.size else 0.0)
            d2 += float(np.sum((x - y) ** 2))
            n2 += float(np.sum(y**2))
        return mx, (d2 / n2) ** 0.5 if n2 else 0.0

    rows = []
    prev_mine = None
    prev_ref = None
    t_start = time.time()
    for it in range(1, cli.iters + 1):
        batch = next(feed)
        tb = {k: torch.from_numpy(v.transpose(0, 3, 1, 2) if v.ndim == 4 else v)
              for k, v in batch.items()}
        img = jnp.asarray(np.concatenate(
            [batch["x1"], batch["x2"]]))
        c_org = jnp.asarray(np.concatenate([batch["y1"], batch["y2"]]))

        ref.update_lr()
        ref.set_inputs(tb)
        ref.optimize_parameters(it)
        ref_losses = {k: float(v) for k, v in ref.loss.items()
                      if k in LOSS_KEYS}
        lr_now = float(ref.optimizer["discriminator1"].param_groups[0]["lr"])
        z_d, z_g2 = draws_t[-2], draws_t[-1]

        params, opt_state, logs = step_jit(
            params, opt_state, img, c_org, jnp.asarray(z_d),
            jnp.asarray(z_g2), jnp.float32(lr_now),
        )

        if it % cli.log_every == 0 or it <= 3:
            my_losses = {k: round(float(logs[k]), 5)
                         for k in ref_losses if k in logs}
            ported = port_all()
            row = {"iter": it, "lr": lr_now,
                   "ref": {k: round(v, 5) for k, v in ref_losses.items()},
                   "mine": my_losses, "drift": {}, "upd_ref": {},
                   "upd_mine": {}}
            for name in params:
                mx, rel = net_stats(params[name], ported[name])
                row["drift"][name] = {"max": f"{mx:.3e}", "rel": f"{rel:.3e}"}
                if prev_mine is not None:
                    _, ur = net_stats(ported[name], prev_ref[name])
                    _, um = net_stats(params[name], prev_mine[name])
                    row["upd_ref"][name] = f"{ur:.3e}"
                    row["upd_mine"][name] = f"{um:.3e}"
            prev_mine = jax.tree.map(np.asarray, params)
            prev_ref = ported
            rows.append(row)
            el = time.time() - t_start
            print(f"[{el:7.0f}s] iter {it} lr {lr_now:.2e} "
                  f"ref.total_g {ref_losses.get('total_g', 0):.4f} "
                  f"mine {my_losses.get('total_g', 0):.4f} "
                  f"maxdrift {max(float(v['max']) for v in row['drift'].values()):.2e}",
                  flush=True)
            with open(cli.out, "w") as f:
                json.dump({
                    "config": {"model": cli.model, "dim": DIM, "size": H,
                               "iters": cli.iters,
                               "sched": [cli.sched_iters, cli.sched_iters // 2]},
                    "rows": rows,
                }, f, indent=1)

    print("done:", cli.out, flush=True)


if __name__ == "__main__":
    main()
