"""Head-to-head quality comparison: PyTorch reference vs this framework.

The quality north star ("FID within 1 pt of the PyTorch reference",
BASELINE.json) needs the reference actually RUN, not assumed. This script
trains BOTH frameworks on the identical synthetic 4-domain dataset
(scripts/quality_trend.py's generator, same seed -> bitwise-identical image
files) at an identical reduced-scale config, then scores every checkpoint of
both sides with the IDENTICAL pixel-statistics FID evaluator (same val
content lists, same numpy-seeded style codes z).

Config (both sides): AdaINModel flagship family — reparam VAE style encoder,
AdaIN decoder, vanilla GAN, lambda_cls 1.0 / cls_G 5.0 / rec 10.0, Adam
(1e-4, 0.5/0.999, wd 1e-4), linear lr decay from iters/2. `use_dis_content`
is OFF on both sides: the reference ContentDiscriminator's fixed conv stack
(reference networks.py:386-419) needs crop_size >= 184, which is not
CPU-trainable at useful iteration counts (the torch side runs on the host
CPU: this environment's TPU is JAX-only).

The torch side drives the reference's own training code
(`AdaINModel.optimize_parameters`, reference adain_model.py /
base_model.py:461-470) with this framework's data pipeline feeding NCHW
tensors (the reference's own DataLoader stack needs torchvision, absent
here; the transform math is parity-tested in tests/test_data.py).

Run (torch side is CPU-slow — background it):
  python scripts/reference_headtohead.py --side ref
  python scripts/reference_headtohead.py --side tpu
  python scripts/reference_headtohead.py --side report

(the ref side forces jax onto CPU itself — the ambient axon platform pins
any jax-importing process to the single TPU, and `JAX_PLATFORMS=cpu` in the
environment is overridden by sitecustomize on this machine)
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

from quality_trend import DOMAINS, make_dataset  # noqa: E402

REF = "/root/reference/src"

CFG = dict(
    dim=32, latent_dim=8, num_domains=4, input_dim=3, batch_size=2,
    gan_mode="vanilla", lambda_cls=1.0, lambda_cls_G=5.0, lambda_rec=10.0,
    lr=1e-4, beta1=0.5, beta2=0.999, wd=1e-4,
)


# --------------------------------------------------------------------------- #
# shared evaluator: pixel-statistics FID over identical content/style draws
# --------------------------------------------------------------------------- #
def eval_translator(translate, dataroot, load_size, crop_size, num_styles=2,
                    seed=123):
    """translate(imgs_nhwc_f32, z, c_onehot) -> imgs_nhwc_f32 in [-1, 1].

    Returns {domain: fid} + 'mean'. Content lists, crops and z draws are all
    derived from `seed`, so both frameworks score on identical inputs.
    """
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.data.datasets import ImageList
    from masterthesis_tpu.data.transforms import TrainTransform
    from masterthesis_tpu.metrics.fid import FID

    transform = TrainTransform(load_size, crop_size, train=False)
    mode_dir = os.path.join(dataroot, "val")
    results = {}
    rng = np.random.default_rng(seed)

    def pixel_features(x):
        t4 = jax.image.resize(
            jnp.asarray(x, jnp.float32), (x.shape[0], 4, 4, x.shape[-1]), "linear"
        )
        return t4.reshape(x.shape[0], -1)

    for t, domain in enumerate(sorted(DOMAINS)):
        fid = FID(num_features=48, feature_extractor=pixel_features)
        real_ds = ImageList(os.path.join(mode_dir, domain), transform=transform)
        content_paths = []
        for d2 in sorted(DOMAINS):
            if d2 != domain:
                content_paths += ImageList(os.path.join(mode_dir, d2)).dataset
        content_paths = content_paths[: len(real_ds)]
        trg1 = np.eye(CFG["num_domains"], dtype=np.float32)[t]
        for start in range(0, len(content_paths), 8):
            chunk = content_paths[start : start + 8]
            imgs = np.stack([transform.load_file(p) for p in chunk]).astype(np.float32)
            bsz = imgs.shape[0]
            trg = np.tile(trg1, (bsz, 1))
            for _ in range(num_styles):
                z = rng.standard_normal((bsz, CFG["latent_dim"])).astype(np.float32)
                fake = np.asarray(translate(imgs, z, trg), np.float32)
                reals = np.stack(
                    [np.asarray(real_ds[(start + j) % len(real_ds)], np.float32)
                     for j in range(bsz)]
                )
                fid.update(((fake + 1.0) / 2.0, (reals + 1.0) / 2.0))
        results[domain] = float(fid.compute())
    results["mean"] = float(np.mean([results[d] for d in sorted(DOMAINS)]))
    return results


def data_feed(args_like, seed=0):
    """Infinite {x1,x2,y1,y2} NHWC float batch generator (PairedDataset
    semantics, shared by both sides)."""
    from masterthesis_tpu.data.datasets import PairedDataset

    ds = PairedDataset(args_like, seed=seed)
    n = len(ds)
    i = 0
    while True:
        rows = [ds[(i + j) % n] for j in range(args_like.batch_size)]
        i += args_like.batch_size
        yield {
            k: np.stack([r[k] for r in rows]).astype(np.float32)
            for k in ("x1", "x2", "y1", "y2")
        }


# --------------------------------------------------------------------------- #
# torch reference side
# --------------------------------------------------------------------------- #
def install_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.models", "torchvision.models.vgg",
                 "torchvision.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    sys.modules["torchvision.models"].vgg = sys.modules["torchvision.models.vgg"]
    import torch

    orig_get_device = torch.Tensor.get_device

    def cpu_safe_get_device(self):
        d = orig_get_device(self)
        return "cpu" if isinstance(d, int) and d < 0 else d

    torch.Tensor.get_device = cpu_safe_get_device


def ref_args(cli, ckpt_dir):
    from types import SimpleNamespace

    return SimpleNamespace(
        **CFG,
        enc_norm="instance", up_type="transpose", dec_norm="layer",
        use_dropout=False, mode="train", ms_dis=False, dis_norm=None,
        dis_sn=False, crop_size=cli.size, use_dis_content=False,
        use_ragan=False, vgg_loss=None, logdir=os.path.join(cli.out, "ref_logs"),
        # getattr: callers outside this CLI (scripts/diag_init_stats.py)
        # build a minimal namespace without the --concat flag
        reparam=True, concat=getattr(cli, "concat", False), num_scales=3, d_iter=3,
        resume=None, resume_opt=None, init_type="normal", init_gain=0.02,
        gpu_ids=[], last_iter=-1, lr_policy="lambda",
        n_iters=cli.iters, n_iter_decay=cli.iters // 2,
        checkpoint_dir=ckpt_dir,
    )


def run_ref(cli):
    # the torch side must NOT touch the TPU (one-process rule); env
    # JAX_PLATFORMS=cpu is overridden by sitecustomize, so force it here
    import jax

    jax.config.update("jax_platforms", "cpu")
    install_reference()
    import torch

    torch.manual_seed(cli.seed)
    import models as ref_models  # reference package

    # per-tag checkpoint dir: concurrent/sequential seed runs must not
    # clobber each other's model_{it}.ckpt files
    ckpt_dir = os.path.join(cli.out, f"ref_ckpt_{cli.tag}" if cli.tag else "ref_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    args = ref_args(cli, ckpt_dir)
    if cli.resume_iter:
        # resume an interrupted ref run via the reference's own mechanism
        # (reference model.py:41-53): load model+opt ckpt, rebuild schedulers
        # at last_iter. The data feed is replayed below so the image stream
        # is identical; torch's global RNG state (noise/z draws) is NOT
        # replayable, so the post-resume draws differ — same class of
        # variation as a fresh seed, acceptable for a GAN quality trend.
        args.resume = os.path.join(ckpt_dir, f"model_{cli.resume_iter}.ckpt")
        args.resume_opt = os.path.join(ckpt_dir, f"opt_{cli.resume_iter}.ckpt")
        args.last_iter = cli.resume_iter
    model = getattr(ref_models, cli.model)(args)
    if cli.resume_iter:
        # torch>=2 LambdaLR(last_epoch>=0) demands 'initial_lr' in the param
        # groups; the reference was written for torch 1.9 where resume worked
        # without it. The base lr is the pre-decay lr (decay starts iters/2).
        for opt in model.optimizer:
            for g in model.optimizer[opt].param_groups:
                g.setdefault("initial_lr", g["lr"])
    model.initialize()

    feed_args = types.SimpleNamespace(
        dataroot=os.path.join(cli.out, "data"), mode="train",
        load_size=cli.size + 16, crop_size=cli.size, no_flip=False,
        batch_size=cli.batch_size, num_domains=4, select_domains=None,
    )
    feed = data_feed(feed_args, seed=cli.seed)
    start_it = 1
    if cli.resume_iter:
        for _ in range(cli.resume_iter):  # replay the data stream exactly
            next(feed)
        start_it = cli.resume_iter + 1
        print(f"[ref] resumed at iter {cli.resume_iter}", flush=True)
    def translate_current(imgs, z, trg):
        # eval the CURRENT in-memory weights (identical to the checkpoint
        # just saved); eval_translator's own rng(123) keeps the scoring
        # draws shared with the tpu side and leaves torch's global RNG —
        # hence the training trajectory — untouched.
        with torch.no_grad():
            ti = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
            z_c = model.model.content_encoder(ti)
            out = model.model.decoder(
                z_c, torch.from_numpy(z), torch.from_numpy(trg)
            )
        return out.numpy().transpose(0, 2, 3, 1)

    suffix = f"_{cli.tag}" if cli.tag else ""
    results_path = os.path.join(cli.out, f"ref_results{suffix}.json")

    def write_results(results, times, partial):
        out = {
            "side": "reference (PyTorch, CPU)",
            "config": {**CFG, "crop_size": cli.size, "iters": cli.iters,
                       "seed": cli.seed, "model": cli.model,
                       "concat": cli.concat},
            "sec_per_iter": round(float(np.mean(times)), 3) if times else None,
            "trend": results,
        }
        if partial:
            out["partial"] = True  # run still in progress at this write
        with open(results_path, "w") as f:
            json.dump(out, f, indent=1)
        return out

    def eval_now(it, results, times):
        # incremental checkpoint eval: a wall-clock cutoff must still leave
        # a scored trend on disk (single-core ref runs take hours)
        for net in model.model:
            model.model[net].eval()
        fids = eval_translator(
            translate_current,
            os.path.join(cli.out, "data"), cli.size + 16, cli.size,
        )
        for net in model.model:
            model.model[net].train()
        row = {"iter": it, **{f"fid_{k}": round(v, 3) for k, v in fids.items()}}
        print("[ref eval]", json.dumps(row), flush=True)
        results.append(row)
        write_results(results, times, partial=it < cli.iters)

    times, results = [], []
    if start_it == 1:
        # score the init too: "does training ever improve on init" is the
        # exact question the r3 flagship-scale collapse raised
        eval_now(0, results, times)
    for it in range(start_it, cli.iters + 1):
        batch = next(feed)
        tb = {
            k: torch.from_numpy(
                v.transpose(0, 3, 1, 2) if v.ndim == 4 else v
            )
            for k, v in batch.items()
        }
        t0 = time.perf_counter()
        model.update_lr()
        model.set_inputs(tb)
        model.optimize_parameters(it)
        times.append(time.perf_counter() - t0)
        if it % 50 == 0:
            keep = {k: float(v) for k, v in model.loss.items()
                    if k in ("g_adv", "g_cls", "l1_cc_rec")}
            print(f"[ref] iter {it} {keep} {np.mean(times[-50:]):.2f}s/it",
                  flush=True)
        if it % cli.ckpt_every == 0 or it == cli.iters:
            model.save(it)
            eval_now(it, results, times)

    out = write_results(results, times, partial=False)
    print(json.dumps(out))


# --------------------------------------------------------------------------- #
# this framework's side
# --------------------------------------------------------------------------- #
def run_tpu(cli):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpu_jax_cache")
    import jax
    import jax.numpy as jnp

    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel, BaseModel

    model_cls = {"AdaINModel": AdaINModel, "BaseModel": BaseModel}[cli.model]
    # per-tag like the ref side: multi-seed runs must not clobber each
    # other's params_{it}.npz (diag_domain_stats.py reads these post-hoc)
    ckpt_dir = os.path.join(cli.out, f"tpu_ckpt_{cli.tag}" if cli.tag else "tpu_ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    targs = default_train_args(
        dataroot=os.path.join(cli.out, "data"),
        model=model_cls,
        crop_size=cli.size, load_size=cli.size + 16,
        use_dis_content=False, reparam=True, concat=cli.concat,
        compute_dtype=cli.dtype,
        # match the ref side's schedule exactly (ref_args: lr_policy lambda,
        # decay from iters/2) — the default 'step' policy would hold lr
        # constant over a 1k-iter run while the reference anneals to ~0
        lr_policy="lambda", n_iter_decay=cli.iters // 2,
        n_iters=cli.iters, max_iter=cli.iters, seed=cli.seed,
        mode="train", logdir=None, checkpoint_dir=ckpt_dir,
        # 'off' by default: h2h trends compare against rounds 3/4 data that
        # trained on the composed float path; pass --fused auto to A/B the
        # whole-block training kernel's dynamics at h2h scale instead
        fused_resblock=cli.fused,
        **{k: v for k, v in CFG.items() if k not in ("input_dim",)},
    )
    model = model_cls(targs)
    state = model.initialize()
    if cli.init_from:
        # start from an imported (e.g. reference) parameter set — isolates
        # init-distribution effects from training-dynamics effects
        from masterthesis_tpu.checkpoint import load_pytree

        ported = load_pytree(cli.init_from)["params"]
        params = dict(state.params)
        params.update({k: ported[k] for k in ported if k in params})
        opt_state = {k: model.tx[k].init(params[k]) for k in params}
        state = type(state)(step=state.step, params=params,
                            opt_state=opt_state, extra=state.extra)
        print(f"initialized {list(ported)} from {cli.init_from}", flush=True)
    feed_args = types.SimpleNamespace(
        dataroot=os.path.join(cli.out, "data"), mode="train",
        load_size=cli.size + 16, crop_size=cli.size, no_flip=False,
        batch_size=cli.batch_size, num_domains=4, select_domains=None,
    )
    feed = data_feed(feed_args, seed=cli.seed)
    rng = jax.random.PRNGKey(cli.seed)
    times = []
    # score the init too (iter 0): "does training ever improve on init" is
    # the exact question the r3 flagship-scale collapse raised
    ckpts = {0: jax.tree.map(np.asarray, dict(state.params))}
    for it in range(1, cli.iters + 1):
        batch = next(feed)
        rng, k = jax.random.split(rng)
        t0 = time.perf_counter()
        state, logs = model.optimize_parameters(state, batch, it, k)
        if it % 50 == 0:
            keep = {k2: round(float(logs[k2]), 3)
                    for k2 in ("g_adv", "g_cls", "l1_cc_rec") if k2 in logs}
            times.append(time.perf_counter() - t0)
            print(f"[tpu] iter {it} {keep}", flush=True)
        if it % cli.ckpt_every == 0 or it == cli.iters:
            ckpts[it] = jax.tree.map(np.asarray, dict(state.params))
            # persist for post-hoc diagnostics (flat npz of leaves)
            flat = {
                jax.tree_util.keystr(path): leaf
                for path, leaf in jax.tree_util.tree_flatten_with_path(ckpts[it])[0]
            }
            np.savez(os.path.join(ckpt_dir, f"params_{it}.npz"), **flat)

    fwd = model._forward_random_jit
    results = []
    for it, params in sorted(ckpts.items()):
        def translate(imgs, z, trg, params=params):
            return fwd(params, jnp.asarray(imgs), jnp.asarray(z), jnp.asarray(trg))

        fids = eval_translator(
            translate, os.path.join(cli.out, "data"), cli.size + 16, cli.size
        )
        row = {"iter": it, **{f"fid_{k}": round(v, 3) for k, v in fids.items()}}
        print("[tpu eval]", json.dumps(row), flush=True)
        results.append(row)
    out = {
        "side": "masterthesis_tpu (JAX)",
        "config": {**CFG, "crop_size": cli.size, "iters": cli.iters,
                   "compute_dtype": cli.dtype, "seed": cli.seed,
                   "model": cli.model, "concat": cli.concat},
        "trend": results,
    }
    suffix = f"_{cli.tag}" if cli.tag else ""
    with open(os.path.join(cli.out, f"tpu_results{suffix}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def run_report(cli):
    import glob as _glob

    # merge with the committed file: /tmp run dirs are wiped between
    # sessions, so a fresh report must not drop runs that only survive there
    sides = {}
    # seed from the newest committed report so /tmp-only runs are preserved
    for prior in ("benchmarks/headtohead_r4.json", "benchmarks/headtohead_r3.json"):
        if os.path.exists(prior):
            with open(prior) as f:
                sides = json.load(f).get("headtohead", {})
            break
    for path in sorted(_glob.glob(os.path.join(cli.out, "ref_results*.json"))):
        key = os.path.basename(path)[: -len(".json")]
        key = "ref" if key == "ref_results" else key.replace("ref_results_", "ref_")
        with open(path) as f:
            sides[key] = json.load(f)
    for path in sorted(_glob.glob(os.path.join(cli.out, "tpu_results*.json"))):
        key = os.path.basename(path)[: -len(".json")]
        key = "tpu" if key == "tpu_results" else key.replace("tpu_results_", "tpu_")
        with open(path) as f:
            sides[key] = json.load(f)
    report = {"headtohead": sides}
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/headtohead_r4.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "tpu", "report"], required=True)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--ckpt_every", type=int, default=250)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="/tmp/headtohead")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="tpu-side compute dtype (the ref side is f32 torch)")
    ap.add_argument("--tag", type=str, default="",
                    help="suffix for the tpu-side results file")
    ap.add_argument("--resume_iter", type=int, default=0,
                    help="ref side: resume from ref_ckpt_*/model_{N}.ckpt")
    ap.add_argument("--init_from", type=str, default="",
                    help="tpu side: initialize params from this ported ckpt")
    ap.add_argument("--model", choices=["AdaINModel", "BaseModel"],
                    default="AdaINModel",
                    help="model family on BOTH sides (reference class name)")
    ap.add_argument("--concat", action="store_true",
                    help="use the concat decoder (both sides)")
    ap.add_argument("--dim", type=int, default=CFG["dim"],
                    help="base channel width (both sides) — 64 + --size 128 "
                         "reproduces the r3 quality-trend flagship scale")
    ap.add_argument("--fused", default="off", choices=["off", "auto"],
                    help="tpu side --fused_resblock (off matches the r3/r4 "
                         "composed-path trend data)")
    cli = ap.parse_args()
    cli.batch_size = CFG["batch_size"]
    CFG["dim"] = cli.dim

    dataroot = os.path.join(cli.out, "data")
    if cli.side != "report" and not os.path.isdir(dataroot):
        print("generating synthetic 4-domain dataset ...")
        make_dataset(dataroot, size=cli.size + 32)

    {"ref": run_ref, "tpu": run_tpu, "report": run_report}[cli.side](cli)


if __name__ == "__main__":
    main()
