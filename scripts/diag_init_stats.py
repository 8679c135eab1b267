"""Diff per-tensor INIT statistics: reference (torch) vs this framework.

Builds both sides at the head-to-head config (dim 32, latent 8, 4 domains),
imports the torch init through tools/port_reference (so tensors are aligned
name-by-name in OUR param tree layout), then re-initializes our side from
scratch and compares every leaf's (std, mean, |max|) pairwise.

Any leaf whose std ratio falls outside [0.7, 1.4] (or where exactly one side
is all-zero) is printed — that's the remaining init-distribution gap that the
from-ref-init experiment proved matters (benchmarks/headtohead_r3.json).

Run: JAX_PLATFORMS=cpu python scripts/diag_init_stats.py
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from scripts.reference_headtohead import install_reference, ref_args  # noqa: E402


def build_ref_model(seed=0):
    import torch

    torch.manual_seed(seed)
    install_reference()
    import models as ref_models

    cli = types.SimpleNamespace(size=96, iters=10, batch_size=2, seed=seed,
                                out="/tmp/diag_init")
    args = ref_args(cli, "/tmp/diag_init_ckpt")
    model = ref_models.AdaINModel(args)
    model.initialize()
    return model


def main():
    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.tools.port_reference import import_net_params

    ref = build_ref_model()

    targs = default_train_args(
        dim=32, latent_dim=8, num_domains=4, crop_size=96, batch_size=2,
        compute_dtype="float32", logdir=None, mode="train",
    )
    model = AdaINModel(targs)
    state = model.initialize()

    rows = []
    for net in model.nets:
        sd = {k: v.detach().cpu().numpy() for k, v in ref.model[net].state_dict().items()}
        try:
            ported = import_net_params(model.nets[net], sd)
        except Exception as e:  # noqa: BLE001
            print(f"[skip] {net}: import failed: {e}")
            continue

        def walk(ours, theirs, path):
            if isinstance(ours, dict):
                for k in ours:
                    if not isinstance(theirs, dict) or k not in theirs:
                        rows.append((f"{net}/{path}/{k}", None, None, "MISSING in ported"))
                        continue
                    walk(ours[k], theirs[k], f"{path}/{k}")
                return
            a = np.asarray(ours, np.float64)
            b = np.asarray(theirs, np.float64)
            if a.shape != b.shape:
                rows.append((f"{net}{path}", a.std(), b.std(), f"SHAPE {a.shape} vs {b.shape}"))
                return
            sa, sb = a.std(), b.std()
            za, zb = np.allclose(a, 0), np.allclose(b, 0)
            flag = ""
            if za != zb:
                flag = "ZERO-MISMATCH"
            elif not za and (sa < 0.7 * sb or sa > 1.4 * sb):
                flag = "STD-RATIO"
            if abs(a.mean()) > 0.1 + 3 * sa or abs(b.mean()) > 0.1 + 3 * sb:
                flag += " MEAN"
            rows.append((f"{net}{path}", sa, sb, flag))

        walk(dict(state.params[net]), ported, "")

    print(f"{'tensor':70s} {'ours_std':>10s} {'ref_std':>10s}  flag")
    nflag = 0
    for name, sa, sb, flag in rows:
        if flag:
            nflag += 1
        if flag or "-v" in sys.argv:
            print(f"{name:70s} {sa if sa is None else round(sa, 5)!s:>10s}"
                  f" {sb if sb is None else round(sb, 5)!s:>10s}  {flag}")
    print(f"\n{len(rows)} tensors compared, {nflag} flagged")


if __name__ == "__main__":
    main()
