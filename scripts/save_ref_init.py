"""Save the reference model's INITIAL weights (before any training) as a
model_0.ckpt, exactly as `reference_headtohead.py --side ref` would draw them
(same torch.manual_seed -> constructor -> initialize() sequence).

The head-to-head's strongest dynamics probe is training this framework from
the reference's exact init tensors (`--side tpu --init_from ...`); the ref
side only checkpoints at ckpt_every intervals, so the init itself needs this
helper. Convert the output with tools/port_reference.py.

Usage:
  python scripts/save_ref_init.py --model BaseModel --concat --seed 0 \
      --tag basemodel_init --out /tmp/headtohead
"""
from __future__ import annotations

import argparse
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_headtohead import install_reference, ref_args  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["AdaINModel", "BaseModel"],
                    default="AdaINModel")
    ap.add_argument("--concat", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--tag", type=str, required=True)
    ap.add_argument("--out", type=str, default="/tmp/headtohead")
    cli = ap.parse_args()

    # CPU only — the torch side must never touch the single-process TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    install_reference()
    import torch

    torch.manual_seed(cli.seed)
    import models as ref_models  # reference package

    ckpt_dir = os.path.join(cli.out, f"ref_ckpt_{cli.tag}")
    os.makedirs(ckpt_dir, exist_ok=True)
    args = ref_args(cli, ckpt_dir)
    model = getattr(ref_models, cli.model)(args)
    model.initialize()
    model.save(0)
    print(os.path.join(ckpt_dir, "model_0.ckpt"))


if __name__ == "__main__":
    main()
