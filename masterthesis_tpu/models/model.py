"""Abstract model: lifecycle, checkpointing, logging.

Parity with reference src/models/model.py:15-122, re-designed functionally:
the model object owns module *definitions*, optimizer transforms and the lr
schedule; all mutable training state lives in a TrainState PyTree that the
jitted step functions consume and return.
"""
from __future__ import annotations

import os
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu import checkpoint as ckpt
from masterthesis_tpu.models.functions import init_net, make_lr_schedule, make_optimizer
from masterthesis_tpu.models.state import TrainState
from masterthesis_tpu.utils import AttributeDict, save_image


class Model(ABC):
    """Base model: net registry, TrainState init, save/load, logging."""

    def __init__(self, args):
        self.args = args
        # fail fast on bad checkpoint paths (before minutes of net init/compile)
        for attr in ("resume", "resume_opt"):
            path = getattr(args, attr, None)
            if path is not None and not os.path.exists(path):
                raise FileNotFoundError(f"--{attr} checkpoint not found: {path}")
        self.nets: Dict[str, Any] = AttributeDict()
        self.tx: Dict[str, Any] = {}
        self.loss: Dict[str, float] = {}
        self.print_loss = []
        self.writer = None
        if "train" in getattr(args, "mode", "train"):
            logdir = getattr(args, "logdir", None)
            if logdir:
                try:
                    from tensorboardX import SummaryWriter

                    self.writer = SummaryWriter(log_dir=logdir)
                except Exception:  # pragma: no cover - tensorboard optional
                    self.writer = None
        self.schedule = make_lr_schedule(
            lr=getattr(args, "lr", None) or 1e-4,
            lr_policy=getattr(args, "lr_policy", None) or "step",
            n_iters=getattr(args, "n_iters", None) or 1_000_000,
            n_iter_decay=getattr(args, "n_iter_decay", None) or 600_000,
        )

    # ------------------------------------------------------------------ #
    # lifecycle
    # ------------------------------------------------------------------ #
    @abstractmethod
    def _dummy_inputs(self, name: str):
        """Return (args, kwargs) used to trace ``nets[name]`` at init."""

    def _is_train(self) -> bool:
        return "train" in getattr(self.args, "mode", "train")

    def _make_tx(self):
        a = self.args
        beta1 = getattr(a, "beta1", None)
        beta2 = getattr(a, "beta2", None)
        wd = getattr(a, "wd", None)
        for name in self.nets:
            clip = 5.0 if name == "content_discriminator" else None
            self.tx[name] = make_optimizer(
                beta1=0.5 if beta1 is None else float(beta1),
                beta2=0.999 if beta2 is None else float(beta2),
                weight_decay=1e-4 if wd is None else float(wd),
                clip_norm=clip,
            )

    def initialize(self, rng: Optional[jax.Array] = None) -> TrainState:
        """Build params for every net, apply the reference init scheme, create
        optimizer states, and restore checkpoints if requested
        (reference model.py:42-54)."""
        a = self.args
        if rng is None:
            rng = jax.random.PRNGKey(getattr(a, "seed", 0))
        params, extra = {}, {}
        init_type = None if getattr(a, "resume", None) else getattr(a, "init_type", "normal")
        for name, net in self.nets.items():
            rng, k_init, k_reinit = jax.random.split(rng, 3)
            args_, kwargs_ = self._dummy_inputs(name)
            variables = net.init({"params": k_init}, *args_, **kwargs_)
            p = variables["params"]
            if init_type:
                p = init_net(p, k_reinit, init_type, getattr(a, "init_gain", 0.02))
            params[name] = p
            extra[name] = dict(variables.get("spectral", {}))
        self._make_tx()
        if self._is_train():
            opt_state = {name: self.tx[name].init(params[name]) for name in params}
        else:
            opt_state = {name: () for name in params}
        state = TrainState.create(params, opt_state, extra)
        last_iter = int(getattr(a, "last_iter", -1) or -1)
        if getattr(a, "resume_opt", None) is not None and last_iter >= 0:
            state = state.replace(step=jnp.asarray(last_iter + 1, jnp.int32))
        if self._is_train():
            state = self.load(state, getattr(a, "resume", None), getattr(a, "resume_opt", None))
        else:
            state = self.load(state, getattr(a, "resume", None))
        return state

    # ------------------------------------------------------------------ #
    # checkpointing (reference model.py:70-100)
    # ------------------------------------------------------------------ #
    def save(self, state: TrainState, it: int) -> None:
        ckdir = self.args.checkpoint_dir
        # 'msgpack' (default) -> single model_{it}.ckpt files (reference
        # filename parity); 'orbax' -> model_{it}.orbax directories (sharded
        # array support for scale-out)
        ext = ".orbax" if getattr(self.args, "ckpt_format", "msgpack") == "orbax" else ".ckpt"
        model_tree = {"params": dict(state.params), "extra": dict(state.extra)}
        ckpt.save_pytree(model_tree, os.path.join(ckdir, f"model_{it}{ext}"))
        opt_tree = {"opt_state": dict(state.opt_state), "step": state.step}
        ckpt.save_pytree(opt_tree, os.path.join(ckdir, f"opt_{it}{ext}"))

    def load(self, state: TrainState, checkpoint: Optional[str], opt_ckpt: Optional[str] = None):
        if checkpoint is not None:
            restored = ckpt.load_pytree(checkpoint)
            saved_params = restored.get("params", restored)
            new_params = ckpt.restore_matching(dict(state.params), saved_params, "network")
            new_extra = dict(state.extra)
            if "extra" in restored:
                for name, coll in restored["extra"].items():
                    if name in new_extra and coll:
                        new_extra[name] = ckpt.restore_matching(
                            {name: new_extra[name]}, {name: coll}, "spectral"
                        )[name]
            state = state.replace(params=new_params, extra=new_extra)
        if opt_ckpt is not None:
            restored = ckpt.load_pytree(opt_ckpt)
            new_opt = ckpt.restore_matching(
                dict(state.opt_state), restored.get("opt_state", {}), "optimizer"
            )
            state = state.replace(opt_state=new_opt)
            if "step" in restored:
                state = state.replace(step=jnp.asarray(np.asarray(restored["step"]), jnp.int32))
        return state

    # ------------------------------------------------------------------ #
    # logging (reference model.py:102-119)
    # ------------------------------------------------------------------ #
    def get_current_lr(self, state: TrainState) -> Dict[str, float]:
        base = float(self.schedule(state.step))
        lrs = {}
        for name in self.nets:
            lrs[name] = base / 2.5 if name == "content_discriminator" else base
        return lrs

    def save_images(self, state: TrainState, batch, it: int, rng=None) -> None:
        visuals = self.compute_visuals(state, batch, rng)
        img_filename = os.path.join(self.args.display_dir, f"gen_{it}.jpg")
        save_image(np.asarray(visuals), img_filename)

    def write_loss(self, global_iter: int) -> None:
        if self.writer is None:
            return
        for name, value in self.loss.items():
            self.writer.add_scalar(name, float(value), global_iter)

    def print_losses(self) -> Dict[str, float]:
        return {k: float(v) for k, v in self.loss.items() if k in self.print_loss}

    def compute_metrics(self):  # pragma: no cover - parity stub (model.py:121)
        pass

    @abstractmethod
    def optimize_parameters(self, state: TrainState, batch, global_iter: int, rng):
        """Run one optimization iteration; returns (new_state, loss_dict)."""

    @abstractmethod
    def compute_visuals(self, state: TrainState, batch, rng=None):
        """Produce a visualization grid for the current batch."""
