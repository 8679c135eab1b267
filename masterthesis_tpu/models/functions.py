"""Optimization plumbing: weight re-init, LR schedules, optimizer groups.

Parity with reference src/models/core/functions.py:
- ``init_net`` (functions.py:72-106): re-initializes every conv kernel in a
  params pytree per the chosen scheme and zeroes conv biases. Linear layers
  keep their torch-default init (set at module construction). There is no
  DataParallel here — replication/sharding is XLA's job via the mesh.
- ``make_lr_schedule`` (functions.py:60-70): 'step' (gamma 0.1 every
  n_iter_decay iters, torch StepLR) and 'lambda' (linear decay after
  n_iter_decay) policies, stepped once per global iteration like the
  reference's update_lr (model.py:66-68).
- ``make_optimizer``: torch-Adam-equivalent optax chain
  (grad [+ clip] + wd*param -> adam moments -> -lr), with lr applied at update
  time from the global step so every group shares the reference's
  per-iteration schedule semantics.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from masterthesis_tpu.ops.initializers import get_conv_init


def init_net(params, rng, init_type: Optional[str] = "normal", init_gain: float = 0.02):
    """Re-initialize conv kernels (ndim==4) and zero their biases.

    Matches reference init_weights (functions.py:72-94): only modules whose
    class name starts with 'Conv' are touched; norm affine params and Dense
    layers are left at their construction-time init.
    """
    if init_type is None:
        return params
    flat = traverse_util.flatten_dict(params)
    kernel_paths = [p for p, v in flat.items() if p[-1] == "kernel" and v.ndim == 4]
    keys = jax.random.split(rng, max(1, len(kernel_paths)))
    out = dict(flat)
    for key, path in zip(keys, kernel_paths):
        v = flat[path]
        init_fn = get_conv_init(init_type, init_gain)
        out[path] = init_fn(key, v.shape, v.dtype)
        bias_path = path[:-1] + ("bias",)
        if bias_path in flat:
            out[bias_path] = jnp.zeros_like(flat[bias_path])
    return traverse_util.unflatten_dict(out)


def make_lr_schedule(
    lr: float,
    lr_policy: str = "step",
    n_iters: int = 1_000_000,
    n_iter_decay: int = 600_000,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return lr(step) matching reference get_scheduler (functions.py:60-70)."""
    if lr_policy == "step":

        def schedule(step):
            return lr * jnp.power(0.1, jnp.floor_divide(step, n_iter_decay).astype(jnp.float32))

    elif lr_policy == "lambda":

        def schedule(step):
            frac = 1.0 - jnp.maximum(0.0, step.astype(jnp.float32) - n_iter_decay) / float(
                n_iters - n_iter_decay + 1
            )
            return lr * frac

    elif lr_policy == "constant":

        def schedule(step):
            return jnp.full((), lr, dtype=jnp.float32)

    else:
        raise NotImplementedError(f"Learning rate policy {lr_policy} is not implemented")
    return schedule


def make_optimizer(
    beta1: float = 0.5,
    beta2: float = 0.999,
    weight_decay: float = 1e-4,
    clip_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, (b1,b2), weight_decay) equivalent, lr-deferred.

    The learning rate is applied by ``apply_updates`` from the global step, so
    groups that update on different iterations (content discriminator) still
    follow the reference's every-iteration scheduler stepping.
    """
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def apply_updates(
    tx: optax.GradientTransformation,
    grads: Any,
    opt_state: Any,
    params: Any,
    lr: jnp.ndarray,
):
    """One optimizer step with the step-dependent lr multiplied in."""
    updates, new_opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt_state
