"""Post-training quantization helpers (int8 serving path).

Works on the ``calib`` variable collections sown by ``blocks.Conv2d`` (each
conv records the running amax of its input under ``amax_in``) and turns them
into the ``quant`` collections those same convs consume at serving time.
See ops/pallas/conv_int8.py for the kernel and the quantization scheme, and
TranslationModel.calibrate_int8 for the driver.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def merge_amax(acc, new):
    """Elementwise-max merge of two calib collections (None-safe)."""
    if acc is None:
        return new
    return jax.tree.map(jnp.maximum, acc, new)


def extract_amax(calib_col):
    """calib -> quant collection: unwrap flax sow tuples to scalars."""

    def unwrap(leaf):
        if isinstance(leaf, tuple):
            leaf = leaf[0]
        return jnp.asarray(leaf, jnp.float32)

    return jax.tree.map(unwrap, calib_col, is_leaf=lambda x: isinstance(x, tuple))
