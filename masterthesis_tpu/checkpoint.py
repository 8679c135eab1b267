"""Checkpointing.

Parity with reference Model.save/load (src/models/model.py:70-100): two
artifacts per save point — ``model_{it}.ckpt`` (per-net params) and
``opt_{it}.ckpt`` (per-net optimizer state + step) — with tolerant per-net
loading (missing nets are skipped with a warning).

Two backends:
- ``msgpack`` (default): single files via flax.serialization, exact filename
  parity with the reference.
- ``orbax``: directory-based checkpoints for large/sharded states
  (``model_{it}.orbax/``); used automatically when a path ends in ``.orbax``.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_pytree(tree: Dict[str, Any], path: str) -> None:
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        # hand orbax the jax.Arrays directly: for mesh-sharded state each
        # process writes only its addressable shards (np.asarray would fail on
        # non-fully-addressable arrays under multi-host)
        ckptr.save(os.path.abspath(path), tree, force=True)
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = serialization.to_state_dict(_to_host(tree))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))


def load_pytree(path: str, template: Optional[Any] = None) -> Any:
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        if template is not None:
            # restore into the template's structure (keeps optax NamedTuples)
            # AND onto its shardings: template leaves that are mesh-sharded
            # jax.Arrays come back sharded the same way — the multi-host
            # restore path (each process reads only its shards).
            return ckptr.restore(
                os.path.abspath(path),
                item=template,
                restore_args=ocp.checkpoint_utils.construct_restore_args(template),
            )
        restored = ckptr.restore(os.path.abspath(path))
    else:
        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
    if template is None:
        return restored
    return serialization.from_state_dict(template, restored)


def restore_matching(template: Dict[str, Any], restored: Dict[str, Any], label: str = "net"):
    """Per-key tolerant restore (reference model.py:84-100 semantics)."""
    out = dict(template)
    for name in restored:
        if name in template:
            print(f"Loading checkpoint for : {name}")
            out[name] = serialization.from_state_dict(template[name], restored[name])
        else:
            print(f"Checkpoint for {name} {label} is not found.")
    return out
