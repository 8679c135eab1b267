"""Convert a head-to-head params_{it}.npz into a Trainer model_{it}.ckpt.

scripts/reference_headtohead.py run_tpu persists checkpoints as flat npz
(jax.tree_util.keystr -> leaf) for post-hoc diagnostics; the evaluate/sample
CLIs resume from the Trainer's msgpack format ({"params": {net: tree}},
models/model.py save). This rebuilds the nested tree from the keystr paths
so h2h checkpoints can drive `evaluate --int8` / scripts/int8_quality.py
without retraining.

Usage: python scripts/npz_to_ckpt.py IN.npz OUT.ckpt
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def npz_to_tree(path: str) -> dict:
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = re.findall(r"\['([^']+)'\]", key)
        if not parts:
            raise ValueError(f"unparseable keystr {key!r}")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree


def main():
    src, dst = sys.argv[1], sys.argv[2]
    from masterthesis_tpu.checkpoint import save_pytree

    tree = npz_to_tree(src)
    # spectral 'u' vectors (state.extra) aren't in the npz; restore_matching
    # keeps the template's — irrelevant for the generator-only serving path
    save_pytree({"params": tree, "extra": {}}, dst)
    print(f"wrote {dst} ({len(tree)} nets: {sorted(tree)})")


if __name__ == "__main__":
    main()
