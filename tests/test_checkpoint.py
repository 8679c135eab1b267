"""Checkpoint round-trip tests (SURVEY.md §4 plan item e)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu import checkpoint as ckpt
from masterthesis_tpu.models import AdaINModel

from conftest import make_batch, tiny_train_args


def _trees_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "t.ckpt")
    ckpt.save_pytree(tree, path)
    template = jax.tree.map(jnp.zeros_like, tree)
    restored = ckpt.load_pytree(path, template)
    assert _trees_equal(tree, restored)


def test_model_save_load_roundtrip(tmp_path):
    args = tiny_train_args(checkpoint_dir=str(tmp_path))
    m = AdaINModel(args)
    state = m.initialize()
    state, _ = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(0))
    m.save(state, 1)
    assert os.path.exists(tmp_path / "model_1.ckpt")
    assert os.path.exists(tmp_path / "opt_1.ckpt")

    # fresh model, restore both params and optimizer state
    m2 = AdaINModel(args)
    state2 = m2.initialize()
    assert not _trees_equal(state.params, state2.params)
    state2 = m2.load(state2, str(tmp_path / "model_1.ckpt"), str(tmp_path / "opt_1.ckpt"))
    assert _trees_equal(state.params, state2.params)
    assert _trees_equal(state.opt_state, state2.opt_state)
    assert int(state2.step) == int(state.step)


def test_tolerant_load_skips_missing_net(tmp_path, capsys):
    args = tiny_train_args(checkpoint_dir=str(tmp_path))
    m = AdaINModel(args)
    state = m.initialize()
    # save only a subset of nets
    partial = {"params": {"decoder": state.params["decoder"], "bogus_net": {"w": jnp.ones(3)}}}
    path = str(tmp_path / "partial.ckpt")
    ckpt.save_pytree(partial, path)
    state2 = m.load(state, path)
    out = capsys.readouterr().out
    assert "Loading checkpoint for : decoder" in out
    assert "bogus_net" in out and "not found" in out
    assert _trees_equal(state.params["decoder"], state2.params["decoder"])


def test_resume_sets_step(tmp_path):
    args = tiny_train_args(checkpoint_dir=str(tmp_path))
    m = AdaINModel(args)
    state = m.initialize()
    state, _ = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(0))
    m.save(state, 1)
    args2 = tiny_train_args(
        checkpoint_dir=str(tmp_path),
        resume=str(tmp_path / "model_1.ckpt"),
        resume_opt=str(tmp_path / "opt_1.ckpt"),
        last_iter=0,
    )
    m2 = AdaINModel(args2)
    state2 = m2.initialize()
    assert int(state2.step) == 1


def test_orbax_backend_roundtrip(tmp_path):
    tree = {"x": jnp.arange(4.0)}
    path = str(tmp_path / "t.orbax")
    ckpt.save_pytree(tree, path)
    restored = ckpt.load_pytree(path, jax.tree.map(jnp.zeros_like, tree))
    assert _trees_equal(tree, restored)


def test_orbax_format_flag(tmp_path):
    args = tiny_train_args(checkpoint_dir=str(tmp_path), ckpt_format="orbax")
    m = AdaINModel(args)
    state = m.initialize()
    m.save(state, 5)
    assert os.path.isdir(tmp_path / "model_5.orbax")
    restored = ckpt.load_pytree(str(tmp_path / "model_5.orbax"))
    assert "params" in restored
