"""Multi-host (DCN) path tests.

The reference has no multi-process story at all (its only parallelism is
single-process ``torch.nn.DataParallel``, src/models/core/functions.py:96-106);
this framework scales over hosts via ``jax.distributed`` + one global mesh.
These tests prove that path for real:

- two actual OS processes initialize ``jax.distributed`` over a localhost
  coordinator, stride one dataset disjointly, assemble a global batch with
  ``jax.make_array_from_process_local_data``, and run a jitted step whose
  gradient all-reduce crosses the process boundary (multihost_worker.py);
- orbax save/restore of a mesh-sharded TrainState round-trips values and can
  be re-placed onto the mesh.

Set ``MT_FULL_MULTIHOST=1`` to also run a real model optimizer step inside the
two workers (adds ~6 min of XLA compile on a 1-core host, so it is opt-in).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from conftest import make_batch, tiny_train_args

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, extra=()):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"worker{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), "2", str(port), out, *extra],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_distributed(tmp_path):
    """Real 2-process jax.distributed run: DCN init, disjoint loader shards,
    global batch assembly, cross-process gradient all-reduce."""
    r0, r1 = _run_workers(tmp_path)
    assert r0["device_count"] == r1["device_count"] == 8
    # loader striding: disjoint and complete across the two processes
    s0, s1 = set(r0["local_items"]), set(r1["local_items"])
    assert not (s0 & s1)
    assert s0 | s1 == set(float(i) for i in range(16))
    # the jitted step saw the GLOBAL batch: mean(i^2, i<16) = 77.5, and the
    # gradient all-reduce crossed the process boundary (w identical on both)
    for r in (r0, r1):
        np.testing.assert_allclose(r["loss"], 77.5, rtol=1e-6)
        np.testing.assert_allclose(r["w_after"], 1.0 - 0.1 * 2 * 77.5, rtol=1e-6)


@pytest.mark.skipif(
    os.environ.get("MT_FULL_MULTIHOST") != "1",
    reason="~6 min of XLA compile on a 1-core host; run with MT_FULL_MULTIHOST=1 "
    "(validated manually; see BASELINE.md multi-host row)",
)
def test_two_process_distributed_model_step(tmp_path):
    """Same two processes, plus a real model optimizer step on the global mesh."""
    r0, r1 = _run_workers(tmp_path, extra=("--full-step",))
    assert r0["model_losses_finite"] and r1["model_losses_finite"]
    for k in r0["model_losses"]:
        np.testing.assert_allclose(
            r0["model_losses"][k], r1["model_losses"][k], rtol=1e-6, err_msg=k
        )


def test_orbax_mesh_sharded_state_roundtrip(tmp_path):
    """Orbax save/restore of a TrainState living on an 8-device mesh, with a
    genuinely sharded array alongside the replicated params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from masterthesis_tpu import checkpoint as ckpt
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.parallel import make_mesh, replicate

    args = tiny_train_args(batch_size=8)
    m = AdaINModel(args)
    mesh = make_mesh()
    state = replicate(m.initialize(), mesh)
    sharded_extra = jax.device_put(
        np.arange(8 * 4, dtype=np.float32).reshape(8, 4), NamedSharding(mesh, P("data"))
    )
    tree = {"state": state, "sharded": sharded_extra}
    path = str(tmp_path / "sharded_state.orbax")
    ckpt.save_pytree(tree, path)

    # restore INTO a mesh-placed template: values land back on the mesh with
    # the template's shardings (the multi-host restore flow — each process
    # would read only its shards)
    template = {
        "state": replicate(m.initialize(), mesh),
        "sharded": jax.device_put(
            np.zeros((8, 4), np.float32), NamedSharding(mesh, P("data"))
        ),
    }
    restored = ckpt.load_pytree(path, template)
    np.testing.assert_array_equal(
        np.asarray(restored["sharded"]), np.asarray(sharded_extra)
    )
    assert restored["sharded"].sharding.spec == P("data")
    for a, b in zip(jax.tree.leaves(restored["state"]), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert b.sharding.is_fully_replicated == a.sharding.is_fully_replicated

    # run one real sharded step straight from the restored state
    from masterthesis_tpu.data.loader import shard_batch

    batch = shard_batch(make_batch(b=8), mesh)
    _, logs = m.optimize_parameters(restored["state"], batch, 0, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in logs.values())
