"""Worker for the 2-process ``jax.distributed`` test (run via subprocess).

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh. The worker proves the full multi-host recipe end to end:

  1. ``jax.distributed.initialize`` over a localhost coordinator (the DCN
     control plane — what ``parallel.mesh.init_distributed`` wraps),
  2. per-process DataLoader striding (disjoint slices of one dataset),
  3. ``jax.make_array_from_process_local_data`` to assemble the global batch,
  4. a jitted step whose gradient all-reduce crosses the process boundary,
  5. a REAL model ``optimize_parameters`` step on the global mesh.

Results are written as one JSON file per process; the parent test asserts
coverage/values. Usage:
    python multihost_worker.py <pid> <nproc> <port> <out.json> [--full-step]
"""
import json
import os
import sys

pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
full_step = "--full-step" in sys.argv

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# the env var alone is not authoritative on this machine (the axon TPU plugin
# still wins) — the config update is what conftest.py relies on too
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from masterthesis_tpu.data.loader import DataLoader  # noqa: E402
from masterthesis_tpu.parallel.mesh import make_mesh  # noqa: E402

result = {"pid": pid, "device_count": jax.device_count()}

# ---- per-process loader striding over one shared dataset ---- #
N = 16


class _IndexDataset:
    def __len__(self):
        return N

    def __getitem__(self, i):
        return np.float32(i)


loader = DataLoader(_IndexDataset(), batch_size=4, shard_index=pid, num_shards=nproc)
local = np.concatenate([np.atleast_1d(b) for b in loader]).astype(np.float32)
result["local_items"] = sorted(float(x) for x in local)

# ---- global batch assembly + cross-process gradient all-reduce ---- #
mesh = make_mesh()  # global: all 8 devices across both processes
assert mesh.devices.size == 4 * nproc
data_sh = NamedSharding(mesh, P("data"))
x_global = jax.make_array_from_process_local_data(data_sh, local)
w = jax.make_array_from_process_local_data(NamedSharding(mesh, P()), np.ones((), np.float32))


@jax.jit
def sgd_step(w, x):
    def loss_fn(w):
        return jnp.mean((x * w) ** 2)

    loss, grad = jax.value_and_grad(loss_fn)(w)
    return w - 0.1 * grad, loss


w2, loss = sgd_step(w, x_global)
result["loss"] = float(loss)  # mean(i^2, i<16) = 77.5 regardless of placement
result["w_after"] = float(w2)  # 1 - 0.1 * 2 * 77.5 = -14.5

# ---- real model step on the global mesh ---- #
# The content-discriminator step (real grads + optax update through model
# code) rather than the giant fused main step: the latter takes >3 min to
# compile per process on a 1-core CPU host, which is test-hostile; the
# content step exercises the identical mesh/collective plumbing.
if full_step:
    from conftest import make_batch, tiny_train_args
    from masterthesis_tpu.models import AdaINModel

    args = tiny_train_args(batch_size=8, use_dis_content=True)
    model = AdaINModel(args)
    state = model.initialize()  # same PRNG on every process -> identical params
    state = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(a)
        ),
        state,
    )
    host_batch = make_batch(b=8)  # identical on both processes (seeded)
    local_rows = slice(pid * 8 // nproc, (pid + 1) * 8 // nproc)
    batch = {
        k: jax.make_array_from_process_local_data(data_sh, np.asarray(v)[local_rows])
        for k, v in host_batch.items()
    }
    # global_iter=1 with use_dis_content and d_iter=3 -> content-D step
    state, logs = model.optimize_parameters(state, batch, 1, jax.random.PRNGKey(0))
    result["model_losses"] = {k: float(v) for k, v in logs.items()}
    result["model_losses_finite"] = all(np.isfinite(v) for v in result["model_losses"].values())

with open(out_path, "w") as f:
    json.dump(result, f)
print(f"worker {pid} OK")
