"""Data-parallel sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4 plan item d — the JAX-idiomatic fake backend)."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.data.loader import shard_batch
from masterthesis_tpu.models import AdaINModel
from masterthesis_tpu.parallel import make_mesh, replicate

from conftest import make_batch, tiny_train_args


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = make_batch(b=8)
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["x1"].addressable_shards]
    assert all(s[0] == 1 for s in shard_shapes)  # batch split 8 ways
    assert len(shard_shapes) == 8


def test_train_step_under_data_parallel_mesh():
    """Full main step with batch sharded over 8 devices: params stay
    replicated, losses match the single-device result."""
    args = tiny_train_args(batch_size=8)
    m = AdaINModel(args)
    state = m.initialize()
    batch = make_batch(b=8)

    # single-device baseline
    state_sd, logs_sd = m.optimize_parameters(state, batch, 0, jax.random.PRNGKey(0))

    # fresh identical state, sharded over the mesh
    mesh = make_mesh()
    state2 = replicate(m.initialize(), mesh)
    batch2 = shard_batch(make_batch(b=8), mesh)
    state_dp, logs_dp = m.optimize_parameters(state2, batch2, 0, jax.random.PRNGKey(0))

    for k in logs_sd:
        np.testing.assert_allclose(
            float(logs_sd[k]), float(logs_dp[k]), rtol=2e-3, atol=2e-4, err_msg=k
        )
    # params remain fully replicated after the update
    p = jax.tree.leaves(state_dp.params)[0]
    assert p.sharding.is_fully_replicated


def test_num_devices_limit():
    mesh = make_mesh(num_devices=4)
    assert mesh.devices.size == 4


def test_spatial_sharding_matches_unsharded():
    """dp x spatial 2-D mesh: GSPMD halo-exchanged convs == single-device."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.parallel import make_mesh_2d, spatial_sharding

    args = tiny_train_args()
    m = AdaINModel(args)
    state = m.initialize()
    img = make_batch()["x1"]
    z = jnp.zeros((2, args.latent_dim))
    c = jax.nn.one_hot(jnp.array([0, 1]), 4)
    ref = m._forward_random_jit(state.params, img, z, c)

    mesh = make_mesh_2d(2, 4)
    img_s = jax.device_put(img, spatial_sharding(mesh))
    z_s = jax.device_put(z, NamedSharding(mesh, P("data")))
    c_s = jax.device_put(c, NamedSharding(mesh, P("data")))
    params_s = jax.device_put(state.params, NamedSharding(mesh, P()))
    out = m._forward_random_jit(params_s, img_s, z_s, c_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
