"""Golden-step integration tests: one/few train iterations on tiny configs
(SURVEY.md §4 plan item c)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from masterthesis_tpu.models import AdaINModel, BaseModel

from conftest import make_batch, tiny_train_args


def _snapshot(tree):
    """Host copy — the jitted steps donate the state, so device buffers from
    the previous state are invalidated after each optimize_parameters call."""
    return jax.tree.map(np.asarray, tree)


def _changed(a, b):
    return any(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y)))) > 0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_adain_model_main_and_content_steps():
    args = tiny_train_args(use_dis_content=True)
    m = AdaINModel(args)
    state = m.initialize()
    batch = make_batch()
    rng = jax.random.PRNGKey(7)

    old_params = _snapshot(state.params)
    state, logs = m.optimize_parameters(state, batch, 0, rng)  # it%3==0 -> main
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    for name in ("content_encoder", "style_encoder", "decoder",
                 "discriminator1", "discriminator2"):
        assert _changed(old_params[name], state.params[name]), name
    # content discriminator only updates on off-iterations
    assert not _changed(old_params["content_discriminator"], state.params["content_discriminator"])

    old_params = _snapshot(state.params)
    state, logs = m.optimize_parameters(state, batch, 1, rng)  # it%3!=0 -> content D
    assert "d_content_cls" in logs
    assert _changed(old_params["content_discriminator"], state.params["content_discriminator"])
    assert not _changed(old_params["decoder"], state.params["decoder"])
    assert int(state.step) == 2


def test_adain_reconstruction_improves():
    """Self/cross-cycle L1 should drop over a few steps on a fixed batch."""
    args = tiny_train_args(use_dis_content=False, lr=4e-4)
    m = AdaINModel(args)
    state = m.initialize()
    batch = make_batch()
    first = last = None
    for it in range(8):
        state, logs = m.optimize_parameters(state, batch, it, jax.random.fold_in(jax.random.PRNGKey(0), it))
        rec = float(logs["l1_self_rec"]) + float(logs["l1_cc_rec"])
        if first is None:
            first = rec
        last = rec
    assert last < first, (first, last)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(reparam=False, concat=False, gan_mode="lsgan"),
        dict(reparam=True, concat=True, gan_mode="vanilla"),
    ],
    ids=["plain-lsgan", "reparam-concat"],
)
def test_base_model_variants(kwargs):
    args = tiny_train_args(**kwargs)
    m = BaseModel(args)
    state = m.initialize()
    state, logs = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(3))
    assert all(np.isfinite(float(v)) for v in logs.values())
    assert int(state.step) == 1


def test_hinge_and_ragan_modes_finite():
    for extra in (dict(gan_mode="hinge"), dict(use_ragan=True)):
        args = tiny_train_args(**extra)
        m = AdaINModel(args)
        state = m.initialize()
        state, logs = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(4))
        assert all(np.isfinite(float(v)) for v in logs.values()), extra


def test_multiscale_and_spectral_norm():
    # dis_n_layers=3 so the shared trunk doesn't collapse to 0px at 32px crops
    args = tiny_train_args(ms_dis=True, num_scales=2, dis_sn=True, dis_n_layers=3)
    m = AdaINModel(args)
    state = m.initialize()
    u_before = _snapshot(jax.tree.leaves(state.extra["discriminator1"]))
    state, logs = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(5))
    assert all(np.isfinite(float(v)) for v in logs.values())
    u_after = _snapshot(jax.tree.leaves(state.extra["discriminator1"]))
    assert any(float(np.max(np.abs(a - b))) > 0 for a, b in zip(u_before, u_after))


def test_lr_schedule_applied():
    args = tiny_train_args(lr=1e-3, lr_policy="step", n_iter_decay=2)
    m = AdaINModel(args)
    state = m.initialize()
    batch = make_batch()
    state, logs = m.optimize_parameters(state, batch, 0, jax.random.PRNGKey(0))
    assert abs(float(logs["lr"]) - 1e-3) < 1e-9
    state, logs = m.optimize_parameters(state, batch, 3, jax.random.PRNGKey(1))
    # step counter is 1 -> still first decay window; after 2 -> 1e-4
    state, logs = m.optimize_parameters(state, batch, 6, jax.random.PRNGKey(2))
    assert abs(float(logs["lr"]) - 1e-4) < 1e-9


def test_forward_paths_deterministic_content():
    args = tiny_train_args()
    m = AdaINModel(args)
    state = m.initialize()
    img = make_batch()["x1"]
    z = m.get_z_random(jax.random.PRNGKey(0), 2)
    c = jax.nn.one_hot(jnp.array([0, 1]), 4)
    out1, _, _ = m.forward_random(state, img, z, c)
    out2, _, _ = m.forward_random(state, img, z, c)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    assert out1.shape == img.shape


def test_remat_matches_baseline():
    """--remat must not change the math, only the backward memory profile."""
    batch = make_batch()
    logs = {}
    for remat in (False, True):
        args = tiny_train_args(remat=remat)
        m = AdaINModel(args)
        state = m.initialize()
        state, l = m.optimize_parameters(state, batch, 0, jax.random.PRNGKey(9))
        logs[remat] = {k: float(v) for k, v in l.items()}
    for k in logs[False]:
        assert abs(logs[False][k] - logs[True][k]) < 1e-4, k


def test_wgangp_gradient_penalty():
    """wgangp with --lambda_gp: penalty logged, step finite (an enhancement —
    the reference exposes wgangp with no penalty term)."""
    args = tiny_train_args(gan_mode="wgangp", lambda_gp=10.0)
    m = AdaINModel(args)
    state = m.initialize()
    state, logs = m.optimize_parameters(state, make_batch(), 0, jax.random.PRNGKey(11))
    assert "d_gp" in logs
    assert np.isfinite(float(logs["d_gp"])) and float(logs["d_gp"]) > 0
    assert all(np.isfinite(float(v)) for v in logs.values())
