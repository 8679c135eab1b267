"""Closed-form unit tests for every loss (SURVEY.md §4 plan item b)."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.models import losses as L


def test_bce_logits_matches_formula():
    logits = jnp.array([0.0, 2.0, -3.0])
    targets = jnp.array([1.0, 0.0, 1.0])
    expected = np.mean(
        [np.log(2.0), 2.0 + np.log1p(np.exp(-2.0)), 3.0 + np.log1p(np.exp(-3.0))]
    )
    assert abs(float(L.bce_logits_loss(logits, targets)) - expected) < 1e-5


def test_gan_loss_modes():
    pred = jnp.array([1.0, -1.0])
    # vanilla on real: BCEWithLogits vs ones
    v = float(L.gan_loss(pred, True, "vanilla"))
    expected = np.mean([np.log1p(np.exp(-1.0)), 1.0 + np.log1p(np.exp(-1.0))])
    assert abs(v - expected) < 1e-5
    # lsgan: MSE vs zeros
    assert abs(float(L.gan_loss(pred, False, "lsgan")) - 1.0) < 1e-5
    # wgangp
    assert abs(float(L.gan_loss(pred, True, "wgangp")) - 0.0) < 1e-5
    assert abs(float(L.gan_loss(jnp.array([2.0]), False, "wgangp")) - 2.0) < 1e-5


def test_hinge_losses():
    real = jnp.array([0.5, 2.0])
    fake = jnp.array([-2.0, 0.0])
    d = float(L.hinge_d_loss(real, fake))
    assert abs(d - (np.mean([0.5, 0.0]) + np.mean([0.0, 1.0]))) < 1e-5
    assert abs(float(L.hinge_g_loss(fake)) - 1.0) < 1e-5


def test_ragan_directions_differ():
    real = jnp.array([1.0, 2.0])
    fake = jnp.array([-1.0, 0.0])
    d_loss = float(L.ragan_loss(real, fake, True, "vanilla"))
    g_loss = float(L.ragan_loss(real, fake, False, "vanilla"))
    assert d_loss < g_loss  # D favors real>fake which is already true


def test_kl_divergence_closed_form():
    mu = jnp.array([[0.0, 1.0]])
    logvar = jnp.array([[0.0, 0.0]])
    # -0.5 * sum(1 + 0 - mu^2 - 1) = 0.5 * sum(mu^2) = 0.5
    assert abs(float(L.kl_divergence(mu, logvar)) - 0.5) < 1e-5
    # standard normal has zero KL
    assert abs(float(L.kl_divergence(jnp.zeros((3, 2)), jnp.zeros((3, 2))))) < 1e-5


def test_l2_regularize_and_l1():
    x = jnp.array([1.0, -2.0])
    assert abs(float(L.l2_regularize(x)) - 2.5) < 1e-5
    assert abs(float(L.l1_loss(x, jnp.zeros(2))) - 1.5) < 1e-5


def test_vgg_layer_names_match_reference():
    names = L.vgg_layer_names("vgg19")
    # spot-check against reference loss.py:27-32
    assert names[0] == "conv1_1" and names[1] == "relu1_1"
    assert "conv5_4" in names and names[-1] == "pool5"
    assert len(names) == 37
    names11 = L.vgg_layer_names("vgg11")
    assert names11[:3] == ["conv1_1", "relu1_1", "pool1"]


def test_vgg_perceptual_loss_runs_and_grads():
    loss_mod = L.VGGPerceptualLoss(layers=("conv2_1",), layer_weights=(1.0,), vgg_type="vgg11")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    variables = loss_mod.init(jax.random.PRNGKey(2), x, y)
    val = loss_mod.apply(variables, x, y)
    assert np.isfinite(float(val)) and float(val) > 0
    # same image -> zero loss
    assert abs(float(loss_mod.apply(variables, x, x))) < 1e-5
    # gradient flows to the input (unlike the reference's detached version)
    g = jax.grad(lambda xx: loss_mod.apply(variables, xx, y))(x)
    assert float(jnp.abs(g).sum()) > 0
