"""Shape & contract tests for all networks (SURVEY.md §2 rows 13-22)."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.models import networks as N

K = jax.random.PRNGKey


def test_content_encoder_output_contract():
    ce = N.ContentEncoder(dim=8)
    x = jnp.ones((2, 32, 32, 3))
    v = ce.init(K(0), x)
    y = ce.apply(v, x)
    assert y.shape == (2, 8, 8, 32)
    assert ce.output_dim == 32
    # train mode adds noise
    y_train = ce.apply(v, x, deterministic=False, rngs={"noise": K(1)})
    assert float(jnp.mean(jnp.abs(y_train - y))) > 0.1


def test_style_encoders():
    x = jnp.ones((2, 32, 32, 3))
    c = jax.nn.one_hot(jnp.array([0, 3]), 4)
    se = N.StyleEncoder(output_dim=8, dim=8, num_domains=4)
    v = se.init(K(0), x, c)
    assert se.apply(v, x, c).shape == (2, 8)

    rse = N.ReparameterizedStyleEncoder(output_dim=8, dim=8, num_domains=4)
    v = rse.init(K(0), x, c)
    z, mu, logvar = rse.apply(v, x, c, rngs={"reparam": K(1)})
    assert z.shape == mu.shape == logvar.shape == (2, 8)
    # deterministic path returns mu
    z2, mu2, _ = rse.apply(v, x, c, sample=False)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(mu2))
    # same rng -> same sample; different rng -> different
    z3, _, _ = rse.apply(v, x, c, rngs={"reparam": K(1)})
    np.testing.assert_allclose(np.asarray(z), np.asarray(z3))
    z4, _, _ = rse.apply(v, x, c, rngs={"reparam": K(2)})
    assert float(jnp.max(jnp.abs(z4 - z))) > 1e-6


def test_decoders_reconstruct_image_shape():
    zc = jnp.ones((2, 8, 8, 32))
    z = jnp.ones((2, 8))
    c = jax.nn.one_hot(jnp.array([1, 2]), 4)
    for cls in (N.Decoder, N.AdaINDecoder, N.DecoderConcat):
        dec = cls(output_dim=3, dim=32, num_domains=4)
        v = dec.init(K(0), zc, z, c)
        y = dec.apply(v, zc, z, c)
        assert y.shape == (2, 32, 32, 3), cls.__name__
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head


def test_decoder_style_actually_modulates_output():
    zc = jax.random.normal(K(0), (1, 8, 8, 32))
    c = jax.nn.one_hot(jnp.array([0]), 4)
    dec = N.AdaINDecoder(output_dim=3, dim=32, num_domains=4)
    v = dec.init(K(1), zc, jnp.zeros((1, 8)), c)
    y1 = dec.apply(v, zc, jnp.zeros((1, 8)), c)
    y2 = dec.apply(v, zc, jnp.ones((1, 8)) * 2.0, c)
    assert float(jnp.mean(jnp.abs(y1 - y2))) > 1e-4


def test_discriminator_heads():
    x = jnp.ones((2, 64, 64, 3))
    dis = N.Discriminator(dim=8, num_domains=4, image_size=64)
    v = dis.init(K(0), x)
    patch, cls = dis.apply(v, x)
    assert patch.shape == (2, 3, 3, 1)  # 1x1 map padded by 1
    assert cls.shape == (2, 4)


def test_discriminator_spectral_norm_collection():
    x = jnp.ones((1, 64, 64, 3))
    dis = N.Discriminator(dim=8, num_domains=4, image_size=64, sn=True)
    v = dis.init(K(0), x)
    assert "spectral" in v
    out, mut = dis.apply(v, x, mutable=["spectral"])
    # power-iteration u vectors updated
    flat_before = jax.tree.leaves(v["spectral"])
    flat_after = jax.tree.leaves(mut["spectral"])
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(flat_before, flat_after)
    )


def test_content_discriminator_reference_geometry():
    # default geometry: 3x(conv7 s2 p1) + conv4 valid on a 64px content map
    cd = N.ContentDiscriminator(dim=16, num_domains=4)
    x = jnp.ones((1, 64, 64, 16))
    v = cd.init(K(0), x)
    assert cd.apply(v, x).shape == (1, 4)


def test_multiscale_discriminator_scales():
    ms = N.MultiScaleDiscriminator(dim=8, n_layers=4, num_domains=4, num_scales=3)
    x = jnp.ones((2, 64, 64, 3))
    v = ms.init(K(0), x)
    outs = ms.apply(v, x)
    assert len(outs) == 3
    hw = [o[0].shape[1] for o in outs]
    assert hw[0] == 2 * hw[1]  # each scale halves the input
    for _, cls in outs:
        assert cls.shape == (2, 4)


def test_resnet_generator():
    rg = N.ResnetGenerator(output_dim=3, dim=8, n_blocks=2, norm="instance",
                           activation="relu", padding_type="reflect")
    x = jnp.ones((1, 16, 16, 3))
    v = rg.init(K(0), x)
    assert rg.apply(v, x).shape == (1, 16, 16, 3)
