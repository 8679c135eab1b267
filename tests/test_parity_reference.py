"""Numerics parity against the PyTorch reference (SURVEY.md §7 milestone 5).

Every test instantiates a reference network (/root/reference/src/models/core/
networks.py), ports its weights through tools/port_reference.py, runs IDENTICAL
inputs through both frameworks with sampling disabled, and asserts the outputs
agree. A final group compares full D / G-phase-1 / G-phase-2 loss values
against the reference model's own backward_* code with injected z, plus a
torch-Adam vs optax-chain update equivalence check.

Runs on CPU (torch CPU wheel is installed; torchvision is stubbed out since
only the VGG loss needs it and that path is not exercised here).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/src"


def _install_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # loss.py / model.py import torchvision (absent here); stub the modules —
    # only the untested pretrained-VGG path touches their attributes.
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.models", "torchvision.models.vgg"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.models"].vgg = sys.modules["torchvision.models.vgg"]


_install_reference()

# The reference is CUDA-only in places (`tensor.to(x.get_device())` with
# get_device() == -1 on CPU, loss.py:59-62, misc.py:25). Make get_device()
# CPU-safe so the loss-parity tests can run the reference's own code paths.
_orig_get_device = torch.Tensor.get_device


def _cpu_safe_get_device(self):
    d = _orig_get_device(self)
    return "cpu" if isinstance(d, int) and d < 0 else d


torch.Tensor.get_device = _cpu_safe_get_device

from models.core import networks as ref_nets  # noqa: E402  (reference)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from masterthesis_tpu.models import networks as my_nets  # noqa: E402
from masterthesis_tpu.tools.port_reference import import_net_params  # noqa: E402

B, H, IMG_C, DIM, LAT, DOM = 2, 64, 3, 16, 8, 4
CONTENT_C = DIM * 4  # content encoder output channels


def _rng():
    return np.random.default_rng(0)


def _sd(net) -> dict:
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _nhwc(t: "torch.Tensor") -> np.ndarray:
    a = t.detach().numpy()
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def _run_mine(module, torch_net, inputs_nhwc, **apply_kwargs):
    """Init the flax module, overwrite params with the ported torch weights,
    and apply."""
    variables = module.init(jax.random.PRNGKey(0), *inputs_nhwc, **apply_kwargs)
    params = import_net_params(module, torch_net.state_dict())
    jax.tree.map(  # structure + shape check
        lambda a, b: np.testing.assert_equal(np.shape(a), np.shape(b)),
        variables["params"], params,
    )
    return module.apply({"params": params}, *inputs_nhwc, **apply_kwargs)


def _assert_close(torch_out, jax_out, atol=1e-4, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(jax_out), _nhwc(torch_out), atol=atol, rtol=rtol)


@pytest.fixture(scope="module")
def data():
    r = _rng()
    img = r.uniform(-1, 1, (B, IMG_C, H, H)).astype(np.float32)
    c = np.eye(DOM, dtype=np.float32)[r.integers(0, DOM, B)]
    z = r.normal(size=(B, LAT)).astype(np.float32)
    content = r.normal(size=(B, CONTENT_C, H // 4, H // 4)).astype(np.float32)
    return {
        "img_t": torch.from_numpy(img), "img_j": jnp.asarray(img.transpose(0, 2, 3, 1)),
        "c_t": torch.from_numpy(c), "c_j": jnp.asarray(c),
        "z_t": torch.from_numpy(z), "z_j": jnp.asarray(z),
        "content_t": torch.from_numpy(content),
        "content_j": jnp.asarray(content.transpose(0, 2, 3, 1)),
    }


def test_content_encoder_parity(data):
    torch.manual_seed(0)
    ref = ref_nets.ContentEncoder(IMG_C, dim=DIM, norm_layer="instance").eval()
    mine = my_nets.ContentEncoder(dim=DIM)
    with torch.no_grad():
        want = ref(data["img_t"])
    got = _run_mine(mine, ref, (data["img_j"],))
    _assert_close(want, got)


def test_style_encoder_parity(data):
    torch.manual_seed(1)
    ref = ref_nets.StyleEncoder(
        IMG_C, output_dim=LAT, dim=DIM, num_domains=DOM, activation="lrelu"
    ).eval()
    mine = my_nets.StyleEncoder(output_dim=LAT, dim=DIM, num_domains=DOM, activation="lrelu")
    with torch.no_grad():
        want = ref(data["img_t"], data["c_t"])
    got = _run_mine(mine, ref, (data["img_j"], data["c_j"]))
    _assert_close(want, got)


def test_reparam_style_encoder_parity(data):
    torch.manual_seed(2)
    ref = ref_nets.ReparameterizedStyleEncoder(
        IMG_C, output_dim=LAT, dim=DIM, num_domains=DOM, norm_layer=None, activation="lrelu"
    ).eval()
    mine = my_nets.ReparameterizedStyleEncoder(
        output_dim=LAT, dim=DIM, num_domains=DOM, norm=None, activation="lrelu"
    )
    with torch.no_grad():
        _, mu_t, logvar_t = ref(data["img_t"], data["c_t"])
    z, mu, logvar = _run_mine(mine, ref, (data["img_j"], data["c_j"]), sample=False)
    _assert_close(mu_t, mu)
    _assert_close(logvar_t, logvar)
    np.testing.assert_allclose(np.asarray(z), np.asarray(mu))  # sample=False -> mu


@pytest.mark.parametrize("up_type", ["transpose", "nearest"])
def test_decoder_parity(data, up_type):
    torch.manual_seed(3)
    ref = ref_nets.Decoder(
        IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT, up_type=up_type,
        norm_layer="layer", activation="relu",
    ).eval()
    mine = my_nets.Decoder(
        output_dim=IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT,
        up_type=up_type, norm="layer", activation="relu",
    )
    with torch.no_grad():
        want = ref(data["content_t"], data["z_t"], data["c_t"])
    got = _run_mine(mine, ref, (data["content_j"], data["z_j"], data["c_j"]))
    _assert_close(want, got)


def test_adain_decoder_parity(data):
    torch.manual_seed(4)
    ref = ref_nets.AdaINDecoder(
        IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT, up_type="transpose",
        norm_layer="layer",
    ).eval()
    mine = my_nets.AdaINDecoder(
        output_dim=IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT,
        up_type="transpose", norm="layer",
    )
    with torch.no_grad():
        want = ref(data["content_t"], data["z_t"], data["c_t"])
    got = _run_mine(mine, ref, (data["content_j"], data["z_j"], data["c_j"]))
    _assert_close(want, got)


def test_decoder_concat_parity(data):
    torch.manual_seed(5)
    ref = ref_nets.DecoderConcat(
        IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT, up_type="transpose",
        norm_layer="layer",
    ).eval()
    mine = my_nets.DecoderConcat(
        output_dim=IMG_C, dim=CONTENT_C, num_domains=DOM, latent_dim=LAT,
        up_type="transpose", norm="layer",
    )
    with torch.no_grad():
        want = ref(data["content_t"], data["z_t"], data["c_t"])
    got = _run_mine(mine, ref, (data["content_j"], data["z_j"], data["c_j"]))
    _assert_close(want, got)


def test_discriminator_parity(data):
    torch.manual_seed(6)
    ref = ref_nets.Discriminator(
        IMG_C, dim=DIM, n_layers=6, num_domains=DOM, norm_layer=None, image_size=H
    ).eval()
    mine = my_nets.Discriminator(
        dim=DIM, n_layers=6, num_domains=DOM, norm=None, image_size=H
    )
    with torch.no_grad():
        patch_t, cls_t = ref(data["img_t"])
    patch, cls = _run_mine(mine, ref, (data["img_j"],))
    _assert_close(patch_t, patch)
    _assert_close(cls_t, cls)


def test_content_discriminator_parity(data):
    torch.manual_seed(7)
    ref = ref_nets.ContentDiscriminator(dim=CONTENT_C, num_domains=DOM).eval()
    mine = my_nets.ContentDiscriminator(dim=CONTENT_C, num_domains=DOM)
    x_t = torch.from_numpy(_rng().normal(size=(B, CONTENT_C, H, H)).astype(np.float32))
    x_j = jnp.asarray(_nhwc(x_t))
    with torch.no_grad():
        want = ref(x_t)
    got = _run_mine(mine, ref, (x_j,))
    _assert_close(want, got)


def test_multiscale_discriminator_parity(data):
    torch.manual_seed(8)
    ref = ref_nets.MultiScaleDiscriminator(
        IMG_C, dim=DIM, n_layers=4, num_domains=DOM, norm_layer=None, num_scales=3
    ).eval()
    mine = my_nets.MultiScaleDiscriminator(
        dim=DIM, n_layers=4, num_domains=DOM, norm=None, num_scales=3
    )
    with torch.no_grad():
        want = ref(data["img_t"])
    got = _run_mine(mine, ref, (data["img_j"],))
    assert len(want) == len(got) == 3
    for (patch_t, cls_t), (patch, cls) in zip(want, got):
        _assert_close(patch_t, patch)
        _assert_close(cls_t, cls)


def test_resnet_generator_parity(data):
    torch.manual_seed(9)
    ref = ref_nets.ResnetGenerator(
        IMG_C, IMG_C, dim=DIM, num_downs=2, norm_layer="instance",
        activation="relu", padding_type="reflect",
    ).eval()
    # the reference never builds its resnet blocks (n_blocks unused) -> 0 here
    mine = my_nets.ResnetGenerator(
        output_dim=IMG_C, dim=DIM, num_downs=2, n_blocks=0, norm="instance",
        activation="relu", padding_type="reflect",
    )
    with torch.no_grad():
        want = ref(data["img_t"])
    got = _run_mine(mine, ref, (data["img_j"],))
    _assert_close(want, got)


# --------------------------------------------------------------------------- #
# full loss parity: reference backward_* vs this framework's loss methods
# --------------------------------------------------------------------------- #
def _ref_model(tmp_path, model_name="AdaINModel", **over):
    from types import SimpleNamespace

    import models as ref_models  # reference package

    args = SimpleNamespace(
        latent_dim=LAT, input_dim=IMG_C, dim=DIM, num_domains=DOM,
        enc_norm="instance", up_type="transpose", dec_norm="layer",
        use_dropout=False, mode="train", ms_dis=False, dis_norm=None,
        dis_sn=False, crop_size=H, use_dis_content=False, lr=1e-4, beta1=0.5,
        beta2=0.999, wd=1e-4, gan_mode="vanilla", use_ragan=False,
        vgg_loss=None, logdir=str(tmp_path), batch_size=B,
        lambda_cls=1.0, lambda_cls_G=5.0, lambda_rec=10.0,
        reparam=True, concat=False, num_scales=3, d_iter=3,
    )
    for k, v in over.items():
        setattr(args, k, v)
    torch.manual_seed(42)
    model = getattr(ref_models, model_name)(args)
    # nets live in a plain AttributeDict (not registered submodules), so
    # .eval() must be applied per net: disables the content noise layer.
    for name in model.model:
        model.model[name].eval()
    return model, args


def _my_model(model_name="AdaINModel", **over):
    import masterthesis_tpu.models as my_models
    from masterthesis_tpu.arguments import default_train_args

    args = default_train_args(
        dim=DIM, latent_dim=LAT, num_domains=DOM, crop_size=H, batch_size=B,
        mode="train", gan_mode="vanilla", reparam=True, concat=False,
        use_dis_content=False, lambda_cls=1.0, lambda_cls_G=5.0, lambda_rec=10.0,
    )
    args.update(over)
    return getattr(my_models, model_name)(args)


def _loss_parity_case(tmp_path, model_name, ref_over, my_over, check_zreg=True):
    """Run one full loss-value comparison: reference optimize_parameters with
    lr=0 (values recorded, no weight change) vs this framework's loss fns."""
    ref, ref_args = _ref_model(tmp_path, model_name, **ref_over)
    mine = _my_model(model_name, **my_over)
    state = mine.initialize()
    params = {
        name: import_net_params(mine.nets[name], ref.model[name].state_dict())
        for name in mine.nets
    }
    jax.tree.map(lambda a, b: None, dict(state.params), params)  # structure check

    r = _rng()
    x1 = r.uniform(-1, 1, (B, IMG_C, H, H)).astype(np.float32)
    x2 = r.uniform(-1, 1, (B, IMG_C, H, H)).astype(np.float32)
    y1 = np.eye(DOM, dtype=np.float32)[[0, 1]]
    y2 = np.eye(DOM, dtype=np.float32)[[2, 3]]
    z_sr = r.normal(size=(B, LAT)).astype(np.float32)

    # ---- reference side: deterministic z, zero-lr optimizers ---- #
    ref.get_z_random = lambda bs, dim: torch.from_numpy(z_sr)
    ref_nets.ReparameterizedStyleEncoder.reparameterize = lambda self, mu, logvar: mu
    for name in ref.optimizer:
        for g in ref.optimizer[name].param_groups:
            g["lr"] = 0.0
    d_records = []
    orig_backward_d = ref.backward_discriminator

    def record_d(netD, real, fake, c_org):
        orig_backward_d(netD, real, fake, c_org)
        d_records.append({k: ref.loss[k] for k in ("d_adv", "d_cls", "d_total")})

    ref.backward_discriminator = record_d
    ref.set_inputs({
        "x1": torch.from_numpy(x1), "x2": torch.from_numpy(x2),
        "y1": torch.from_numpy(y1), "y2": torch.from_numpy(y2),
    })
    # Only loss VALUES are compared (weights frozen via lr=0), so skip the
    # torch backward pass. This is also load-bearing for the BaseModel
    # non-concat config: the reference's DecResnetBlock does `out += residual`
    # in place on a ReLU output (blocks.py:207), which torch autograd rejects —
    # that reference config cannot train at all as written upstream.
    orig_backward = torch.Tensor.backward
    torch.Tensor.backward = lambda self, *a, **k: None
    try:
        ref.optimize_parameters(0)
    finally:
        torch.Tensor.backward = orig_backward

    # ---- this framework, same weights/inputs/z ---- #
    img = jnp.asarray(np.concatenate([x1, x2]).transpose(0, 2, 3, 1))
    c_org = jnp.asarray(np.concatenate([y1, y2]))
    z_j = jnp.asarray(z_sr)
    img_fake, img_random = mine._make_d_fakes(params, {}, img, c_org, B, z_j, None, train=False)
    _, d1 = mine._d_loss("discriminator1", params["discriminator1"], params, {}, img, img_fake, c_org)
    _, d2 = mine._d_loss("discriminator2", params["discriminator2"], params, {}, img, img_random, c_org)
    _, g1 = mine._g1_loss(params, {}, img, c_org, B, None, {}, train=False)
    _, g2 = mine._g2_loss(params, {}, img, c_org, B, z_j, None, {}, train=False)

    tol = dict(rtol=2e-3, atol=2e-4)
    for rec, logs in zip(d_records, (d1, d2)):
        for key in ("d_adv", "d_cls", "d_total"):
            np.testing.assert_allclose(float(logs[key]), rec[key], **tol, err_msg=key)
    for key in ("g_adv", "g_cls", "kl_zc", "kl_zs", "l1_self_rec", "l1_cc_rec", "total_g"):
        np.testing.assert_allclose(float(g1[key]), ref.loss[key], **tol, err_msg=key)
    for key in ("gan2", "gan2_cls"):
        np.testing.assert_allclose(float(g2[key]), ref.loss[key], **tol, err_msg=key)
    if check_zreg:
        np.testing.assert_allclose(
            float(g2["l1_recon_z"]), ref.loss["l1_recon_z"], **tol, err_msg="l1_recon_z"
        )
    return ref, mine, params, img, c_org, z_j


def test_loss_parity_adain_vanilla(tmp_path):
    """Flagship config: AdaINModel, vanilla GAN, reparam VAE KL."""
    _loss_parity_case(tmp_path, "AdaINModel", {}, {})


def test_loss_parity_base_lsgan_ragan(tmp_path):
    """BaseModel, non-reparam, lsgan + ragan — exercises the ragan /2 form,
    the D1/D2 selection quirk, and the documented latent-regression divergence
    (the reference reuses z_sr_a for both halves, base_model.py:420)."""
    ref, mine, params, img, c_org, z_j = _loss_parity_case(
        tmp_path, "BaseModel",
        dict(gan_mode="lsgan", use_ragan=True, reparam=False),
        dict(gan_mode="lsgan", use_ragan=True, reparam=False),
        check_zreg=False,
    )
    # reproduce the reference's buggy value exactly: 2 * l1(z_rec_a, z_sr) * 10
    from masterthesis_tpu.models import losses as L

    z_c = mine.encode_content(params, {}, img, train=False)
    dec = mine.decode(
        params, jnp.concatenate([z_c[B:], z_c[:B]]), jnp.concatenate([z_j, z_j]), c_org
    )
    z_rec, _, _ = mine.encode_style(params, dec, c_org, train=False)
    buggy = float(2 * L.l1_loss(z_rec[:B], z_j) * 10)
    np.testing.assert_allclose(buggy, ref.loss["l1_recon_z"], rtol=2e-3, atol=2e-4)


def test_loss_parity_hinge(tmp_path):
    """Hinge D/G forms (base_model.py:234-235, 324-326)."""
    _loss_parity_case(
        tmp_path, "AdaINModel", dict(gan_mode="hinge"), dict(gan_mode="hinge")
    )


def test_content_discriminator_loss_parity(tmp_path):
    """Content-D update loss + generator confusion loss (base_model.py:158-166,
    backward_content_discriminator)."""
    torch.manual_seed(11)
    ref = ref_nets.ContentDiscriminator(dim=CONTENT_C, num_domains=DOM).eval()
    mine = my_nets.ContentDiscriminator(dim=CONTENT_C, num_domains=DOM)
    params = import_net_params(mine, ref.state_dict())
    r = _rng()
    z_c = r.normal(size=(2 * B, CONTENT_C, H, H)).astype(np.float32)
    c_org = np.eye(DOM, dtype=np.float32)[[0, 1, 2, 3]]
    with torch.no_grad():
        pred_t = ref(torch.from_numpy(z_c))
        bce = torch.nn.BCEWithLogitsLoss()
        want_d = float(bce(pred_t, torch.from_numpy(c_org)))
        want_g = float(bce(pred_t, torch.from_numpy(1.0 - c_org)))
    from masterthesis_tpu.models import losses as L

    pred = mine.apply({"params": params}, jnp.asarray(z_c.transpose(0, 2, 3, 1)))
    got_d = float(L.bce_logits_loss(pred, jnp.asarray(c_org)))
    got_g = float(L.bce_logits_loss(pred, jnp.asarray(1.0 - c_org)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3)
    np.testing.assert_allclose(got_g, want_g, rtol=1e-3)


def test_adam_update_parity():
    """torch.optim.Adam(lr, (0.5, 0.999), wd=1e-4) == make_optimizer chain
    over several steps on identical params/grads."""
    from masterthesis_tpu.models.functions import apply_updates, make_optimizer

    r = _rng()
    w0 = r.normal(size=(5, 3)).astype(np.float32)
    grads = [r.normal(size=(5, 3)).astype(np.float32) for _ in range(4)]

    w_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([w_t], lr=1e-3, betas=(0.5, 0.999), weight_decay=1e-4)
    for g in grads:
        opt.zero_grad()
        w_t.grad = torch.from_numpy(g.copy())
        opt.step()  # torch couples wd*param into the grad internally

    tx = make_optimizer(beta1=0.5, beta2=0.999, weight_decay=1e-4)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in grads:
        params, opt_state = apply_updates(tx, jnp.asarray(g), opt_state, params, jnp.float32(1e-3))
    np.testing.assert_allclose(np.asarray(params), w_t.detach().numpy(), atol=1e-6)
