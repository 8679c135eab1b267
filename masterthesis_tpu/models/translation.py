"""Disentangled content/style translation model — shared GAN+VAE train logic.

This is the TPU-native re-design of the reference's BaseModel/AdaINModel
optimization (src/models/base_model.py:99-470, adain_model.py:83-430):

- The reference runs 5+ separate zero_grad/backward/step passes per iteration
  through torch autograd. Here the ENTIRE iteration — D1 update, D2 update,
  G phase 1 (enc+style+dec), G phase 2 (enc+dec) — is ONE jitted, donated
  function (`_main_step`); the content-discriminator off-iteration is a second
  jitted function (`_content_step`). No Python runs between device ops.
- `.detach()` becomes `jax.lax.stop_gradient`; `retain_graph` disappears —
  each phase is an independent `jax.value_and_grad` over its parameter subset.
- All call-site torch RNG (z_random, VAE eps, content noise) is explicit
  `jax.random` key threading.
- Decoder calls that the reference issues per-direction are fused into single
  4b-batch calls (per-sample norms make this exact) to keep the MXU busy.

Update-schedule parity (base_model.py:461-470): on iterations where
``use_dis_content`` and ``it % d_iter != 0`` only the content discriminator
updates (with grad-clip 5 and lr/2.5, base_model.py:79-87,165); otherwise
D1, D2, G-phase1, G-phase2 all update in order, with G seeing the
just-updated discriminators.

Documented divergences from the reference (intentional, see SURVEY.md §7):
- non-reparam latent regression uses both a and b halves
  (base_model.py:420 reuses `z_sr_a` for both — a bug);
- `loss_dc` is logged as ``d_content_cls`` (the reference stores it on an
  attribute that never reaches tensorboard, base_model.py:164);
- perceptual loss keeps its gradient (reference loss.py:133 detaches it).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from masterthesis_tpu.models import losses as L
from masterthesis_tpu.models.functions import apply_updates
from masterthesis_tpu.models.model import Model
from masterthesis_tpu.models.state import TrainState

GEN_NETS = ("content_encoder", "style_encoder", "decoder")


class TranslationModel(Model):
    """Shared logic; subclasses pick encoders/decoders (reparam flag etc.)."""

    #: whether the style encoder is VAE-reparameterized (set by subclass)
    reparam: bool = True

    def __init__(self, args):
        super().__init__(args)
        self.latent_dim = args.latent_dim
        self.perceptual = None
        self.perceptual_params = {}
        if self._is_train() and getattr(args, "vgg_loss", None) is not None:
            self.perceptual = L.VGGPerceptualLoss(
                layers=tuple(args.vgg_layers),
                layer_weights=tuple(args.layer_weights),
                vgg_type=args.vgg_type,
                loss_fn=args.vgg_loss,
                norm_feat=getattr(args, "norm_feat", False),
            )
        self.print_loss = ["g_adv", "g_cls", "l1_cc_rec"]
        if getattr(args, "vgg_loss", None) is not None:
            self.print_loss += ["g_p", "g_p2"]
        step_impl = (
            self._main_step_fused_impl
            if getattr(args, "gan_step", "reference") == "fused"
            else self._main_step_impl
        )
        self._main_step = jax.jit(step_impl, donate_argnums=0)
        self._content_step = jax.jit(self._content_step_impl, donate_argnums=0)
        # --fused_resblock: route eligible training resblocks through the
        # differentiable whole-block Pallas kernel (resblock_bf16.py). Only
        # the MAIN step body — the content step's encoder forward is
        # stop-gradient'd, so the kernel's saved residuals (h1/h2/stats)
        # would be pure extra HBM writes there.
        self._fused_train_enabled = (
            getattr(args, "fused_resblock", "auto") != "off"
        )
        # --int8_train state (see calibrate_quant_train / ops/qat.py)
        self._step_quant = None
        self._train_quant = None
        self._calib_pass = None
        if getattr(args, "int8_train", False):
            if getattr(args, "remat", False):
                raise ValueError(
                    "--int8_train is incompatible with --remat: the remat step "
                    "bypasses the quant plumbing (and remat measured slower anyway)"
                )
            from masterthesis_tpu.ops.qat import parse_qat_scope

            # stored per-model (not process-wide): two models with different
            # scopes in one process each trace with their own
            self._qat_scope = parse_qat_scope(
                getattr(args, "int8_train_scope", "all")
            )
        self._forward_jit = jax.jit(self._forward_impl)
        self._forward_random_jit = jax.jit(self._forward_random_impl)
        self._forward_reference_jit = jax.jit(self._forward_reference_impl)

    def init_perceptual(self, rng: Optional[jax.Array] = None, weights_path: Optional[str] = None):
        """Initialize (or load) the frozen VGG feature extractor params."""
        if self.perceptual is None:
            return
        shape = (1, int(self.args.crop_size), int(self.args.crop_size), int(self.args.input_dim))
        dummy = jnp.zeros(shape, jnp.float32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        variables = self.perceptual.init(rng, dummy, dummy)
        if weights_path:
            from masterthesis_tpu.models.losses import load_vgg_params

            vgg = load_vgg_params(weights_path, self.perceptual.layers, self.perceptual.vgg_type)
            variables = {"params": {"vgg": vgg["params"]}}
        self.perceptual_params = variables["params"]

    # ------------------------------------------------------------------ #
    # net application helpers
    # ------------------------------------------------------------------ #
    def _apply(self, name, params, extra, *args, rngs=None, mutable=False,
               quant=False, **kwargs):
        variables = {"params": params[name]}
        if extra is not None and extra.get(name):
            variables["spectral"] = extra[name]
        # int8 routing: quant=True is the SERVING path (self.quant_cols,
        # baked constants, non-differentiable kernels allowed); quant="train"
        # is the QAT path (--int8_train) — the amax tree arrives as a dynamic
        # jit argument via self._step_quant and only the straight-through
        # (differentiable) convs may engage (blocks.py routes quant convs
        # without fused prologue/stats through ops/qat.py).
        if quant == "train":
            quant_cols = getattr(self, "_step_quant", None)
        else:
            quant_cols = getattr(self, "quant_cols", None) if quant else None
        if quant_cols and quant_cols.get(name):
            # eligible convs route through the Pallas int8 kernel
            variables["quant"] = quant_cols[name]
        if mutable:
            # returns (out, {"spectral": new_u}); only valid when extra is set
            return self.nets[name].apply(
                variables, *args, rngs=rngs, mutable=["spectral"], **kwargs
            )
        return self.nets[name].apply(variables, *args, rngs=rngs, **kwargs)

    def encode_content(self, params, extra, img, rng=None, train=False, quant=False):
        rngs = {"noise": rng} if (train and rng is not None) else None
        if train and getattr(self, "_step_quant", None) is not None:
            # --int8_train: the step installed a dynamic amax tree
            quant = "train"
        if train and getattr(self.args, "remat", False):
            # rematerialize encoder activations in the backward pass
            # (jax.checkpoint: trade FLOPs for HBM at high resolution)
            net = self.nets["content_encoder"]

            def run(p, x, r):
                rr = {"noise": r} if r is not None else None
                return net.apply({"params": p}, x, deterministic=False, rngs=rr)

            return jax.checkpoint(run)(params["content_encoder"], img, rng)
        # the deferred-norm/packed serving chain is inference-only (its
        # kernels are non-differentiable) — never enabled under QAT
        serving = quant is True and bool(
            (getattr(self, "quant_cols", None) or {}).get("content_encoder")
        )
        return self._apply(
            "content_encoder", params, extra, img, deterministic=not train,
            rngs=rngs, quant=quant, serving=serving,
        )

    def encode_style(self, params, img, c, rng=None, train=False, sample=True):
        """Returns (z, mu, logvar); mu/logvar are None for the plain encoder."""
        if self.reparam:
            do_sample = sample and rng is not None
            rngs = {"reparam": rng} if do_sample else None
            z, mu, logvar = self._apply(
                "style_encoder", params, None, img, c, sample=do_sample, rngs=rngs
            )
            return z, mu, logvar
        z = self._apply("style_encoder", params, None, img, c)
        return z, None, None

    def decode(self, params, z_c, z, c, rng=None, train=False, quant=False):
        rngs = None
        if train and getattr(self, "_step_quant", None) is not None:
            quant = "train"  # --int8_train (see encode_content)
        use_dropout = getattr(self.args, "use_dropout", False)
        if train and rng is not None and use_dropout:
            rngs = {"dropout": rng}
        if train and getattr(self.args, "remat", False):
            net = self.nets["decoder"]

            def run(p, zc_, z_, c_, r):
                rr = {"dropout": r} if (use_dropout and r is not None) else None
                return net.apply({"params": p}, zc_, z_, c_, deterministic=False, rngs=rr)

            return jax.checkpoint(run)(params["decoder"], z_c, z, c, rng)
        return self._apply(
            "decoder", params, None, z_c, z, c, deterministic=not train,
            rngs=rngs, quant=quant,
        )

    def discriminate(self, params, extra, name, img):
        return self._apply(name, params, extra, img)

    def get_z_random(self, rng, batch_size):
        return jax.random.normal(rng, (batch_size, self.latent_dim), jnp.float32)

    # ------------------------------------------------------------------ #
    # int8 serving (post-training quantization)
    # ------------------------------------------------------------------ #
    def calibrate_int8(self, state, images, c_trgs=None, rng=None):
        """Calibrate per-conv activation ranges and switch inference to int8.

        Runs the content-encoder + decoder over the given calibration batches
        with the ``calib`` collection mutable (every Conv2d sows the running
        amax of its input), merges the ranges across batches, and installs
        them as the ``quant`` collection — after which every eligible 3x3
        conv in ``forward_random``/``forward_reference`` executes on the
        int8 MXU path (ops/pallas/conv_int8.py). The reference has no
        quantized serving; this is a TPU-native addition.

        images: iterable of NHWC batches (same preprocessing as training).
        Returns the installed quant collections (per net).
        """
        from masterthesis_tpu.models.quantize import extract_amax, merge_amax

        if rng is None:
            rng = jax.random.PRNGKey(0)
        num_domains = int(self.args.num_domains)
        cols = {"content_encoder": None, "decoder": None}

        # jitted calibration passes: un-jitted flax applies execute eagerly,
        # i.e. one device dispatch per op — minutes per batch through the
        # relay instead of one compiled call
        @jax.jit
        def calib_pass(params, img, z, c):
            z_c, cal_e = self.nets["content_encoder"].apply(
                {"params": params["content_encoder"]},
                img, deterministic=True, mutable=["calib"],
            )
            _, cal_d = self.nets["decoder"].apply(
                {"params": params["decoder"]},
                z_c, z, c, deterministic=True, mutable=["calib"],
            )
            # zero-size batches sow nothing; tolerate a missing collection
            return cal_e.get("calib", {}), cal_d.get("calib", {})

        contributed = 0
        for i, img in enumerate(images):
            img = jnp.asarray(img)
            b = img.shape[0]
            if b == 0:
                continue
            rng, kz, kc = jax.random.split(rng, 3)
            if c_trgs is not None:
                c = jnp.asarray(c_trgs[i])
            else:
                c = jax.nn.one_hot(
                    jax.random.randint(kc, (b,), 0, num_domains), num_domains
                )
            z = self.get_z_random(kz, b)
            cal_e, cal_d = calib_pass(state.params, img, z, c)
            if not cal_e and not cal_d:
                continue
            contributed += 1
            cols["content_encoder"] = merge_amax(cols["content_encoder"], cal_e)
            cols["decoder"] = merge_amax(cols["decoder"], cal_d)
        if contributed == 0:
            raise ValueError(
                "calibrate_int8: no calibration batch contributed activation "
                "ranges (all batches empty?) — int8 serving not enabled"
            )
        self.quant_cols = {
            k: extract_amax(v) for k, v in cols.items() if v
        }
        # re-trace the inference paths so the quant constants are baked in
        self._forward_jit = jax.jit(self._forward_impl)
        self._forward_random_jit = jax.jit(self._forward_random_impl)
        self._forward_reference_jit = jax.jit(self._forward_reference_impl)
        return self.quant_cols

    def disable_int8(self):
        """Back to the float inference path (re-traces the jits)."""
        self.quant_cols = None
        self._forward_jit = jax.jit(self._forward_impl)
        self._forward_random_jit = jax.jit(self._forward_random_impl)
        self._forward_reference_jit = jax.jit(self._forward_reference_impl)

    # ------------------------------------------------------------------ #
    # int8 training (QAT with delayed activation scaling)
    # ------------------------------------------------------------------ #
    def calibrate_quant_train(self, state, batch, rng=None):
        """Refresh the --int8_train activation ranges from a recent batch.

        Delayed scaling: the per-conv amax trees are measured on the current
        params/batch every ``--int8_calib_freq`` iterations (train.py) and
        consumed by the train step as DYNAMIC jit inputs, so a refresh never
        recompiles. One persistent jitted calibration pass (content-encoder +
        decoder forward with the ``calib`` collection mutable) is reused
        across refreshes — same structure, new values.
        """
        from masterthesis_tpu.models.quantize import extract_amax

        if rng is None:
            rng = jax.random.PRNGKey(int(jax.device_get(state.step)))
        if isinstance(batch, dict):
            img = batch.get("x1", batch.get("x"))
        else:
            img = batch
        img = jnp.asarray(img)
        if getattr(self, "_calib_pass", None) is None:

            @jax.jit
            def calib_pass(params, img, z, c):
                z_c, cal_e = self.nets["content_encoder"].apply(
                    {"params": params["content_encoder"]},
                    img, deterministic=True, mutable=["calib"],
                )
                _, cal_d = self.nets["decoder"].apply(
                    {"params": params["decoder"]},
                    z_c, z, c, deterministic=True, mutable=["calib"],
                )
                return cal_e.get("calib", {}), cal_d.get("calib", {})

            self._calib_pass = calib_pass
        b = img.shape[0]
        kz, kc = jax.random.split(rng)
        c = jax.nn.one_hot(
            jax.random.randint(kc, (b,), 0, int(self.args.num_domains)),
            int(self.args.num_domains),
        )
        cal_e, cal_d = self._calib_pass(state.params, img, self.get_z_random(kz, b), c)
        self._train_quant = {
            "content_encoder": extract_amax(cal_e),
            "decoder": extract_amax(cal_d),
        }
        return self._train_quant

    def disable_int8_train(self):
        """Back to plain bf16 training steps."""
        self._train_quant = None

    # ------------------------------------------------------------------ #
    # loss pieces
    # ------------------------------------------------------------------ #
    def _gradient_penalty(self, d_name, p, extra, real, fake, rng):
        """WGAN-GP interpolated gradient penalty (enhancement: the reference
        exposes gan_mode=wgangp but never adds the penalty, so the mode is
        unusable there; enabled here via --lambda_gp > 0)."""
        eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), jnp.float32)
        interp = eps * real.astype(jnp.float32) + (1.0 - eps) * fake.astype(jnp.float32)

        def d_scalar(x):
            out = self.discriminate(p, extra, d_name, x.astype(real.dtype))
            pred = out[0][0] if isinstance(out, list) else out[0]
            return jnp.sum(pred.astype(jnp.float32))

        grads = jax.grad(d_scalar)(interp)
        norms = jnp.sqrt(jnp.sum(jnp.square(grads), axis=(1, 2, 3)) + 1e-12)
        return jnp.mean(jnp.square(norms - 1.0))

    def _d_loss(self, d_name, d_params, params, extra, real, fake, c_org, rng=None,
                update_u=False):
        """Discriminator loss (reference backward_discriminator
        base_model.py:226-248 / backward_multi_scale_discriminator :207-224).

        With ``update_u`` the real-image forward also refreshes the
        spectral-norm power-iteration vectors, returned in the aux logs under
        ``_spectral`` — this folds the u update into the grad pass instead of
        costing an extra D forward per step."""
        a = self.args
        mode = a.gan_mode
        p = {**params, d_name: d_params}
        new_spectral = None
        # ONE forward over concat(fake, real) instead of two half-batch
        # forwards: the discriminators are per-sample (pure conv stacks /
        # instance norm, no cross-batch coupling), so splitting the logits
        # afterwards is exact — and at training batch sizes every D conv
        # runs at 2x the per-op batch, which is where the MXU efficiency is.
        # The spectral-norm u refresh (power iteration on W) is input-
        # independent, so folding it into the combined pass changes nothing.
        b_f = fake.shape[0]
        both = jnp.concatenate([fake, real.astype(fake.dtype)], axis=0)
        if getattr(a, "ms_dis", False):
            if update_u:
                outs_both, mut = self._apply(d_name, p, extra, both, mutable=True)
                new_spectral = mut["spectral"]
            else:
                outs_both = self.discriminate(p, extra, d_name, both)
            adv = sum(
                L.gan_loss(o[0][:b_f], False, mode) + L.gan_loss(o[0][b_f:], True, mode)
                for o in outs_both
            )
            cls = sum(L.bce_logits_loss(o[1][b_f:], c_org) for o in outs_both)
        else:
            if update_u:
                (pred_both, cls_both), mut = self._apply(
                    d_name, p, extra, both, mutable=True
                )
                new_spectral = mut["spectral"]
            else:
                pred_both, cls_both = self.discriminate(p, extra, d_name, both)
            pred_fake, pred_real = pred_both[:b_f], pred_both[b_f:]
            pred_real_cls = cls_both[b_f:]
            if getattr(a, "use_ragan", False):
                adv = L.ragan_loss(pred_real, pred_fake, True, mode)
            elif "hinge" in mode:
                adv = L.hinge_d_loss(pred_real, pred_fake)
            else:
                adv = L.gan_loss(pred_fake, False, mode) + L.gan_loss(pred_real, True, mode)
            cls = L.bce_logits_loss(pred_real_cls, c_org)
        total = adv + a.lambda_cls * cls
        logs = {"d_adv": adv, "d_cls": cls, "d_total": total}
        lambda_gp = float(getattr(a, "lambda_gp", 0.0) or 0.0)
        if "wgangp" in mode and lambda_gp > 0.0 and rng is not None:
            gp = self._gradient_penalty(d_name, p, extra, real, fake, rng)
            total = total + lambda_gp * gp
            logs["d_gp"] = gp
            logs["d_total"] = total
        if new_spectral is not None:
            logs["_spectral"] = jax.lax.stop_gradient(new_spectral)
        return total, logs

    def _g_adv_loss(self, params, extra, real, fake, c_org, d_fake, d_real=None):
        """Generator adversarial + classification terms
        (reference base_model.py:309-332 phase 1; :386-409 phase 2 with its
        discriminator selection quirks preserved via d_fake/d_real)."""
        a = self.args
        mode = a.gan_mode
        d_real = d_real or d_fake
        if getattr(a, "ms_dis", False):
            outs = self.discriminate(params, extra, d_fake, fake)
            adv = sum(L.gan_loss(o[0], True, mode) for o in outs)
            cls = sum(L.bce_logits_loss(o[1], c_org) for o in outs) * a.lambda_cls_G
        elif getattr(a, "use_ragan", False):
            pred_real, _ = self.discriminate(params, extra, d_real, real)
            pred_fake, pred_fake_cls = self.discriminate(params, extra, d_fake, fake)
            adv = L.ragan_loss(pred_real, pred_fake, False, mode)
            cls = L.bce_logits_loss(pred_fake_cls, c_org) * a.lambda_cls_G
        elif "hinge" in mode:
            pred_fake, pred_fake_cls = self.discriminate(params, extra, d_fake, fake)
            adv = L.hinge_g_loss(pred_fake)
            cls = L.bce_logits_loss(pred_fake_cls, c_org) * a.lambda_cls_G
        else:
            pred_fake, pred_fake_cls = self.discriminate(params, extra, d_fake, fake)
            adv = L.gan_loss(pred_fake, True, mode)
            cls = L.bce_logits_loss(pred_fake_cls, c_org) * a.lambda_cls_G
        return adv, cls

    def _perceptual_loss(self, aux_params, x, y):
        return self.perceptual.apply({"params": aux_params}, x, y)

    # ------------------------------------------------------------------ #
    # loss computations (extracted so the torch-parity suite can evaluate
    # them deterministically with train=False and injected z; ``ks`` may be
    # None, in which case all sampling paths are disabled)
    # ------------------------------------------------------------------ #
    def _make_d_fakes(self, params, extra, img, c_org, b, z_sr, ks, train=True):
        """Fake/random image pairs for the D updates (reference
        update_discriminator, base_model.py:168-197): the reference's two
        per-direction decoder calls are fused into one 4b-batch call (exact:
        all norms are per-sample)."""
        k = (lambda i: ks[i] if ks is not None else None)
        cls_a, cls_b = c_org[:b], c_org[b:]
        z_c = self.encode_content(params, extra, img, k(0), train=train)
        z_s, _, _ = self.encode_style(params, img, c_org, k(1), train=train)
        z_ca, z_cb = z_c[:b], z_c[b:]
        z_sa, z_sb = z_s[:b], z_s[b:]
        content = jnp.concatenate([z_cb, z_cb, z_ca, z_ca], axis=0)
        style = jnp.concatenate([z_sa, z_sr, z_sb, z_sr], axis=0).astype(z_s.dtype)
        trg = jnp.concatenate([cls_a, cls_a, cls_b, cls_b], axis=0)
        fakes = self.decode(params, content, style, trg, k(2), train=train)
        img_ba, img_br, img_ab, img_ar = jnp.split(fakes, 4, axis=0)
        img_fake = jax.lax.stop_gradient(jnp.concatenate([img_ba, img_ab], axis=0))
        img_random = jax.lax.stop_gradient(jnp.concatenate([img_br, img_ar], axis=0))
        return img_fake, img_random

    def _g1_forward(self, p, extra, img, c_org, b, ks, aux_params, train=True):
        """Generator phase-1 forward + every non-adversarial loss term
        (reference backward_generator, base_model.py:266-366, minus the
        D-dependent adv/cls terms — split out so the fused step can apply
        them against the just-updated discriminator through a saved vjp).

        Returns ``(aux_total, img_fake, z_pack, logs)`` where ``z_pack`` is
        the stop-gradient'd ``(z_ca, z_cb)`` pair the fused step reuses to
        decode the D2 random-style fakes without a second content encode.
        """
        a = self.args
        k = (lambda i: ks[i] if ks is not None else None)
        cls_a, cls_b = c_org[:b], c_org[b:]
        g_logs = {}
        z_c = self.encode_content(p, extra, img, k(0), train=train)
        z_s, mu, logvar = self.encode_style(p, img, c_org, k(1), train=train)
        z_ca, z_cb = z_c[:b], z_c[b:]
        z_sa, z_sb = z_s[:b], z_s[b:]
        content = jnp.concatenate([z_cb, z_ca, z_ca, z_cb], axis=0)
        style = jnp.concatenate([z_sa, z_sa, z_sb, z_sb], axis=0)
        trg = jnp.concatenate([cls_a, cls_a, cls_b, cls_b], axis=0)
        fakes = self.decode(p, content, style, trg, k(2), train=train)
        img_ba, img_aa, img_ab, img_bb = jnp.split(fakes, 4, axis=0)
        img_fake = jnp.concatenate([img_ba, img_ab], axis=0)
        img_self = jnp.concatenate([img_aa, img_bb], axis=0)
        # cycle: re-encode and reconstruct (base_model.py:291-304)
        z_c_rec = self.encode_content(p, extra, img_fake, k(3), train=train)
        z_c_rec_b, z_c_rec_a = z_c_rec[:b], z_c_rec[b:]
        z_s_rec, _, _ = self.encode_style(p, img_fake, c_org, k(4), train=train)
        z_s_rec_a, z_s_rec_b = z_s_rec[:b], z_s_rec[b:]
        img_recon = self.decode(
            p,
            jnp.concatenate([z_c_rec_a, z_c_rec_b], axis=0),
            jnp.concatenate([z_s_rec_a, z_s_rec_b], axis=0),
            c_org,
            k(5),
            train=train,
        )
        loss_self = L.l1_loss(img, img_self) * a.lambda_rec
        loss_cc = L.l1_loss(img, img_recon) * a.lambda_rec
        loss_kl_zc = L.l2_regularize(z_c) * 0.01
        if self.reparam:
            loss_kl_zs = L.kl_divergence(mu, logvar) * 0.01
        else:
            loss_kl_zs = L.l2_regularize(z_s) * 0.01
        aux_total = loss_self + loss_cc + loss_kl_zc + loss_kl_zs
        if getattr(a, "use_dis_content", False):
            pred = self.discriminate(p, extra, "content_discriminator", z_c)
            loss_content = L.bce_logits_loss(pred, 1.0 - c_org)
            aux_total = aux_total + loss_content
            g_logs["g_content"] = loss_content
        if self.perceptual is not None:
            img_fake_p = jnp.concatenate([img_ab, img_ba], axis=0)
            g_p = self._perceptual_loss(aux_params, img, img_fake_p) * a.lambda_perceptual
            aux_total = aux_total + g_p
            g_logs["g_p"] = g_p
        g_logs.update(
            kl_zc=loss_kl_zc, kl_zs=loss_kl_zs,
            l1_self_rec=loss_self, l1_cc_rec=loss_cc,
        )
        z_pack = jax.lax.stop_gradient((z_ca, z_cb))
        return aux_total, img_fake, z_pack, g_logs

    def _g1_loss(self, p, extra, img, c_org, b, ks, aux_params, train=True):
        """Generator phase-1 loss (reference backward_generator,
        base_model.py:266-366). Returns (total, logs)."""
        aux_total, img_fake, _, g_logs = self._g1_forward(
            p, extra, img, c_org, b, ks, aux_params, train=train
        )
        adv, cls = self._g_adv_loss(p, extra, img, img_fake, c_org, "discriminator1")
        total = aux_total + adv + cls
        g_logs = dict(g_logs)
        g_logs.update(g_adv=adv, g_cls=cls, total_g=total)
        return total, g_logs

    def _g2_adv(self, p, extra, img, img_random, c_org):
        """Phase-2 adversarial term with the reference's discriminator
        selection quirks (base_model.py:386-409)."""
        a = self.args
        if getattr(a, "ms_dis", False):
            return self._g_adv_loss(p, extra, img, img_random, c_org, "discriminator1")
        if getattr(a, "use_ragan", False):
            return self._g_adv_loss(
                p, extra, img, img_random, c_org, "discriminator1", "discriminator2"
            )
        return self._g_adv_loss(p, extra, img, img_random, c_org, "discriminator2")

    def _g2_forward(self, p, extra, img, c_org, b, z_sr2, ks, aux_params, train=True):
        """Phase-2 forward + non-adversarial terms (latent regression,
        perceptual); the adv term is split out for the fused step."""
        a = self.args
        k = (lambda i: ks[i] if ks is not None else None)
        g_logs = {}
        z_c = self.encode_content(p, extra, img, k(0), train=train)
        z_ca, z_cb = z_c[:b], z_c[b:]
        content = jnp.concatenate([z_cb, z_ca], axis=0)
        style = jnp.concatenate([z_sr2, z_sr2], axis=0)
        img_random = self.decode(p, content, style, c_org, k(1), train=train)
        img_br, img_ar = img_random[:b], img_random[b:]
        # latent regression (base_model.py:410-421)
        z_rec, mu2, _ = self.encode_style(p, img_random, c_org, k(2), train=train)
        reg_target = mu2 if self.reparam else z_rec
        loss_z_a = L.l1_loss(reg_target[:b], z_sr2)
        loss_z_b = L.l1_loss(reg_target[b:], z_sr2)
        loss_z_l1 = (loss_z_a + loss_z_b) * 10.0
        aux_total = loss_z_l1
        if self.perceptual is not None:
            img_random_p = jnp.concatenate([img_ar, img_br], axis=0)
            g_p2 = self._perceptual_loss(aux_params, img, img_random_p) * a.lambda_perceptual
            aux_total = aux_total + g_p2
            g_logs["g_p2"] = g_p2
        g_logs.update(l1_recon_z=loss_z_l1)
        return aux_total, img_random, g_logs

    def _g2_loss(self, p, extra, img, c_org, b, z_sr2, ks, aux_params, train=True):
        """Generator phase-2 (random-decode) loss (reference
        backward_decoder_random, base_model.py:373-434)."""
        aux_total, img_random, g_logs = self._g2_forward(
            p, extra, img, c_org, b, z_sr2, ks, aux_params, train=train
        )
        adv2, cls2 = self._g2_adv(p, extra, img, img_random, c_org)
        total = aux_total + adv2 + cls2
        g_logs = dict(g_logs)
        g_logs.update(gan2=adv2, gan2_cls=cls2)
        return total, g_logs

    # ------------------------------------------------------------------ #
    # train steps
    # ------------------------------------------------------------------ #
    def _update_d(self, d_name, params, opt_state, extra, img, fake, c_org,
                  k_gp, lr, logs, prefix):
        """Value-and-grad + optimizer step for one discriminator (with the
        spectral-norm u refresh folded in when dis_sn is set)."""
        use_sn = bool(getattr(self.args, "dis_sn", False))
        (d_total, d_logs), grads = jax.value_and_grad(
            self._d_loss, argnums=1, has_aux=True
        )(d_name, params[d_name], params, extra, img, fake, c_org, k_gp,
          update_u=use_sn)
        if use_sn:
            extra[d_name] = d_logs.pop("_spectral")
        params[d_name], opt_state[d_name] = apply_updates(
            self.tx[d_name], grads, opt_state[d_name], params[d_name], lr
        )
        logs.update({f"{prefix}_{k}": v for k, v in d_logs.items()})
        logs.update(d_logs)  # reference keys: last write (d2) wins

    def _with_qat(self, quant, fn, *args):
        """Run a step body, optionally under QAT (--int8_train).

        ``quant``: None (plain bf16 trace) or the per-net amax tree from
        ``calibrate_quant_train`` — a DYNAMIC jit argument, so refreshing the
        calibration never recompiles. While set, encode_content/decode route
        eligible convs through the straight-through int8 wrappers
        (ops/qat.py) and the serving-only defer/packed chains stay off.
        """
        if quant is None:
            if getattr(self, "_fused_train_enabled", False):
                # plain bf16 step: route eligible resblocks through the
                # differentiable whole-block Pallas kernel (the trace-time
                # flag mirrors qat_trace; mutually exclusive with QAT, whose
                # per-conv int8 forwards replace the whole-block fusion)
                from masterthesis_tpu.ops.pallas.resblock_bf16 import (
                    fused_train_trace,
                )

                with fused_train_trace():
                    return fn(*args)
            return fn(*args)
        from masterthesis_tpu.ops.qat import qat_trace

        self._step_quant = quant
        try:
            with qat_trace(getattr(self, "_qat_scope", None)):
                return fn(*args)
        finally:
            self._step_quant = None

    def _main_step_fused_impl(self, state: TrainState, batch, rng, aux_params,
                              quant=None):
        return self._with_qat(
            quant, self._main_step_fused_body, state, batch, rng, aux_params
        )

    def _main_step_fused_body(self, state: TrainState, batch, rng, aux_params):
        """Fused iteration (``--gan_step fused``): the D updates reuse the
        G-phase forwards instead of the separate ``_make_d_fakes`` pass.

        The reference generates one set of fakes for the D updates and a
        second, independently-drawn set inside backward_generator
        (base_model.py:168-197 vs :266-304). Both draws sample the same
        distribution from the SAME pre-update generator, so sharing one
        forward is distribution-equivalent (the standard DCGAN fake-reuse
        pattern) and saves a full content-encode + style-encode + 2b decode
        per iteration. Update order is preserved exactly: D1 and D2 step
        first (on stop-gradient'd fakes from the pre-update G), then G
        phase 1 sees the UPDATED discriminator through a saved vjp, then
        phase 2 runs as usual against the updated D2.
        """
        a = self.args
        img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
        c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
        b = batch["x1"].shape[0]
        lr = self.schedule(state.step)
        params = dict(state.params)
        opt_state = dict(state.opt_state)
        extra = dict(state.extra)
        logs: Dict[str, jnp.ndarray] = {}
        ks = list(jax.random.split(rng, 14))

        # ---- G phase-1 forward (pre-update params), vjp saved ----------- #
        gp = {k: params[k] for k in GEN_NETS}

        def g1_fwd(gparams):
            p = {**params, **gparams}
            return self._g1_forward(
                p, extra, img, c_org, b, ks[4:10], aux_params, train=True
            )

        (aux_total, img_fake, z_pack, g1_logs), vjp1 = jax.vjp(g1_fwd, gp)

        # ---- D updates on detached fakes (reference order: D before G) -- #
        fake_det = jax.lax.stop_gradient(img_fake)
        self._update_d(
            "discriminator1", params, opt_state, extra, img, fake_det, c_org,
            jax.random.fold_in(ks[3], 1), lr, logs, "d1",
        )
        z_sr = self.get_z_random(ks[2], b)
        z_ca, z_cb = z_pack
        img_random_d = jax.lax.stop_gradient(
            self.decode(
                params,
                jnp.concatenate([z_cb, z_ca], axis=0),
                jnp.concatenate([z_sr, z_sr], axis=0),
                c_org, ks[3], train=True,
            )
        )
        self._update_d(
            "discriminator2", params, opt_state, extra, img, img_random_d,
            c_org, jax.random.fold_in(ks[3], 2), lr, logs, "d2",
        )

        # ---- G phase-1 adv vs the UPDATED D1, grads through the vjp ----- #
        def adv1(fake):
            adv, cls = self._g_adv_loss(
                params, extra, img, fake, c_org, "discriminator1"
            )
            return adv + cls, (adv, cls)

        (advcls, (adv, cls)), fake_cot = jax.value_and_grad(adv1, has_aux=True)(
            img_fake
        )
        cot = (
            jnp.ones_like(aux_total),
            fake_cot,
            jax.tree.map(jnp.zeros_like, z_pack),
            jax.tree.map(jnp.zeros_like, g1_logs),
        )
        (g_grads,) = vjp1(cot)
        for k in GEN_NETS:
            params[k], opt_state[k] = apply_updates(
                self.tx[k], g_grads[k], opt_state[k], params[k], lr
            )
        logs.update(g1_logs)
        logs.update(g_adv=adv, g_cls=cls, total_g=aux_total + advcls)

        # ---- G phase 2 (unchanged semantics) ---------------------------- #
        z_sr2 = self.get_z_random(ks[11], b)

        def g2_loss(gparams):
            p = {**params, **gparams}
            return self._g2_loss(
                p, extra, img, c_org, b, z_sr2, (ks[10], ks[12], ks[13]),
                aux_params, train=True,
            )

        gp2 = {k: params[k] for k in ("content_encoder", "decoder")}
        (_, g2_logs), grads2 = jax.value_and_grad(g2_loss, has_aux=True)(gp2)
        for k in ("content_encoder", "decoder"):
            params[k], opt_state[k] = apply_updates(
                self.tx[k], grads2[k], opt_state[k], params[k], lr
            )
        logs.update(g2_logs)
        logs["lr"] = lr

        return TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, extra=extra
        ), logs

    def _main_step_impl(self, state: TrainState, batch, rng, aux_params,
                        quant=None):
        return self._with_qat(
            quant, self._main_step_body, state, batch, rng, aux_params
        )

    def _main_step_body(self, state: TrainState, batch, rng, aux_params):
        a = self.args
        img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
        c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
        b = batch["x1"].shape[0]
        lr = self.schedule(state.step)
        params = dict(state.params)
        opt_state = dict(state.opt_state)
        extra = dict(state.extra)
        logs: Dict[str, jnp.ndarray] = {}
        ks = list(jax.random.split(rng, 14))

        # ------------------- D phase (base_model.py:168-205) ------------- #
        z_sr = self.get_z_random(ks[2], b)
        img_fake, img_random = self._make_d_fakes(
            params, extra, img, c_org, b, z_sr, (ks[0], ks[1], ks[3]), train=True
        )

        for d_name, fake, prefix in (
            ("discriminator1", img_fake, "d1"),
            ("discriminator2", img_random, "d2"),
        ):
            k_gp = jax.random.fold_in(ks[3], 1 if d_name == "discriminator1" else 2)
            self._update_d(
                d_name, params, opt_state, extra, img, fake, c_org, k_gp, lr,
                logs, prefix,
            )

        # ------------------- G phase 1 (base_model.py:266-366) ----------- #
        def g1_loss(gparams):
            p = {**params, **gparams}
            return self._g1_loss(p, extra, img, c_org, b, ks[4:10], aux_params, train=True)

        gp = {k: params[k] for k in GEN_NETS}
        (_, g_logs), grads = jax.value_and_grad(g1_loss, has_aux=True)(gp)
        for k in GEN_NETS:
            params[k], opt_state[k] = apply_updates(
                self.tx[k], grads[k], opt_state[k], params[k], lr
            )
        logs.update(g_logs)

        # ------------------- G phase 2 (base_model.py:373-434) ----------- #
        z_sr2 = self.get_z_random(ks[11], b)

        def g2_loss(gparams):
            p = {**params, **gparams}
            return self._g2_loss(
                p, extra, img, c_org, b, z_sr2, (ks[10], ks[12], ks[13]), aux_params, train=True
            )

        gp2 = {k: params[k] for k in ("content_encoder", "decoder")}
        (_, g2_logs), grads2 = jax.value_and_grad(g2_loss, has_aux=True)(gp2)
        for k in ("content_encoder", "decoder"):
            params[k], opt_state[k] = apply_updates(
                self.tx[k], grads2[k], opt_state[k], params[k], lr
            )
        logs.update(g2_logs)
        logs["lr"] = lr

        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, extra=extra
        )
        return new_state, logs

    def _content_step_impl(self, state: TrainState, batch, rng):
        """Content-discriminator-only iteration
        (reference update_content_discriminator, base_model.py:158-166)."""
        a = self.args
        img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
        c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
        lr = self.schedule(state.step) / 2.5
        params = dict(state.params)
        opt_state = dict(state.opt_state)
        k0, _ = jax.random.split(rng)
        z_c = jax.lax.stop_gradient(
            self.encode_content(params, state.extra, img, k0, train=True)
        )

        def loss_fn(p):
            pred = self.nets["content_discriminator"].apply({"params": p}, z_c)
            return L.bce_logits_loss(pred, c_org)

        loss_dc, grads = jax.value_and_grad(loss_fn)(params["content_discriminator"])
        params["content_discriminator"], opt_state["content_discriminator"] = apply_updates(
            self.tx["content_discriminator"],
            grads,
            opt_state["content_discriminator"],
            params["content_discriminator"],
            lr,
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, extra=state.extra
        )
        return new_state, {"d_content_cls": loss_dc}

    def optimize_parameters(self, state: TrainState, batch, global_iter: int, rng):
        """Dispatch one iteration (reference optimize_parameters,
        base_model.py:461-470). ``global_iter`` is a Python int, so the branch
        is static — two compiled step functions, no lax.cond."""
        a = self.args
        if getattr(a, "use_dis_content", False) and global_iter % a.d_iter != 0:
            state, logs = self._content_step(state, batch, rng)
        elif getattr(self, "_train_quant", None) is not None:
            # --int8_train: the amax tree rides as a dynamic jit arg
            state, logs = self._main_step(
                state, batch, rng, self.perceptual_params, self._train_quant
            )
        else:
            state, logs = self._main_step(state, batch, rng, self.perceptual_params)
        # keep device arrays: no host sync in the hot loop (unlike the
        # reference's per-loss .item() calls); float() happens at print_freq.
        self.loss = logs
        return state, logs

    # ------------------------------------------------------------------ #
    # inference (reference base_model.py:112-156)
    # ------------------------------------------------------------------ #
    def _forward_random_impl(self, params, img, z_r, c_trg):
        z_c = self.encode_content(params, None, img, train=False, quant=True)
        return self.decode(params, z_c, z_r, c_trg, train=False, quant=True)

    def _forward_reference_impl(self, params, img_src, img_ref, c_trg, rng):
        z_c = self.encode_content(params, None, img_src, train=False, quant=True)
        z_s, _, _ = self.encode_style(params, img_ref, c_trg, rng, train=False, sample=True)
        return self.decode(params, z_c, z_s, c_trg, train=False, quant=True)

    def forward_random(self, state, img, z_r, c_trg):
        """Translate with a random style code; returns (images, seconds, device_mem_GB)
        — timing parity with base_model.py:112-117."""
        import time

        params = state.params if isinstance(state, TrainState) else state
        start = time.perf_counter()
        out = self._forward_random_jit(params, img, z_r, c_trg)
        out.block_until_ready()
        dt = time.perf_counter() - start
        return out, dt, _device_memory_gb()

    def forward_reference(self, state, img_src, img_ref, c_trg, rng=None):
        """Translate using a reference image's style (base_model.py:119-128)."""
        import time

        params = state.params if isinstance(state, TrainState) else state
        if rng is None:
            rng = jax.random.PRNGKey(0)
        start = time.perf_counter()
        out = self._forward_reference_jit(params, img_src, img_ref, c_trg, rng)
        out.block_until_ready()
        dt = time.perf_counter() - start
        return out, dt, _device_memory_gb()

    def _forward_impl(self, params, img, c_org, rng):
        """(img_fake, img_random, img_self) triple (base_model.py:130-156)."""
        b = img.shape[0] // 2
        k1, k2 = jax.random.split(rng)
        z_c = self.encode_content(params, None, img, train=False, quant=True)
        z_s, _, _ = self.encode_style(params, img, c_org, k1, train=False, sample=True)
        z_sr = self.get_z_random(k2, b)
        z_ca, z_cb = z_c[:b], z_c[b:]
        z_sa, z_sb = z_s[:b], z_s[b:]
        cls_a, cls_b = c_org[:b], c_org[b:]
        content = jnp.concatenate([z_cb, z_ca, z_cb, z_ca, z_cb, z_ca], axis=0)
        style = jnp.concatenate([z_sa, z_sa, z_sr, z_sb, z_sb, z_sr], axis=0).astype(z_s.dtype)
        trg = jnp.concatenate([cls_a, cls_a, cls_a, cls_b, cls_b, cls_b], axis=0)
        fakes = self.decode(params, content, style, trg, train=False, quant=True)
        img_ba, img_aa, img_br, img_ab, img_bb, img_ar = jnp.split(fakes, 6, axis=0)
        img_fake = jnp.concatenate([img_ba, img_ab], axis=0)
        img_random = jnp.concatenate([img_br, img_ar], axis=0)
        img_self = jnp.concatenate([img_aa, img_bb], axis=0)
        return img_fake, img_random, img_self

    def forward(self, state, img, c_org, rng=None):
        params = state.params if isinstance(state, TrainState) else state
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._forward_jit(params, img, c_org, rng)

    def compute_visuals(self, state: TrainState, batch, rng=None):
        """2x4 grid: [real | translated | random-style | self-recon] per
        direction (reference compute_visuals, base_model.py:441-456)."""
        img = jnp.concatenate([batch["x1"], batch["x2"]], axis=0)
        c_org = jnp.concatenate([batch["y1"], batch["y2"]], axis=0).astype(jnp.float32)
        b = batch["x1"].shape[0]
        img_fake, img_random, img_self = self.forward(state, img, c_org, rng)
        row1 = jnp.concatenate(
            [img[0:1], img_fake[b : b + 1], img_random[b : b + 1], img_self[0:1]], axis=2
        )
        row2 = jnp.concatenate(
            [img[b : b + 1], img_fake[0:1], img_random[0:1], img_self[b : b + 1]], axis=2
        )
        return jnp.concatenate([row1, row2], axis=1)[0]


def _device_memory_gb() -> float:
    """Device memory in use (parity with torch.cuda.memory_reserved reporting,
    base_model.py:117)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / (1024**3)
    except Exception:
        return 0.0
