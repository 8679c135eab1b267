"""Loss functions (pure JAX).

Parity with reference src/models/core/loss.py:
- ``gan_loss``: vanilla (BCE-with-logits), bce, lsgan (MSE), wgangp, hinge
  (GANLoss, loss.py:35-64 — the reference's `'wgangp' or 'hinge'` truthiness bug
  at loss.py:47 is compensated at its model layer; here hinge is implemented
  correctly and the model layer applies the same D/G hinge forms as
  base_model.py:234-235, 324-326).
- ``bce_logits_loss``: nn.BCEWithLogitsLoss (domain classification).
- ``l1_loss``, ``l2_regularize``, ``kl_divergence``: base_model.py:334-348,
  436-439.
- ``VGGPerceptualLoss``: loss.py:66-134 as a Flax feature extractor with
  loadable weights. Note the reference detaches the graph at loss.py:133
  (``torch.tensor([...])``), so its perceptual loss contributes no gradient;
  here it is implemented with gradients intact (intended behavior).

All reductions are means over all elements, matching torch defaults.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from masterthesis_tpu.ops.norms import instance_norm

Dtype = Any

GAN_MODES = ("vanilla", "bce", "lsgan", "wgangp", "hinge")


def bce_logits_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def bce_loss(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Mean binary cross entropy on probabilities (torch BCELoss)."""
    probs = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    targets = targets.astype(jnp.float32)
    return -jnp.mean(targets * jnp.log(probs) + (1.0 - targets) * jnp.log(1.0 - probs))


def mse_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)))


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))


def gan_loss(pred: jnp.ndarray, target_is_real: bool, mode: str = "vanilla") -> jnp.ndarray:
    """Adversarial loss against a constant real/fake target (GANLoss)."""
    pred = pred.astype(jnp.float32)
    if mode == "wgangp":
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    if mode == "hinge":
        # Hinge loss needs the D/G context; the model layer uses
        # hinge_d_loss / hinge_g_loss below. Fall back to the D-real/fake form.
        if target_is_real:
            return jnp.mean(nn.relu(1.0 - pred))
        return jnp.mean(nn.relu(1.0 + pred))
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    if mode == "vanilla":
        return bce_logits_loss(pred, target)
    if mode == "bce":
        return bce_loss(pred, target)
    if mode == "lsgan":
        return mse_loss(pred, target)
    raise NotImplementedError(f"Loss {mode} is not implemented")


def hinge_d_loss(pred_real: jnp.ndarray, pred_fake: jnp.ndarray) -> jnp.ndarray:
    """D hinge: relu(1-real).mean() + relu(1+fake).mean()
    (reference base_model.py:234-235)."""
    pred_real = pred_real.astype(jnp.float32)
    pred_fake = pred_fake.astype(jnp.float32)
    return jnp.mean(nn.relu(1.0 - pred_real)) + jnp.mean(nn.relu(1.0 + pred_fake))


def hinge_g_loss(pred_fake: jnp.ndarray) -> jnp.ndarray:
    """G hinge: -fake.mean() (reference base_model.py:326)."""
    return -jnp.mean(pred_fake.astype(jnp.float32))


def ragan_loss(pred_real, pred_fake, real_is_target: bool, mode: str) -> jnp.ndarray:
    """Relativistic average GAN loss (reference base_model.py:231-233, 320-321).

    ``real_is_target=True`` is the D direction (real>fake); False is G.
    """
    r = pred_real.astype(jnp.float32)
    f = pred_fake.astype(jnp.float32)
    if real_is_target:
        return (gan_loss(r - jnp.mean(f), True, mode) + gan_loss(f - jnp.mean(r), False, mode)) / 2
    return (gan_loss(r - jnp.mean(f), False, mode) + gan_loss(f - jnp.mean(r), True, mode)) / 2


def l2_regularize(x: jnp.ndarray) -> jnp.ndarray:
    """mean(x^2) (reference base_model.py:436-439)."""
    return jnp.mean(jnp.square(x.astype(jnp.float32)))


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Summed VAE KL: -0.5 * sum(1 + logvar - mu^2 - exp(logvar))
    (reference base_model.py:345-346 — note SUM, not mean)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


# --------------------------------------------------------------------------- #
# VGG perceptual loss
# --------------------------------------------------------------------------- #

VGG_CONFIGS = {
    # (channels per conv, 'M' = maxpool) — standard VGG feature configs
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
              512, 512, 512, 512, "M"],
}


def vgg_layer_names(vgg_type: str) -> list[str]:
    """conv1_1/relu1_1/pool1... names matching reference loss.py:10-33."""
    names = []
    block, idx = 1, 1
    for v in VGG_CONFIGS[vgg_type]:
        if v == "M":
            names.append(f"pool{block}")
            block += 1
            idx = 1
        else:
            names.append(f"conv{block}_{idx}")
            names.append(f"relu{block}_{idx}")
            idx += 1
    return names


class VGGFeatureExtractor(nn.Module):
    """VGG feature extractor returning activations at named layers
    (reference loss.py:66-104). ``remove_pooling`` skips maxpools like the
    reference default. Weights can be loaded via ``load_vgg_params``; without
    pretrained weights the features are random projections (still a valid
    training signal regularizer, but not "perceptual" — supply weights for
    parity).
    """

    feature_layers: Sequence[str]
    vgg_type: str = "vgg19"
    remove_pooling: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x in [-1, 1] -> [0,1] -> ImageNet normalize (reference normalizes the
        # [0,1] image at loss.py:93-99; callers pass [-1,1] model outputs so we
        # shift here).
        x = (x.astype(jnp.float32) + 1.0) / 2.0
        mean = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
        std = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)
        x = ((x - mean) / std).astype(self.dtype)

        names = vgg_layer_names(self.vgg_type)
        wanted = set(self.feature_layers)
        for name in wanted:
            if name not in names:
                raise ValueError(f"unknown vgg layer {name} for {self.vgg_type}")
        max_idx = max(names.index(n) for n in wanted)

        outputs = []
        conv_i = 0
        for i, name in enumerate(names[: max_idx + 1]):
            if name.startswith("conv"):
                features = [v for v in VGG_CONFIGS[self.vgg_type] if v != "M"][conv_i]
                x = nn.Conv(
                    features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=name,
                )(x)
                conv_i += 1
            elif name.startswith("relu"):
                x = nn.relu(x)
            elif name.startswith("pool"):
                if not self.remove_pooling:
                    x = nn.max_pool(x, (2, 2), (2, 2))
            if name in wanted:
                outputs.append(x)
        return outputs


class VGGPerceptualLoss(nn.Module):
    """Weighted feature-space distance (reference loss.py:106-134)."""

    layers: Sequence[str] = ("conv5_4",)
    layer_weights: Sequence[float] = (1.0,)
    vgg_type: str = "vgg19"
    loss_fn: str = "l2"
    norm_feat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        extractor = VGGFeatureExtractor(
            self.layers, self.vgg_type, dtype=self.dtype, param_dtype=self.param_dtype,
            name="vgg",
        )
        fx = extractor(x)
        fy = extractor(y)
        total = 0.0
        for w, a, b in zip(self.layer_weights, fx, fy):
            if self.norm_feat:
                a = instance_norm(a)
                b = instance_norm(b)
            if "mse" in self.loss_fn or "l2" in self.loss_fn:
                total = total + w * mse_loss(a, b)
            else:
                total = total + w * l1_loss(a, b)
        return total


def load_vgg_params(npz_path: str, feature_layers: Sequence[str], vgg_type: str = "vgg19"):
    """Build a VGGFeatureExtractor params pytree from an npz of
    ``{name}/kernel`` (HWIO) and ``{name}/bias`` arrays."""
    import numpy as np

    data = np.load(npz_path)
    params = {}
    for name in vgg_layer_names(vgg_type):
        if f"{name}/kernel" in data:
            params[name] = {
                "kernel": jnp.asarray(data[f"{name}/kernel"]),
                "bias": jnp.asarray(data[f"{name}/bias"]),
            }
    return {"params": params}
