"""Network definitions (Flax, NHWC).

Capability parity with reference src/models/core/networks.py:
ContentEncoder:8, StyleEncoder:45, ReparameterizedStyleEncoder:87, Decoder:148,
AdaINDecoder:207, DecoderConcat:272, Discriminator:335, ContentDiscriminator:386,
MultiScaleDiscriminator:421, ResnetGenerator:468.

Design notes (TPU-first):
- NHWC everywhere; channel counts follow the reference (64 -> 256 etc.), which
  keeps the minor dim at/above the 128-lane width in the hot layers.
- Domain labels are injected by broadcasting the one-hot vector over H, W and
  concatenating on the channel (minor) axis, matching the reference semantics.
- Randomness (VAE reparameterization, content noise) is explicit via flax rng
  streams ('reparam', 'noise') instead of call-site torch RNG.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from masterthesis_tpu.models.blocks import (
    AdaINResnetBlock,
    ConvBlock,
    Conv2d,
    apply_pending,
    DecResnetBlock,
    Dense,
    DownResnetBlock,
    GaussianNoise,
    ResnetBlock,
    UpsampleBlock,
    avg_pool2d,
    get_activation,
    global_avg_pool,
)

Dtype = Any

MAX_FILTER_SIZE = 256


def concat_label(x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Broadcast one-hot domain labels over H, W and concat on channels
    (reference networks.py:80-84)."""
    n, h, w, _ = x.shape
    c_map = jnp.broadcast_to(c[:, None, None, :], (n, h, w, c.shape[-1])).astype(x.dtype)
    return jnp.concatenate([x, c_map], axis=-1)


class ContentEncoder(nn.Module):
    """Domain-invariant content encoder (reference networks.py:8-43).

    conv7 -> num_downs stride-2 convs -> n_blocks resblocks -> +noise (train).
    output channels = dim * 2**num_downs.
    """

    dim: int = 64
    num_downs: int = 2
    n_blocks: int = 4
    norm: Optional[str] = "instance"
    padding_type: str = "reflect"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.dim * (2**self.num_downs)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, serving: bool = False):
        """``serving``: int8 serving chain (set by TranslationModel when the
        quant collection is active): the stem and down blocks defer their
        instance-norm + activation into the next conv's fused kernel
        prologue, and the down convs' norm stats come from inside the Pallas
        kernel — removing every standalone norm/activation HBM pass between
        the stem and the residual blocks. Inert during training: the flags
        only change op placement, and serving is never set on gradient
        paths (translation.py _apply)."""
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        defer = bool(serving)
        d = self.dim
        pending = None
        out = ConvBlock(
            d, 7, 1, 3, use_bias=self.use_bias, norm=self.norm, activation="lrelu",
            padding_type=self.padding_type, defer_norm=defer, name="stem", **common,
        )(x)
        h, pending = out if isinstance(out, tuple) else (out, None)
        for i in range(self.num_downs):
            d *= 2
            out = ConvBlock(
                d, 3, 2, 1, use_bias=self.use_bias, norm=self.norm, activation="relu",
                padding_type=self.padding_type, defer_norm=defer,
                name=f"down{i}", **common,
            )(h, pending=pending)
            h, pending = out if isinstance(out, tuple) else (out, None)
        if pending is not None:
            # no fused consumer yet for the resblock kernel's first conv:
            # apply the last down block's deferred norm inline
            h = apply_pending(h, pending, h.dtype)
        for i in range(self.n_blocks):
            h = ResnetBlock(d, norm=self.norm, activation="relu", name=f"res{i}", **common)(
                h, deterministic=deterministic
            )
        h = GaussianNoise(name="noise")(h, deterministic=deterministic)
        return h


class StyleEncoder(nn.Module):
    """Plain style encoder: downsampling convs + GAP + 1x1 conv to latent
    (reference networks.py:45-85)."""

    output_dim: int = 8
    dim: int = 64
    num_downs: int = 4
    num_domains: int = 2
    padding_type: str = "reflect"
    activation: str = "relu"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = concat_label(x, c)
        d = self.dim
        h = ConvBlock(
            d, 7, 1, 3, padding_type=self.padding_type, activation=self.activation,
            name="stem", **common,
        )(h)
        for i in range(self.num_downs):
            out_d = min(MAX_FILTER_SIZE, d * 2)
            h = ConvBlock(
                out_d, 4, 2, 1, padding_type=self.padding_type, activation=self.activation,
                name=f"down{i}", **common,
            )(h)
            d *= 2
        h = global_avg_pool(h)[:, None, None, :]
        h = Conv2d(self.output_dim, 1, 1, 0, use_bias=True, name="head", **common)(h)
        return h.reshape(h.shape[0], -1)


class ReparameterizedStyleEncoder(nn.Module):
    """VAE-style encoder returning (z, mu, logvar)
    (reference networks.py:87-146). Sampling uses the 'reparam' rng stream;
    pass ``sample=False`` for a deterministic mu-only path."""

    output_dim: int = 8
    dim: int = 64
    n_blocks: int = 4
    num_domains: int = 2
    norm: Optional[str] = None
    activation: str = "lrelu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, sample: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = concat_label(x, c)
        d = self.dim
        h = ConvBlock(
            d, 4, 2, 1, use_bias=self.use_bias, padding_type="reflect", name="stem", **common
        )(h)
        for i in range(1, self.n_blocks):
            out_d = min(MAX_FILTER_SIZE, d * 2)
            h = DownResnetBlock(
                out_d, norm=self.norm, activation=self.activation, use_bias=self.use_bias,
                name=f"down{i}", **common,
            )(h)
            d *= 2
        h = get_activation(self.activation)(h)
        h = global_avg_pool(h)
        mu = Dense(self.output_dim, name="fc", **common)(h)
        logvar = Dense(self.output_dim, name="fcVar", **common)(h)
        if sample:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape, dtype=jnp.float32)
            z = mu + eps.astype(mu.dtype) * jnp.exp(0.5 * logvar)
        else:
            z = mu
        return z, mu, logvar


class _DecoderTail(nn.Module):
    """Shared upsampling tail: num_ups upsample blocks + tanh head
    (reference networks.py:181-188 / 246-253)."""

    output_dim: int
    dim: int
    num_ups: int = 2
    up_type: str = "transpose"
    norm: Optional[str] = "layer"
    activation: Optional[str] = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        transpose = "transpose" in self.up_type
        # int8 serving chain (inert in training/bf16: the flags only act
        # when the deconv's quant path fires): each up block defers its
        # LayerNorm+relu into the next kernel's prologue, and the last block
        # hands its lane-packed output straight to the packed-aware 1x1 head
        # the defer/packed chain is only valid for the LayerNorm+relu tail
        # (the deconv kernel's in-kernel stats are per-(sample) LN totals and
        # the packed layout's only unpack-aware consumers assume it); other
        # --dec_norm / activation choices serve int8 with unfused norms
        fusible = transpose and self.norm == "layer" and self.activation in ("relu", None)
        pending = None
        for i in range(self.num_ups):
            out = UpsampleBlock(
                d // 2, 3, 2, 1, 1, use_bias=self.use_bias, norm=self.norm,
                activation=self.activation, up_type=self.up_type,
                defer_norm=fusible,
                allow_packed=fusible and i == self.num_ups - 1,
                name=f"up{i}", **common,
            )(h, pending=pending)
            h, pending = out if isinstance(out, tuple) else (out, None)
            d //= 2
        if transpose:
            h = UpsampleBlock(
                self.output_dim, 1, 1, 0, activation="tanh", up_type="transpose",
                name="head", **common,
            )(h, pending=pending)
        else:
            h = ConvBlock(self.output_dim, 7, 1, 3, activation="tanh", name="head", **common)(h)
        return h


class _StyleMLP(nn.Module):
    """(z, c) -> style vector MLP (reference networks.py:190-195 / 256-261)."""

    out_features: int
    hidden: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, c):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = jnp.concatenate([c.astype(z.dtype), z], axis=-1)
        h = nn.relu(Dense(self.hidden, name="fc0", **common)(h))
        h = nn.relu(Dense(self.hidden, name="fc1", **common)(h))
        return Dense(self.out_features, name="fc2", **common)(h)


class Decoder(nn.Module):
    """Linear-injection decoder: per-block style chunks feed DecResnetBlocks
    (reference networks.py:148-205)."""

    output_dim: int = 3
    dim: int = 256
    n_blocks: int = 4
    num_domains: int = 2
    num_ups: int = 2
    latent_dim: int = 8
    up_type: str = "transpose"
    dropout: bool = False
    norm: Optional[str] = "layer"
    activation: Optional[str] = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, c, deterministic: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        z_c = _StyleMLP(self.dim * self.n_blocks, name="linear", **common)(z, c)
        h = x
        for i in range(self.n_blocks):
            chunk = z_c[:, i * self.dim : (i + 1) * self.dim]
            h = DecResnetBlock(self.dim, dropout=self.dropout, name=f"dec1_{i}", **common)(
                h, chunk, deterministic=deterministic
            )
        return _DecoderTail(
            self.output_dim, self.dim, self.num_ups, self.up_type, self.norm,
            self.activation, self.use_bias, name="dec2", **common,
        )(h)


class AdaINDecoder(nn.Module):
    """AdaIN-modulated decoder: one shared style code modulates n_blocks
    AdaINResnetBlocks (reference networks.py:207-270)."""

    output_dim: int = 3
    dim: int = 256
    n_blocks: int = 4
    num_domains: int = 2
    num_ups: int = 2
    latent_dim: int = 8
    up_type: str = "transpose"
    res_norm: str = "adain"
    dropout: bool = False
    norm: Optional[str] = "layer"
    activation: Optional[str] = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, c, deterministic: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = x
        if "adain" in self.res_norm:
            style = _StyleMLP(self.dim, name="linear", **common)(z, c)
            for i in range(self.n_blocks):
                h = AdaINResnetBlock(self.dim, dropout=self.dropout, name=f"dec1_{i}", **common)(
                    h, style, deterministic=deterministic
                )
        else:
            for i in range(self.n_blocks):
                h = ResnetBlock(self.dim, dropout=self.dropout, name=f"dec1_{i}", **common)(
                    h, deterministic=deterministic
                )
        return _DecoderTail(
            self.output_dim, self.dim, self.num_ups, self.up_type, self.norm,
            self.activation, self.use_bias, name="dec2", **common,
        )(h)


class DecoderConcat(nn.Module):
    """Concat-injection decoder: z (and c) broadcast and channel-concatenated
    before the resblocks and before each upsample stage
    (reference networks.py:272-333)."""

    output_dim: int = 3
    dim: int = 256
    n_blocks: int = 3
    num_domains: int = 2
    latent_dim: int = 8
    up_type: str = "transpose"
    dropout: bool = False
    norm: Optional[str] = "layer"
    activation: Optional[str] = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, c, deterministic: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        def with_z(h):
            n, hh, ww, _ = h.shape
            z_map = jnp.broadcast_to(z[:, None, None, :], (n, hh, ww, z.shape[-1]))
            return jnp.concatenate([h, z_map.astype(h.dtype)], axis=-1)

        h = ResnetBlock(self.dim, name="dec_share", **common)(x, deterministic=deterministic)
        # channel order [content, domains, z] matches the reference's
        # torch.cat([out0, c, z_img], 1) (networks.py:322) so reference
        # checkpoints port channel-for-channel (tools/port_reference.py)
        h = with_z(concat_label(h, c))
        nch = self.dim + self.latent_dim + self.num_domains
        for i in range(self.n_blocks):
            h = ResnetBlock(nch, dropout=self.dropout, name=f"dec1_{i}", **common)(
                h, deterministic=deterministic
            )
        nch = nch + self.latent_dim
        h = UpsampleBlock(
            nch // 2, 3, 2, 1, 1, use_bias=self.use_bias, norm=self.norm,
            activation=self.activation, up_type=self.up_type, name="dec2", **common,
        )(with_z(h))
        nch = nch // 2 + self.latent_dim
        h = UpsampleBlock(
            nch // 2, 3, 2, 1, 1, use_bias=self.use_bias, norm=self.norm,
            activation=self.activation, up_type=self.up_type, name="dec3", **common,
        )(with_z(h))
        h = with_z(h)
        if "transpose" in self.up_type:
            h = UpsampleBlock(
                self.output_dim, 1, 1, 0, activation="tanh", up_type="transpose",
                name="dec4", **common,
            )(h)
        else:
            h = ConvBlock(self.output_dim, 7, 1, 3, activation="tanh", name="dec4", **common)(h)
        return h


class Discriminator(nn.Module):
    """PatchGAN discriminator + auxiliary domain classifier
    (reference networks.py:335-384). Returns (patch_logits, class_logits)."""

    dim: int = 64
    n_layers: int = 6
    num_domains: int = 2
    norm: Optional[str] = None
    activation: str = "lrelu"
    padding_type: str = "reflect"
    use_bias: bool = True
    sn: bool = False
    image_size: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = self.dim
        h = ConvBlock(
            d, 3, 2, 1, use_bias=self.use_bias, norm=self.norm, activation=self.activation,
            padding_type=self.padding_type, sn=self.sn, name="layer0", **common,
        )(x)
        for i in range(self.n_layers - 2):
            h = ConvBlock(
                d * 2, 3, 2, 1, use_bias=self.use_bias, norm=self.norm,
                activation=self.activation, padding_type=self.padding_type, sn=self.sn,
                name=f"layer{i + 1}", **common,
            )(h)
            d *= 2
        h = ConvBlock(
            d, 3, 2, 1, use_bias=self.use_bias, activation=self.activation,
            padding_type=self.padding_type, sn=self.sn, name=f"layer{self.n_layers - 1}",
            **common,
        )(h)
        # patch head: 1x1 conv with padding 1, no bias (networks.py:373)
        out = Conv2d(1, 1, 1, 1, use_bias=False, name="patch_head", **common)(h)
        # class head: kernel covering the remaining map + GAP (networks.py:374-376)
        k = max(1, int(self.image_size / (2**self.n_layers)))
        cls = Conv2d(self.num_domains, k, 1, 0, use_bias=False, name="cls_head", **common)(h)
        cls = global_avg_pool(cls)
        return out, cls


class ContentDiscriminator(nn.Module):
    """Domain classifier on content features (reference networks.py:386-419).

    ``n_layers``/``kernel_size``/``final_kernel`` default to the reference's
    fixed 3x(conv7 s2) + conv4 stack (which requires content maps >= 46px,
    i.e. crop_size >= 184); smaller test configs can shrink them.
    """

    dim: int = 256
    num_domains: int = 3
    norm: Optional[str] = "instance"
    activation: str = "lrelu"
    padding_type: str = "reflect"
    use_bias: bool = True
    n_layers: int = 3
    kernel_size: int = 7
    final_kernel: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = x
        for i in range(self.n_layers):
            h = ConvBlock(
                self.dim, self.kernel_size, 2, 1, use_bias=self.use_bias, norm=self.norm,
                activation=self.activation, padding_type=self.padding_type,
                name=f"layer{i}", **common,
            )(h)
        h = ConvBlock(
            self.dim, self.final_kernel, 1, 0, use_bias=self.use_bias,
            activation=self.activation,
            padding_type=self.padding_type, name="layer3", **common,
        )(h)
        h = Conv2d(self.num_domains, 1, 1, 0, use_bias=True, name="head", **common)(h)
        return global_avg_pool(h)


class MultiScaleDiscriminator(nn.Module):
    """Shared-trunk discriminator applied at num_scales pooled scales
    (reference networks.py:421-466). Returns list of (patch, class) pairs."""

    dim: int = 64
    n_layers: int = 6
    num_domains: int = 2
    norm: Optional[str] = None
    activation: str = "lrelu"
    padding_type: Optional[str] = None
    num_scales: int = 3
    sn: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        trunk = [
            ConvBlock(
                self.dim, 4, 2, 1, activation=self.activation,
                padding_type=self.padding_type, sn=self.sn, name="layer0", **common,
            )
        ]
        d = self.dim
        for i in range(self.n_layers - 1):
            trunk.append(
                ConvBlock(
                    d * 2, 4, 2, 1, norm=self.norm, activation=self.activation,
                    padding_type=self.padding_type, sn=self.sn, name=f"layer{i + 1}", **common,
                )
            )
            d *= 2
        dis_head = Conv2d(1, 1, 1, 0, use_bias=True, name="dis_head", **common)
        cls_head = Conv2d(self.num_domains, 1, 1, 0, use_bias=True, name="cls_head", **common)
        outputs = []
        for s in range(self.num_scales):
            h = x
            for layer in trunk:
                h = layer(h)
            dis = dis_head(h)
            cls = global_avg_pool(cls_head(h))
            outputs.append((dis, cls))
            x = avg_pool2d(x, 3, 2, padding=1, count_include_pad=False)
        return outputs


class ResnetGenerator(nn.Module):
    """Plain residual encoder-decoder generator (reference networks.py:468-512;
    unused by the two shipped configs but part of the public surface)."""

    output_dim: int = 3
    dim: int = 64
    num_downs: int = 2
    n_blocks: int = 6
    norm: Optional[str] = None
    activation: Optional[str] = None
    padding_type: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvBlock(
            self.dim, 7, 1, 3, norm=self.norm, activation=self.activation,
            padding_type=self.padding_type, name="stem", **common,
        )(x)
        for i in range(self.num_downs):
            h = ConvBlock(
                self.dim * 2 ** (i + 1), 3, 2, 1, norm=self.norm, activation=self.activation,
                padding_type=self.padding_type, name=f"down{i}", **common,
            )(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(
                self.dim * 2**self.num_downs, norm=self.norm or "instance",
                name=f"res{i}", **common,
            )(h, deterministic=deterministic)
        for i in reversed(range(self.num_downs)):
            h = UpsampleBlock(
                self.dim * 2**i, 3, 2, 1, 1, norm=self.norm, activation=self.activation,
                padding_type=self.padding_type, name=f"up{i}", **common,
            )(h)
        h = ConvBlock(
            self.output_dim, 7, 1, 3, norm=self.norm, activation="tanh",
            padding_type=self.padding_type, name="head", **common,
        )(h)
        return h
