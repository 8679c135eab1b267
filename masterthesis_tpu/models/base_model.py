"""BaseModel: style injected by concatenation / linear modulation.

Parity with reference src/models/base_model.py:9-97 (net construction):
content encoder, plain or reparameterized style encoder (``--reparam``),
Decoder or DecoderConcat (``--concat``), two (multi-scale) discriminators and
an optional content discriminator. All training logic lives in
TranslationModel.
"""
from __future__ import annotations

import jax.numpy as jnp

from masterthesis_tpu.models import networks
from masterthesis_tpu.models.translation import TranslationModel


class BaseModel(TranslationModel):
    def __init__(self, args):
        self.reparam = bool(getattr(args, "reparam", False))
        super().__init__(args)
        a = args
        dtype = jnp.bfloat16 if getattr(a, "compute_dtype", "float32") == "bfloat16" else jnp.float32
        self.compute_dtype = dtype
        self.nets.content_encoder = networks.ContentEncoder(dim=a.dim, norm=a.enc_norm, dtype=dtype)
        if self.reparam:
            self.nets.style_encoder = networks.ReparameterizedStyleEncoder(
                output_dim=a.latent_dim, dim=a.dim, num_domains=a.num_domains,
                norm=None, activation="lrelu", dtype=dtype,
            )
        else:
            self.nets.style_encoder = networks.StyleEncoder(
                output_dim=a.latent_dim, dim=a.dim, num_domains=a.num_domains,
                activation="lrelu", dtype=dtype,
            )
        content_dim = self.nets.content_encoder.output_dim
        if getattr(a, "concat", False):
            self.nets.decoder = networks.DecoderConcat(
                output_dim=a.input_dim, dim=content_dim, num_domains=a.num_domains,
                latent_dim=a.latent_dim, up_type=a.up_type, norm=a.dec_norm,
                dropout=getattr(a, "use_dropout", False), dtype=dtype,
            )
        else:
            self.nets.decoder = networks.Decoder(
                output_dim=a.input_dim, dim=content_dim, num_domains=a.num_domains,
                latent_dim=a.latent_dim, up_type=a.up_type, norm=a.dec_norm,
                dropout=getattr(a, "use_dropout", False), dtype=dtype,
            )
        if self._is_train():
            if getattr(a, "ms_dis", False):
                dis_cls = lambda: networks.MultiScaleDiscriminator(  # noqa: E731
                    norm=a.dis_norm, sn=getattr(a, "dis_sn", False),
                    num_domains=a.num_domains, num_scales=getattr(a, "num_scales", 3),
                    n_layers=getattr(a, "dis_n_layers", None) or 6, dtype=dtype,
                )
            else:
                dis_cls = lambda: networks.Discriminator(  # noqa: E731
                    dim=a.dim, norm=a.dis_norm, sn=getattr(a, "dis_sn", False),
                    num_domains=a.num_domains, image_size=a.crop_size,
                    n_layers=getattr(a, "dis_n_layers", None) or 6, dtype=dtype,
                )
            self.nets.discriminator1 = dis_cls()
            self.nets.discriminator2 = dis_cls()
            if getattr(a, "use_dis_content", False):
                self.nets.content_discriminator = networks.ContentDiscriminator(
                    dim=content_dim, num_domains=a.num_domains,
                    n_layers=getattr(a, "dis_content_layers", None) or 3,
                    kernel_size=getattr(a, "dis_content_kernel", None) or 7,
                    final_kernel=getattr(a, "dis_content_final_kernel", None) or 4,
                    dtype=dtype,
                )

    def _dummy_inputs(self, name: str):
        a = self.args
        size = int(a.crop_size)
        img = jnp.zeros((2, size, size, int(a.input_dim)), jnp.float32)
        c = jnp.zeros((2, int(a.num_domains)), jnp.float32)
        content_dim = self.nets.content_encoder.output_dim
        z_c = jnp.zeros((2, size // 4, size // 4, content_dim), jnp.float32)
        z = jnp.zeros((2, int(a.latent_dim)), jnp.float32)
        if name == "content_encoder":
            return (img,), {}
        if name == "style_encoder":
            if self.reparam:
                return (img, c), {"sample": False}
            return (img, c), {}
        if name == "decoder":
            return (z_c, z, c), {}
        if name in ("discriminator1", "discriminator2"):
            return (img,), {}
        if name == "content_discriminator":
            return (z_c,), {}
        raise KeyError(name)
