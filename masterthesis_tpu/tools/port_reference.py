"""Import reference (PyTorch) network weights into this framework.

The reference saves ``model_{it}.ckpt`` as ``{net_name: state_dict}``
(reference src/models/model.py:70-82). This module maps each network's torch
state dict onto the matching Flax param tree so trained reference checkpoints
can run (and be fine-tuned) on TPU, and so the numerics-parity test suite can
compare both frameworks on identical weights.

Layout conventions translated here:
- Conv2d         OIHW            -> HWIO
- ConvTranspose2d IOHW           -> HWIO, spatially flipped (torch's transposed
  conv correlates with the *flipped* kernel on the dilated input; our
  ``jax.lax.conv_transpose(transpose_kernel=False)`` does not flip)
- Linear         (out, in)       -> (in, out)
- LayerNorm      (C, 1, 1) affine -> (C,)
- Spectral norm  ``weight_orig``  -> kernel (power-iteration state re-estimates)

Network graph maps cite the reference definitions in
src/models/core/networks.py and blocks.py (see each function).

CLI:
    python -m masterthesis_tpu.tools.port_reference model_100.ckpt out.ckpt \
        --model AdaINModel --dim 64 --latent_dim 8 --num_domains 4 [...]
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _conv_t(w: np.ndarray) -> np.ndarray:
    # IOHW -> HWIO with spatial flip (see module docstring)
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1].copy()


def _linear(sd: Dict, p: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(np.transpose(np.asarray(sd[f"{p}.weight"]))),
        "bias": np.asarray(sd[f"{p}.bias"]),
    }


def _dense(sd: Dict, p: str) -> Dict[str, Dict[str, np.ndarray]]:
    """blocks.Dense wraps nn.Dense -> params nest under 'Dense_0'."""
    return {"Dense_0": _linear(sd, p)}


def _conv_weight(sd: Dict, p: str):
    """Conv weight at prefix, resolving spectral-norm's 'weight_orig' rename."""
    if f"{p}.weight" in sd:
        return sd[f"{p}.weight"]
    return sd[f"{p}.weight_orig"]


def conv_block(
    sd: Dict, p: str, pad: bool = True, bias: bool = False, norm: Optional[str] = None
) -> Dict:
    """ConvBlock (reference blocks.py:10-46): block = [pad?, conv, norm?, act?].

    ``pad`` says whether a padding layer precedes the conv (padding_type set),
    which shifts the conv's Sequential index. Only 'layer' norm has params.
    """
    i = 1 if pad else 0
    out = {"conv": {"kernel": _conv(_conv_weight(sd, f"{p}.block.{i}"))}}
    if bias:
        out["conv"]["bias"] = np.asarray(sd[f"{p}.block.{i}.bias"])
    if norm == "layer":
        out["norm"] = {
            "scale": np.asarray(sd[f"{p}.block.{i + 1}.weight"]).reshape(-1),
            "bias": np.asarray(sd[f"{p}.block.{i + 1}.bias"]).reshape(-1),
        }
    return out


def upsample_block(
    sd: Dict,
    p: str,
    bias: bool = False,
    norm: Optional[str] = None,
    up_type: str = "transpose",
    pad: bool = False,
) -> Dict:
    """UpsampleBlock (reference blocks.py:48-91)."""
    if "transpose" in up_type:
        out = {"conv": {"kernel": _conv_t(_conv_weight(sd, f"{p}.block.0"))}}
        if bias:
            out["conv"]["bias"] = np.asarray(sd[f"{p}.block.0.bias"])
        norm_idx = 1
    elif "nearest" in up_type:
        # block = [nn.Upsample, ConvBlock, norm?, act?]
        out = {"conv": conv_block(sd, f"{p}.block.1", pad=pad, bias=bias)}
        norm_idx = 2
    else:
        raise NotImplementedError(
            "pixelshuffle import unsupported: the reference block is unusable "
            "as written (channel mismatch, blocks.py:77-79) and this framework's "
            "fixed block has a different kernel shape"
        )
    if norm == "layer":
        out["norm"] = {
            "scale": np.asarray(sd[f"{p}.block.{norm_idx}.weight"]).reshape(-1),
            "bias": np.asarray(sd[f"{p}.block.{norm_idx}.bias"]).reshape(-1),
        }
    return out


def resnet_block(sd: Dict, p: str) -> Dict:
    """ResnetBlock (blocks.py:121-138): two pad+conv ConvBlocks, instance norm
    (param-free), no bias."""
    return {
        "conv1": conv_block(sd, f"{p}.model.0"),
        "conv2": conv_block(sd, f"{p}.model.1"),
    }


def down_resnet_block(sd: Dict, p: str, norm: Optional[str] = None, bias: bool = True) -> Dict:
    """DownResnetBlock (blocks.py:93-119). With norm=None the torch Sequential
    is [act, ConvBlock, ConvBlock, pool]; a norm layer (instance, param-free)
    would shift indices by one."""
    base = 2 if norm is not None else 1
    return {
        "conv1": conv_block(sd, f"{p}.conv.{base}", bias=bias),
        "conv2": conv_block(sd, f"{p}.conv.{base + 1}", bias=bias),
        "shortcut": {
            "kernel": _conv(sd[f"{p}.shortcut.1.weight"]),
            "bias": np.asarray(sd[f"{p}.shortcut.1.bias"]),
        },
    }


def adain_resnet_block(sd: Dict, p: str) -> Dict:
    """AdaINResnetBlock (blocks.py:140-167): the single shared norm module's
    fc is this framework's shared 'style_proj'."""
    return {
        "conv1": conv_block(sd, f"{p}.conv1"),
        "conv2": conv_block(sd, f"{p}.conv2"),
        "adain": {"style_proj": _linear(sd, f"{p}.norm.fc")},
    }


def dec_resnet_block(sd: Dict, p: str) -> Dict:
    """DecResnetBlock (blocks.py:169-208)."""
    return {
        "conv1": conv_block(sd, f"{p}.conv1"),
        "conv2": conv_block(sd, f"{p}.conv2"),
        "block1_a": {"kernel": _conv(sd[f"{p}.block1.0.weight"]),
                     "bias": np.asarray(sd[f"{p}.block1.0.bias"])},
        "block1_b": {"kernel": _conv(sd[f"{p}.block1.2.weight"]),
                     "bias": np.asarray(sd[f"{p}.block1.2.bias"])},
        "block2_a": {"kernel": _conv(sd[f"{p}.block2.0.weight"]),
                     "bias": np.asarray(sd[f"{p}.block2.0.bias"])},
        "block2_b": {"kernel": _conv(sd[f"{p}.block2.2.weight"]),
                     "bias": np.asarray(sd[f"{p}.block2.2.bias"])},
    }


def style_mlp(sd: Dict, p: str) -> Dict:
    """(z,c)->style Sequential[Linear,ReLU,Linear,ReLU,Linear]
    (networks.py:190-195)."""
    return {"fc0": _dense(sd, f"{p}.0"), "fc1": _dense(sd, f"{p}.2"), "fc2": _dense(sd, f"{p}.4")}


def decoder_tail(sd: Dict, p: str, num_ups: int, up_type: str, norm: Optional[str], bias: bool) -> Dict:
    """Shared upsample tail (networks.py:181-188 / 246-253)."""
    out = {}
    for i in range(num_ups):
        out[f"up{i}"] = upsample_block(sd, f"{p}.{i}", bias=bias, norm=norm, up_type=up_type)
    if "transpose" in up_type:
        out["head"] = upsample_block(sd, f"{p}.{num_ups}", bias=False, up_type="transpose")
    else:
        out["head"] = conv_block(sd, f"{p}.{num_ups}", pad=False, bias=False)
    return out


# --------------------------------------------------------------------------- #
# network-level importers (dispatch by this framework's module type)
# --------------------------------------------------------------------------- #
def import_content_encoder(sd: Dict, mod) -> Dict:
    """ContentEncoder (networks.py:8-43)."""
    out = {"stem": conv_block(sd, "model.0", bias=mod.use_bias)}
    for i in range(mod.num_downs):
        out[f"down{i}"] = conv_block(sd, f"model.{1 + i}", bias=mod.use_bias)
    for i in range(mod.n_blocks):
        out[f"res{i}"] = resnet_block(sd, f"model.{1 + mod.num_downs + i}")
    return out


def import_style_encoder(sd: Dict, mod) -> Dict:
    """StyleEncoder (networks.py:45-85): head conv sits after the pool."""
    out = {"stem": conv_block(sd, "model.0")}
    for i in range(mod.num_downs):
        out[f"down{i}"] = conv_block(sd, f"model.{1 + i}")
    head = f"model.{mod.num_downs + 2}"
    out["head"] = {"kernel": _conv(sd[f"{head}.weight"]), "bias": np.asarray(sd[f"{head}.bias"])}
    return out


def import_reparam_style_encoder(sd: Dict, mod) -> Dict:
    """ReparameterizedStyleEncoder (networks.py:87-146)."""
    out = {"stem": conv_block(sd, "model.0", bias=mod.use_bias)}
    for i in range(1, mod.n_blocks):
        out[f"down{i}"] = down_resnet_block(sd, f"model.{i}", norm=mod.norm, bias=mod.use_bias)
    out["fc"] = _dense(sd, "fc")
    out["fcVar"] = _dense(sd, "fcVar")
    return out


def import_decoder(sd: Dict, mod) -> Dict:
    """Decoder (networks.py:148-205)."""
    out = {"linear": style_mlp(sd, "linear")}
    for i in range(mod.n_blocks):
        out[f"dec1_{i}"] = dec_resnet_block(sd, f"dec1.{i}")
    out["dec2"] = decoder_tail(sd, "dec2", mod.num_ups, mod.up_type, mod.norm, mod.use_bias)
    return out


def import_adain_decoder(sd: Dict, mod) -> Dict:
    """AdaINDecoder (networks.py:207-270)."""
    out = {}
    if "adain" in mod.res_norm:
        out["linear"] = style_mlp(sd, "linear")
        for i in range(mod.n_blocks):
            out[f"dec1_{i}"] = adain_resnet_block(sd, f"dec1.{i}")
    else:
        for i in range(mod.n_blocks):
            out[f"dec1_{i}"] = resnet_block(sd, f"dec1.{i}")
    out["dec2"] = decoder_tail(sd, "dec2", mod.num_ups, mod.up_type, mod.norm, mod.use_bias)
    return out


def import_decoder_concat(sd: Dict, mod) -> Dict:
    """DecoderConcat (networks.py:272-333)."""
    out = {"dec_share": resnet_block(sd, "dec_share")}
    for i in range(mod.n_blocks):
        out[f"dec1_{i}"] = resnet_block(sd, f"dec1.{i}")
    out["dec2"] = upsample_block(sd, "dec2", bias=mod.use_bias, norm=mod.norm, up_type=mod.up_type)
    out["dec3"] = upsample_block(sd, "dec3", bias=mod.use_bias, norm=mod.norm, up_type=mod.up_type)
    if "transpose" in mod.up_type:
        out["dec4"] = upsample_block(sd, "dec4", bias=False, up_type="transpose")
    else:
        out["dec4"] = conv_block(sd, "dec4", pad=False)
    return out


def import_discriminator(sd: Dict, mod) -> Dict:
    """Discriminator (networks.py:335-384)."""
    out = {}
    for i in range(mod.n_layers):
        out[f"layer{i}"] = conv_block(sd, f"model.{i}", bias=mod.use_bias)
    out["patch_head"] = {"kernel": _conv(_conv_weight(sd, "conv1"))}
    out["cls_head"] = {"kernel": _conv(_conv_weight(sd, "conv2"))}
    return out


def import_content_discriminator(sd: Dict, mod) -> Dict:
    """ContentDiscriminator (networks.py:386-419)."""
    out = {}
    for i in range(mod.n_layers):
        out[f"layer{i}"] = conv_block(sd, f"model.{i}", bias=mod.use_bias)
    out["layer3"] = conv_block(sd, f"model.{mod.n_layers}", bias=mod.use_bias)
    head = f"model.{mod.n_layers + 1}"
    out["head"] = {"kernel": _conv(sd[f"{head}.weight"]), "bias": np.asarray(sd[f"{head}.bias"])}
    return out


def import_multiscale_discriminator(sd: Dict, mod) -> Dict:
    """MultiScaleDiscriminator (networks.py:421-466): padding_type None ->
    conv at Sequential index 0, no conv bias."""
    out = {}
    for i in range(mod.n_layers):
        out[f"layer{i}"] = conv_block(sd, f"model.{i}", pad=mod.padding_type is not None)
    out["dis_head"] = {"kernel": _conv(_conv_weight(sd, "dis")),
                       "bias": np.asarray(sd["dis.bias"])}
    out["cls_head"] = {"kernel": _conv(_conv_weight(sd, "cls")),
                       "bias": np.asarray(sd["cls.bias"])}
    return out


def import_resnet_generator(sd: Dict, mod) -> Dict:
    """ResnetGenerator (networks.py:468-512). The reference builds NO resnet
    blocks (its n_blocks arg is unused), so only a 0-block config is portable.
    decoder Sequential order: insert(0, ...) reverses the ups."""
    if mod.n_blocks != 0:
        raise ValueError(
            "reference ResnetGenerator has no resnet blocks (n_blocks unused, "
            "networks.py:468-512); instantiate with n_blocks=0 to import"
        )
    pad = mod.padding_type is not None
    out = {"stem": conv_block(sd, "encoder.0", pad=pad)}
    for i in range(mod.num_downs):
        out[f"down{i}"] = conv_block(sd, f"encoder.{1 + i}", pad=pad)
    for i in range(mod.num_downs):
        out[f"up{i}"] = upsample_block(sd, f"decoder.{mod.num_downs - 1 - i}", up_type="transpose")
    out["head"] = conv_block(sd, f"decoder.{mod.num_downs}", pad=pad)
    return out


_IMPORTERS = {
    "ContentEncoder": import_content_encoder,
    "StyleEncoder": import_style_encoder,
    "ReparameterizedStyleEncoder": import_reparam_style_encoder,
    "Decoder": import_decoder,
    "AdaINDecoder": import_adain_decoder,
    "DecoderConcat": import_decoder_concat,
    "Discriminator": import_discriminator,
    "ContentDiscriminator": import_content_discriminator,
    "MultiScaleDiscriminator": import_multiscale_discriminator,
    "ResnetGenerator": import_resnet_generator,
}


def import_net_params(module, state_dict: Dict) -> Dict:
    """torch state_dict (tensors or arrays) -> Flax params for one network."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    kind = type(module).__name__
    if kind not in _IMPORTERS:
        raise KeyError(f"no reference importer for network type {kind}")
    return _IMPORTERS[kind](sd, module)


def import_model_params(model, torch_ckpt: Dict[str, Dict]) -> Dict[str, Dict]:
    """Map a reference ``model_{it}.ckpt`` dict ({net_name: state_dict},
    reference model.py:70-82) onto ``{net_name: flax params}`` for ``model``
    (a models.Model with matching config). Nets present on only one side are
    skipped with a warning, mirroring the reference's tolerant load
    (model.py:88-100)."""
    out = {}
    for name in model.nets:
        if name not in torch_ckpt:
            print(f"Checkpoint for {name} net is not found.")
            continue
        out[name] = import_net_params(model.nets[name], torch_ckpt[name])
    return out


def _validate_against(template: Dict, imported: Dict, prefix: str = "") -> None:
    """Assert the imported tree matches the init-template tree exactly."""
    t_keys, i_keys = set(template), set(imported)
    if t_keys != i_keys:
        raise ValueError(f"{prefix}: key mismatch: missing={t_keys - i_keys} extra={i_keys - t_keys}")
    for k in template:
        t, v = template[k], imported[k]
        if isinstance(t, dict):
            _validate_against(t, v, f"{prefix}/{k}")
        elif tuple(np.shape(t)) != tuple(np.shape(v)):
            raise ValueError(f"{prefix}/{k}: shape {np.shape(v)} != expected {np.shape(t)}")


def main():
    import argparse

    import torch

    import masterthesis_tpu.models as models_mod
    from masterthesis_tpu.arguments import default_train_args
    from masterthesis_tpu.checkpoint import save_pytree
    from masterthesis_tpu.utils import module_to_dict

    p = argparse.ArgumentParser("port a reference PyTorch model_{it}.ckpt to this framework")
    p.add_argument("src", help="reference model_{it}.ckpt")
    p.add_argument("dst", help="output checkpoint path (.ckpt/.orbax); load with --resume")
    p.add_argument("--model", default="AdaINModel")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--latent_dim", type=int, default=8)
    p.add_argument("--num_domains", type=int, default=4)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--up_type", default="transpose")
    p.add_argument("--concat", action="store_true")
    p.add_argument("--reparam", action="store_true")
    p.add_argument("--ms_dis", action="store_true")
    p.add_argument("--use_dis_content", action="store_true")
    p.add_argument("--mode", default="train", help="'train' ports discriminators too")
    cli = p.parse_args()
    overrides = {k: v for k, v in vars(cli).items() if k not in ("src", "dst", "model")}
    args = default_train_args(**overrides)
    model = module_to_dict(models_mod)[cli.model](args)
    state = model.initialize()
    ckpt = torch.load(cli.src, map_location="cpu", weights_only=True)
    imported = import_model_params(model, ckpt)
    for name, params in imported.items():
        _validate_against(state.params[name], params, name)
    merged = {**dict(state.params), **imported}
    save_pytree({"params": merged, "extra": dict(state.extra)}, cli.dst)
    print(f"wrote {len(imported)} net(s) to {cli.dst}")


if __name__ == "__main__":
    main()
