"""Argument system.

Parity with reference src/arguments.py:11-164: a 3-level argparse hierarchy
(Arguments -> TrainArguments / TestArguments) that resolves ``--model`` and
``--dataset`` strings to classes reflectively, creates the experiment
directory tree, and dumps ``args.txt``.

Fixes over the reference (documented quirks NOT copied, SURVEY.md §5):
- ``--beta2`` is a float (reference types it str, arguments.py:91);
- test-time mutable flags (dis_norm/dis_sn) are proper defaults.

Additional TPU-native flags: ``--compute_dtype`` and ``--num_devices``.
``default_train_args``/``default_test_args`` expose the same defaults as
plain namespaces for programmatic use (and tests).
"""
from __future__ import annotations

import argparse
import os
from datetime import datetime

from masterthesis_tpu.utils import AttributeDict, module_to_dict


def _add_base_args(parser: argparse.ArgumentParser):
    parser.add_argument("--dataroot", help="root folder of the dataset")
    parser.add_argument(
        "--name", type=str,
        default=f'{datetime.now().strftime("%Y-%m-%d_%H-%M-%S")}',
        help="name of the experiment. It decides where to store samples and model",
    )
    parser.add_argument("--exp_dir", type=str, default="../exps",
                        help="custom directory for storing experiment results")
    # model parameters
    parser.add_argument("--model", type=str, default="BaseModel", help="chooses which model to use.")
    parser.add_argument("--input_dim", type=int, default=3)
    parser.add_argument("--output_dim", type=int, default=3)
    parser.add_argument("--dim", type=int, default=64, help="# of gen filters in the last conv layer")
    parser.add_argument("--init_type", type=str, default="normal", help="network initialization.")
    parser.add_argument("--init_gain", type=float, default=0.02)
    parser.add_argument("--use_dropout", action="store_true")
    parser.add_argument("--num_domains", type=int, default=2)
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--concat", action="store_true", help="concatenate style features for translation")
    parser.add_argument("--reparam", action="store_true", help="reparameterize generating style features")
    parser.add_argument("--use_dis_content", action="store_true", help="whether to use content discriminator")
    parser.add_argument("--latent_dim", type=int, default=8)
    parser.add_argument("--up_type", type=str, default="transpose",
                        choices=["transpose", "nearest", "pixelshuffle"])
    parser.add_argument("--dec_norm", type=str, default="layer", choices=["batch", "instance", "layer"])
    parser.add_argument("--enc_norm", type=str, default="instance", choices=["batch", "instance", "layer"])
    # dataset parameters
    parser.add_argument("--dataset", type=str, default="PairedDataset")
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--load_size", type=int, default=286)
    parser.add_argument("--crop_size", type=int, default=256)
    parser.add_argument("--no_flip", action="store_true")
    parser.add_argument("--select_domains", default=None, type=str, nargs="+")
    # additional parameters
    parser.add_argument("--resume", type=str, default=None, help="path to checkpoint to load")
    parser.add_argument("--save_logs", action="store_true")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")
    # TPU-native knobs
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--num_devices", type=int, default=None,
                        help="limit the data-parallel mesh to this many devices")
    parser.add_argument("--device_preproc", action="store_true",
                        help="host decodes+resizes to uint8 only; crop/flip/"
                             "normalize run fused on-device (4x less H2D)")
    parser.add_argument("--gan_step", type=str, default="reference",
                        choices=["reference", "fused"],
                        help="'fused' shares the G forward with the D updates "
                             "(distribution-equivalent, saves an encode+decode "
                             "per iteration); 'reference' mirrors the "
                             "reference's independent D-phase fakes")
    parser.add_argument("--fused_resblock", type=str, default="off",
                        choices=["auto", "off"],
                        help="route eligible training resblocks (128-lane-"
                             "aligned channels) through the differentiable "
                             "whole-block Pallas kernel (forward + analytic-"
                             "VJP backward as one launch per image each way, "
                             "ops/pallas/resblock_bf16.py); 'auto' engages on "
                             "TPU only, numerics pinned vs autodiff in "
                             "tests/test_resblock_bf16.py. Default off: the "
                             "kernel wins per-block on the device plane "
                             "(benchmarks/resblock_micro_r5.json) but at "
                             "flagship instance counts the full-step compile "
                             "exhausts this environment's TPU compile service "
                             "(BASELINE.md round-5 training section)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize encoder/decoder activations in the"
                             " backward pass (jax.checkpoint) to cut HBM use")
    parser.add_argument("--int8_train", action="store_true",
                        help="run the generator's forward convs on the int8 "
                             "MXU path during training (straight-through bf16 "
                             "gradients, delayed activation scaling — see "
                             "ops/qat.py); quality-gated by the head-to-head "
                             "harness")
    parser.add_argument("--int8_train_scope", type=str, default="all",
                        help="--int8_train: which conv kinds run int8 — "
                             "'all' or a comma list of conv,stride2,deconv. "
                             "Each Pallas boundary in the gradient graph "
                             "costs XLA layout copies, so a narrower scope "
                             "can be faster (see ops/qat.py)")
    parser.add_argument("--int8_calib_freq", type=int, default=100,
                        help="--int8_train: refresh the per-conv activation "
                             "ranges from the current batch every N iterations")
    parser.add_argument("--ckpt_format", type=str, default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="checkpoint backend: single msgpack files "
                             "(reference filename parity) or orbax dirs")


def _add_train_args(parser: argparse.ArgumentParser):
    parser.add_argument("--dis_norm", type=str, default=None, choices=["batch", "instance", "layer"])
    parser.add_argument("--norm_feat", action="store_true")
    parser.add_argument("--lr", type=float, default=0.0001)
    parser.add_argument("--wd", type=float, default=0.0001)
    parser.add_argument("--beta1", type=float, default=0.5)
    parser.add_argument("--beta2", type=float, default=0.999)
    parser.add_argument("--lr_policy", type=str, default="step")
    parser.add_argument("--n_iters", type=int, default=1000000)
    parser.add_argument("--last_iter", type=int, default=-1)
    parser.add_argument("--max_iter", type=int, default=1000000)
    parser.add_argument("--n_iter_decay", type=int, default=600000)
    parser.add_argument("--d_iter", type=int, default=3)
    parser.add_argument("--lambda_rec", type=float, default=10)
    parser.add_argument("--lambda_cls", type=float, default=1.0)
    parser.add_argument("--lambda_cls_G", type=float, default=5.0)
    parser.add_argument("--lambda_style", type=float, default=5.0)
    parser.add_argument("--print_freq", type=int, default=1000)
    parser.add_argument("--save_freq", type=int, default=1000)
    parser.add_argument("--display_freq", type=int, default=1000)
    parser.add_argument("--train_n_batch", type=float, default=float("inf"))
    parser.add_argument("--gan_mode", type=str, default="vanilla")
    parser.add_argument("--resume_opt", type=str, default=None)
    parser.add_argument("--lambda_gp", type=float, default=0.0,
                        help="WGAN gradient-penalty weight (wgangp mode; the "
                             "reference exposes wgangp without a penalty)")
    parser.add_argument("--ms_dis", action="store_true")
    parser.add_argument("--dis_sn", action="store_true")
    parser.add_argument("--num_scales", type=int, default=3)
    parser.add_argument("--use_ragan", action="store_true")
    parser.add_argument("--lambda_perceptual", type=float, default=1.0)
    parser.add_argument("--vgg_type", type=str, default="vgg19")
    parser.add_argument("--vgg_loss", type=str, default=None)
    parser.add_argument("--vgg_layers", type=str, nargs="+", default=["conv5_4"])
    parser.add_argument("--layer_weights", type=float, nargs="+", default=[1.0])
    parser.add_argument("--vgg_weights", type=str, default=None,
                        help="npz file with pretrained VGG weights for the perceptual loss")


def _add_test_args(parser: argparse.ArgumentParser):
    parser.add_argument("--num", type=int, default=5, help="number of outputs per image")
    parser.add_argument("--result_dir", type=str, default="./outputs")
    parser.add_argument("--out_fmt", type=str, default="image", help="one of [image, video]")
    parser.add_argument("--vid_fname", type=str, default="video.avi")
    parser.add_argument("--reference", type=str, nargs="+", default=None)
    parser.add_argument("--targets", type=str, nargs="+", default=None)
    parser.add_argument("--multi_iter", type=int, default=0)
    parser.add_argument("--save_visuals", action="store_true")
    parser.add_argument("--gen_grid", action="store_true")
    parser.add_argument("--gen_style", action="store_true")
    parser.add_argument(
        "--int8", action="store_true",
        help="serve on the int8 MXU path (calibrates activation ranges on a "
        "few input batches, then eligible convs run the Pallas int8 kernels)",
    )
    parser.add_argument(
        "--int8_calib_batches", type=int, default=2,
        help="number of input batches used for int8 activation calibration",
    )
    parser.add_argument(
        "--sample_size", type=int, nargs=2, default=[540, 960],
        metavar=("H", "W"),
        help="sampler-time resize (reference sample.py:48-53 hard-codes "
        "540x960 for driving video; pass e.g. 256 256 to serve at the "
        "training/serving resolution instead)",
    )


def _resolve_classes(args):
    import masterthesis_tpu.data as data_mod
    import masterthesis_tpu.models as models_mod

    if isinstance(getattr(args, "dataset", None), str):
        args.dataset = module_to_dict(data_mod)[args.dataset]
    if isinstance(args.model, str):
        args.model = module_to_dict(models_mod)[args.model]
    return args


def _make_exp_dirs(args):
    args.exp_dir = os.path.join(args.exp_dir, args.name)
    os.makedirs(args.exp_dir, exist_ok=True)
    args.checkpoint_dir = os.path.join(args.exp_dir, "checkpoints")
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    args.logdir = os.path.join(args.exp_dir, "logs")
    os.makedirs(args.logdir, exist_ok=True)
    args.display_dir = os.path.join(args.exp_dir, "images")
    os.makedirs(args.display_dir, exist_ok=True)
    return args


def _git_revision():
    import subprocess

    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _dump_args(args, path):
    arguments = dict(vars(args) if not isinstance(args, dict) else args)
    arguments["framework_revision"] = _git_revision()  # reproducibility stamp
    with open(path, "a") as f:
        print("\n--- Loaded arguments ---")
        for name, value in sorted(arguments.items(), key=lambda kv: kv[0]):
            print("%s: %s" % (str(name), str(value)))
            f.write("%s: %s\n" % (str(name), str(value)))


class Arguments:
    """Base argument class (reference arguments.py:11-78)."""

    def __init__(self):
        self.parser = argparse.ArgumentParser("Arguments for the program")
        _add_base_args(self.parser)

    def parse(self, argv=None):
        args = self.parser.parse_args(argv)
        args = _resolve_classes(args)
        args = _make_exp_dirs(args)
        _dump_args(args, os.path.join(args.exp_dir, "args.txt"))
        return args


class TrainArguments(Arguments):
    """Training arguments (reference arguments.py:80-118)."""

    def __init__(self):
        super().__init__()
        _add_train_args(self.parser)


class TestArguments(Arguments):
    """Test/sampling arguments (reference arguments.py:120-164)."""

    def __init__(self):
        super().__init__()
        _add_test_args(self.parser)

    def parse(self, argv=None):
        args = self.parser.parse_args(argv)
        os.makedirs(args.result_dir, exist_ok=True)
        if "image" in args.out_fmt:
            args.display_dir = os.path.join(args.result_dir, "images")
        elif "video" in args.out_fmt:
            args.display_dir = os.path.join(args.result_dir, "videos")
        os.makedirs(args.display_dir, exist_ok=True)
        args.mode = "test"
        args.dis_scale = 3
        args.dis_norm = None
        args.dis_sn = False
        args = _resolve_classes(args)
        _dump_args(args, os.path.join(args.result_dir, "args.txt"))
        return args


def _defaults_from(parsers) -> AttributeDict:
    d = AttributeDict()
    for add in parsers:
        p = argparse.ArgumentParser()
        add(p)
        for action in p._actions:
            if action.dest != "help":
                d[action.dest] = action.default
    return d


def default_train_args(**overrides) -> AttributeDict:
    """Programmatic TrainArguments defaults (no CLI, no dirs created)."""
    d = _defaults_from([_add_base_args, _add_train_args])
    d["mode"] = "train"
    d.update(overrides)
    return d


def default_test_args(**overrides) -> AttributeDict:
    d = _defaults_from([_add_base_args, _add_test_args])
    d["mode"] = "test"
    d["dis_scale"] = 3
    d["dis_norm"] = None
    d["dis_sn"] = False
    d.update(overrides)
    return d
