"""End-to-end CLI/driver integration: Trainer over synthetic data, argument
parsing, checkpoint/resume through the Trainer, Sampler output files."""
import os

import numpy as np

from masterthesis_tpu.arguments import TrainArguments, default_test_args
from masterthesis_tpu.train import Trainer

from conftest import make_image_tree, tiny_train_args


def test_train_arguments_parse_and_dirs(tmp_path, monkeypatch):
    argv = [
        "--dataroot", str(tmp_path / "data"),
        "--exp_dir", str(tmp_path / "exps"),
        "--name", "exp1",
        "--model", "AdaINModel",
        "--dataset", "PairedDataset",
        "--batch_size", "2",
        "--num_domains", "4",
    ]
    args = TrainArguments().parse(argv)
    from masterthesis_tpu.data import PairedDataset
    from masterthesis_tpu.models import AdaINModel

    assert args.model is AdaINModel
    assert args.dataset is PairedDataset
    assert os.path.isdir(args.checkpoint_dir)
    assert os.path.isdir(args.logdir)
    assert os.path.isdir(args.display_dir)
    assert os.path.exists(os.path.join(args.exp_dir, "args.txt"))
    assert isinstance(args.beta2, float)  # reference quirk fixed


def test_trainer_end_to_end(tmp_path):
    """3 iterations of the flagship config shape (AdaINModel + PairedDataset)
    on synthetic data: losses logged, ckpt + image grid written."""
    from masterthesis_tpu.data import PairedDataset
    from masterthesis_tpu.models import AdaINModel

    make_image_tree(tmp_path / "data", num_domains=4, per_domain=2)
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        dataset=PairedDataset,
        model=AdaINModel,
        use_dis_content=True,
        num_workers=0,
        n_iters=2,
        max_iter=2,
        print_freq=1,
        save_freq=2,
        display_freq=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        display_dir=str(tmp_path / "images"),
        logdir=None,
        resume=None,
        resume_opt=None,
        shuffle=False,
    )
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    os.makedirs(args.display_dir, exist_ok=True)
    trainer = Trainer()
    dataloader = trainer.load_dataset(args)
    model, state = trainer.create_model(args)
    state = trainer.train(args, model, state, dataloader, mesh=None)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(args.checkpoint_dir, "model_0.ckpt"))
    assert os.path.exists(os.path.join(args.checkpoint_dir, "model_3.ckpt"))
    assert os.path.exists(os.path.join(args.display_dir, "gen_0.jpg"))


def test_trainer_end_to_end_fused_step(tmp_path):
    """The --gan_step fused trainer path drives the same loop end-to-end:
    losses logged with the reference keys, checkpoint written, step count
    advances through both content-D and main iterations."""
    from masterthesis_tpu.data import PairedDataset
    from masterthesis_tpu.models import AdaINModel

    make_image_tree(tmp_path / "data", num_domains=4, per_domain=2)
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        dataset=PairedDataset,
        model=AdaINModel,
        use_dis_content=True,
        gan_step="fused",
        d_iter=1,  # every iteration is a main step -> model.loss keeps its keys
        num_workers=0,
        n_iters=2,
        max_iter=2,
        print_freq=1,
        save_freq=2,
        display_freq=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
        display_dir=str(tmp_path / "images"),
        logdir=None,
        resume=None,
        resume_opt=None,
        shuffle=False,
    )
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    os.makedirs(args.display_dir, exist_ok=True)
    trainer = Trainer()
    dataloader = trainer.load_dataset(args)
    model, state = trainer.create_model(args)
    state = trainer.train(args, model, state, dataloader, mesh=None)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(args.checkpoint_dir, "model_3.ckpt"))
    # the fused step logs the reference's loss keys
    for key in ("g_adv", "g_cls", "l1_cc_rec", "total_g"):
        assert key in model.loss


def test_sampler_writes_translations(tmp_path):
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.sample import Sampler

    make_image_tree(tmp_path / "data", num_domains=2, per_domain=1, mode="imgs", size=40)
    args = default_test_args(
        dataroot=str(tmp_path / "data" / "imgs"),
        model=AdaINModel,
        batch_size=1,
        num_domains=4,
        latent_dim=4,
        dim=8,
        crop_size=32,
        num_workers=0,
        display_dir=str(tmp_path / "out"),
        result_dir=str(tmp_path / "out"),
    )
    sampler = Sampler()
    # small eval transform so the tiny model runs fast
    from masterthesis_tpu.data.transforms import EvalTransform

    sampler.transforms = EvalTransform(size=(32, 32))
    model, state = sampler.load_model(args)
    dataloader = sampler.load_dataset(args)
    sampler.sample(args, model, state, dataloader, trgs=[1])
    outs = []
    for root, _, files in os.walk(str(tmp_path / "out")):
        outs += [os.path.join(root, f) for f in files]
    assert any(f.endswith(".jpg") for f in outs)


def test_sampler_diverse_mode(tmp_path):
    from masterthesis_tpu.arguments import default_test_args
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.sample import Sampler
    from masterthesis_tpu.data.transforms import EvalTransform

    make_image_tree(tmp_path / "data", num_domains=1, per_domain=1, mode="imgs", size=40)
    args = default_test_args(
        dataroot=str(tmp_path / "data" / "imgs"), model=AdaINModel, batch_size=1,
        num_domains=4, latent_dim=4, dim=8, crop_size=32, num_workers=0,
        display_dir=str(tmp_path / "out"), result_dir=str(tmp_path / "out"),
    )
    sampler = Sampler()
    sampler.transforms = EvalTransform(size=(32, 32))
    model, state = sampler.load_model(args)
    dataloader = sampler.load_dataset(args)
    sampler.sample_diverse(args, model, state, dataloader, trgs=[2])
    assert os.path.exists(os.path.join(str(tmp_path / "out"), "0", "0_0.jpg"))


def test_sampler_int8_serving(tmp_path):
    """--int8: calibrate on input batches, then translate on the quantized
    path (jnp int8 math on CPU)."""
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.sample import Sampler

    make_image_tree(tmp_path / "data", num_domains=2, per_domain=2, mode="imgs", size=40)
    args = default_test_args(
        dataroot=str(tmp_path / "data" / "imgs"),
        model=AdaINModel,
        batch_size=1,
        num_domains=4,
        latent_dim=4,
        dim=8,
        crop_size=32,
        num_workers=0,
        display_dir=str(tmp_path / "out8"),
        result_dir=str(tmp_path / "out8"),
    )
    sampler = Sampler()
    from masterthesis_tpu.data.transforms import EvalTransform

    sampler.transforms = EvalTransform(size=(32, 32))
    model, state = sampler.load_model(args)
    dataloader = sampler.load_dataset(args)
    import numpy as np

    batches = [np.asarray(b) for b in dataloader][:2]
    model.calibrate_int8(state, batches)
    assert model.quant_cols
    sampler.sample(args, model, state, dataloader, trgs=[1])
    outs = []
    for root, _, files in os.walk(str(tmp_path / "out8")):
        outs += [os.path.join(root, f) for f in files]
    assert any(f.endswith(".jpg") for f in outs)


def test_sampler_video_in_video_out(tmp_path):
    """--out_fmt video on a video input: translated frame stream is written
    as one .avi per target via FrameWriter (flags the reference parses but
    never acts on, reference sample.py:11 + arguments.py:126-127)."""
    import cv2

    from masterthesis_tpu.data.transforms import EvalTransform
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.sample import Sampler

    vid_path = str(tmp_path / "in.avi")
    writer = cv2.VideoWriter(
        vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (40, 40)
    )
    rng_ = np.random.default_rng(0)
    for _ in range(5):
        writer.write(rng_.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    writer.release()

    args = default_test_args(
        dataroot=vid_path, model=AdaINModel, batch_size=1, num_domains=4,
        latent_dim=4, dim=8, crop_size=32, num_workers=0,
        out_fmt="video", vid_fname="clip.avi",
        display_dir=str(tmp_path / "vids"), result_dir=str(tmp_path / "vids"),
    )
    sampler = Sampler()
    sampler.transforms = EvalTransform(size=(32, 32))
    model, state = sampler.load_model(args)
    dataloader = sampler.load_dataset(args)
    assert dataloader.dataset.fps == 10.0
    sampler.sample_video(args, model, state, dataloader, trgs=[1])
    out = os.path.join(str(tmp_path / "vids"), "clip_fog.avi")
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) >= 4
    ok, frame = cap.read()
    assert ok and frame.shape == (32, 32, 3)
    cap.release()


def test_sampler_multi_iter_styles(tmp_path):
    """--multi_iter N renders N random styles per target with _s<k> suffixed
    filenames (reference arguments.py:130 parses the flag but ignores it)."""
    from masterthesis_tpu.data.transforms import EvalTransform
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.sample import Sampler

    make_image_tree(tmp_path / "data", num_domains=1, per_domain=1, mode="imgs", size=40)
    args = default_test_args(
        dataroot=str(tmp_path / "data" / "imgs"), model=AdaINModel, batch_size=1,
        num_domains=4, latent_dim=4, dim=8, crop_size=32, num_workers=0,
        multi_iter=2,
        display_dir=str(tmp_path / "out"), result_dir=str(tmp_path / "out"),
    )
    sampler = Sampler()
    sampler.transforms = EvalTransform(size=(32, 32))
    model, state = sampler.load_model(args)
    dataloader = sampler.load_dataset(args)
    sampler.sample(args, model, state, dataloader, trgs=[1])
    outs = []
    for root, _, files in os.walk(str(tmp_path / "out")):
        outs += [f for f in files]
    assert "image0_0_0_s0.jpg" in outs and "image0_0_0_s1.jpg" in outs
