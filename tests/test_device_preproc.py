"""On-device preprocessing: parity with the host pipeline, randomness, and
end-to-end trainer wiring with uint8 batches."""
import jax
import jax.numpy as jnp
import numpy as np

from masterthesis_tpu.data.device_preproc import (
    RawResizeTransform,
    preprocess,
    preprocess_pair_batch,
    sample_crop_params,
)

from conftest import make_image_tree, tiny_train_args


def test_preprocess_matches_host_math():
    rng_np = np.random.default_rng(0)
    imgs = rng_np.integers(0, 256, (4, 40, 40, 3), dtype=np.uint8)
    params = {
        "tops": jnp.array([0, 3, 8, 2]),
        "lefts": jnp.array([5, 0, 1, 7]),
        "flips": jnp.array([False, True, False, True]),
    }
    out = np.asarray(preprocess(jnp.asarray(imgs), params, crop_size=32))
    for i in range(4):
        t, l = int(params["tops"][i]), int(params["lefts"][i])
        ref = imgs[i, t : t + 32, l : l + 32].astype(np.float32) / 255.0 * 2 - 1
        if bool(params["flips"][i]):
            ref = ref[:, ::-1]
        np.testing.assert_allclose(out[i], ref, atol=1e-6)


def test_sample_crop_params_distribution():
    params = sample_crop_params(jax.random.PRNGKey(0), 256, 40, 32, train=True)
    tops = np.asarray(params["tops"])
    assert tops.min() >= 0 and tops.max() <= 8
    assert len(np.unique(tops)) > 3  # actually random
    flips = np.asarray(params["flips"])
    assert 0.2 < flips.mean() < 0.8
    # eval: deterministic center crop, no flips
    p_eval = sample_crop_params(jax.random.PRNGKey(0), 8, 40, 32, train=False)
    assert np.all(np.asarray(p_eval["tops"]) == 4)
    assert not np.asarray(p_eval["flips"]).any()


def test_preprocess_pair_batch_only_touches_uint8():
    rng_np = np.random.default_rng(1)
    batch = {
        "x1": jnp.asarray(rng_np.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8)),
        "x2": jnp.asarray(rng_np.integers(0, 256, (2, 40, 40, 3), dtype=np.uint8)),
        "y1": jnp.eye(4)[jnp.array([0, 1])],
        "y2": jnp.eye(4)[jnp.array([2, 3])],
    }
    out = preprocess_pair_batch(batch, jax.random.PRNGKey(0), 40, 32)
    assert out["x1"].shape == (2, 32, 32, 3)
    assert out["x1"].dtype == jnp.float32
    assert float(jnp.abs(out["x1"]).max()) <= 1.0 + 1e-6  # f32 rounding of 255*(2/255)
    # labels untouched
    np.testing.assert_array_equal(np.asarray(out["y1"]), np.asarray(batch["y1"]))
    # x1 and x2 get different crop draws
    assert not np.allclose(np.asarray(out["x1"]), np.asarray(out["x2"]))


def test_raw_resize_transform(tmp_path):
    make_image_tree(tmp_path, num_domains=1, per_domain=1, size=50)
    import os

    path = os.path.join(str(tmp_path), "train", "cloud", "img0.jpg")
    t = RawResizeTransform(load_size=36)
    arr = t.load_file(path)
    assert arr.shape == (36, 36, 3) and arr.dtype == np.uint8


def test_trainer_device_preproc_end_to_end(tmp_path):
    from masterthesis_tpu.data import PairedDataset
    from masterthesis_tpu.models import AdaINModel
    from masterthesis_tpu.train import Trainer

    make_image_tree(tmp_path / "data", num_domains=4, per_domain=2)
    args = tiny_train_args(
        dataroot=str(tmp_path / "data"),
        dataset=PairedDataset,
        model=AdaINModel,
        device_preproc=True,
        num_workers=0,
        n_iters=1,
        max_iter=1,
        print_freq=10,
        save_freq=10,
        display_freq=10,
        checkpoint_dir=str(tmp_path / "ckpt"),
        display_dir=str(tmp_path / "images"),
        logdir=None,
        use_dis_content=False,
        shuffle=False,
    )
    import os

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    trainer = Trainer()
    dataloader = trainer.load_dataset(args)
    batch = next(iter(dataloader))
    assert batch["x1"].dtype == np.uint8  # host emits raw uint8
    model, state = trainer.create_model(args)
    state = trainer.train(args, model, state, dataloader, mesh=None)
    assert int(state.step) == 2
