"""Dataset & loader semantics (reference dataset.py parity)."""
import numpy as np
import pytest

from masterthesis_tpu.data import (
    DataLoader,
    ImageFolder,
    ImageList,
    PairedDataset,
    PairedImageDataset,
    SingleDataset,
    collate,
)
from masterthesis_tpu.data.transforms import EvalTransform, TrainTransform
from masterthesis_tpu.utils import AttributeDict

from conftest import make_image_tree


def _args(root, **kw):
    d = AttributeDict(
        dataroot=str(root), mode="train", num_domains=4, load_size=36, crop_size=32,
        no_flip=False, select_domains=None, seed=0,
    )
    d.update(kw)
    return d


def test_image_list_recursive(tmp_path):
    make_image_tree(tmp_path, per_domain=2)
    ds = ImageList(str(tmp_path))
    assert len(ds) == 8
    img = ds[0]
    assert img.ndim == 3 and img.shape[-1] == 3
    assert 0.0 <= img.min() and img.max() <= 1.0  # raw ToTensor range


def test_image_folder_labels(tmp_path):
    make_image_tree(tmp_path, per_domain=2, mode="train")
    ds = ImageFolder(AttributeDict(dataroot=str(tmp_path / "train")))
    xs, ys = zip(*[(ds[i][0], ds[i][1]) for i in range(len(ds))])
    assert sorted(set(ys)) == [0, 1, 2, 3]


def test_single_dataset_semantics(tmp_path):
    make_image_tree(tmp_path, per_domain=3)
    ds = SingleDataset(_args(tmp_path))
    assert len(ds) == 3  # max domain size
    item = ds[0]
    assert item["x"].shape == (32, 32, 3)
    assert item["y"].shape == (4,) and item["y"].sum() == 1.0
    assert -1.0 <= item["x"].min() and item["x"].max() <= 1.0


def test_single_dataset_select_domains(tmp_path):
    make_image_tree(tmp_path, per_domain=2)
    args = _args(tmp_path, select_domains=["cloud", "sun"], num_domains=2)
    ds = SingleDataset(args)
    assert ds.target_names == ["cloud", "sun"]
    item = ds[0]
    assert item["y"].shape == (2,)


def test_paired_dataset_distinct_domains(tmp_path):
    make_image_tree(tmp_path, per_domain=3)
    ds = PairedDataset(_args(tmp_path))
    for i in range(6):
        item = ds[i]
        assert item["x1"].shape == item["x2"].shape == (32, 32, 3)
        d1 = int(np.argmax(item["y1"]))
        d2 = int(np.argmax(item["y2"]))
        assert d1 != d2  # sampled without replacement


def test_paired_image_dataset_int_labels(tmp_path):
    make_image_tree(tmp_path, per_domain=2)
    ds = PairedImageDataset(_args(tmp_path))
    item = ds[0]
    assert item["y1"].dtype == np.int64
    assert int(item["y1"]) != int(item["y2"])


def test_dataloader_collate_and_prefetch(tmp_path):
    make_image_tree(tmp_path, per_domain=4)
    ds = PairedDataset(_args(tmp_path))
    for workers in (0, 2):
        dl = DataLoader(ds, batch_size=2, num_workers=workers, drop_last=True)
        batches = list(dl)
        assert len(batches) == 2
        b = batches[0]
        assert b["x1"].shape == (2, 32, 32, 3)
        assert b["y1"].shape == (2, 4)


def test_transforms_geometry():
    from PIL import Image

    img = Image.fromarray(np.zeros((50, 70, 3), np.uint8))
    t = TrainTransform(load_size=36, crop_size=32, train=True)
    out = t(img, np.random.default_rng(0))
    assert out.shape == (32, 32, 3)
    e = EvalTransform(size=(54, 96))
    out = e(img)
    assert out.shape == (54, 96, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_collate_nested():
    items = [{"a": np.zeros((2,)), "b": (np.ones(()), "p1")},
             {"a": np.ones((2,)), "b": (np.zeros(()), "p2")}]
    c = collate(items)
    assert c["a"].shape == (2, 2)
    assert c["b"][0].shape == (2,)
    assert c["b"][1] == ["p1", "p2"]


def test_dataloader_host_sharding(tmp_path):
    """Multi-host striding: shards are disjoint and cover the index space."""
    make_image_tree(tmp_path, per_domain=4)
    ds = SingleDataset(_args(tmp_path, num_domains=4))

    class _IdxDs:
        def __len__(self):
            return 12

        def __getitem__(self, i):
            return np.array([i])

    shards = []
    for s in range(3):
        dl = DataLoader(_IdxDs(), batch_size=2, shard_index=s, num_shards=3)
        got = np.concatenate([b.ravel() for b in dl])
        shards.append(set(got.tolist()))
        assert len(dl) == 2
    assert shards[0] | shards[1] | shards[2] == set(range(12))
    assert not (shards[0] & shards[1])
