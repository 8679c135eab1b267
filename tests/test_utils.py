"""Utils layer tests (SURVEY.md §2 row 36): grids, image IO, helpers."""
import os

import numpy as np

from masterthesis_tpu.utils import (
    AttributeDict,
    AverageMeter,
    TimerBlock,
    get_modules,
    make_grid,
    module_to_dict,
    save_image,
    save_images,
    tensor_to_image,
)
from masterthesis_tpu.utils.images import param_to_str, tensor_to_mask


def test_make_grid_tiling():
    batch = np.stack([np.full((4, 6, 3), i, np.float32) for i in range(4)])
    grid = make_grid(batch, nrow=2)
    assert grid.shape == (8, 12, 3)
    assert grid[0, 0, 0] == 0 and grid[0, 11, 0] == 1
    assert grid[7, 0, 0] == 2 and grid[7, 11, 0] == 3


def test_tensor_to_image_range():
    img = np.full((1, 2, 2, 3), -1.0, np.float32)
    out = tensor_to_image(img)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, 0)
    out = tensor_to_image(np.full((1, 2, 2, 3), 1.0, np.float32))
    np.testing.assert_array_equal(out, 255)


def test_save_image_and_images(tmp_path):
    batch = np.zeros((2, 4, 4, 3), np.float32)
    save_image(batch[0], str(tmp_path / "one.jpg"))
    save_images(batch, [str(tmp_path / "a.jpg"), str(tmp_path / "sub" / "b.jpg")])
    assert os.path.exists(tmp_path / "one.jpg")
    assert os.path.exists(tmp_path / "sub" / "b.jpg")


def test_tensor_to_mask():
    m = np.ones((1, 3, 3, 1), np.float32) * 0.5
    out = tensor_to_mask(m)
    assert out.dtype == np.uint8
    assert int(out[0, 0, 0]) in (127, 128)


def test_attribute_dict():
    d = AttributeDict(a=1)
    d.b = 2
    assert d["b"] == 2 and d.a == 1
    assert d.missing is None  # reference semantics: .get fallback
    del d.b
    assert "b" not in d


def test_average_meter():
    m = AverageMeter("loss")
    m.update(1.0)
    m.update(3.0, n=3)
    assert m.avg == 2.5 and m.count == 4
    assert "loss" in str(m)


def test_timer_block_logs(capsys):
    with TimerBlock("title") as block:
        block.log("hello")
    out = capsys.readouterr().out
    assert "title" in out and "hello" in out and "Operation finished" in out


def test_reflection_helpers():
    import masterthesis_tpu.models as models_mod

    d = module_to_dict(models_mod)
    assert "AdaINModel" in d and "BaseModel" in d
    names = get_modules(models_mod, filter="Model")
    assert "AdaINModel" in names


def test_param_to_str():
    assert "a: 1" in param_to_str(a=1, b="x")
