"""Image grid / save helpers operating on NHWC numpy/JAX arrays in [-1, 1].

Capability parity with reference src/utils.py:40-117 (make_grid, tensor_to_image,
save_image, save_images) but for NHWC arrays and without torch.
"""
from __future__ import annotations

import os

import numpy as np


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def make_grid(images, nrow: int = 1) -> np.ndarray:
    """Tile a batch of NHWC images into one HWC image.

    ``nrow`` is the number of images per row (matching the reference's custom
    make_grid at utils.py:40-71 where `nrow` counts columns-per-row).
    """
    x = _to_numpy(images)
    if x.ndim == 3:
        x = x[None]
    if x.ndim != 4:
        raise ValueError(f"expected NHWC batch, got shape {x.shape}")
    n, h, w, c = x.shape
    ncols = min(nrow, n)
    nrows = int(np.ceil(n / ncols))
    grid = np.zeros((h * nrows, w * ncols, c), dtype=x.dtype)
    for k in range(n):
        r, col = divmod(k, ncols)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = x[k]
    return grid


def tensor_to_image(images, nrow: int = 1) -> np.ndarray:
    """[-1,1] NHWC batch -> uint8 HWC grid (reference utils.py:73-80)."""
    grid = make_grid(images, nrow=nrow)
    grid = grid / 2.0 + 0.5
    grid = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    return grid


def save_image(image, image_path: str, nrow: int = 1) -> None:
    """Save a [-1,1] NHWC image (or batch -> grid) to disk (utils.py:103-111)."""
    from PIL import Image

    arr = tensor_to_image(image, nrow=nrow)
    os.makedirs(os.path.dirname(os.path.abspath(image_path)), exist_ok=True)
    Image.fromarray(arr).save(image_path)


def save_images(images, names) -> None:
    """Save each image in a batch under the corresponding name (utils.py:113-117)."""
    x = _to_numpy(images)
    for img, name in zip(x, names):
        save_image(img, name)


def tensor_to_mask(mask, imtype=np.uint8) -> np.ndarray:
    """[0,1] NHWC segmentation mask -> uint8 image (reference utils.py:82-93)."""
    grid = make_grid(_to_numpy(mask))
    return np.clip(grid * 255.0, 0, 255).astype(imtype)


def resize_image(img: np.ndarray, size) -> np.ndarray:
    """Resize an HWC uint8 image (reference utils.py:95-101)."""
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize(size))


def param_to_str(**kwargs) -> str:
    """'key: value, ...' formatting helper (reference utils.py:34-38)."""
    return str([f"{key}: {value}" for key, value in kwargs.items()]).strip("[]")
