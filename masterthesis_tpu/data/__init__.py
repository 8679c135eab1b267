"""Dataset registry (string -> class, reference arguments.py:41,56)."""
from masterthesis_tpu.data.datasets import (  # noqa: F401
    ImageFolder,
    ImageList,
    PairedDataset,
    PairedImageDataset,
    SingleDataset,
    VideoDataset,
)
from masterthesis_tpu.data.loader import DataLoader, collate, infinite, shard_batch  # noqa: F401
