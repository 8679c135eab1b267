"""Frame-extraction CLI: end-to-end on a tiny synthetic video."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from masterthesis_tpu.tools.extract import collect_videos, extract_video, main
from masterthesis_tpu.tools.videoreaders import FrameWriter


@pytest.fixture()
def tiny_video(tmp_path):
    path = tmp_path / "clips"
    path.mkdir()
    writer = FrameWriter(str(path), "video", fname="clip.avi", fps=5.0)
    rng = np.random.default_rng(0)
    for i in range(12):
        writer.write(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8), i)
    writer.close()
    return str(path / "clip.avi")


def test_extract_stride_and_limit(tiny_video, tmp_path):
    out = tmp_path / "frames"
    n = extract_video(tiny_video, str(out), stride=4, limit=2)
    assert n == 2
    assert sorted(os.listdir(out)) == ["frame_000000.png", "frame_000004.png"]


def test_extract_cli_per_video_dirs(tiny_video, tmp_path):
    out = tmp_path / "frames"
    main([os.path.dirname(tiny_video), "-o", str(out), "--stride", "6",
          "--per-video-dirs"])
    assert sorted(os.listdir(out / "clip")) == ["frame_000000.png", "frame_000006.png"]


def test_collect_videos_rejects_empty(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError):
        collect_videos([str(empty)])
    with pytest.raises(FileNotFoundError):
        collect_videos([str(tmp_path / "nope.mp4")])
