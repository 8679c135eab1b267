"""Frame-extraction CLI for standard video files
(parity with reference src/misc/extract_image.py:1-28).

Usage: python -m masterthesis_tpu.tools.extract_image --dataroot vid_or_dir
       --outdir out [--save_freq 10] [--outfmt image]
"""
from __future__ import annotations

import argparse
import os

from masterthesis_tpu.tools.videoreaders import FrameReader, FrameWriter


def extract(vid_fname: str, output_dir: str, save_freq: int = 10, out_fmt: str = "image"):
    print(f"Extracting: {vid_fname} . . .")
    reader = FrameReader(vid_fname)
    writer = FrameWriter(output_dir, out_fmt, fps=reader.fps or 25.0)
    for i, frame in enumerate(reader):
        if i % save_freq == 0:
            writer.write(frame, i)
    writer.close()
    reader.close()


def run(dataroot: str, output_dir: str, save_freq: int = 10, out_fmt: str = "image"):
    if os.path.isdir(dataroot):
        for vfile in sorted(os.listdir(dataroot)):
            extract(os.path.join(dataroot, vfile), output_dir, save_freq, out_fmt)
    else:
        extract(dataroot, output_dir, save_freq, out_fmt)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("Image extractor")
    parser.add_argument("--dataroot", type=str, required=True,
                        help="a video file or a directory of video files")
    parser.add_argument("--outdir", type=str, default=os.path.join(os.getcwd(), "outputs"))
    parser.add_argument("--outfmt", type=str, default="image")
    parser.add_argument("--save_freq", type=int, default=10)
    args = parser.parse_args()
    print(f"Extracting to : {args.outdir}")
    run(args.dataroot, args.outdir, args.save_freq, args.outfmt)
