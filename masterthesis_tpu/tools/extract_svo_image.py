"""SVO frame-extraction CLI (parity with reference src/misc/extract_svo_image.py:1-29).

Requires the pyzed SDK (gated; see tools.videoreaders.SVOReader).
"""
from __future__ import annotations

import argparse
import os

from masterthesis_tpu.tools.videoreaders import SVOReader


def extract(vid_fname: str, output_dir: str, save_freq: int = 10, out_fmt: str = "frames"):
    print(f"Extracting: {vid_fname} . . .")
    reader = SVOReader(vid_fname, outdir=output_dir, outfmt=out_fmt)
    for i in range(len(reader)):
        frame = reader.get_frame()
        if i % save_freq == 0:
            reader.write(frame, i)
    reader.close()


def run(dataroot: str, output_dir: str, save_freq: int = 10, out_fmt: str = "frames"):
    if os.path.isdir(dataroot):
        for vfile in sorted(os.listdir(dataroot)):
            extract(os.path.join(dataroot, vfile), output_dir, save_freq, out_fmt)
    else:
        extract(dataroot, output_dir, save_freq, out_fmt)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("SVO Image extractor")
    parser.add_argument("--dataroot", type=str, required=True)
    parser.add_argument("--outdir", type=str, default=os.path.join(os.getcwd(), "outputs"))
    parser.add_argument("--outfmt", type=str, default="image")
    parser.add_argument("--save_freq", type=int, default=10)
    args = parser.parse_args()
    print(f"Extracting to : {args.outdir}")
    run(args.dataroot, args.outdir, args.save_freq, args.outfmt)
