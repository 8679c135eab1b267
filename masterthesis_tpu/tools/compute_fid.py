"""Two-directory FID CLI (parity with reference src/misc/compute_fid.py:1-9).

``--mode clean`` reproduces cleanfid's resize protocol (host-side unquantized
PIL-bicubic resize to 299) — the mode the reference's eval actually used;
``--mode plain`` resizes on device with bilinear (reference metrics/fid.py).

Usage: python -m masterthesis_tpu.tools.compute_fid dir1 dir2 \
           [--mode clean] [--weights fid_inception.npz]
"""
from __future__ import annotations

import argparse

from masterthesis_tpu.metrics.fid import compute_fid_from_dirs

if __name__ == "__main__":
    parser = argparse.ArgumentParser("FID")
    parser.add_argument("dir1")
    parser.add_argument("dir2")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--mode", choices=["plain", "clean"], default="plain")
    parser.add_argument("--weights", type=str, default=None,
                        help="npz with pretrained FID-InceptionV3 weights")
    args = parser.parse_args()
    score = compute_fid_from_dirs(
        args.dir1, args.dir2, batch_size=args.batch_size,
        weights_path=args.weights, mode=args.mode,
    )
    print(f"FID: {score}")
