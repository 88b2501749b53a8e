"""Repack a sample store (.npz / reference .pt) into the native .gsb format
(mmap'd zero-copy loading via native/gaot_io.cpp).

Usage: python tools/repack_gsb.py --root DATASET_ROOT --folder processed
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaot3d_tpu.data.dataset import load_sample  # noqa: E402
from gaot3d_tpu.data.native_io import write_gsb  # noqa: E402

logger = logging.getLogger("repack_gsb")


def main():
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--folder", default="processed")
    args = ap.parse_args()
    order = os.path.join(args.root, f"order_{args.folder}.txt")
    processed = os.path.join(args.root, args.folder)
    with open(order) as f:
        names = [line.strip() for line in f if line.strip()]
    for name in names:
        for ext in (".npz", ".pt"):
            src = os.path.join(processed, name + ext)
            if os.path.exists(src):
                sample = load_sample(src)
                write_gsb(os.path.join(processed, name + ".gsb"), sample)
                logger.info("repacked %s%s -> .gsb", name, ext)
                break
        else:
            logger.warning("no source for %s", name)


if __name__ == "__main__":
    main()
