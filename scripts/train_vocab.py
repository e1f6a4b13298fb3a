#!/usr/bin/env python
"""Train a bag-of-words vocabulary from a directory of images.

The reference pipeline downloads a prebuilt ORBvoc.txt; this tool makes the
TPU build self-sufficient: extract ORB descriptors from any image corpus and
train a hierarchical k-majority vocabulary.

Usage:
  python scripts/train_vocab.py --images '/data/frames/*.png' \
      --out pretrains/vocab.npz [--k 10] [--levels 4] [--max-images 500]
"""

import argparse
import glob
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from vista_slam_tpu.native.bow import train_vocabulary  # noqa: E402


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--max-images", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    paths = sorted(glob.glob(args.images))[: args.max_images]
    if not paths:
        raise SystemExit(f"no images matched {args.images}")
    orb = cv2.ORB_create()
    descs, ids = [], []
    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        _, d = orb.detectAndCompute(img, None)
        if d is not None:
            descs.append(d)
            ids.append(np.full(len(d), i))
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(paths)} images, {sum(map(len, descs))} descriptors")
    descs = np.concatenate(descs)
    ids = np.concatenate(ids)
    print(f"training k={args.k} L={args.levels} on {len(descs)} descriptors ...")
    vocab = train_vocabulary(descs, k=args.k, levels=args.levels,
                             seed=args.seed, image_ids=ids, n_images=len(paths))
    if args.out.endswith(".txt"):
        vocab.save_dbow_text(args.out)  # DBoW3-compatible text export
    else:
        vocab.save_npz(args.out)
    print(f"saved {vocab.num_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
