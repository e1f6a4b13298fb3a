#!/usr/bin/env python
"""Render a PLY point cloud to PNG (multi-view turntable) — matplotlib-based
replacement for the reference's Open3D PLY viewer (reference:
scripts/vis_ply.py).

Usage: python scripts/vis_ply.py --ply output/test/pointcloud.ply [--views 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vista_slam_tpu.utils.pointcloud import read_ply  # noqa: E402


def main(argv=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--max-points", type=int, default=300000)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    pts, cols = read_ply(args.ply)
    if len(pts) > args.max_points:
        sel = np.random.default_rng(0).choice(len(pts), args.max_points, replace=False)
        pts, cols = pts[sel], (cols[sel] if cols is not None else None)

    fig = plt.figure(figsize=(5 * args.views, 5))
    for i in range(args.views):
        ax = fig.add_subplot(1, args.views, i + 1, projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.2,
                   c=(cols / 255.0 if cols is not None else "gray"))
        ax.view_init(elev=20, azim=360 * i / args.views)
        ax.set_axis_off()
    out = args.out or args.ply.rsplit(".", 1)[0] + ".png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
