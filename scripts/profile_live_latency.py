#!/usr/bin/env python
"""Per-keyframe latency of the live path on the current accelerator.

Live mode (reference: run_live.py:139-183) is latency-bound: each keyframe
pays flow keyframing (host LK), encoder, the batched neighbor decode +
single fetch, and host graph replay. This script feeds synthetic frames
through the REAL OnlineSLAM.step at the flagship 224x224 config and reports
median / p90 per-keyframe latency, plus the incremental-PGO pause at the
live cadence (pgo_every=50).

Usage: python scripts/profile_live_latency.py [--frames 40] [--pgo-every 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.slam.frontend import FrontendEngine
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--pgo-every", type=int, default=50)
    ap.add_argument("--neighbors", type=int, default=3)
    ap.add_argument("--ab", action="store_true",
                    help="interleave a separate-encode-dispatch arm and "
                         "report the paired fused-vs-separate delta")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    model, params = init_params_host(cfg, seed=0)
    params = jax.device_put(params)
    engine = FrontendEngine(cfg, params)
    print(f"params ready in {time.time() - t0:.1f}s")

    def make_slam(fuse):
        return OnlineSLAM(engine, loop_detector=None, live_mode=True,
                          max_view_num=args.frames + 8,
                          neighbor_edge_num=args.neighbors, loop_edge_num=0,
                          pgo_every=args.pgo_every, rel_pose_thres=-1.0,
                          flow_thres=1.0, fuse_encode=fuse)

    slam = make_slam(True)
    # paired A/B arm: identical config but the round-2 schedule (separate
    # encode dispatch before the edge-batch dispatch). Interleaving the two
    # arms keyframe-by-keyframe cancels relay drift, which swings 3x across
    # sessions (BASELINE.md measurement caveat).
    slam_sep = make_slam(False) if args.ab else None

    rng = np.random.default_rng(0)
    h, w = cfg.img_size
    base = rng.uniform(-1, 1, (h, w + args.frames + 8, 3)).astype(np.float32)

    def frame(k):
        rgb = base[:, k:k + w]  # drifting crop = realistic flow displacement
        gray = ((rgb[..., 0] * 0.5 + 0.5) * 255).astype(np.uint8)
        return rgb, gray

    # warm up every decode bucket (1, 2, 4 pairs) + the PGO program so the
    # steady-state numbers measure the live path, not compilation
    t0 = time.time()
    arms = [slam] + ([slam_sep] if slam_sep else [])
    for s in arms:
        for k in range(args.neighbors + 2):
            rgb, gray = frame(k)
            s.step({"rgb": rgb, "gray": gray})
        s.pose_graph_optimize()
        s.reset()
    print(f"warmup (compile all buckets + PGO): {time.time() - t0:.1f}s")

    lat, pgo_lat, lat_sep = [], [], []
    for k in range(args.frames):
        rgb, gray = frame(k)
        is_kf = slam.flow_tracker.is_new_keyframe(gray) or k == 0
        if not is_kf:
            continue
        # alternate arm order per keyframe so relay warmth doesn't favor one
        order = arms if k % 2 == 0 else arms[::-1]
        for s in order:
            t0 = time.time()
            ran_pgo = s.step({"rgb": rgb, "gray": gray}, force_pgo=False)
            dt = time.time() - t0
            if s is slam:
                (pgo_lat if ran_pgo else lat).append(dt)
            elif not ran_pgo:
                lat_sep.append(dt)

    steady = np.asarray(lat) * 1e3
    print(f"keyframes: {len(lat) + len(pgo_lat)} of {args.frames} frames")
    print(f"per-keyframe latency (fused encode+decode dispatch): "
          f"median {np.median(steady):.0f} ms, "
          f"p90 {np.percentile(steady, 90):.0f} ms, "
          f"min {steady.min():.0f} ms  ({1e3 / np.median(steady):.1f} kf/s)")
    if lat_sep:
        sep = np.asarray(lat_sep) * 1e3
        n = min(len(steady), len(sep))
        d = sep[:n] - steady[:n]
        print(f"separate-encode arm: median {np.median(sep):.0f} ms, "
              f"p90 {np.percentile(sep, 90):.0f} ms, min {sep.min():.0f} ms")
        print(f"paired delta (separate - fused): median {np.median(d):.0f} ms"
              f", mean {d.mean():.0f} ms over {n} keyframes")
    if pgo_lat:
        print(f"keyframe+PGO latency: {np.median(pgo_lat) * 1e3:.0f} ms "
              f"(every {args.pgo_every} keyframes)")

    # incremental-PGO pause on this graph size (compiled in warmup only if
    # the buffer shapes match; time a second solve to be sure)
    slam.pose_graph_optimize()
    t0 = time.time()
    slam.pose_graph_optimize()
    print(f"PGO pause ({slam.view_num} views, compiled): "
          f"{(time.time() - t0) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
