#!/usr/bin/env python
"""Per-keyframe attribution of the OFFLINE SLAM loop's steady-state cost.

Drives the real OnlineSLAM pipeline (BoW loop detection, speculative
slots, graph construction, fused encode+decode+store dispatch) on the
stress generator's frames and prints per-keyframe wall / decode / encode
deltas — the number end-to-end stress rates should be checked against.
Long stress runs through the dev relay are weather-dominated (BASELINE.md
"Per-keyframe host synchronization": same binaries measured 0.21-1.67
kf/s across one day); this probe gives the calm-window per-keyframe
budget directly, at any store size.

Usage: python scripts/profile_offline_step.py [--keyframes 40]
         [--max-view-num 200] [--neighbor-edge-num 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from stress_long_run import make_frames
    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.datasets.preprocess import to_model_inputs
    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.native.bow import train_vocabulary
    from vista_slam_tpu.slam.frontend import FrontendEngine
    from vista_slam_tpu.slam.loop_detector import LoopDetector
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=40)
    ap.add_argument("--max-view-num", type=int, default=200,
                    help="store size (sets the donated dense-buffer size)")
    ap.add_argument("--neighbor-edge-num", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--combine", action="store_true",
                    help="combine neighbor+loop pairs into one dispatch/"
                         "fetch (OnlineSLAM combine_loop_batch)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    n = args.keyframes
    frames = make_frames(n)
    grays = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    orb = cv2.ORB_create()
    descs, ids = [], []
    for i in range(0, max(n // 2, 8), 4):
        _, d = orb.detectAndCompute(grays[i % n], None)
        if d is not None:
            descs.append(d)
            ids.append(np.full(len(d), i))
    vocab = train_vocabulary(np.concatenate(descs), k=8, levels=3, seed=0,
                             image_ids=np.concatenate(ids))

    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    model, params = init_params_host(cfg, seed=0)
    params = jax.device_put(params)
    engine = FrontendEngine(cfg, params)
    det = LoopDetector(vocab, loop_dist_min=40, loop_nms=40,
                       loop_cand_thresh_neighbor=5)
    slam = OnlineSLAM(engine, loop_detector=det,
                      max_view_num=args.max_view_num,
                      neighbor_edge_num=args.neighbor_edge_num,
                      loop_edge_num=2, pgo_every=10 ** 9,
                      rel_pose_thres=-1.0,
                      combine_loop_batch=args.combine)

    walls = []
    for i in range(n):
        inputs = to_model_inputs(frames[i])
        td0, te0, f0 = engine.time_decode, engine.time_encode, engine.fetch_count
        t0 = time.perf_counter()
        slam.step({"rgb": inputs["rgb"], "gray": inputs["gray"],
                   "view_name": f"kf_{i:05d}"})
        w = time.perf_counter() - t0
        if i >= args.warmup:
            walls.append(w)
            print(f"kf {i:3d}: step {w * 1000:7.1f} ms  "
                  f"decode {1000 * (engine.time_decode - td0):7.1f}  "
                  f"encode {1000 * (engine.time_encode - te0):5.1f}  "
                  f"fetches {engine.fetch_count - f0}", flush=True)
    w = np.asarray(walls) * 1000
    print(f"\nsteady state over {len(w)} keyframes "
          f"(store {args.max_view_num} views): median {np.median(w):.1f} ms/kf "
          f"(p10 {np.percentile(w, 10):.1f}, p90 {np.percentile(w, 90):.1f}) "
          f"-> {1000 / np.median(w):.1f} kf/s", flush=True)


if __name__ == "__main__":
    main()
