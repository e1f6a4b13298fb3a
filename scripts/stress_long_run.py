#!/usr/bin/env python
"""Long-sequence loop-closure stress at the flagship config: the analog of
the reference's ScanNet scene0000 long run (BASELINE.json config 4).

Drives the REAL pipeline at full production sizes on the current
accelerator: 400 keyframes (224x224 bf16, neighbor_edge_num 3), BoW loop
closure with an in-repo-trained vocabulary, windowed PGO every
``--pgo-every`` keyframes, full artifact dump at the end. The sequence
makes two passes over the same visual strip, so the second half must
retrieve loop edges against the first.

Reports stage timing (reference time_dict schema), graph sizes, loop-edge
count and buffer headroom — the stability questions a long run answers.

Usage: python scripts/stress_long_run.py [--keyframes 400] [--pgo-every 100]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_frames(n, hw=(224, 224), revisit_at=0.5, seed=0):
    """Sliding crops over one long textured strip; the second
    ``1-revisit_at`` fraction replays the first pass's crops (loops)."""
    import cv2

    rng = np.random.default_rng(seed)
    h, w = hw
    first = int(n * revisit_at)
    strip_w = w + 4 * first
    strip = cv2.resize(rng.integers(0, 255, (h // 4, strip_w // 4, 3), np.uint8),
                       (strip_w, h), interpolation=cv2.INTER_CUBIC)
    frames = []
    for i in range(n):
        k = i if i < first else i - first  # second pass revisits
        x = 4 * k
        frames.append(strip[:, x:x + w].copy())
    return frames


def main():
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.datasets.preprocess import to_model_inputs
    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.native.bow import train_vocabulary
    from vista_slam_tpu.slam.frontend import FrontendEngine
    from vista_slam_tpu.slam.loop_detector import LoopDetector
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--keyframes", type=int, default=400)
    ap.add_argument("--pgo-every", type=int, default=100)
    ap.add_argument("--combine", action="store_true",
                    help="combine neighbor+loop pairs into one dispatch/fetch")
    ap.add_argument("--save-resume-at", type=int, default=0, metavar="K",
                    help="after keyframe K, save_state; at the end, restore "
                         "into a FRESH OnlineSLAM on the same engine, replay "
                         "keyframes K..n, and require the resumed run's "
                         "trajectory to be bit-identical to the "
                         "uninterrupted one (the live-config crash-recovery "
                         "contract at scale)")
    ap.add_argument("--out", default="/tmp/stress_out")
    ap.add_argument("--print-every", type=int, default=100,
                    help="progress/cadence print interval (keyframes)")
    args = ap.parse_args()

    import cv2
    import jax

    print(f"devices: {jax.devices()}")
    n = args.keyframes
    frames = make_frames(n)
    grays = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]

    t0 = time.time()
    orb = cv2.ORB_create()
    descs, ids = [], []
    for i in range(0, n // 2, 4):  # vocab corpus: first pass only
        _, d = orb.detectAndCompute(grays[i], None)
        if d is not None:
            descs.append(d)
            ids.append(np.full(len(d), i))
    vocab = train_vocabulary(np.concatenate(descs), k=8, levels=3, seed=0,
                             image_ids=np.concatenate(ids))
    print(f"vocab: {vocab.num_words} words ({time.time() - t0:.1f}s)")

    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    model, params = init_params_host(cfg, seed=0)
    params = jax.device_put(params)
    engine = FrontendEngine(cfg, params)
    det = LoopDetector(vocab, loop_dist_min=40, loop_nms=40,
                       loop_cand_thresh_neighbor=5)
    slam = OnlineSLAM(engine, loop_detector=det, max_view_num=n,
                      neighbor_edge_num=3, loop_edge_num=2,
                      pgo_every=args.pgo_every, rel_pose_thres=-1.0,
                      combine_loop_batch=args.combine)

    ckpt_path = os.path.join("/tmp", "stress_state.npz")
    t0 = time.time()
    for i in range(n):
        inputs = to_model_inputs(frames[i])
        slam.step({"rgb": inputs["rgb"], "gray": inputs["gray"],
                   "view_name": f"kf_{i:05d}"}, force_pgo=(i == n - 1))
        if args.save_resume_at and i + 1 == args.save_resume_at:
            ts = time.time()
            slam.save_state(ckpt_path, frame_cursor=i + 1)
            print(f"  kf {i + 1}: save_state -> {ckpt_path} "
                  f"({os.path.getsize(ckpt_path) / 1e6:.0f} MB, "
                  f"{time.time() - ts:.1f}s)", flush=True)
        if (i + 1) % args.print_every == 0:
            g = slam.graph
            print(f"  kf {i + 1}: nodes {g.num_nodes}/{g.max_nodes} "
                  f"edges {g.num_edges}/{g.max_edges} "
                  f"({(time.time() - t0) / (i + 1):.2f} s/kf avg)",
                  flush=True)
    wall = time.time() - t0

    g = slam.graph
    loop_edges = sum(
        1 for v, js in slam.get_view_graph().items()
        for j in js if abs(v - j) > det.loop_dist_min)
    td = slam.get_time_dict()
    print(f"\n{n} keyframes in {wall:.1f}s ({n / wall:.2f} kf/s end-to-end)")
    print(f"stage timing: { {k: round(v, 1) for k, v in td.items()} }")
    print(f"host syncs: {engine.fetch_count} blocking fetches "
          f"({engine.fetch_count / n:.2f}/kf), "
          f"{engine.fetch_arrays} array transfers "
          f"({engine.fetch_arrays / n:.2f}/kf)")
    print(f"graph: {g.num_nodes}/{g.max_nodes} nodes, "
          f"{g.num_edges}/{g.max_edges} edges, {loop_edges} loop edges")
    traj = np.stack([slam.get_view(v, filter_outlier=False)["pose"]
                     for v in range(slam.view_num)])
    assert np.isfinite(traj).all(), "non-finite pose after long run"
    print("trajectory finite; saving artifacts ...")
    slam.save_data_all(args.out)
    print(f"artifacts in {args.out}")

    if args.save_resume_at:
        k = args.save_resume_at
        print(f"\nresume check: fresh OnlineSLAM <- {ckpt_path}, "
              f"replaying keyframes {k}..{n} ...", flush=True)
        det2 = LoopDetector(vocab, loop_dist_min=40, loop_nms=40,
                            loop_cand_thresh_neighbor=5)
        slam2 = OnlineSLAM(engine, loop_detector=det2, max_view_num=n,
                           neighbor_edge_num=3, loop_edge_num=2,
                           pgo_every=args.pgo_every, rel_pose_thres=-1.0,
                           combine_loop_batch=args.combine)
        extra = slam2.load_state(ckpt_path)
        t0 = time.time()
        for i in range(int(extra["frame_cursor"]), n):
            inputs = to_model_inputs(frames[i])
            slam2.step({"rgb": inputs["rgb"], "gray": inputs["gray"],
                        "view_name": f"kf_{i:05d}"}, force_pgo=(i == n - 1))
        print(f"resumed arm: {n - k} keyframes in {time.time() - t0:.1f}s")
        traj2 = np.stack([slam2.get_view(v, filter_outlier=False)["pose"]
                          for v in range(slam2.view_num)])
        assert slam2.view_num == slam.view_num
        assert slam2.get_view_graph() == slam.get_view_graph(), \
            "resumed run changed the view graph"
        if np.array_equal(traj2, traj):
            print("resume BIT-IDENTICAL to the uninterrupted run "
                  f"({slam2.graph.num_edges} edges, "
                  f"{slam2.view_num} views)")
        else:
            d = np.abs(traj2 - traj).max()
            raise AssertionError(f"resumed trajectory differs (max {d:.3g})")


if __name__ == "__main__":
    main()
