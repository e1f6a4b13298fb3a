#!/usr/bin/env python
"""Headline benchmark: STA frontend two-view pairs/sec on one chip.

Measures the SLAM hot path (reference: vista_slam/slam.py:153-189 — decoder
+ DPT pointmap heads on both directions + pose head + shared-intrinsics
estimation) at the pair-batched batch size the online pipeline uses.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against an estimated 20 pairs/sec for the reference's
serial per-pair A100 decode (the reference publishes no number —
BASELINE.md; estimate documented there). The driver-set target is >= 2x A100
on one v5e chip, i.e. vs_baseline >= 2.0.
"""

import json
import sys
import time

import numpy as np

A100_REFERENCE_PAIRS_PER_SEC = 20.0  # documented estimate, see BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.slam.frontend import FrontendEngine

    log(f"devices: {jax.devices()}")
    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    model, params = init_params_host(cfg, seed=0)
    params = jax.device_put(params)
    log(f"params ready in {time.time() - t0:.1f}s")
    engine = FrontendEngine(cfg, params)

    batch = 8  # matches the SLAM pair-batch bucket
    n_tokens = cfg.num_patches
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((1, n_tokens, cfg.enc_dim)),
                         jnp.float32) for _ in range(batch + 1)]

    f_i = [feats[0]] * batch
    f_j = feats[1:batch + 1]

    # drive the REAL OnlineSLAM edge-batch path (single-sync pipeline:
    # async decode -> store scatter -> speculative scale reduction -> one
    # joint fetch -> host graph replay); reference equivalent runs each
    # pair serially through slam.py:153-241
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    slam = OnlineSLAM(engine, loop_detector=None, max_view_num=64,
                      neighbor_edge_num=batch, loop_edge_num=0, pgo_every=10 ** 6,
                      rel_pose_thres=-1.0)
    slam.enc_feats = feats
    slam.view_num = len(feats)

    def keyframe_cycle():
        i = slam.view_num - 1
        js = list(range(i - batch, i))
        slam._finish_edge_batch(i, js, slam._dispatch_edge_batch(i, js))

    # warmup / compile
    t0 = time.time()
    keyframe_cycle()
    log(f"compile+first run: {time.time() - t0:.1f}s")

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        slam.graph.reset()
        keyframe_cycle()
    dt = time.time() - t0
    pairs_per_sec = batch * iters / dt

    # encoder throughput as context (one encode per keyframe)
    img = jnp.asarray(rng.standard_normal((1,) + cfg.img_size + (3,)), jnp.float32)
    engine._encode(params, img).block_until_ready()
    t0 = time.time()
    for _ in range(10):
        engine._encode(params, img).block_until_ready()
    log(f"encoder: {10 / (time.time() - t0):.2f} frames/s")
    log(f"decode: {pairs_per_sec:.2f} pairs/s (batch {batch}, {iters} iters, {dt:.2f}s)")

    print(json.dumps({
        "metric": "sta_frontend_pairs_per_sec",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / A100_REFERENCE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
