#!/usr/bin/env python
"""Training-step throughput of the full-size STA model on the current
accelerator: steady-state step time, two-view pairs/s, and MFU from XLA
cost analysis of the jitted step (forward + backward + AdamW).

The reference trains with DDP/AMP on CUDA (reference:
vista_slam/sta_model/train.py:233-328) and publishes no throughput numbers;
this records the v5e counterpart for BASELINE.md.

Usage: python scripts/profile_train.py [--batch 4] [--support 1] [--steps 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.cli.common import enable_compilation_cache
    from vista_slam_tpu.models.sta import STAConfig, init_params_host
    from vista_slam_tpu.parallel.mesh import make_mesh
    from vista_slam_tpu.train.step import make_optimizer, make_train_step

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--support", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    B, S = args.batch, args.support

    print(f"devices: {jax.devices()}")
    cfg = STAConfig(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    model, params = init_params_host(cfg, seed=0)
    print(f"params ready in {time.time() - t0:.1f}s")

    H, W = cfg.img_size
    rng = np.random.default_rng(0)

    def views(shape_prefix):
        return {
            "pts3d_cam": jnp.asarray(
                rng.uniform(0.5, 2.0, shape_prefix + (H, W, 3)).astype(np.float32)),
            "valid_mask": jnp.ones(shape_prefix + (H, W), bool),
            "camera_pose": jnp.broadcast_to(jnp.eye(4), shape_prefix + (4, 4)),
            "camera_intrinsics": jnp.broadcast_to(
                jnp.asarray([[140.0, 0, W / 2], [0, 140.0, H / 2], [0, 0, 1]]),
                shape_prefix + (3, 3)),
        }

    batch = {
        "main": dict(views((B,)), img=jnp.asarray(
            rng.standard_normal((B, H, W, 3)).astype(np.float32))),
        "supports": views((S, B)),
        "support_imgs": jnp.asarray(
            rng.standard_normal((S, B, H, W, 3)).astype(np.float32)),
    }

    mesh = make_mesh(1)
    with mesh:
        optimizer = make_optimizer(total_steps=10_000)
        init_fn, jit_step, shard_batch = make_train_step(model, optimizer,
                                                         mesh, S)
        state = init_fn(params)
        batch = shard_batch(batch)

        t0 = time.time()
        state, loss, _ = jit_step(state, batch)
        print(f"compile+first step: {time.time() - t0:.1f}s, "
              f"loss={float(loss):.4f}")

        t0 = time.time()
        for _ in range(args.steps):
            state, loss, _ = jit_step(state, batch)
        jax.block_until_ready(loss)
        dt = (time.time() - t0) / args.steps

        flops = None
        try:
            cost = jit_step.lower(state, batch).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost["flops"])
        except Exception as e:
            print(f"cost analysis unavailable: {e}")

        pairs = S * B  # two-view pairs per step (both directions included)
        print(f"train step: {dt * 1e3:.0f} ms (batch {B}, {S} support views)"
              f" -> {pairs / dt:.1f} pairs/s, {B / dt:.1f} graphs/s")
        if flops:
            mfu = flops / dt / V5E_BF16_PEAK_FLOPS
            print(f"{flops / 1e12:.2f} TFLOP/step (XLA cost analysis) -> "
                  f"{flops / dt / 1e12:.1f} TFLOP/s = {mfu * 100:.1f}% MFU "
                  f"of v5e bf16 peak")


if __name__ == "__main__":
    main()
