#!/usr/bin/env python
"""End-to-end learning proof: train a small STA frontend on the synthetic
textured-room scene, then run the full SLAM stack with the trained weights
on a held-out trajectory and compare ATE against random weights.

Usage:
  python scripts/train_synthetic.py [--steps 1200] [--out /tmp/synth_sta.npz]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_slam_eval(model_cfg, params, eval_poses, dataset_cls_kwargs):
    import jax

    from vista_slam_tpu.datasets.synthetic_scene import SyntheticSceneDataset
    from vista_slam_tpu.eval.traj import ape_statistics
    from vista_slam_tpu.slam.frontend import FrontendEngine
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    ds = SyntheticSceneDataset(**dataset_cls_kwargs)
    ds.poses = eval_poses
    ds.n_frames = len(eval_poses)
    ds._cache.clear()
    engine = FrontendEngine(model_cfg, params)
    slam = OnlineSLAM(engine, loop_detector=None, max_view_num=64,
                      neighbor_edge_num=2, loop_edge_num=0, pgo_every=500,
                      rel_pose_thres=-1.0)
    n = len(eval_poses)
    for t in range(n):
        v = ds.view(t)
        slam.step({"rgb": v["img"], "gray": v["gray"],
                   "view_name": v["view_name"]}, force_pgo=(t == n - 1))
    est = [slam.get_view(k)["pose"] for k in range(slam.view_num)]
    stats = ape_statistics(np.stack(est), eval_poses[:len(est)])
    return stats["rmse"]


def eval_pair_pose_error(model_cfg, params, ds, n_pairs=32, seed=7):
    """Median relative-pose rotation error (deg) of the frontend on
    held-out view pairs — a more direct probe than full-SLAM ATE."""
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import STA

    model = STA(model_cfg)
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))
    rng = np.random.default_rng(seed)
    errs = []
    for _ in range(n_pairs):
        i = int(rng.integers(0, ds.n_frames))
        j = (i + int(rng.integers(1, 4))) % ds.n_frames
        vi, vj = ds.view(i), ds.view(j)
        out = fwd(params, jnp.asarray(vi["img"])[None], jnp.asarray(vj["img"])[None])
        pred = np.asarray(out["pose"][0])  # i in j's frame
        gt = np.linalg.inv(vj["camera_pose"]) @ vi["camera_pose"]
        cosang = np.clip((np.trace(pred[:3, :3].T @ gt[:3, :3]) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(cosang)))
    return float(np.median(errs))


def main():
    import jax
    import jax.numpy as jnp

    from vista_slam_tpu.datasets.synthetic_scene import (SyntheticSceneDataset,
                                                         orbit_trajectory)
    from vista_slam_tpu.models.convert import save_params_npz
    from vista_slam_tpu.models.sta import STA, STAConfig
    from vista_slam_tpu.parallel.mesh import make_mesh
    from vista_slam_tpu.train.data import TrainLoader
    from vista_slam_tpu.train.step import make_optimizer, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="/tmp/synth_sta.npz")
    ap.add_argument("--patch", type=int, default=8)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--opt-state", default="fp32",
                    choices=("fp32", "bf16", "int8", "bf16_fused",
                             "int8_fused"),
                    help="Adam moment storage (train/quantized_opt.py) — "
                         "the model-scale quality A/B for BASELINE.md "
                         "'Compressed-moment quality at model scale'")
    ap.add_argument("--save-losses", default=None,
                    help="save the per-step loss sequence to this .npy "
                         "(same data order across --opt-state arms)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    hw = (64, 64)
    cfg = STAConfig(img_size=hw, patch_size=args.patch, enc_dim=96, enc_depth=4,
                    enc_heads=4, dec_dim=64, dec_depth=4, dec_heads=4,
                    mlp_ratio=4, compute_dtype=jnp.bfloat16)
    model = STA(cfg)
    ds_kwargs = dict(n_frames=64, hw=hw, focal=48.0, neighbor_num=1,
                     loop_num=1, radius=2.0)
    ds = SyntheticSceneDataset(**ds_kwargs)
    n_support = 3
    loader = TrainLoader(ds, args.batch, n_support)

    mesh = make_mesh()
    tx = make_optimizer(lr=args.lr, warmup_steps=100, total_steps=args.steps,
                        weight_decay=0.01, state_dtype=args.opt_state)
    init_fn, jit_step, shard_batch = make_train_step(model, tx, mesh, n_support)

    with mesh:
        dummy = jnp.zeros((1,) + hw + (3,))
        params0 = model.init(jax.random.PRNGKey(0), dummy, dummy)
        # host copy: device_put in init_fn may alias these buffers and the
        # donated train step would delete them
        params0 = jax.device_get(params0)
        state = init_fn(params0)
        step = 0
        epoch = 0
        t0 = time.time()
        losses = []
        while step < args.steps:
            loader.set_epoch(epoch)
            for batch in loader:
                state, loss, details = jit_step(state, shard_batch(batch))
                step += 1
                if args.save_losses:
                    losses.append(float(loss))
                if step % 100 == 0 or step == 1:
                    print(f"step {step}: loss {float(loss):.3f} "
                          f"({(time.time() - t0):.0f}s)", flush=True)
                if step >= args.steps:
                    break
            epoch += 1
        trained = jax.device_get(state.params)

    if args.save_losses:
        np.save(args.save_losses, np.asarray(losses, np.float32))
        print(f"saved {len(losses)} per-step losses to {args.save_losses}")

    save_params_npz(args.out, trained)
    print(f"saved trained params to {args.out}")

    if args.skip_eval:
        return
    eval_ds = SyntheticSceneDataset(**{**ds_kwargs, "radius": 1.6})
    rot_t = eval_pair_pose_error(cfg, trained, eval_ds)
    rot_r = eval_pair_pose_error(cfg, params0, eval_ds)
    print(f"frontend median rotation error: trained={rot_t:.2f} deg  "
          f"random={rot_r:.2f} deg")
    eval_poses = orbit_trajectory(20, radius=1.6, height=0.4).astype(np.float32)
    ate_trained = run_slam_eval(cfg, trained, eval_poses, ds_kwargs)
    ate_random = run_slam_eval(cfg, params0, eval_poses, ds_kwargs)
    print(f"SLAM ATE on held-out orbit: trained={ate_trained:.4f}  "
          f"random={ate_random:.4f}  "
          f"(improvement {ate_random / max(ate_trained, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
