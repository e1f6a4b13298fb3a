"""Shared setup for the cross-process sharded-train-step test: a tiny STA
config, a deterministic synthetic batch, and a one-step runner. Imported by
the pytest process (single-process 8-device reference value) AND by the two
spawned child processes (4 devices each, global (dp, tp) mesh) — both must
produce the same loss, proving the DCN path executes the real training
program with gradient synchronization (the reference's DDP contract,
reference: vista_slam/utils/croco_misc.py:227-248 + DDP allreduce
sta_model/train.py:398-400)."""

from __future__ import annotations

import numpy as np

B, S = 4, 1  # global batch (divides dp=4), support views


def tiny_cfg():
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import STAConfig

    return STAConfig(img_size=(32, 32), patch_size=16, enc_dim=32,
                     enc_depth=1, enc_heads=2, dec_dim=32, dec_depth=4,
                     dec_heads=2, mlp_ratio=2, head_type="linear",
                     compute_dtype=jnp.float32)


def make_batch(cfg, b: int = B):
    H, W = cfg.img_size
    rng = np.random.default_rng(42)

    def gt(shape_prefix):
        pts = rng.standard_normal(shape_prefix + (H, W, 3)).astype(np.float32)
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1, 0.0, 0.2]
        return {
            "pts3d_cam": pts,
            "valid_mask": np.ones(shape_prefix + (H, W), bool),
            "camera_pose": np.broadcast_to(pose, shape_prefix + (4, 4)).copy(),
            "camera_intrinsics": np.broadcast_to(
                np.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                           np.float32), shape_prefix + (3, 3)).copy(),
        }

    return {
        "main": dict(gt((b,)), img=rng.standard_normal(
            (b, H, W, 3)).astype(np.float32)),
        "supports": gt((S, b)),
        "support_imgs": rng.standard_normal((S, b, H, W, 3)).astype(np.float32),
    }


def run_one_step(mesh, state_dtype: str = "fp32",
                 n_steps: int = 1) -> float:
    """Init (seed-deterministic) params, run ``n_steps`` optimizer steps over
    the given mesh, return the last (globally reduced) loss. ``state_dtype``
    selects the Adam moment storage (fp32 | bf16 | int8 | *_fused) so the
    DCN test can pin the compressed-state path too. The global batch is
    sized to the mesh's dp extent (min B) so dp-only meshes stay legal."""
    from vista_slam_tpu.models.sta import STA, init_params_host
    from vista_slam_tpu.train.step import (make_optimizer, make_train_step)

    cfg = tiny_cfg()
    model, params = init_params_host(cfg, seed=0)
    optimizer = make_optimizer(total_steps=100, state_dtype=state_dtype)
    init_fn, jit_step, shard_batch = make_train_step(model, optimizer, mesh,
                                                     n_support=S)
    dp = mesh.shape["dp"]
    batch = shard_batch(make_batch(cfg, b=max(B, dp)))
    with mesh:
        state = init_fn(params)
        for _ in range(n_steps):
            state, loss, _ = jit_step(state, batch, 0.4)
    return float(loss)
