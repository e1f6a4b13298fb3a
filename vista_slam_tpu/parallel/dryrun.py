"""Self-contained multi-chip dryrun: jit the FULL training step over an
n-device (dp, tp) mesh and run ONE step on tiny shapes.

Multi-chip TPU hardware is not available in the build environment, so the
mesh is materialized on n virtual CPU devices. This module FORCES the CPU
backend before jax initializes — the ambient environment may point jax at a
(possibly version-mismatched) TPU plugin (JAX_PLATFORMS=axon), and a dryrun
that inherits that backend dies at the first device_put. The XLA programs
validated here are identical to the TPU ones up to backend lowering.

Run as ``python -m vista_slam_tpu.parallel.dryrun N`` (a fresh interpreter is
the only fully reliable way to control backend selection; ``__graft_entry__.
dryrun_multichip`` spawns exactly that). Importing and calling :func:`main`
in-process also works IF jax has not yet initialized a backend, or if it can
be re-pointed at CPU (we retarget the config and drop cached backends, the
same recovery tests/conftest.py uses).

Reference analog: the NCCL process-group init contract the reference's DDP
training must satisfy (reference: vista_slam/utils/croco_misc.py:227-248).
"""

from __future__ import annotations

import os
import sys


def _force_cpu_backend(n_devices: int) -> None:
    """Point jax at n virtual CPU devices, even if jax is already imported."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    os.environ["XLA_FLAGS"] = " ".join(flags)

    if "jax" in sys.modules:
        # A site hook may have imported jax already, freezing jax_platforms
        # to a hardware backend. Retarget and drop initialized backends so
        # the next backend lookup re-reads the env (same recovery as
        # tests/conftest.py).
        import jax

        if jax.config.jax_platforms != "cpu":
            jax.config.update("jax_platforms", "cpu")
        try:
            from jax._src import xla_bridge

            xla_bridge.backends.cache_clear()
        except Exception:
            pass


def main(n_devices: int) -> None:
    _force_cpu_backend(n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "cpu":
        raise RuntimeError(
            f"dryrun needs the CPU backend, got {jax.default_backend()!r}; "
            "run via `python -m vista_slam_tpu.parallel.dryrun N` in a fresh "
            "interpreter")
    if jax.device_count() < n_devices:
        raise RuntimeError(
            f"requested {n_devices} devices but only {jax.device_count()} "
            "materialized (XLA_FLAGS applied too late? run in a fresh "
            "interpreter)")

    from vista_slam_tpu.models.sta import STA, STAConfig
    from vista_slam_tpu.parallel.mesh import make_mesh
    from vista_slam_tpu.train.step import make_optimizer, make_train_step

    mesh = make_mesh(n_devices)
    dp = mesh.shape["dp"]

    # tiny model, but every sharded dimension divisible by tp
    cfg = STAConfig(img_size=(64, 64), patch_size=16, enc_dim=64, enc_depth=2,
                    enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                    mlp_ratio=4, compute_dtype=jnp.float32)
    model = STA(cfg)

    B = 2 * dp  # batch divisible by dp
    S = 2
    H, W = cfg.img_size
    rng = np.random.default_rng(0)

    def views(shape_prefix):
        return {
            "pts3d_cam": jnp.asarray(
                rng.uniform(0.5, 2.0, shape_prefix + (H, W, 3)).astype(np.float32)),
            "valid_mask": jnp.ones(shape_prefix + (H, W), bool),
            "camera_pose": jnp.broadcast_to(jnp.eye(4), shape_prefix + (4, 4)),
            "camera_intrinsics": jnp.broadcast_to(
                jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]]),
                shape_prefix + (3, 3)),
        }

    batch = {
        "main": dict(views((B,)),
                     img=jnp.asarray(rng.standard_normal((B, H, W, 3)).astype(np.float32))),
        "supports": views((S, B)),
        "support_imgs": jnp.asarray(
            rng.standard_normal((S, B, H, W, 3)).astype(np.float32)),
    }

    with mesh:
        params = model.init(jax.random.PRNGKey(0), batch["main"]["img"][:1],
                            batch["main"]["img"][:1])
        optimizer = make_optimizer(total_steps=100)
        init_fn, jit_step, shard_batch = make_train_step(model, optimizer, mesh, S)
        state = init_fn(params)
        batch = shard_batch(batch)
        state, loss, details = jit_step(state, batch)
        loss = float(loss)
        assert np.isfinite(loss), f"non-finite training loss {loss}"

    # Second contract: the multi-chip INFERENCE path. FrontendEngine(mesh=...)
    # runs the SLAM hot loop dp-sharded over pair batches with params in the
    # tp layout (slam/frontend.py); it must compile, execute, and reproduce
    # the single-device decode. (The reference is strictly single-GPU at
    # inference, vista_slam/slam.py:28 — this contract is TPU-only capability.)
    from vista_slam_tpu.models.sta import init_params
    from vista_slam_tpu.slam.frontend import FrontendEngine

    _, inf_params = init_params(cfg, seed=0)
    imgs = rng.uniform(-1, 1, (4, H, W, 3)).astype(np.float32)

    def decode_all(mesh_arg):
        engine = FrontendEngine(cfg, inf_params, mesh=mesh_arg)
        feats = engine.encode_batch(imgs)
        out = engine.decode_pairs(feats[:-1], feats[1:])  # 3 pairs -> bucket 4
        return {k: np.asarray(out[k]) for k in
                ("pose_ij", "pose_conf_ij", "K", "mean_conf_i")}

    single = decode_all(None)
    sharded = decode_all(mesh)
    max_delta = 0.0
    for k in single:
        d = float(np.max(np.abs(sharded[k] - single[k])))
        max_delta = max(max_delta, d)
        # tp psum reduction order perturbs the pose head's SVD at ~1e-4
        # (same tolerance as tests/test_multichip.py)
        np.testing.assert_allclose(sharded[k], single[k], atol=1e-3,
                                   err_msg=f"sharded decode mismatch in {k}")

    print(f"dryrun_multichip OK on {n_devices} devices "
          f"(mesh dp={mesh.shape['dp']} tp={mesh.shape['tp']}): "
          f"train step loss={loss:.4f}; dp-sharded inference decode matches "
          f"single-device (max delta {max_delta:.2e})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
