"""Coverage for smaller utilities: host Sim(3) math, consistency checks,
stage timer, geometry helpers."""

import jax.numpy as jnp
import numpy as np

from vista_slam_tpu.slam import host_math as hm
from vista_slam_tpu.utils.consistency import (symmetric_geo_valid_mask,
                                              view_consistency_count)
from vista_slam_tpu.utils.geometry import (depth_from_pointcloud,
                                           depth_to_pointcloud,
                                           estimate_intrinsics_batched,
                                           estimate_intrinsics_shared,
                                           inv_se3)
from vista_slam_tpu.utils.profiling import StageTimer


def test_host_math_matches_jax_sim3():
    from vista_slam_tpu.ops import sim3 as js

    rng = np.random.default_rng(0)
    for _ in range(5):
        xi1 = rng.standard_normal(7).astype(np.float32) * 0.5
        xi2 = rng.standard_normal(7).astype(np.float32) * 0.5
        a = np.asarray(js.exp(jnp.asarray(xi1)))
        b = np.asarray(js.exp(jnp.asarray(xi2)))
        np.testing.assert_allclose(hm.mul(a, b), np.asarray(js.mul(jnp.asarray(a), jnp.asarray(b))), atol=1e-5)
        np.testing.assert_allclose(hm.inv(a), np.asarray(js.inv(jnp.asarray(a))), atol=1e-5)
        m = hm.to_pose_matrix(a)
        back = hm.from_matrix(m, float(a[7]))
        np.testing.assert_allclose(hm.to_pose_matrix(back), m, atol=1e-5)


def test_intrinsics_estimation_recovers_K():
    """Points unprojected with a known K must yield that K back."""
    H = W = 32
    K = jnp.asarray([[40.0, 0, 16], [0, 44.0, 16], [0, 0, 1]])
    depth = jnp.full((2, H, W), 2.5)
    pts = depth_to_pointcloud(depth, K)
    conf = jnp.ones((2, H, W))
    K_est = estimate_intrinsics_shared(pts, conf)
    np.testing.assert_allclose(np.asarray(K_est), np.asarray(K), atol=1e-2)
    K_b = estimate_intrinsics_batched(pts, conf)
    np.testing.assert_allclose(np.asarray(K_b[0]), np.asarray(K), atol=1e-2)

    d_back = depth_from_pointcloud(pts, K)
    # ray-dot depth equals z-depth only along the optical axis; check center
    np.testing.assert_allclose(float(d_back[0, H // 2, W // 2]), 2.5, atol=1e-3)


def test_inv_se3_matches_lu_inverse():
    """Closed-form rigid inverse vs np.linalg.inv on random SE(3) poses
    ([4,4] and batched [B,4,4]); it must also be an exact group inverse
    (T @ inv(T) == I to fp32 roundoff)."""
    rng = np.random.default_rng(7)
    from vista_slam_tpu.ops import sim3 as js
    xi = rng.standard_normal((6, 7)).astype(np.float32)
    xi[:, 6] = 0.0  # rigid: zero log-scale
    T = np.stack([hm.to_pose_matrix(np.asarray(js.exp(jnp.asarray(x))))
                  for x in xi])
    got = np.asarray(inv_se3(jnp.asarray(T)))
    np.testing.assert_allclose(got, np.linalg.inv(T), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got @ T, np.broadcast_to(np.eye(4), T.shape),
                               atol=1e-5)
    # unbatched [4,4]
    got1 = np.asarray(inv_se3(jnp.asarray(T[0])))
    np.testing.assert_allclose(got1, np.linalg.inv(T[0]), rtol=1e-5,
                               atol=1e-5)


def test_symmetric_geo_valid_mask_flags_outliers():
    """Under identity relative pose, lightly-noisy consistent pixels pass the
    adaptive 2x-median threshold while a corrupted block fails (the
    threshold is relative, so exactly-zero error everywhere is degenerate —
    same as the reference's 2*median rule, slam_utils.py:334-335)."""
    H = W = 16
    K = jnp.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])
    rng = np.random.default_rng(0)
    d1 = 2.0 + 1e-4 * rng.standard_normal((H, W)).astype(np.float32)
    d2 = 2.0 + 1e-4 * rng.standard_normal((H, W)).astype(np.float32)
    d2[4:8, 4:8] += 1.0
    depth = jnp.asarray(np.stack([d1, d2]))
    masks = np.asarray(symmetric_geo_valid_mask(depth, K, jnp.eye(4)))
    # 2x-median is an adaptive cut through the noise distribution: most clean
    # pixels pass, the corrupted block (error ~1m >> noise) never does
    clean = np.ones((H, W), bool)
    clean[4:8, 4:8] = False
    assert masks[0][clean].mean() > 0.6
    assert masks[0, 4:8, 4:8].mean() < 0.1


def test_view_consistency_count():
    H = W = 16
    K = jnp.broadcast_to(jnp.asarray([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]]), (3, 3, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
    depth = jnp.full((3, H, W), 2.0)
    counts = view_consistency_count(depth, K, poses, window=2)
    # identical cameras: every pixel agrees with both neighbors
    assert int(counts.min()) >= 2


def test_stage_timer():
    t = StageTimer("a", "b")
    with t("a"):
        pass
    with t("b"):
        pass
    s = t.summary()
    assert set(s) == {"a", "b", "total"}
    assert s["total"] >= 0
