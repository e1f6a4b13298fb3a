"""Loss sanity on geometrically consistent synthetic views: perfect
predictions must zero the geometric terms and minimize the confidence
terms at the expected values."""

import jax.numpy as jnp
import numpy as np

from vista_slam_tpu.train.losses import (joint_norm_factor, masked_mean,
                                         pointmap_conf_loss, rel_pose_loss,
                                         reproj_loss, sta_criterion)


def make_consistent_pair(seed=0, B=2, H=16, W=16, offset=0.3):
    """Two views of the same plane-ish scene with exact GT geometry."""
    rng = np.random.default_rng(seed)
    K = np.array([[20.0, 0, W / 2], [0, 20.0, H / 2], [0, 0, 1]], np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def unproject(depth):
        x = (xs - K[0, 2]) * depth / K[0, 0]
        y = (ys - K[1, 2]) * depth / K[1, 1]
        return np.stack([x, y, depth], -1).astype(np.float32)

    depth_main = np.full((H, W), 2.0, np.float32)
    pts_main = unproject(depth_main)

    # support camera translated along x; its GT pointmap is its own unproject
    T_main = np.eye(4, dtype=np.float32)
    T_supp = np.eye(4, dtype=np.float32)
    T_supp[0, 3] = offset
    depth_supp = np.full((H, W), 2.0, np.float32)
    pts_supp = unproject(depth_supp)

    def view(pts, T):
        return {
            "pts3d_cam": jnp.asarray(np.broadcast_to(pts, (B, H, W, 3))),
            "valid_mask": jnp.ones((B, H, W), bool),
            "camera_pose": jnp.broadcast_to(jnp.asarray(T), (B, 4, 4)),
            "camera_intrinsics": jnp.broadcast_to(jnp.asarray(K), (B, 3, 3)),
        }

    gt_main = view(pts_main, T_main)
    gt_supp = view(pts_supp, T_supp)
    rel_ms = np.linalg.inv(T_supp) @ T_main  # main -> support
    rel_sm = np.linalg.inv(rel_ms)

    def pred(gt, rel, conf=2.0, pose_conf=0.9):
        return {
            "pts3d": gt["pts3d_cam"],
            "conf": jnp.full((B, H, W), conf),
            "pose": jnp.broadcast_to(jnp.asarray(rel.astype(np.float32)), (B, 4, 4)),
            "pose_conf": jnp.full((B,), pose_conf),
        }

    return gt_main, gt_supp, pred(gt_main, rel_ms), pred(gt_supp, rel_sm)


def test_rel_pose_loss_floor_for_perfect_pose():
    gt_main, gt_supp, pm, ps = make_consistent_pair()
    # the arccos clamp at 0.99999 (reference: losses_geo.py:168) floors each
    # rotation term at arccos(0.99999) ~= 4.47e-3 rad even for a perfect
    # pose; with the identity constraint that is 2 terms x B=2 samples
    floor = 4 * np.arccos(0.99999)
    loss = rel_pose_loss(gt_main, gt_supp, pm, ps, use_conf=False)
    np.testing.assert_allclose(float(loss), floor, atol=2e-3)

    # a genuinely wrong pose dominates the floor
    import jax.numpy as jnp

    bad = np.asarray(pm["pose"]).copy()
    bad[:, :3, 3] += 1.0
    loss_bad = rel_pose_loss(gt_main, gt_supp, dict(pm, pose=jnp.asarray(bad)),
                             ps, use_conf=False)
    assert float(loss_bad) > 10 * float(loss)


def test_reproj_loss_zero_for_perfect_prediction():
    gt_main, gt_supp, pm, ps = make_consistent_pair()
    loss = reproj_loss(gt_main, gt_supp, pm, ps)
    assert float(loss) < 1e-3, float(loss)


def test_pointmap_conf_loss_minimal_at_perfect_points():
    gt_main, gt_supp, pm, ps = make_consistent_pair()
    alpha = 0.4
    loss = pointmap_conf_loss(gt_main, gt_supp, pm, ps, alpha=alpha)
    # zero point error: loss = 2 * (-alpha * log(conf)) with conf = 2
    expected = 2 * (-alpha * np.log(2.0))
    np.testing.assert_allclose(float(loss), expected, atol=1e-3)

    # corrupting the prediction must increase the data term
    pm_bad = dict(pm, pts3d=pm["pts3d"] + 0.5)
    loss_bad = pointmap_conf_loss(gt_main, gt_supp, pm_bad, ps, alpha=alpha)
    assert float(loss_bad) > float(loss)


def test_criterion_aggregates():
    gt_main, gt_supp, pm, ps = make_consistent_pair()
    total, details = sta_criterion(gt_main, [gt_supp], [pm], [ps])
    assert np.isfinite(float(total))
    assert set(details) == {"pts_0", "pose_0", "reproj_0"}


def test_masked_mean_and_norm_factor():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    m = jnp.asarray([[True, False], [True, True]])
    np.testing.assert_allclose(float(masked_mean(x, m)), (1 + 3 + 4) / 3, atol=1e-6)

    pts = jnp.full((1, 4, 4, 3), 1.0)  # |p| = sqrt(3)
    v = jnp.ones((1, 4, 4), bool)
    f = joint_norm_factor(pts, pts, v, v)
    np.testing.assert_allclose(np.asarray(f), np.sqrt(3), atol=1e-5)


def test_bf16_grad_sampler_matches_f32_path():
    """The bf16-backward sampler (TPU scatter-cost fix; AMP-grade like the
    reference's fp16-autocast grid_sample) must match the plain f32 gather
    exactly in the FORWARD and to bf16 tolerance in the BACKWARD."""
    import jax

    from vista_slam_tpu.train.losses import _grid_sample_nearest

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 12, 16, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (B, H, W, 2)), jnp.float32)

    out_a, va = _grid_sample_nearest(img, grid, grad_impl="f32")
    out_b, vb = _grid_sample_nearest(img, grid, grad_impl="bf16_scatter")
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    def loss(img, impl):
        out, valid = _grid_sample_nearest(img, grid, grad_impl=impl)
        return jnp.sum(out * valid[..., None] * 0.1)

    g_a = jax.grad(lambda im: loss(im, "f32"))(img)
    g_b = jax.grad(lambda im: loss(im, "bf16_scatter"))(img)
    # collisions accumulate in bf16: relative tolerance ~1e-2
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a),
                               rtol=2e-2, atol=2e-3)


def test_sorted_grad_sampler_matches_f32_path():
    """The scatter-free sorted VJP (argsort + fp32 cumsum + run-boundary
    differences) must match the exact fp32 XLA scatter-add backward to
    fp32-cumsum tolerance, forward bit-exact — including heavy index
    collisions (many grid points landing on one source pixel)."""
    import jax

    from vista_slam_tpu.train.losses import _grid_sample_nearest

    rng = np.random.default_rng(1)
    B, H, W, C = 2, 24, 32, 3
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    # heavy collisions: grid quantized to a handful of target pixels
    grid = jnp.asarray(
        np.round(rng.uniform(-1.1, 1.1, (B, H, W, 2)) * 3) / 3, jnp.float32)

    out_a, va = _grid_sample_nearest(img, grid, grad_impl="f32")
    out_s, vs = _grid_sample_nearest(img, grid, grad_impl="sorted")
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_s))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vs))

    def loss(img, impl):
        out, valid = _grid_sample_nearest(img, grid, grad_impl=impl)
        return jnp.sum(jnp.sin(out) * valid[..., None] * 0.1)

    g_a = jax.grad(lambda im: loss(im, "f32"))(img)
    g_s = jax.grad(lambda im: loss(im, "sorted"))(img)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_a),
                               rtol=1e-5, atol=1e-5)
