import jax.numpy as jnp
import numpy as np

from vista_slam_tpu.models.heads import (rotation_6d_to_matrix,
                                         svd_orthogonalize,
                                         svd_orthogonalize_stable)


def _check_so3(R, atol=1e-4):
    R = np.asarray(R)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=atol)


def test_rotation_6d():
    rng = np.random.default_rng(0)
    d6 = rng.standard_normal((10, 6)).astype(np.float32)
    R = rotation_6d_to_matrix(jnp.asarray(d6))
    _check_so3(R)


def test_stable_is_so3_and_agrees_near_orthogonal():
    rng = np.random.default_rng(1)
    # both variants must produce SO(3) for arbitrary inputs
    m = rng.standard_normal((6, 9)).astype(np.float32)
    _check_so3(svd_orthogonalize(jnp.asarray(m)))
    _check_so3(svd_orthogonalize_stable(jnp.asarray(m), n_iter=100))

    # near a rotation (trained-network regime) the two variants agree;
    # on random inputs they differ because the SVD path row-normalizes
    # first (reference: pose_head.py:49 vs :63)
    from vista_slam_tpu.ops.sim3 import quat_to_matrix, so3_exp_quat

    phi = rng.standard_normal((6, 3)).astype(np.float32)
    R = np.asarray(quat_to_matrix(so3_exp_quat(jnp.asarray(phi))))
    noisy = R + 0.01 * rng.standard_normal(R.shape).astype(np.float32)
    a = svd_orthogonalize(jnp.asarray(noisy))
    b = svd_orthogonalize_stable(jnp.asarray(noisy), n_iter=100)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_pose_head_inits_near_identity_with_finite_grads():
    """Guard for the from-scratch pose-head saddle fix (BASELINE.md
    'From-scratch pose-head saddle'): at flax init the rotation output
    must sit near the identity (NOT at a random rotation — that lands in
    the loss's conf-gated 180-degree trap) but NOT exactly at it (the SVD
    derivative NaNs at repeated singular values, and the head's row
    normalization turns diagonal biases back into orthonormal matrices).
    Both the angle window and gradient finiteness are load-bearing."""
    import jax

    from vista_slam_tpu.models.heads import PoseHead

    for rep in ("9D", "9D_stable", "6D"):
        head = PoseHead(rot_representation=rep)
        tok = jnp.zeros((2, 64))
        params = head.init(jax.random.PRNGKey(0), tok)
        R = np.asarray(head.apply(params, tok)["pose"][:, :3, :3])
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1, 1)))
        assert (ang < 15.0).all(), (rep, ang)

        def loss(p):
            out = head.apply(p, tok + 0.1)
            return (jnp.sum(out["pose"][:, :3, :3] *
                            jnp.asarray([[0.1, 0.2, 0.3]] * 3))
                    + jnp.sum(out["pose"][:, :3, 3]) + jnp.sum(out["conf"]))

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves), rep
        # the zero-init fc_rot kernel must still receive gradient signal
        flat = {"/".join(str(p) for p in k): v for k, v in
                jax.tree_util.tree_flatten_with_path(g)[0]}
        rot_kernel_grads = [v for k, v in flat.items()
                            if "fc_rot" in k and "kernel" in k]
        assert rot_kernel_grads and any(
            float(np.abs(np.asarray(v)).max()) > 0 for v in rot_kernel_grads)
