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
