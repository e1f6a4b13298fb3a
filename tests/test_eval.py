import numpy as np

from vista_slam_tpu.eval.recon import (chamfer_rmse, icp_point_to_point,
                                       voxel_downsample)
from vista_slam_tpu.eval.traj import ape_statistics, umeyama_alignment


def rand_poses(n, rng):
    from scipy.spatial.transform import Rotation

    poses = []
    for i in range(n):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_rotvec(rng.standard_normal(3) * 0.3).as_matrix()
        T[:3, 3] = rng.standard_normal(3) * 2
        poses.append(T)
    return np.stack(poses)


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((50, 3))
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.2, -0.5, 0.9]).as_matrix()
    c, t = 1.7, np.array([1.0, -2.0, 0.5])
    y = c * x @ R.T + t
    R2, t2, c2 = umeyama_alignment(x, y)
    np.testing.assert_allclose(R2, R, atol=1e-8)
    np.testing.assert_allclose(t2, t, atol=1e-8)
    assert abs(c2 - c) < 1e-8


def test_ape_zero_after_alignment():
    rng = np.random.default_rng(1)
    gt = rand_poses(20, rng)
    from scipy.spatial.transform import Rotation

    S = np.eye(4)
    S[:3, :3] = Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix() * 0.5  # scaled
    est = np.einsum("ij,njk->nik", S, gt)
    stats = ape_statistics(est, gt)
    assert stats["rmse"] < 1e-6


def test_ape_skips_nan_reference():
    rng = np.random.default_rng(2)
    gt = rand_poses(10, rng)
    gt[3] = np.nan
    stats = ape_statistics(gt.copy(), gt)
    assert np.isfinite(stats["rmse"])


def test_chamfer_and_icp():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((500, 3))
    c, _, _ = chamfer_rmse(pts, pts)
    assert c < 1e-9
    # shifted cloud: ICP must recover the offset
    shifted = pts + np.array([0.05, -0.03, 0.02])
    T = icp_point_to_point(shifted, pts, max_dist=0.5)
    recovered = (T[:3, :3] @ shifted.T).T + T[:3, 3]
    c2, _, _ = chamfer_rmse(pts, recovered)
    assert c2 < 1e-3


def test_voxel_downsample():
    pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.0, 1.0, 1.0]])
    out = voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
