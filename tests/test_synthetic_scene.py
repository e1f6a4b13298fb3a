"""Synthetic textured-room renderer: geometric consistency checks."""

import numpy as np

from vista_slam_tpu.datasets.synthetic_scene import (BoxScene,
                                                     SyntheticSceneDataset,
                                                     lookat_pose,
                                                     orbit_trajectory)


def test_depth_positive_and_bounded():
    ds = SyntheticSceneDataset(n_frames=8)
    v = ds.view(0)
    assert (v["depth"] > 0).all()
    assert np.isfinite(v["depth"]).all()
    assert v["img"].shape == (64, 64, 3)
    assert -1.0 <= v["img"].min() and v["img"].max() <= 1.0


def test_cross_view_depth_consistency():
    """Unproject view A, reproject into view B: depths agree to pixel-
    quantization accuracy."""
    ds = SyntheticSceneDataset(n_frames=16)
    a = ds.view(0)
    b = ds.view(1)
    T_rel = np.linalg.inv(b["camera_pose"]) @ a["camera_pose"]
    pts = a["pts3d_cam"].reshape(-1, 3) @ T_rel[:3, :3].T + T_rel[:3, 3]
    K = ds.K
    uv = pts @ K.T
    u = uv[:, 0] / uv[:, 2]
    v_ = uv[:, 1] / uv[:, 2]
    z = pts[:, 2]
    h, w = 64, 64
    ui = np.round(u - 0.5).astype(int)
    vi = np.round(v_ - 0.5).astype(int)
    ok = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h) & (z > 0)
    d_b = b["depth"][np.clip(vi, 0, h - 1), np.clip(ui, 0, w - 1)]
    err = np.abs(d_b[ok] - z[ok])
    assert np.median(err) < 0.06, np.median(err)


def test_graph_sampling_shapes():
    ds = SyntheticSceneDataset(n_frames=12, neighbor_num=1, loop_num=1)
    g = ds[3]
    assert len(g["neighbor_views"]) == 2 and len(g["loop_views"]) == 1
    for v in [g["main_view"]] + g["neighbor_views"] + g["loop_views"]:
        assert v["pts3d_cam"].shape == (64, 64, 3)


def test_lookat_orthonormal():
    T = lookat_pose([1, 2, 0.5], [0, 0, 0])
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert np.linalg.det(R) > 0.99
    traj = orbit_trajectory(8)
    assert traj.shape == (8, 4, 4)
