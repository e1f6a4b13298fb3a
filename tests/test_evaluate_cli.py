"""End-to-end evaluate driver on a synthetic TUM-RGBD-format scene with a
tiny random-weight model: exercises dataset association, SLAM, artifact
dump with GT, ATE and reconstruction eval."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_tiny_cfg(tmp_path):
    """Tiny random-weight model config shared by the driver tests."""
    cfg_path = str(tmp_path / "cfg.yaml")
    out = str(tmp_path / "evalout")
    with open(cfg_path, "w") as f:
        f.write(f"""
output_dir: {out}
compute_dtype: float32
stride: 1
max_view_num: 10
neighbor_edge_num: 2
loop_edge_num: 1
pgo_every: 500
rel_pose_thres: -1.0
model:
  img_size: [64, 64]
  enc_dim: 64
  enc_depth: 2
  enc_heads: 4
  dec_dim: 48
  dec_depth: 4
  dec_heads: 4
  mlp_ratio: 2
""")
    return cfg_path, out


@pytest.fixture(scope="module")
def tum_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("tum") / "rgbd_dataset_freiburg1_synth"
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rng = np.random.default_rng(0)
    n = 8
    rgb_lines, depth_lines, gt_lines = [], [], []
    base = rng.integers(0, 255, (60, 80, 3), np.uint8)
    base = cv2.resize(base, (640, 480), interpolation=cv2.INTER_CUBIC)
    for i in range(n):
        ts = 1000.0 + i * 0.1
        m = np.float32([[1, 0, 3 * i], [0, 1, 0]])
        img = cv2.warpAffine(base, m, (640, 480))
        cv2.imwrite(str(root / "rgb" / f"{ts:.6f}.png"), img)
        depth = np.full((480, 640), 10000 + 100 * i, np.uint16)
        cv2.imwrite(str(root / "depth" / f"{ts:.6f}.png"), depth)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.1 * i:.4f} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(root / name, "w") as f:
            f.write("# header\n" + "\n".join(lines) + "\n")
    with open(root / "intrinsics.txt", "w") as f:
        f.write("500 0 320\n0 500 240\n0 0 1\n")
    return str(root)


def test_tum_dataset_loader(tum_scene):
    from vista_slam_tpu.datasets import SLAMTUMRGBD

    ds = SLAMTUMRGBD(tum_scene, resolution=(64, 64), frame_rate=1000)
    assert len(ds) >= 4
    item = ds[0]
    assert item["rgb"].shape == (64, 64, 3)
    assert item["depth"].shape == (64, 64)
    assert item["camera_pose"].shape == (4, 4)
    assert np.isfinite(item["pts3d_cam"]).all()
    # first pose normalized to identity (reference: slam_tumrgbd.py:95-105)
    np.testing.assert_allclose(item["camera_pose"], np.eye(4), atol=1e-6)


def test_evaluate_driver_end_to_end(tum_scene, tmp_path):
    from vista_slam_tpu.cli.evaluate import main

    cfg_path, out = _write_tiny_cfg(tmp_path)
    data_root = os.path.dirname(tum_scene)
    results = main(["--dataset", "tumrgbd", "--data-root", data_root,
                    "--config", cfg_path, "--scenes", "synth", "--recon"])
    r = results["synth"]
    assert np.isfinite(r["ate_rmse"])
    assert "recon_chamfer" in r and np.isfinite(r["recon_chamfer"])
    summary = json.load(open(os.path.join(out, "tumrgbd_summary.json")))
    assert "avg_ate_rmse" in summary
    assert os.path.exists(os.path.join(out, "tumrgbd_synth", "trajectory.npy"))
    assert os.path.exists(os.path.join(out, "tumrgbd_synth", "traj.png"))


def test_evaluate_driver_f2f3_spec(tum_scene, tmp_path):
    """The tumrgbd_f2f3 spec resolves scenes via the rgbd_dataset_{scene}
    path template (reference: evaluation_tumrgbdf2f3.py:37)."""
    from vista_slam_tpu.cli.evaluate import main

    cfg_path, out = _write_tiny_cfg(tmp_path)
    data_root = os.path.dirname(tum_scene)
    results = main(["--dataset", "tumrgbd_f2f3", "--data-root", data_root,
                    "--config", cfg_path, "--scenes", "freiburg1_synth"])
    assert np.isfinite(results["freiburg1_synth"]["ate_rmse"])


def test_evaluate_driver_7scenes(tmp_path):
    """End-to-end 7-Scenes evaluation: depth->RGB reprojection loader +
    SLAM + ATE + dense recon through the real CLI (reference:
    evaluation_7scenes.py)."""
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path / "7scenes"
    d = root / "chess" / "seq-01"
    os.makedirs(d)
    h, w = 480, 640
    base = cv2.resize(rng.integers(0, 255, (60, 80, 3), np.uint8), (w, h),
                      interpolation=cv2.INTER_CUBIC)
    for i in range(6):
        stem = f"frame-{i:06d}"
        m = np.float32([[1, 0, 4 * i], [0, 1, 0]])
        cv2.imwrite(str(d / f"{stem}.color.png"), cv2.warpAffine(base, m, (w, h)))
        cv2.imwrite(str(d / f"{stem}.depth.png"), np.full((h, w), 2000, np.uint16))
        T = np.eye(4)
        T[:3, 3] = [0.05 * i, 0, 0]
        np.savetxt(d / f"{stem}.pose.txt", T)

    from vista_slam_tpu.cli.evaluate import main

    cfg_path, out = _write_tiny_cfg(tmp_path)
    results = main(["--dataset", "7scenes", "--data-root", str(root),
                    "--config", cfg_path, "--scenes", "chess"])
    r = results["chess"]
    assert np.isfinite(r["ate_rmse"])
    assert "recon_chamfer" in r and np.isfinite(r["recon_chamfer"])


def test_evaluate_driver_replica(tmp_path):
    """End-to-end Replica evaluation through the real CLI: traj.txt poses,
    results/frame*.jpg + depth*.png layout, ATE + dense recon (reference:
    evaluation_replica.py, slam_replica.py:13-66)."""
    import cv2

    rng = np.random.default_rng(1)
    root = tmp_path / "replica"
    d = root / "office0"
    os.makedirs(d / "results")
    h, w = 680, 1200  # native Replica render size (hardcoded K assumes it)
    base = cv2.resize(rng.integers(0, 255, (68, 120, 3), np.uint8), (w, h),
                      interpolation=cv2.INTER_CUBIC)
    traj = []
    for i in range(6):
        m = np.float32([[1, 0, 6 * i], [0, 1, 0]])
        cv2.imwrite(str(d / "results" / f"frame{i:06d}.jpg"),
                    cv2.warpAffine(base, m, (w, h)))
        depth = np.full((h, w), 2.0 * 6553.5, np.uint16)  # constant 2 m
        cv2.imwrite(str(d / "results" / f"depth{i:06d}.png"), depth)
        T = np.eye(4)
        T[:3, 3] = [0.05 * i, 0, 0]
        traj.append(" ".join(map(str, T.reshape(-1))))
    with open(d / "traj.txt", "w") as f:
        f.write("\n".join(traj) + "\n")

    from vista_slam_tpu.cli.evaluate import main

    cfg_path, out = _write_tiny_cfg(tmp_path)
    results = main(["--dataset", "replica", "--data-root", str(root),
                    "--config", cfg_path, "--scenes", "office0"])
    r = results["office0"]
    assert np.isfinite(r["ate_rmse"])
    assert "recon_chamfer" in r and np.isfinite(r["recon_chamfer"])
    assert os.path.exists(os.path.join(out, "replica_summary.json"))


def test_evaluate_driver_scannet(tmp_path):
    """End-to-end ScanNet evaluation through the real CLI: sensor_data/
    frame-NNNNNN.{color.jpg,depth.png,pose.txt} + intrinsic_depth.txt layout
    (reference: evaluation_scannet.py, slam_scannet.py:13-55)."""
    import cv2

    rng = np.random.default_rng(2)
    root = tmp_path / "scannet"
    d = root / "scene0000_00"
    os.makedirs(d / "sensor_data")
    os.makedirs(d / "intrinsic")
    h, w = 480, 640
    K = np.array([[500.0, 0, w / 2], [0, 500.0, h / 2], [0, 0, 1]])
    np.savetxt(d / "intrinsic" / "intrinsic_depth.txt",
               np.block([[K, np.zeros((3, 1))],
                         [np.zeros((1, 3)), np.ones((1, 1))]]))
    base = cv2.resize(rng.integers(0, 255, (60, 80, 3), np.uint8), (w, h),
                      interpolation=cv2.INTER_CUBIC)
    for i in range(6):
        stem = f"frame-{i:06d}"
        m = np.float32([[1, 0, 4 * i], [0, 1, 0]])
        cv2.imwrite(str(d / "sensor_data" / f"{stem}.color.jpg"),
                    cv2.warpAffine(base, m, (w, h)))
        cv2.imwrite(str(d / "sensor_data" / f"{stem}.depth.png"),
                    np.full((h, w), 2000, np.uint16))
        T = np.eye(4)
        T[:3, 3] = [0.05 * i, 0, 0]
        np.savetxt(d / "sensor_data" / f"{stem}.pose.txt", T)

    from vista_slam_tpu.cli.evaluate import main

    cfg_path, out = _write_tiny_cfg(tmp_path)
    results = main(["--dataset", "scannet", "--data-root", str(root),
                    "--config", cfg_path, "--scenes", "scene0000_00"])
    r = results["scene0000_00"]
    assert np.isfinite(r["ate_rmse"])
    assert "recon_chamfer" in r and np.isfinite(r["recon_chamfer"])
