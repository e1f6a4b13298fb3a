"""Every data-format reader parses a tiny synthetic on-disk scene laid out in
the reference's exact directory/file conventions.

Training readers (reference: vista_slam/datasets/{sevenscenes,scannetpp,
arkitscene,replica,co3d,aria_synthetic}.py) — ScanNet is covered by
test_train_data.py. Eval loaders (reference: vista_slam/datasets/
slam_{sevenscenes,replica,scannet}.py) — TUM is covered by
test_evaluate_cli.py.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vista_slam_tpu.datasets.slam_sequences import (SLAMReplica, SLAMScanNet,
                                                    SLAMSevenScenes)
from vista_slam_tpu.datasets.view_graph import (ARKitScenes, AriaSynthetic,
                                                Co3d, Replica, ScanNetpp,
                                                SevenScenes)

H, W = 96, 128
K_DEFAULT = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]])
N_FRAMES = 8
RES = (64, 64)


def _rgb(rng):
    return rng.integers(0, 255, (H, W, 3), np.uint8)


def _depth_mm(rng, lo=500, hi=3000):
    return rng.integers(lo, hi, (H, W)).astype(np.uint16)


def _write_viewgraph(vg_root, scene, names):
    os.makedirs(os.path.dirname(os.path.join(str(vg_root), scene)),
                exist_ok=True)
    with open(os.path.join(vg_root, f"{scene}_imglist.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(vg_root, f"{scene}_viewgraph.txt"), "w") as f:
        for i in range(len(names)):
            f.write(f"{i}:({(i + len(names) // 2) % len(names)},0.5);\n")


def _check_graph(ds):
    g = ds[0]
    assert set(g) == {"main_view", "neighbor_views", "loop_views"}
    assert len(g["neighbor_views"]) == 2 and len(g["loop_views"]) == 1
    for v in [g["main_view"]] + g["neighbor_views"] + g["loop_views"]:
        assert v["img"].shape == (*RES, 3)
        assert v["pts3d_cam"].shape == (*RES, 3)
        assert np.isfinite(v["pts3d_cam"]).all()
        assert v["valid_mask"].any()
        assert np.isfinite(v["camera_pose"]).all()
        assert v["camera_intrinsics"][0, 0] > 0
    return g


def _graph_kw(vg_root):
    return dict(view_graph_root=str(vg_root), resolution=RES,
                neighbor_range=4, neighbor_num=1, loop_num=1,
                num_sample_per_scene=2, seed=0)


# --- 7-Scenes (training) ----------------------------------------------------

def test_sevenscenes_training_reader(tmp_path):
    rng = np.random.default_rng(0)
    scene = "chess_seq-01"
    d = tmp_path / "data" / scene
    os.makedirs(d)
    names = []
    h, w = 480, 640  # native Kinect frames (the hardcoded K assumes them)
    for i in range(N_FRAMES):
        stem = f"frame-{i:06d}"
        cv2.imwrite(str(d / f"{stem}.color.png"),
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        depth = rng.integers(500, 3000, (h, w)).astype(np.uint16)
        depth[0, 0] = 65535  # invalid marker
        cv2.imwrite(str(d / f"{stem}.depth.png"), depth)
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0, 0]
        np.savetxt(d / f"{stem}.pose.txt", T)
        names.append(f"{stem}.color.png")
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = SevenScenes(sensor_data_root=str(tmp_path / "data"),
                     **_graph_kw(tmp_path / "vg"))
    g = _check_graph(ds)
    # training uses the nominal fx=fy=525 Kinect intrinsics
    # (reference: datasets/sevenscenes.py:237-238)
    assert ds.K[0, 0] == 525.0


# --- ScanNet++ ---------------------------------------------------------------

def test_scannetpp_reader(tmp_path):
    rng = np.random.default_rng(1)
    scene = "0a5c013435"
    dslr = tmp_path / "data" / scene / "dslr"
    os.makedirs(dslr / "undistorted_images")
    os.makedirs(dslr / "undistorted_depths")
    os.makedirs(dslr / "nerfstudio")
    names, frames = [], []
    for i in range(N_FRAMES):
        stem = f"DSC{i:05d}"
        cv2.imwrite(str(dslr / "undistorted_images" / f"{stem}.JPG"), _rgb(rng))
        cv2.imwrite(str(dslr / "undistorted_depths" / f"{stem}.png"), _depth_mm(rng))
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 3.0]
        frames.append({"file_path": f"{stem}.JPG", "transform_matrix": T.tolist()})
        names.append(f"{stem}.JPG")
    meta = {"fl_x": 80.0, "fl_y": 80.0, "cx": W / 2, "cy": H / 2,
            "frames": frames}
    with open(dslr / "nerfstudio" / "transforms_undistorted.json", "w") as f:
        json.dump(meta, f)
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = ScanNetpp(sensor_data_root=str(tmp_path / "data"),
                   **_graph_kw(tmp_path / "vg"))
    g = _check_graph(ds)
    # OpenGL->OpenCV conversion flips world y/z rows INCLUDING translation
    # (reference: scannetpp.py:86-90): identity rotation + t=(1,2,3) maps to
    # identity rotation + t=(1,-2,-3)
    pose = g["main_view"]["camera_pose"]
    np.testing.assert_allclose(pose[:3, 3], [1.0, -2.0, -3.0], atol=1e-6)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-6)


# --- ARKitScenes -------------------------------------------------------------

def test_arkitscenes_reader(tmp_path):
    rng = np.random.default_rng(2)
    scene = "41069021"
    d = tmp_path / "data" / scene
    os.makedirs(d / "lowres_wide")
    os.makedirs(d / "lowres_depth")
    os.makedirs(d / "lowres_wide_intrinsics")
    names, traj_lines = [], []
    for i in range(N_FRAMES):
        ts = 300.0 + 0.377 * (i + 1)
        stem = f"{scene}_{ts:.3f}"
        cv2.imwrite(str(d / "lowres_wide" / f"{stem}.png"), _rgb(rng))
        cv2.imwrite(str(d / "lowres_depth" / f"{stem}.png"), _depth_mm(rng))
        with open(d / "lowres_wide_intrinsics" / f"{stem}.pincam", "w") as f:
            f.write(f"{W} {H} 80.0 80.0 {W / 2} {H / 2}\n")
        # traj row: ts, axis-angle w2c rotation, translation
        traj_lines.append(f"{ts:.6f} 0 0 0 {0.1 * i} 0 0")
        names.append(f"{stem}.png")
    with open(d / "lowres_wide.traj", "w") as f:
        f.write("\n".join(traj_lines) + "\n")
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = ARKitScenes(sensor_data_root=str(tmp_path / "data"),
                     **_graph_kw(tmp_path / "vg"))
    g = _check_graph(ds)
    # frame_key must preserve the dotted timestamp (reference splits ".png")
    assert "." in ds.frame_key(names[0])
    # identity w2c rotation with translation t -> cam-to-world t = -t
    name = g["main_view"]["view_name"]
    idx = names.index(f"{name}.png")
    np.testing.assert_allclose(g["main_view"]["camera_pose"][:3, 3],
                               [-0.1 * idx, 0, 0], atol=1e-5)

    # timestamp fallback: no exact traj key -> the LAST key within 0.1 s
    # wins (the reference scans the whole dict without breaking,
    # arkitscene.py:331-339)
    ts = 310.0
    stem = f"{scene}_{ts:.3f}"
    cv2.imwrite(str(d / "lowres_wide" / f"{stem}.png"), _rgb(rng))
    cv2.imwrite(str(d / "lowres_depth" / f"{stem}.png"), _depth_mm(rng))
    with open(d / "lowres_wide_intrinsics" / f"{stem}.pincam", "w") as f:
        f.write(f"{W} {H} 80.0 80.0 {W / 2} {H / 2}\n")
    with open(d / "lowres_wide.traj", "a") as f:
        f.write("309.950000 0 0 0 7.0 0 0\n310.040000 0 0 0 9.0 0 0\n")
    ds._traj_cache = {}
    raw = ds._read_view_raw(str(d), stem, scene)
    assert raw is not None
    np.testing.assert_allclose(raw[2][:3, 3], [-9.0, 0, 0], atol=1e-5)


# --- Replica (training layout) ----------------------------------------------

def test_replica_training_reader(tmp_path):
    rng = np.random.default_rng(3)
    scene = "room_0"
    d = tmp_path / "data" / scene
    os.makedirs(d)
    names, traj = [], []
    for i in range(N_FRAMES):
        cv2.imwrite(str(d / f"frame{i:06d}.jpg"), _rgb(rng))
        depth = (rng.uniform(1.0, 4.0, (H, W)) * 6553.5).astype(np.uint16)
        cv2.imwrite(str(d / f"depth{i:06d}.png"), depth)
        T = np.eye(4)
        T[:3, 3] = [0, 0.1 * i, 0]
        traj.append(" ".join(map(str, T.reshape(-1))))
        names.append(f"frame{i:06d}.jpg")
    with open(d / "camera.txt", "w") as f:
        f.write("# w,h,fx,fy\n" + f"{W},{H},80.0,80.0\n")
    with open(d / "camera_trajectory.txt", "w") as f:
        f.write("\n".join(traj) + "\n")
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = Replica(sensor_data_root=str(tmp_path / "data"),
                 **_graph_kw(tmp_path / "vg"))
    g = _check_graph(ds)
    # intrinsics derive from camera.txt with center principal point
    K = g["main_view"]["camera_intrinsics"]
    assert abs(K[0, 0] - 80.0 * RES[1] / (H - 0)) < 20  # rescaled focal


# --- Co3d ---------------------------------------------------------------------

def test_co3d_reader(tmp_path):
    rng = np.random.default_rng(4)
    scene = "hydrant/194_20878_39742"
    d = tmp_path / "data" / scene
    os.makedirs(d / "images")
    os.makedirs(d / "depths")
    os.makedirs(d / "masks")
    names = []
    for i in range(N_FRAMES):
        stem = f"frame{i:06d}"
        cv2.imwrite(str(d / "images" / f"{stem}.jpg"), _rgb(rng))
        rel = rng.integers(10000, 60000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(d / "depths" / f"{stem}.jpg.geometric.png"), rel)
        cv2.imwrite(str(d / "masks" / f"{stem}.png"),
                    np.full((H, W), 255, np.uint8))
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.05 * i, 0, 0]
        np.savez(d / "images" / f"{stem}.npz", camera_pose=T,
                 camera_intrinsics=K_DEFAULT.astype(np.float32),
                 maximum_depth=np.float32(5.0))
        names.append(f"{stem}.jpg")
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = Co3d(sensor_data_root=str(tmp_path / "data"), mask_bg=True,
              scene_name=scene, **_graph_kw(tmp_path / "vg"))
    # scene dirs are nested (category/sequence); point scene_names directly
    ds.scene_names = [scene]
    _check_graph(ds)


# --- AriaSynthetic -------------------------------------------------------------

def test_aria_synthetic_reader(tmp_path):
    rng = np.random.default_rng(5)
    scene = "ase_000001"
    d = tmp_path / "data" / scene
    os.makedirs(d / "color")
    os.makedirs(d / "depth")
    os.makedirs(d / "pose")
    os.makedirs(d / "intrinsic")
    np.savetxt(d / "intrinsic" / "intrinsic_color.txt",
               np.block([[K_DEFAULT, np.zeros((3, 1))],
                         [np.zeros((1, 3)), np.ones((1, 1))]]))
    names = []
    const_mm = 2000
    for i in range(N_FRAMES):
        stem = f"{i:07d}"
        cv2.imwrite(str(d / "color" / f"{stem}.jpg"), _rgb(rng))
        cv2.imwrite(str(d / "depth" / f"{stem}.png"),
                    np.full((H, W), const_mm, np.uint16))
        T = np.eye(4)
        T[:3, 3] = [0, 0, 0.1 * i]
        np.savetxt(d / "pose" / f"{stem}.txt", T)
        names.append(f"{stem}.jpg")
    _write_viewgraph(tmp_path / "vg", scene, names)
    ds = AriaSynthetic(sensor_data_root=str(tmp_path / "data"),
                       **_graph_kw(tmp_path / "vg"))
    g = _check_graph(ds)
    # ASE depth is ray DISTANCE: |pts3d| == depth value everywhere
    # (reference: utils/geometry.py:83-122), unlike z-depth where |pts| > z
    # off-axis.
    pts = g["main_view"]["pts3d_cam"]
    norms = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(norms[g["main_view"]["valid_mask"]],
                               const_mm / 1000.0, rtol=1e-3)


# --- eval loaders ---------------------------------------------------------

def test_slam_sevenscenes_eval_loader(tmp_path):
    rng = np.random.default_rng(6)
    d = tmp_path / "seq-01"
    os.makedirs(d)
    h, w = 480, 640  # native Kinect resolution (intrinsics assume it)
    for i in range(3):
        stem = f"frame-{i:06d}"
        cv2.imwrite(str(d / f"{stem}.color.png"),
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        cv2.imwrite(str(d / f"{stem}.depth.png"),
                    np.full((h, w), 2000, np.uint16))
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0, 0]
        np.savetxt(d / f"{stem}.pose.txt", T)
    ds = SLAMSevenScenes(str(d), resolution=(64, 64))
    assert len(ds) == 3
    v = ds[1]
    assert v["rgb"].shape == (64, 64, 3) and v["gray"].shape == (64, 64)
    # constant 2 m plane reprojected depth->RGB frame stays ~2 m in the
    # valid interior (reference: slam_sevenscenes.py:15-86): the RGB/depth
    # cameras are ~2 cm apart, so lambda = (d - t_z)/ray_z ~ d
    interior = v["depth"][16:48, 16:48]
    good = interior[interior > 0]
    assert good.size > 0 and np.allclose(good, 2.0, atol=0.05)
    np.testing.assert_allclose(v["camera_pose"][:3, 3], [0.1, 0, 0])
    assert np.isfinite(v["pts3d_cam"]).all()


def test_slam_replica_eval_loader(tmp_path):
    rng = np.random.default_rng(7)
    d = tmp_path / "office0"
    os.makedirs(d / "results")
    traj = []
    h, w = 680, 1200  # native Replica render size (hardcoded K assumes it)
    for i in range(3):
        cv2.imwrite(str(d / "results" / f"frame{i:06d}.jpg"),
                    rng.integers(0, 255, (h, w, 3), np.uint8))
        depth = (rng.uniform(1.0, 4.0, (h, w)) * 6553.5).astype(np.uint16)
        cv2.imwrite(str(d / "results" / f"depth{i:06d}.png"), depth)
        T = np.eye(4)
        T[:3, 3] = [0, 0.1 * i, 0]
        traj.append(" ".join(map(str, T.reshape(-1))))
    with open(d / "traj.txt", "w") as f:
        f.write("\n".join(traj) + "\n")
    ds = SLAMReplica(str(d), resolution=(64, 64))
    assert len(ds) == 3
    v = ds[2]
    assert v["rgb"].shape == (64, 64, 3)
    assert v["depth"].min() >= 0 and v["depth"].max() < 5.0
    np.testing.assert_allclose(v["camera_pose"][:3, 3], [0, 0.2, 0])


def test_slam_scannet_eval_loader(tmp_path):
    rng = np.random.default_rng(8)
    d = tmp_path / "scene0000_00"
    os.makedirs(d / "sensor_data")
    os.makedirs(d / "intrinsic")
    np.savetxt(d / "intrinsic" / "intrinsic_depth.txt",
               np.block([[K_DEFAULT, np.zeros((3, 1))],
                         [np.zeros((1, 3)), np.ones((1, 1))]]))
    for i in range(3):
        stem = f"frame-{i:06d}"
        cv2.imwrite(str(d / "sensor_data" / f"{stem}.color.jpg"),
                    rng.integers(0, 255, (H, W, 3), np.uint8))
        cv2.imwrite(str(d / "sensor_data" / f"{stem}.depth.png"),
                    _depth_mm(rng))
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0, 0]
        np.savetxt(d / "sensor_data" / f"{stem}.pose.txt", T)
    ds = SLAMScanNet(str(d), resolution=(64, 64))
    assert len(ds) == 3
    v = ds[0]
    assert v["rgb"].shape == (64, 64, 3)
    assert (v["depth"] > 0).any() and v["depth"].max() < 3.5
    assert np.isfinite(v["pts3d_cam"]).all()
