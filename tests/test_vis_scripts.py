"""Smoke tests for the visualization/extraction scripts over a real
save_data_all artifact set (reference equivalents: scripts/vis_slam_results.py
[Open3D viewer], scripts/vis_ply.py, scripts/video.py,
scripts/extract_images.py)."""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pytest.importorskip("matplotlib")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from synthetic import SyntheticFrontend, circle_trajectory
from vista_slam_tpu.slam.online_slam import OnlineSLAM


@pytest.fixture(scope="module")
def result_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vis") / "results")
    n = 8
    gt = circle_trajectory(n)
    fe = SyntheticFrontend(gt, noise=0.02, seed=1)
    slam = OnlineSLAM(fe, max_view_num=16, neighbor_edge_num=2,
                      loop_edge_num=0, pgo_every=500)
    rng = np.random.default_rng(0)
    for t in range(n):
        slam.step({"rgb": rng.uniform(-1, 1, (fe.h, fe.w, 3))
                   .astype(np.float32)},
                  force_pgo=(t == n - 1))
    slam.save_data_all(out)
    return out


def test_vis_slam_results(result_dir):
    import vis_slam_results

    vis_slam_results.main(["--result-dir", result_dir])
    assert os.path.exists(os.path.join(result_dir, "vis_results.png"))


def test_vis_ply(result_dir):
    import vis_ply

    vis_ply.main(["--ply", os.path.join(result_dir, "pointcloud.ply"),
                  "--views", "2"])
    assert os.path.exists(os.path.join(result_dir, "pointcloud.png"))


def test_render_flythrough(result_dir):
    import render_flythrough

    out = os.path.join(result_dir, "fly.mp4")
    render_flythrough.main(["--result-dir", result_dir, "--out", out,
                            "--interp", "1", "--size", "60", "80"])
    assert os.path.getsize(out) > 0


def test_extract_images(result_dir):
    import extract_images

    extract_images.main(["--result-dir", result_dir, "--views", "0", "3"])
    figs = os.path.join(result_dir, "figures")
    assert os.path.exists(os.path.join(figs, "view0000_rgb.png"))
    assert os.path.exists(os.path.join(figs, "view0003_depth.png"))


def test_rerun_vis_gates_cleanly_without_rerun():
    """Every rerun_vis entry point must be a safe no-op when the rerun
    package is absent (reference gates at import, run.py:13-20)."""
    from vista_slam_tpu.utils import rerun_vis

    n = 4
    gt = circle_trajectory(n)
    fe = SyntheticFrontend(gt, seed=2)
    slam = OnlineSLAM(fe, max_view_num=8, neighbor_edge_num=2,
                      loop_edge_num=0, pgo_every=500)
    for t in range(n):
        slam.step({"rgb": np.zeros((fe.h, fe.w, 3), np.float32)})

    rerun_vis.init("smoke", save_path=None, url=None)
    rerun_vis.set_time(3)
    rerun_vis.log_slam_views(slam, show_all=True)
    rerun_vis.log_slam_views(slam, show_all=False, max_views=2)
    rerun_vis.disconnect()
    if not rerun_vis.available():  # this environment has no rerun
        assert rerun_vis.rr is None


def test_plot_train_log(tmp_path):
    import json

    import plot_train_log

    log = str(tmp_path / "log.jsonl")
    with open(log, "w") as f:
        for e in range(3):
            f.write(json.dumps({"epoch": e, "loss": 1.0 / (e + 1),
                                "alpha": 0.2 * e}) + "\n")
    out = str(tmp_path / "curves.png")
    plot_train_log.main(["--log", log, "--out", out])
    assert os.path.exists(out)
