"""Live-mode components without a physical camera: LatestCamera on a video
file, the full run_live CLI on a finite source, and the MJPEG streaming
server (reference: run_live.py:84-113, remote_live_setting/live.py)."""

import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    """A short video whose content shifts 8 px/frame (drives flow
    keyframing)."""
    path = str(tmp_path_factory.mktemp("video") / "seq.avi")
    rng = np.random.default_rng(0)
    base = cv2.resize(rng.integers(0, 255, (60, 80, 3), np.uint8), (320, 240),
                      interpolation=cv2.INTER_CUBIC)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 20.0, (320, 240))
    assert w.isOpened()
    for i in range(40):
        m = np.float32([[1, 0, 8 * i], [0, 1, 0]])
        w.write(cv2.warpAffine(base, m, (320, 240)))
    w.release()
    return path


def test_latest_camera_latest_wins(video_file):
    from vista_slam_tpu.cli.run_live import LatestCamera

    cam = LatestCamera(video_file)
    try:
        deadline = time.time() + 5.0
        frame = None
        while frame is None and time.time() < deadline:
            frame = cam.read_latest()
            time.sleep(0.01)
        assert frame is not None and frame.shape == (240, 320, 3)
        # latest-wins: a consumed frame is not returned twice (a None or a
        # genuinely newer frame are the only legal results)
        again = cam.read_latest()
        assert again is None or not np.array_equal(again, frame)
    finally:
        cam.close()


def test_run_live_cli_on_video_file(video_file, tmp_path):
    """Full live pipeline: threaded capture, flow keyframing, SLAM steps,
    final PGO + artifact dump — terminated by the idle timeout when the
    finite source ends."""
    from vista_slam_tpu.cli.run_live import main

    out = str(tmp_path / "liveout")
    cfg_path = str(tmp_path / "live.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""
output_dir: {out}
compute_dtype: float32
max_view_num: 50
neighbor_edge_num: 2
loop_edge_num: 0
pgo_every: 4
state_every: 2
rel_pose_thres: -1.0
keyframe_detection: flow
flow_thres: 2.0
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
    main(["--config", cfg_path, "--camera", video_file,
          "--max-frames", "6", "--idle-timeout", "3"])
    assert os.path.exists(os.path.join(out, "trajectory.npy"))
    # live runs checkpoint their SLAM state for crash recovery
    assert os.path.exists(os.path.join(out, "slam_state.npz"))
    traj = np.load(os.path.join(out, "trajectory.npy"))
    assert traj.shape[0] >= 2  # multiple keyframes made it through


def test_mjpeg_stream_server(video_file):
    """stream_camera serves a valid multipart MJPEG stream from the source."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    proc = subprocess.Popen(
        [sys.executable, "-m", "vista_slam_tpu.cli.stream_camera",
         "--camera", video_file, "--port", str(port)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        data = b""
        deadline = time.time() + 15.0
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/video", timeout=3) as r:
                    ctype = r.headers.get("Content-Type", "")
                    assert "multipart/x-mixed-replace" in ctype, ctype
                    data = r.read(40000)
                break
            except (ConnectionError, urllib.error.URLError, OSError):
                time.sleep(0.3)
        assert b"--frame" in data
        assert b"\xff\xd8" in data  # JPEG start-of-image marker
    finally:
        proc.kill()
        proc.wait()
