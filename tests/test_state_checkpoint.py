"""Mid-run SLAM state checkpoint/resume (beyond-parity: the reference
cannot checkpoint SLAM state mid-run, SURVEY 5.4).

save_state/load_state must round-trip EVERYTHING the pipeline needs —
graph buffers, device pointmap store, encoder feature cache, BoW database,
flow-tracker keyframe — so a resumed run is indistinguishable from an
uninterrupted one."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_bow import make_textured_image
from test_loop_integration import build_vocab
from vista_slam_tpu.slam.loop_detector import LoopDetector
from vista_slam_tpu.slam.online_slam import OnlineSLAM


def _tiny_engine():
    import jax.numpy as jnp

    from vista_slam_tpu.models.sta import STAConfig, init_params
    from vista_slam_tpu.slam.frontend import FrontendEngine

    cfg = STAConfig(img_size=(64, 64), enc_dim=64, enc_depth=2, enc_heads=4,
                    dec_dim=48, dec_depth=2, dec_heads=4, mlp_ratio=2,
                    compute_dtype=jnp.float32)
    _, params = init_params(cfg, seed=0)
    return FrontendEngine(cfg, params)


def test_save_load_state_exact_resume(tmp_path):
    engine = _tiny_engine()
    n = 10
    grays = [make_textured_image(i) for i in range(n - 1)] + \
        [make_textured_image(0)]  # last view revisits view 0 (loop)
    rng = np.random.default_rng(0)
    rgbs = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
            for _ in range(n)]
    vocab = build_vocab(grays[: n - 1])

    def make_slam():
        det = LoopDetector(vocab, loop_dist_min=5, loop_nms=1,
                           loop_cand_thresh_neighbor=3)
        return OnlineSLAM(engine, loop_detector=det, max_view_num=32,
                          neighbor_edge_num=2, loop_edge_num=2,
                          pgo_every=500, rel_pose_thres=-1.0)

    def drive(slam, lo, hi):
        for t in range(lo, hi):
            slam.step({"rgb": rgbs[t], "gray": grays[t],
                       "view_name": f"f{t}"},
                      force_pgo=(t in (4, n - 1)))  # one PGO pre-checkpoint

    uninterrupted = make_slam()
    drive(uninterrupted, 0, n)

    producer = make_slam()
    drive(producer, 0, 5)
    path = str(tmp_path / "state.npz")
    producer.save_state(path, frame_cursor=4)

    resumed = make_slam()
    extras = resumed.load_state(path)
    assert int(extras["frame_cursor"]) == 4
    assert resumed.view_num == 5
    drive(resumed, 5, n)

    # identical graph topology and bookkeeping
    assert resumed.view_num == uninterrupted.view_num
    assert resumed.view_names == uninterrupted.view_names
    assert resumed.get_view_graph() == uninterrupted.get_view_graph()
    ga, gc = uninterrupted.graph, resumed.graph
    assert (ga.num_nodes, ga.num_edges) == (gc.num_nodes, gc.num_edges)
    np.testing.assert_array_equal(gc.edges[:gc.num_edges],
                                  ga.edges[:ga.num_edges])

    # bit-identical trajectories and dense maps: every restored input to the
    # post-resume compute is an exact round trip (fp32 enc feats, fp16 store)
    traj_a = np.stack([uninterrupted.get_view(v, filter_outlier=False)["pose"]
                       for v in range(uninterrupted.view_num)])
    traj_c = np.stack([resumed.get_view(v, filter_outlier=False)["pose"]
                       for v in range(resumed.view_num)])
    np.testing.assert_allclose(traj_c, traj_a, atol=1e-6)
    da, ca, ia = uninterrupted.pointmaps.fetch_many(range(ga.num_nodes))
    dc, cc, ic = resumed.pointmaps.fetch_many(range(gc.num_nodes))
    np.testing.assert_array_equal(dc, da)
    np.testing.assert_array_equal(cc, ca)
    np.testing.assert_array_equal(ic, ia)

    # BoW database restored: same loop candidates from the same query
    q = make_textured_image(1)
    assert (resumed.lc_detector.detect(q, 3)
            == uninterrupted.lc_detector.detect(q, 3))


def test_cli_resume_from_checkpoint(tmp_path):
    """run.py --resume-state continues a state_every checkpoint to the same
    final result as an uninterrupted CLI run."""
    from test_cli_run import make_images

    from vista_slam_tpu.cli.run import main

    make_images(tmp_path / "", n=6)
    images = str(tmp_path / "frame_*.png")

    def cfg_for(out_dir):
        p = str(tmp_path / f"cfg_{os.path.basename(out_dir)}.yaml")
        with open(p, "w") as f:
            f.write(f"""
output_dir: {out_dir}
compute_dtype: float32
keyframe_detection: stride
stride: 1
max_view_num: 10
neighbor_edge_num: 2
loop_edge_num: 0
pgo_every: 500
rel_pose_thres: -1.0
state_every: 2
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
        return p

    out_a = str(tmp_path / "full")
    slam_a = main(["--config", cfg_for(out_a), "--images", images,
                   "--output", out_a])
    state_path = os.path.join(out_a, "slam_state.npz")
    assert os.path.exists(state_path)  # written every 2 keyframes

    out_b = str(tmp_path / "resumed")
    slam_b = main(["--config", cfg_for(out_b), "--images", images,
                   "--output", out_b, "--resume-state", state_path])
    assert slam_b.view_num == slam_a.view_num
    assert slam_b.view_names == slam_a.view_names
    traj_a = np.load(os.path.join(out_a, "trajectory.npy"))
    traj_b = np.load(os.path.join(out_b, "trajectory.npy"))
    assert np.isfinite(traj_b).all()
    # prefetch chunks are aligned to fixed keyframe-order boundaries, so the
    # resumed run re-encodes the exact same batches -> bit-identical result
    np.testing.assert_allclose(traj_b, traj_a, atol=0.0)


def test_save_state_is_atomic(tmp_path):
    """Checkpoint writes go through tmp + os.replace: overwriting an
    existing checkpoint leaves no tmp litter, and a failed write cannot
    truncate the previous good file."""
    import glob

    engine = _tiny_engine()
    slam = OnlineSLAM(engine, max_view_num=8, neighbor_edge_num=1,
                      loop_edge_num=0, pgo_every=10 ** 6, rel_pose_thres=-1.0)
    rng = np.random.default_rng(5)
    for _ in range(3):
        slam.step({"rgb": rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)})

    path = str(tmp_path / "state.npz")
    slam.save_state(path, frame_cursor=2)
    first = open(path, "rb").read()
    slam.save_state(path, frame_cursor=2)  # overwrite in place
    assert glob.glob(str(tmp_path / "*.tmp.npz")) == []
    fresh = OnlineSLAM(engine, max_view_num=8, neighbor_edge_num=1,
                       loop_edge_num=0, pgo_every=10 ** 6, rel_pose_thres=-1.0)
    assert int(fresh.load_state(path)["frame_cursor"]) == 2
    assert fresh.view_num == 3
    assert len(first) > 0


def test_save_state_before_any_decode(tmp_path):
    """A checkpoint taken after 0 or 1 keyframes (no decode yet: no
    pointmap store, empty graph) must round-trip cleanly."""
    engine = _tiny_engine()
    slam = OnlineSLAM(engine, max_view_num=8, neighbor_edge_num=1,
                      loop_edge_num=0, pgo_every=10 ** 6, rel_pose_thres=-1.0)
    rng = np.random.default_rng(6)
    rgb0 = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    slam.step({"rgb": rgb0})  # first keyframe: encode only, no edges
    path = str(tmp_path / "early.npz")
    slam.save_state(path, frame_cursor=0)

    fresh = OnlineSLAM(engine, max_view_num=8, neighbor_edge_num=1,
                       loop_edge_num=0, pgo_every=10 ** 6, rel_pose_thres=-1.0)
    fresh.load_state(path)
    assert fresh.view_num == 1 and fresh.graph.num_nodes == 0
    # continuing from the restored encoder cache works
    fresh.step({"rgb": rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)})
    assert fresh.graph.num_edges > 0
