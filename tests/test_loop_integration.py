"""Loop closure through the full OnlineSLAM plumbing: BoW detection on real
images drives loop-edge decodes on the synthetic frontend; the loop must be
inserted into the graph and tighten the trajectory."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from synthetic import SyntheticFrontend, circle_trajectory, umeyama_ate
from test_bow import make_textured_image
from vista_slam_tpu.native.bow import train_vocabulary
from vista_slam_tpu.slam.loop_detector import LoopDetector
from vista_slam_tpu.slam.online_slam import OnlineSLAM


def build_vocab(images):
    orb = cv2.ORB_create()
    descs, ids = [], []
    for i, img in enumerate(images):
        _, d = orb.detectAndCompute(img, None)
        if d is not None:
            descs.append(d)
            ids.append(np.full(len(d), i))
    return train_vocabulary(np.concatenate(descs), k=6, levels=3, seed=0,
                            image_ids=np.concatenate(ids))


def test_loop_closure_improves_trajectory():
    n = 14
    gt = circle_trajectory(n)
    # distinct textures per view; the LAST view revisits view 0's image
    images = [make_textured_image(i) for i in range(n - 1)] + \
             [make_textured_image(0)]
    vocab = build_vocab(images[: n - 1])

    def run(with_loop):
        det = (LoopDetector(vocab, loop_dist_min=6, loop_nms=1,
                            loop_cand_thresh_neighbor=3) if with_loop else None)
        fe = SyntheticFrontend(gt, noise=0.06, seed=5)
        slam = OnlineSLAM(fe, loop_detector=det, max_view_num=32,
                          neighbor_edge_num=2, loop_edge_num=2, pgo_every=500)
        for t in range(n):
            slam.step({"rgb": np.zeros((4, 4, 3), np.float32),
                       "gray": images[t]}, force_pgo=(t == n - 1))
        est = [slam.get_view(v)["pose"] for v in range(slam.view_num)]
        return slam, umeyama_ate(est, gt)

    slam_loop, ate_loop = run(True)
    _, ate_noloop = run(False)

    # a loop edge between the last and an early view must exist
    graph = slam_loop.get_view_graph()
    long_edges = [(v, u) for v, us in graph.items() for u in us if abs(v - u) > 6]
    assert long_edges, "no loop edge was inserted"
    assert any(v == n - 1 and u <= 2 for v, u in long_edges) or \
           any(u == n - 1 and v <= 2 for v, u in long_edges), long_edges
    # closing the loop should not hurt, and typically helps
    assert ate_loop <= ate_noloop * 1.05, (ate_loop, ate_noloop)


def test_flow_tracker_keyframing():
    from vista_slam_tpu.slam.flow_tracker import FlowTracker

    base = make_textured_image(7, size=200)
    ft = FlowTracker(min_disparity=5.0)
    assert ft.is_new_keyframe(base)  # first frame is always a keyframe
    # 2-pixel shift: below threshold
    m = np.float32([[1, 0, 2], [0, 1, 0]])
    shifted_small = cv2.warpAffine(base, m, base.shape[::-1])
    assert not ft.is_new_keyframe(shifted_small)
    # 12-pixel shift: beyond threshold -> new keyframe
    m = np.float32([[1, 0, 12], [0, 1, 0]])
    shifted_big = cv2.warpAffine(base, m, base.shape[::-1])
    assert ft.is_new_keyframe(shifted_big)


def test_combined_loop_batch_matches_split_schedule():
    """combine_loop_batch=True (one dispatch/fetch per keyframe, BoW first)
    must build the same graph and trajectory as the default split schedule
    (BoW overlapped with the neighbor decode) — only the round-trip count
    differs. Includes edge rejection so speculative slot gaps differ."""
    n = 14
    gt = circle_trajectory(n)
    images = [make_textured_image(i) for i in range(n - 1)] + \
             [make_textured_image(0)]
    vocab = build_vocab(images[: n - 1])

    def run(combined):
        det = LoopDetector(vocab, loop_dist_min=6, loop_nms=1,
                           loop_cand_thresh_neighbor=3)
        fe = SyntheticFrontend(gt, noise=0.06, seed=5, pose_conf=0.8)
        slam = OnlineSLAM(fe, loop_detector=det, max_view_num=32,
                          neighbor_edge_num=2, loop_edge_num=2,
                          pgo_every=500, rel_pose_thres=0.5,
                          combine_loop_batch=combined)
        for t in range(n):
            slam.step({"rgb": np.zeros((4, 4, 3), np.float32),
                       "gray": images[t]}, force_pgo=(t == n - 1))
        traj = np.stack([slam.get_view(v)["pose"]
                         for v in range(slam.view_num)])
        return slam, traj

    slam_a, traj_a = run(False)
    slam_b, traj_b = run(True)
    assert slam_a.get_view_graph() == slam_b.get_view_graph()
    assert slam_a.graph.num_edges == slam_b.graph.num_edges
    np.testing.assert_allclose(traj_b, traj_a, atol=1e-5)
