"""Trajectory-level differential parity: the SAME sequence + the SAME
(converted) weights through the full OnlineSLAM loop, once with the JAX
FrontendEngine and once with the ACTUAL torch reference model as the
frontend (tests/torch_frontend.py).

This extends the model-forward parity evidence (test_reference_parity.py)
to the north-star contract: graph construction, edge accept/reject
decisions, loop-edge insertion, scale edges and the post-PGO trajectory
must agree across frontends, proving the rebuilt SLAM-loop semantics
(reference: vista_slam/slam.py:142-297) — not just the model — match.

Reduced config in CI; the full-size 224x224 model runs under
VSLAM_FULL_PARITY=1 and is recorded in PARITY.md.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

cv2 = pytest.importorskip("cv2")

from reference_oracle import load_reference_sta
from synthetic import umeyama_ate
from test_bow import make_textured_image
from torch_frontend import TorchReferenceFrontend
from vista_slam_tpu.models.convert import convert_state_dict
from vista_slam_tpu.models.sta import STAConfig
from vista_slam_tpu.native.bow import train_vocabulary
from vista_slam_tpu.slam.frontend import FrontendEngine
from vista_slam_tpu.slam.loop_detector import LoopDetector
from vista_slam_tpu.slam.online_slam import OnlineSLAM


def _build_vocab(images):
    orb = cv2.ORB_create()
    descs, ids = [], []
    for i, img in enumerate(images):
        _, d = orb.detectAndCompute(img, None)
        if d is not None:
            descs.append(d)
            ids.append(np.full(len(d), i))
    return train_vocabulary(np.concatenate(descs), k=6, levels=3, seed=0,
                            image_ids=np.concatenate(ids))


def _make_sequence(n, img_hw, seeds=None):
    """Textured frames; by default the last two views revisit the first
    textures so BoW proposes genuine loop candidates. Pass ``seeds`` to
    control the revisit pattern (repeated seed = revisited place)."""
    if seeds is None:
        seeds = list(range(n - 2)) + [0, 1]
    assert len(seeds) == n
    grays = [make_textured_image(s) for s in seeds]
    h, w = img_hw
    rgbs = []
    for g in grays:
        rgb = cv2.resize(g, (w, h), interpolation=cv2.INTER_AREA)
        rgb = np.repeat(rgb[..., None], 3, axis=-1).astype(np.float32)
        rgbs.append(rgb / 127.5 - 1.0)
    return rgbs, grays


def _run_slam(frontend, rgbs, grays, vocab, *, rel_pose_thres,
              pgo_every=500, max_view_num=32):
    det = LoopDetector(vocab, loop_dist_min=5, loop_nms=1,
                       loop_cand_thresh_neighbor=3)
    slam = OnlineSLAM(frontend, loop_detector=det, max_view_num=max_view_num,
                      neighbor_edge_num=2, loop_edge_num=2,
                      rel_pose_thres=rel_pose_thres, pgo_every=pgo_every)
    n = len(rgbs)
    n_pgo = 0
    for t in range(n):
        n_pgo += bool(slam.step({"rgb": rgbs[t], "gray": grays[t],
                                 "view_name": f"v{t}"},
                                force_pgo=(t == n - 1)))
    slam.n_pgo_runs = n_pgo
    return slam


def _graph_facts(slam):
    """Everything topology-level a frontend swap must preserve."""
    g = slam.graph
    nodes = [(int(g.node_view[n]), int(g.node_connected_view[n]))
             for n in range(g.num_nodes) if g.node_view[n] >= 0]
    edges = []
    for e in range(g.num_edges):
        a, b = (int(x) for x in g.edges[e])
        kind = "scale" if np.ndim(g.edge_confs[e]) and float(
            g.edge_confs[e][0]) == 2.0 and float(g.edge_confs[e][5]) == 2.0 \
            else "pose"
        edges.append((int(g.node_view[a]), int(g.node_view[b]), kind))
    return nodes, edges


def _calibrate_threshold(slam_probe, neighbor_edge_num=2) -> float:
    """Accept-all probe run -> pick rel_pose_thres in the widest usable gap
    of the observed NON-adjacent pose-edge confidences, so the differential
    runs exercise both accept and reject with maximal numeric margin (a
    random untrained pose head emits confidences in a narrow band near 0.5;
    a hard-coded threshold would either reject nothing or sit numerically on
    top of a sample). 'Usable' = below the best loop-pair confidence, so at
    least one genuine loop edge survives into the graph."""
    g = slam_probe.graph
    confs, loop_confs = [], []
    for e in range(g.num_edges):
        a, b = (int(x) for x in g.edges[e])
        if float(g.edge_confs[e][0]) == float(g.edge_confs[e][5]) == 2.0:
            continue  # scale edge
        dist = abs(int(g.node_view[a]) - int(g.node_view[b]))
        if dist > 1:
            confs.append(float(g.edge_confs[e][0]))
        if dist > neighbor_edge_num:
            loop_confs.append(float(g.edge_confs[e][0]))
    assert len(confs) >= 2, "probe produced too few non-adjacent pose edges"
    assert loop_confs, "probe produced no loop edges — sequence too easy"
    confs.sort()
    loop_max = max(loop_confs)
    best = None
    for k in range(len(confs) - 1):
        if confs[k + 1] <= loop_max:
            gap = confs[k + 1] - confs[k]
            if best is None or gap > best[1]:
                best = (k, gap)
    assert best is not None, \
        "every loop-pair confidence is the minimum — cannot calibrate"
    k = best[0]
    return (confs[k] + confs[k + 1]) / 2.0


def _differential_case(img, enc_dim, enc_depth, enc_heads, dec_dim, dec_depth,
                       dec_heads, mlp_ratio, *, n_views=10, seed=0,
                       traj_tol=0.05, seq_seeds=None, pgo_every=500,
                       max_view_num=32, min_loops=1, min_pgo_runs=1):
    torch.manual_seed(seed)
    tm = load_reference_sta(
        img_size=(img, img), patch_size=16,
        enc_embed_dim=enc_dim, enc_depth=enc_depth, enc_num_heads=enc_heads,
        dec_embed_dim=dec_dim, dec_depth=dec_depth, dec_num_heads=dec_heads,
        mlp_ratio=mlp_ratio)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, enc_depth=enc_depth, dec_depth=dec_depth)
    cfg = STAConfig(img_size=(img, img), patch_size=16, enc_dim=enc_dim,
                    enc_depth=enc_depth, enc_heads=enc_heads, dec_dim=dec_dim,
                    dec_depth=dec_depth, dec_heads=dec_heads,
                    mlp_ratio=mlp_ratio, compute_dtype=jnp.float32)

    rgbs, grays = _make_sequence(n_views, (img, img), seeds=seq_seeds)
    vocab = _build_vocab(grays[: n_views - 2])

    kw = dict(pgo_every=pgo_every, max_view_num=max_view_num)
    probe = _run_slam(TorchReferenceFrontend(tm), rgbs, grays, vocab,
                      rel_pose_thres=-1.0, **kw)
    rel_pose_thres = _calibrate_threshold(probe)

    slam_jax = _run_slam(FrontendEngine(cfg, params), rgbs, grays, vocab,
                         rel_pose_thres=rel_pose_thres, **kw)
    slam_ref = _run_slam(TorchReferenceFrontend(tm), rgbs, grays, vocab,
                         rel_pose_thres=rel_pose_thres, **kw)
    assert slam_jax.n_pgo_runs == slam_ref.n_pgo_runs >= min_pgo_runs

    # --- identical graph topology: nodes, edge set, edge kinds -------------
    nodes_j, edges_j = _graph_facts(slam_jax)
    nodes_r, edges_r = _graph_facts(slam_ref)
    assert nodes_j == nodes_r, "node (view, connected_view) sets diverge"
    assert edges_j == edges_r, "edge topology diverges"
    assert slam_jax.graph.num_edges == slam_ref.graph.num_edges

    # the comparison must be non-trivial: the sequence has to produce
    # accepted loop edges AND at least one rejection (gap slots)
    loop_edges = [e for e in edges_j
                  if e[2] == "pose" and abs(e[0] - e[1]) > 2]
    assert len(loop_edges) >= min_loops, \
        f"only {len(loop_edges)} loop edges accepted (need {min_loops})"
    views_used = {v for v, _ in nodes_j}
    n_gaps = slam_jax.graph.num_nodes - len(nodes_j)
    assert n_gaps > 0, "no edge was rejected — threshold exercise missing"

    # --- edge numerics: pose-edge confidences + Sim(3) measurements --------
    for e in range(slam_jax.graph.num_edges):
        cj = np.asarray(slam_jax.graph.edge_confs[e], np.float64)
        cr = np.asarray(slam_ref.graph.edge_confs[e], np.float64)
        np.testing.assert_allclose(cj, cr, atol=5e-3)
        np.testing.assert_allclose(slam_jax.graph.edge_poses[e],
                                   slam_ref.graph.edge_poses[e], atol=5e-3)

    # --- post-PGO trajectories agree within the 5% ATE contract ------------
    traj_j = [slam_jax.get_view(v)["pose"] for v in range(slam_jax.view_num)]
    traj_r = [slam_ref.get_view(v)["pose"] for v in range(slam_ref.view_num)]
    rmse = umeyama_ate(traj_j, traj_r)
    t_r = np.asarray([p[:3, 3] for p in traj_r])
    extent = float(np.linalg.norm(t_r - t_r.mean(0), axis=1).max())
    assert rmse <= traj_tol * max(extent, 1e-3), (rmse, extent)

    # scales agree too (the scale-edge chain through the store)
    sc_j = [slam_jax.get_view(v)["scale"] for v in range(slam_jax.view_num)]
    sc_r = [slam_ref.get_view(v)["scale"] for v in range(slam_ref.view_num)]
    np.testing.assert_allclose(sc_j, sc_r, rtol=2e-2)
    return rmse, extent, len(edges_j), len(loop_edges), n_gaps


def test_differential_trajectory_parity_reduced():
    """64x64 / enc 64x2 / dec 48x12 (the reference DPT factory requires
    dec_depth > 9): full SLAM loop, JAX vs actual-reference frontend."""
    _differential_case(img=64, enc_dim=64, enc_depth=2, enc_heads=4,
                       dec_dim=48, dec_depth=12, dec_heads=4, mlp_ratio=2)


@pytest.mark.skipif(os.environ.get("VSLAM_FULL_PARITY") != "1",
                    reason="full-size run: set VSLAM_FULL_PARITY=1 "
                           "(result recorded in PARITY.md)")
def test_differential_trajectory_parity_full_size():
    """Flagship 224x224 / enc 1024x24 / dec 768x12 — minutes on CPU."""
    stats = _differential_case(img=224, enc_dim=1024, enc_depth=24,
                               enc_heads=16, dec_dim=768, dec_depth=12,
                               dec_heads=12, mlp_ratio=4, n_views=8, seed=0)
    print(f"full-size differential parity: rmse={stats[0]:.3g} "
          f"extent={stats[1]:.3g} edges={stats[2]} loops={stats[3]} "
          f"gaps={stats[4]}")


@pytest.mark.skipif(os.environ.get("VSLAM_FULL_PARITY") != "1",
                    reason="full-size run: set VSLAM_FULL_PARITY=1 "
                           "(result recorded in PARITY.md)")
def test_differential_trajectory_parity_full_size_long():
    """Flagship config at production SEQUENCE shape: 36 views with
    mid-sequence revisits (views 16/17 re-see the textures of views 0/1,
    and the final two close the loop again), ≥2 accepted loop closures,
    and ≥2 WINDOWED PGOs triggered mid-run (pgo_every=16) — so PGO
    write-back, the loop-window extension (loop_related_views grows the
    opt window, then clears), and graph construction on top of
    already-optimized poses are all pinned against the torch reference
    frontend at full model size (reference: vista_slam/slam.py:
    108-140,263-297). ~20 min on the 1-core dev box; result in PARITY.md."""
    seeds = list(range(16)) + [0, 1] + list(range(16, 32)) + [0, 1]
    stats = _differential_case(img=224, enc_dim=1024, enc_depth=24,
                               enc_heads=16, dec_dim=768, dec_depth=12,
                               dec_heads=12, mlp_ratio=4, n_views=36,
                               seed=0, seq_seeds=seeds, pgo_every=16,
                               max_view_num=64, min_loops=2,
                               min_pgo_runs=3)
    print(f"full-size LONG differential parity: rmse={stats[0]:.3g} "
          f"extent={stats[1]:.3g} edges={stats[2]} loops={stats[3]} "
          f"gaps={stats[4]}")
