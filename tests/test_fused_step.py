"""The fused edge step (decode + store scatter + scale reductions in one
program) must be numerically identical to the chained-dispatch path."""

import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.models.sta import STAConfig, init_params
from vista_slam_tpu.slam.frontend import FrontendEngine
from vista_slam_tpu.slam.pointmap_store import DevicePointmapStore

CFG = STAConfig(img_size=(64, 64), patch_size=16, enc_dim=64, enc_depth=1,
                enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                mlp_ratio=2, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def engine():
    _, params = init_params(CFG, seed=0)
    return FrontendEngine(CFG, params)


def test_fused_matches_chained(engine):
    rng = np.random.default_rng(0)
    n = 3
    feats_i = [jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
               for _ in range(n)]
    feats_j = [jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
               for _ in range(n)]
    node_idxs = [0, 1, 2, 3, 4, 5]
    jobs = [(2, 0), (4, 0), (3, 1)]

    # chained path
    store_a = DevicePointmapStore(10, (64, 64))
    outs = engine.decode_pairs(feats_i, feats_j, fetch=True)
    b = outs["bucket"]
    rows = np.asarray([r for k in range(n) for r in (k, b + k)])
    store_a.write_batch(node_idxs, outs["depth_dev"][rows], outs["conf_dev"][rows])
    s_a, c_a = store_a.scales_batch([a for a, _ in jobs], [f for _, f in jobs])

    # fused path
    store_b = DevicePointmapStore(10, (64, 64))
    host = engine.decode_pairs_fused(feats_i, feats_j, store_b, node_idxs, jobs)

    np.testing.assert_allclose(np.asarray(store_b.depth[:6]),
                               np.asarray(store_a.depth[:6]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(store_b.conf[:6]),
                               np.asarray(store_a.conf[:6]), rtol=1e-2)
    np.testing.assert_allclose(host["scale"], s_a, rtol=1e-3)
    np.testing.assert_allclose(host["scale_conf"], c_a, rtol=1e-3)
    np.testing.assert_allclose(host["pose_ij"], outs["pose_ij"], atol=1e-4)
    np.testing.assert_allclose(host["mean_conf_i"], outs["mean_conf_i"], rtol=1e-4)
    np.testing.assert_allclose(host["K"], outs["K"], rtol=1e-3)


def test_fused_pads_to_scrap_slot(engine):
    rng = np.random.default_rng(1)
    feats_i = [jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)]
    feats_j = [jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)]
    store = DevicePointmapStore(10, (64, 64))
    engine.decode_pairs_fused(feats_i, feats_j, store, [0, 1], [])
    # bucket pads to 2 pairs; padded slots land on the scrap row (9)
    assert float(jnp.abs(store.depth[0]).sum()) > 0
    assert float(jnp.abs(store.depth[1]).sum()) > 0
    for untouched in range(2, 9):
        assert float(jnp.abs(store.depth[untouched]).sum()) == 0.0


def test_combined_schedule_with_real_engine():
    """combine_loop_batch through the REAL engine (fixed_bucket pins one
    fused program — the per-bucket programs may otherwise alternate
    donated-store layouts) must reproduce the split schedule's graph and
    trajectory. Exercises a fresh engine per mode since fixed_bucket is
    set at OnlineSLAM construction."""
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    rng = np.random.default_rng(9)
    rgbs = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
            for _ in range(6)]

    def run(combined):
        _, params = init_params(CFG, seed=0)
        eng = FrontendEngine(CFG, params)
        slam = OnlineSLAM(eng, max_view_num=16, neighbor_edge_num=3,
                          loop_edge_num=0, pgo_every=10 ** 6,
                          rel_pose_thres=-1.0, combine_loop_batch=combined)
        if combined:
            assert eng.fixed_bucket == 8
        for rgb in rgbs:
            slam.step({"rgb": rgb})
        traj = np.stack([slam.get_view(v, filter_outlier=False)["pose"]
                         for v in range(slam.view_num)])
        return slam, traj

    slam_a, traj_a = run(False)
    slam_b, traj_b = run(True)
    assert slam_a.get_view_graph() == slam_b.get_view_graph()
    # bucket padding changes XLA fusion; small numeric drift only
    np.testing.assert_allclose(traj_b, traj_a, atol=1e-4)
    # A random-weight graph is degenerate: the dense-Cholesky solver's exact
    # Newton steps amplify that ~1e-6 input drift along near-null gauge
    # directions into visibly different (but EQUALLY optimal) solutions, so
    # post-PGO poses are compared at the objective level, not elementwise
    # (same phenomenon as the production-window check in test_pgo.py).
    info_a = slam_a.pose_graph_optimize()
    info_b = slam_b.pose_graph_optimize()
    np.testing.assert_allclose(float(info_b["loss"]), float(info_a["loss"]),
                               rtol=1e-3)
    for slam in (slam_a, slam_b):
        traj = np.stack([slam.get_view(v, filter_outlier=False)["pose"]
                         for v in range(slam.view_num)])
        assert np.isfinite(traj).all()


def test_encode_fused_matches_separate_encode(engine):
    """encode_decode_pairs_fused (encode + decode + store + scales in ONE
    program) must match a separate encode() followed by decode_pairs_fused
    on the resulting feature."""
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    feats_j = [jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
               for _ in range(2)]
    node_idxs = [0, 1, 2, 3]
    jobs = [(2, 0)]

    feat_sep = engine.encode(img)
    store_a = DevicePointmapStore(10, (64, 64))
    host_a = engine.decode_pairs_fused([feat_sep] * 2, feats_j, store_a,
                                       node_idxs, jobs)

    store_b = DevicePointmapStore(10, (64, 64))
    host_b, feat_fused = engine.encode_decode_pairs_fused(
        img, feats_j, store_b, node_idxs, jobs)

    np.testing.assert_allclose(np.asarray(feat_fused), np.asarray(feat_sep),
                               atol=1e-5)
    for k in ("pose_ij", "pose_conf_ij", "mean_conf_i", "K", "scale"):
        np.testing.assert_allclose(host_b[k], host_a[k], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(store_b.depth[:4]),
                               np.asarray(store_a.depth[:4]), atol=1e-3)


def test_online_fused_encode_matches_prefetched(engine=None):
    """The online fused-encode schedule (encode rides the edge-batch
    program) must reproduce the prefetched-features path: same graph
    topology, near-identical trajectory."""
    from vista_slam_tpu.slam.online_slam import OnlineSLAM

    rng = np.random.default_rng(3)
    rgbs = [rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
            for _ in range(6)]

    def run(prefetch):
        _, params = init_params(CFG, seed=0)
        eng = FrontendEngine(CFG, params)
        slam = OnlineSLAM(eng, max_view_num=16, neighbor_edge_num=3,
                          loop_edge_num=0, pgo_every=10 ** 6,
                          rel_pose_thres=-1.0)
        feats = eng.encode_batch(np.stack(rgbs)) if prefetch else None
        for k, rgb in enumerate(rgbs):
            v = {"rgb": rgb}
            if prefetch:
                v["enc_feat"] = feats[k]
            slam.step(v, force_pgo=(k == len(rgbs) - 1))
        traj = np.stack([slam.get_view(v, filter_outlier=False)["pose"]
                         for v in range(slam.view_num)])
        return slam, traj

    slam_a, traj_a = run(prefetch=True)
    slam_b, traj_b = run(prefetch=False)
    # the fused-encode path must actually have been exercised
    assert all(f is not None for f in slam_b.enc_feats)
    assert slam_a.get_view_graph() == slam_b.get_view_graph()
    np.testing.assert_allclose(traj_b, traj_a, atol=1e-3)
