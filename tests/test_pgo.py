import jax
import jax.numpy as jnp
import numpy as np

from vista_slam_tpu.ops import sim3
from vista_slam_tpu.slam.pgo import PGOConfig, optimize_pose_graph


def make_chain(n, key, noise=0.05):
    """Ground-truth poses on an arc + noisy odometry measurements."""
    gt = [sim3.identity()]
    for k in range(1, n):
        step = jnp.asarray([0.5, 0.0, 0.05 * k, 0.0, 0.0, 0.15, 0.0])
        gt.append(sim3.mul(gt[-1], sim3.exp(step)))
    gt = jnp.stack(gt)

    keys = jax.random.split(key, n)
    meas, edges = [], []
    for k in range(1, n):
        z = sim3.mul(sim3.inv(gt[k - 1]), gt[k])  # X_i = X_j * Z with i=k, j=k-1
        xi = noise * jax.random.normal(keys[k], (7,))
        meas.append(sim3.mul(z, sim3.exp(xi)))
        edges.append((k, k - 1))
    return gt, jnp.stack(meas), np.asarray(edges, np.int32)


def pad(arr, n, fill):
    out = np.broadcast_to(fill, (n,) + arr.shape[1:]).copy()
    out[: arr.shape[0]] = np.asarray(arr)
    return jnp.asarray(out)


def ate(poses, gt):
    return float(jnp.sqrt(jnp.mean(jnp.sum((sim3.trans(poses) - sim3.trans(gt)) ** 2, -1))))


def run_graph(gt, meas, edges_np, opt_mask, extra_edges=(), extra_meas=(),
              n_pad=16, e_pad=32, init=None):
    n = gt.shape[0]
    if init is None:
        # integrate noisy odometry for the initialization
        init = [np.asarray(sim3.identity())]
        for k in range(1, n):
            init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), meas[k - 1])))
        init = jnp.asarray(np.stack(init))
    all_edges = list(map(tuple, edges_np)) + list(extra_edges)
    all_meas = jnp.concatenate([meas] + [m[None] for m in extra_meas]) if extra_meas else meas
    e = len(all_edges)
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.asarray(all_meas), e_pad, np.asarray(sim3.identity()))
    confs = jnp.ones((e_pad, 7))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(np.asarray(opt_mask, bool), n_pad, np.zeros((), bool))
    out, info = optimize_pose_graph(nodes, edges, poses, confs, valid, mask,
                                    PGOConfig(max_steps=25))
    return out[:n], init, info


def test_pgo_reduces_loss_and_error():
    key = jax.random.PRNGKey(0)
    gt, meas, edges = make_chain(8, key, noise=0.08)
    # loop edge with an exact measurement anchors the drifted chain
    z_loop = sim3.mul(sim3.inv(gt[0]), gt[7])
    opt_mask = np.ones(8, bool)
    opt_mask[0] = False  # anchor the gauge at node 0
    out, init, info = run_graph(gt, meas, edges, opt_mask,
                                extra_edges=[(7, 0)], extra_meas=[z_loop])
    assert float(info["loss"]) < float(info["loss0"])
    assert ate(out, gt) < 0.7 * ate(init, gt)


def test_pgo_exact_measurements_recover_gt():
    key = jax.random.PRNGKey(1)
    gt, _, edges = make_chain(6, key, noise=0.0)
    meas = jnp.stack([sim3.mul(sim3.inv(gt[j]), gt[i]) for i, j in edges])
    # perturb the initialization instead of the measurements
    pert = 0.2 * jax.random.normal(key, (6, 7))
    init = sim3.mul(gt, sim3.exp(pert))
    init = init.at[0].set(gt[0])
    opt_mask = np.ones(6, bool)
    opt_mask[0] = False
    out, _, info = run_graph(gt, meas, edges, opt_mask, init=init)
    assert ate(out, gt) < 1e-2
    np.testing.assert_allclose(np.asarray(sim3.scale(out)), np.asarray(sim3.scale(gt)), atol=1e-2)


def test_pgo_fixed_nodes_do_not_move():
    key = jax.random.PRNGKey(2)
    gt, meas, edges = make_chain(6, key, noise=0.1)
    opt_mask = np.zeros(6, bool)
    opt_mask[3:] = True  # windowed: only the last 3 views move
    out, init, _ = run_graph(gt, meas, edges, opt_mask)
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(init[:3]), atol=1e-6)


def test_pgo_scale_edge():
    """Two nodes of the same view tied by a scale-only edge converge to the
    measured relative scale (reference scale edges: slam.py:218-232)."""
    gt = jnp.stack([sim3.identity(), sim3.identity()])
    s = 2.0
    z = np.array(sim3.identity())
    z[7] = s  # identity SE3 + scale
    init = np.stack([np.asarray(sim3.identity()), np.asarray(sim3.identity())])
    out, _, info = run_graph(
        gt, jnp.zeros((0, 8)), np.zeros((0, 2), np.int32),
        np.asarray([False, True]),
        extra_edges=[(1, 0)], extra_meas=[jnp.asarray(z)],
        init=jnp.asarray(init),
    )
    # X_1 = X_0 * Z => scale of node 1 should be s
    assert abs(float(sim3.scale(out[1])) - s) < 1e-3
