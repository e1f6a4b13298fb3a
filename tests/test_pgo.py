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


def _stress_graph(n=120, seed=3, odo_noise=0.03, init_noise=0.15):
    """Long drifting loop trajectory (circle returning to start) + one
    distant exact loop edge + near-zero-confidence junk edges + deliberately
    bad initialization (VERDICT round-1 item 7; reference trust-region
    semantics: slam.py:123-137)."""
    key = jax.random.PRNGKey(seed)
    k_chain, k_junk, k_init = jax.random.split(key, 3)

    # circle: constant forward step + yaw, so node n-1 revisits node 0
    step = jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.0, 2 * np.pi / n, 0.0])
    gt = [sim3.identity()]
    for _ in range(1, n):
        gt.append(sim3.mul(gt[-1], sim3.exp(step)))
    gt = jnp.stack(gt)
    keys = jax.random.split(k_chain, n)
    all_edges, all_meas = [], []
    for k in range(1, n):
        z = sim3.mul(sim3.inv(gt[k - 1]), gt[k])
        xi = odo_noise * jax.random.normal(keys[k], (7,))
        all_edges.append((k, k - 1))
        all_meas.append(sim3.mul(z, sim3.exp(xi)))
    all_confs = [np.ones(7, np.float32)] * len(all_edges)

    # one distant loop with an exact measurement, strongly weighted
    all_edges.append((n - 1, 0))
    all_meas.append(sim3.mul(sim3.inv(gt[0]), gt[n - 1]))
    all_confs.append(np.full(7, 10.0, np.float32))

    # a block of junk edges with near-zero confidence: they must not drag
    # the solution, and their ~0 weights must not break CG/preconditioning
    junk_keys = jax.random.split(k_junk, 10)
    rng = np.random.default_rng(seed)
    for t in range(10):
        i, j = sorted(rng.choice(n, 2, replace=False), reverse=True)
        all_edges.append((int(i), int(j)))
        all_meas.append(sim3.exp(2.0 * jax.random.normal(junk_keys[t], (7,))))
        all_confs.append(np.full(7, 1e-6, np.float32))

    # bad init: drifted odometry integration, further scrambled
    init = [np.asarray(sim3.identity())]
    for k in range(1, n):
        init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), all_meas[k - 1])))
    init = jnp.asarray(np.stack(init))
    pert = init_noise * jax.random.normal(k_init, (n, 7))
    init = sim3.mul(init, sim3.exp(pert))
    init = init.at[0].set(sim3.identity())

    opt_mask = np.ones(n, bool)
    opt_mask[0] = False
    return gt, init, all_edges, all_meas, all_confs, opt_mask


def _run_stress(cfg, n=120, n_pad=128, e_pad=160):
    gt, init, all_edges, all_meas, all_confs, opt_mask = _stress_graph(n)
    e = len(all_edges)
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.stack([np.asarray(m) for m in all_meas]), e_pad,
                np.asarray(sim3.identity()))
    confs = pad(np.stack(all_confs), e_pad, np.zeros(7, np.float32))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(opt_mask, n_pad, np.zeros((), bool))
    out, info = optimize_pose_graph(nodes, edges, poses, confs, valid, mask, cfg)
    return gt, init, out[:n], info


def test_pgo_stress_long_chain_distant_loop():
    cfg = PGOConfig(max_steps=40)
    gt, init, out, info = _run_stress(cfg)
    n = gt.shape[0]
    assert np.isfinite(np.asarray(out)).all()
    assert float(info["loss"]) < 0.05 * float(info["loss0"]), info
    # converged to the loop-consistent solution: the distant loop edge is
    # satisfied (it was wildly violated at init) ...
    z = sim3.mul(sim3.inv(out[0]), out[n - 1])
    z_gt = sim3.mul(sim3.inv(gt[0]), gt[n - 1])
    err = float(jnp.linalg.norm(sim3.log(sim3.mul(sim3.inv(z_gt), z))))
    err_init = float(jnp.linalg.norm(sim3.log(
        sim3.mul(sim3.inv(z_gt), sim3.mul(sim3.inv(init[0]), init[n - 1])))))
    assert err < 0.1 * err_init, (err, err_init)
    # ... and the trajectory is globally better than the scrambled init
    assert ate(out, gt) < 0.5 * ate(init, gt), (ate(out, gt), ate(init, gt))
    # junk near-zero-confidence edges did not explode anything
    assert float(jnp.abs(sim3.trans(out)).max()) < 1e3


def test_pgo_stress_damping_schedule_robustness():
    """Two different LM damping schedules must both converge on the
    ill-conditioned graph — the answer may not hinge on the invented
    4.0/0.5 factors (reference uses pypose TrustRegion internals,
    slam.py:125-127)."""
    cfg_a = PGOConfig(max_steps=40, lambda_up=4.0, lambda_down=0.5)
    cfg_b = PGOConfig(max_steps=40, lambda_up=10.0, lambda_down=0.2)
    _, _, out_a, info_a = _run_stress(cfg_a)
    gt, _, out_b, info_b = _run_stress(cfg_b)
    for info, out in [(info_a, out_a), (info_b, out_b)]:
        assert np.isfinite(np.asarray(out)).all()
        assert float(info["loss"]) < 0.05 * float(info["loss0"])
    # both schedules land on comparable optima
    la, lb = float(info_a["loss"]), float(info_b["loss"])
    assert la < 3 * lb and lb < 3 * la, (la, lb)
    assert abs(ate(out_a, gt) - ate(out_b, gt)) < 0.3


def test_pgo_trust_radius_guards_bad_linearization():
    """The adaptive trust region (radius doubles on accept, shrinks 4x on
    reject; pypose TrustRegion semantics, reference slam.py:125) must keep
    the solver finite and convergent both from a tiny initial radius (many
    capped steps) and from an effectively-uncapped one (LM rejection is the
    only guard). Pins the radius-adaptation semantics."""
    cfg_tiny = PGOConfig(max_steps=40, radius0=1.0)
    cfg_wild = PGOConfig(max_steps=40, radius0=1e6, radius_max=1e6)
    gt, init, out_tiny, info_tiny = _run_stress(cfg_tiny)
    _, _, out_wild, info_wild = _run_stress(cfg_wild)
    assert np.isfinite(np.asarray(out_tiny)).all()
    assert np.isfinite(np.asarray(out_wild)).all()
    for info in (info_tiny, info_wild):
        assert float(info["loss"]) < 0.05 * float(info["loss0"]), info
    # starting tiny must not strand the solver: the radius grows back
    la, lb = float(info_tiny["loss"]), float(info_wild["loss"])
    assert la < 3 * lb and lb < 3 * la, (la, lb)


# ---------------------------------------------------------------------------
# Exact-solver cross-checks (round-2 verdict item 3): the production solver
# must land on the same optimum as a test-only fp64 LM with DENSE normal
# equations + Cholesky — the reference's solver shape (reference:
# vista_slam/slam.py:43,123-137). tests/exact_pgo.py shares residuals/
# Jacobians/weighting/retraction; only the linear solve differs. These
# checks are what made solver="dense" the round-3 production default: the
# original 128-iteration block-Jacobi PCG stalled at 0.75 vs the oracle's
# 0.11 on the windowed stress graph below, and even a 2048-iteration fp64
# PCG replica stalled at 0.21 — block-Jacobi CG moves information one
# chain node per iteration, so it cannot solve the long-chain window
# Hessian at production budgets, while the fp32 dense path matches the
# fp64 oracle to 4 digits given the same LM step budget. Round 4 closed
# the gap from the PCG side: the block-tridiagonal chain preconditioner
# (ops/block_tridiag.py, pcg_precond="tridiag" — now the PCG default)
# solves the odometry band exactly per CG iteration and matches the same
# oracle on the same windows (the test_pcg_tridiag_* checks below), which
# is what lets PGOConfig.solver="auto" hand full-graph solves past
# dense_max to PCG without an accuracy cliff.

def _grad_inf(x, edges, poses, confs, valid, mask):
    """fp64 infinity-norm of the masked PGO gradient at x (first-order
    optimality measure)."""
    from vista_slam_tpu.slam.pgo import _residuals_and_jacobians

    x = jnp.asarray(x, jnp.float32)
    m = np.asarray(mask, bool)
    e = np.asarray(edges)
    ei, ej = e[:, 0], e[:, 1]
    mi = m[ei].astype(np.float64)[:, None]
    mj = m[ej].astype(np.float64)[:, None]
    rel = ((mi + mj) > 0).astype(np.float64)
    w = (np.asarray(confs, np.float64)
         * np.asarray(valid, np.float64)[:, None] * rel)
    r, Ji, Jj = _residuals_and_jacobians(x, jnp.asarray(e),
                                         jnp.asarray(poses))
    r = np.asarray(r, np.float64)
    Ji = np.asarray(Ji, np.float64) * mi[..., None]
    Jj = np.asarray(Jj, np.float64) * mj[..., None]
    wr = w * r
    g = np.zeros((x.shape[0], 7))
    np.add.at(g, ei, np.einsum("erc,er->ec", Ji, wr))
    np.add.at(g, ej, np.einsum("erc,er->ec", Jj, wr))
    return np.abs(g * m[:, None]).max()


_ORACLE_CACHE = {}


def _cross_check(nodes, edges, poses, confs, valid, mask, *, loss_rtol,
                 pose_atol=None, cfg=None, oracle_key=None,
                 oracle_steps=100):
    """pose_atol=None switches the agreement criterion from node-level pose
    identity to first-order optimality parity: on degenerate problems (soft
    chain modes — many configurations with near-equal cost) even two exact
    solvers on different damping paths land on different points of the same
    flat valley, so pose identity is not a meaningful contract there.
    oracle_key memoizes the fp64 oracle across tests sharing one window
    (the oracle is minutes-scale at production padding)."""
    from exact_pgo import exact_lm

    cfg = cfg or PGOConfig(max_steps=60, rel_decrease=1e-8, patience=6)
    out_p, info = optimize_pose_graph(nodes, edges, poses, confs, valid,
                                      mask, cfg)
    if oracle_key is not None and oracle_key in _ORACLE_CACHE:
        out_e, loss_e = _ORACLE_CACHE[oracle_key]
    else:
        out_e, loss_e = exact_lm(nodes, edges, poses, confs, valid, mask,
                                 max_steps=oracle_steps)
        if oracle_key is not None:
            _ORACLE_CACHE[oracle_key] = (out_e, loss_e)
    loss_p = float(info["loss"])
    assert loss_p <= loss_e * (1 + loss_rtol) and \
        loss_e <= loss_p * (1 + loss_rtol), (loss_p, loss_e)
    if pose_atol is not None:
        # node-level agreement in the tangent space (gauge is anchored by
        # the fixed nodes, so solutions are directly comparable)
        d = sim3.log(sim3.mul(sim3.inv(out_e), out_p))
        d = np.asarray(d)[np.asarray(mask, bool)]
        assert np.abs(d).max() < pose_atol, np.abs(d).max()
    else:
        g0 = _grad_inf(nodes, edges, poses, confs, valid, mask)
        gp = _grad_inf(out_p, edges, poses, confs, valid, mask)
        ge = _grad_inf(out_e, edges, poses, confs, valid, mask)
        assert gp <= 2.5 * ge, (gp, ge)       # same optimality quality
        assert gp <= 1e-5 * g0, (gp, g0)      # and genuinely converged
    return loss_p, loss_e


def test_pgo_matches_exact_solver_random_graphs():
    for seed in (0, 1, 2):
        key = jax.random.PRNGKey(seed)
        n = 24
        gt, meas, edges_np = make_chain(n, key, noise=0.08)
        # add three loop edges (one exact, two noisy) + one scale-only edge
        extra_e = [(n - 1, 0), (n // 2, 2), (n - 3, n // 2)]
        extra_m = [sim3.mul(sim3.inv(gt[0]), gt[n - 1]),
                   sim3.mul(sim3.mul(sim3.inv(gt[2]), gt[n // 2]),
                            sim3.exp(0.05 * jnp.ones(7))),
                   sim3.mul(sim3.inv(gt[n // 2]), gt[n - 3])]
        all_edges = list(map(tuple, edges_np)) + extra_e
        all_meas = jnp.concatenate([meas] + [m[None] for m in extra_m])
        e = len(all_edges)
        rng = np.random.default_rng(seed)
        confs_real = rng.uniform(0.3, 3.0, (e, 7)).astype(np.float32)

        init = [np.asarray(sim3.identity())]
        for k in range(1, n):
            init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), meas[k - 1])))
        init = jnp.asarray(np.stack(init))
        opt_mask = np.ones(n, bool)
        opt_mask[0] = False

        n_pad, e_pad = 32, 64
        nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
        edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
        poses = pad(np.asarray(all_meas), e_pad, np.asarray(sim3.identity()))
        confs = pad(confs_real, e_pad, np.zeros(7, np.float32))
        valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
        mask = pad(opt_mask, n_pad, np.zeros((), bool))
        _cross_check(nodes, edges, poses, confs, valid, mask,
                     loss_rtol=2e-3, pose_atol=2e-2)


def test_pgo_matches_exact_solver_stress_graph():
    """The ill-conditioned stress graph (junk near-zero-confidence edges,
    bad init, distant strong loop): PCG at the production 128-iteration
    budget must still reach the exact-solver optimum."""
    gt, init, all_edges, all_meas, all_confs, opt_mask = _stress_graph(n=60)
    e = len(all_edges)
    n_pad, e_pad = 64, 96
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.stack([np.asarray(m) for m in all_meas]), e_pad,
                np.asarray(sim3.identity()))
    confs = pad(np.stack(all_confs), e_pad, np.zeros(7, np.float32))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(opt_mask, n_pad, np.zeros((), bool))
    _cross_check(nodes, edges, poses, confs, valid, mask,
                 loss_rtol=5e-3, pose_atol=5e-2)


def test_pcg_tridiag_matches_exact_solver_stress_graph():
    """solver="pcg" with the block-tridiagonal chain preconditioner
    (the pcg_precond default) on the same ill-conditioned stress graph as
    the dense cross-check above: the chain preconditioner must hold the
    fp64-oracle optimum at the production 128-iteration budget — the
    capability block-Jacobi lacks on drifted long chains (see the stall
    numbers in the comment atop this section)."""
    gt, init, all_edges, all_meas, all_confs, opt_mask = _stress_graph(n=60)
    e = len(all_edges)
    n_pad, e_pad = 64, 96
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.stack([np.asarray(m) for m in all_meas]), e_pad,
                np.asarray(sim3.identity()))
    confs = pad(np.stack(all_confs), e_pad, np.zeros(7, np.float32))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(opt_mask, n_pad, np.zeros((), bool))
    _cross_check(nodes, edges, poses, confs, valid, mask,
                 loss_rtol=5e-3, pose_atol=5e-2,
                 cfg=PGOConfig(max_steps=60, rel_decrease=1e-8, patience=6,
                               solver="pcg", pcg_precond="tridiag"))


def _production_padded_window():
    """Production-size padded buffers (4800 node slots / 5200 edge slots,
    the flagship-config allocation) with a realistic windowed optimization:
    a 360-view chain with loop closures where only the last 120 views (plus
    loop-touched early views) are optimized, the rest frozen — the
    reference's windowed-PGO shape (slam.py:115-121)."""
    key = jax.random.PRNGKey(7)
    n = 360
    gt, meas, edges_np = make_chain(n, key, noise=0.04)
    extra_e = [(n - 1, 3), (n - 40, 10)]
    extra_m = [sim3.mul(sim3.inv(gt[3]), gt[n - 1]),
               sim3.mul(sim3.inv(gt[10]), gt[n - 40])]
    all_edges = list(map(tuple, edges_np)) + extra_e
    all_meas = jnp.concatenate([meas] + [m[None] for m in extra_m])
    e = len(all_edges)
    confs_real = np.ones((e, 7), np.float32)
    confs_real[-2:] = 5.0

    init = [np.asarray(sim3.identity())]
    for k in range(1, n):
        init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), meas[k - 1])))
    init = jnp.asarray(np.stack(init))
    # window: last 120 nodes + the loop-touched early nodes move
    opt_mask = np.zeros(n, bool)
    opt_mask[n - 120:] = True
    opt_mask[3] = opt_mask[10] = True

    n_pad, e_pad = 4800, 5200
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.asarray(all_meas), e_pad, np.asarray(sim3.identity()))
    confs = pad(confs_real, e_pad, np.zeros(7, np.float32))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(opt_mask, n_pad, np.zeros((), bool))
    return nodes, edges, poses, confs, valid, mask


def test_pgo_matches_exact_on_production_padded_window():
    """Dense solver (the production default) vs the fp64 oracle on the
    production-padded window.

    Budgets: the coordinated 120-node chain bend needs ~300 Newton steps
    (the retraction nonlinearity, not the linear solve, is the bottleneck
    — the fp64 oracle takes a comparable accepted-step count); budget both
    solvers equivalently so the check isolates linear-solver exactness.
    pose_atol=None: this window is degenerate (frozen drifted middle vs
    strong loop edges leaves soft modes along the chain — measured
    tangent diff up to 5.3 between equally-optimal solutions at loss
    delta 1.5e-4), so the contract is optimality parity, not pose
    identity."""
    buffers = _production_padded_window()
    _cross_check(*buffers, loss_rtol=2e-3, pose_atol=None,
                 oracle_key="prodwin",
                 cfg=PGOConfig(max_steps=300, rel_decrease=1e-9,
                               patience=10))


def test_pcg_tridiag_matches_exact_on_production_padded_window():
    """THE capability the chain preconditioner was built for: matrix-free
    PCG holding the fp64-oracle optimum on the production-padded window —
    the exact configuration where block-Jacobi PCG stalls (measured on
    this window: jacobi final loss 0.697 / grad_inf 7.5 vs tridiag 0.114 /
    grad_inf 0.84 vs oracle ~0.11; see the stall discussion atop this
    section and PGOConfig.pcg_precond). Shares the cached oracle with the
    dense test above."""
    buffers = _production_padded_window()
    _cross_check(*buffers, loss_rtol=2e-3, pose_atol=None,
                 oracle_key="prodwin",
                 cfg=PGOConfig(max_steps=300, rel_decrease=1e-9,
                               patience=10, solver="pcg",
                               pcg_precond="tridiag"))


def test_pcg_solver_survives_as_fallback():
    """solver="pcg" (the O(E+N)-memory fallback for windows past
    dense_max) must still reach the exact optimum on moderately
    conditioned graphs — its documented envelope."""
    key = jax.random.PRNGKey(3)
    n = 24
    gt, meas, edges_np = make_chain(n, key, noise=0.08)
    loop = sim3.mul(sim3.inv(gt[0]), gt[n - 1])
    all_edges = list(map(tuple, edges_np)) + [(n - 1, 0)]
    all_meas = jnp.concatenate([meas, loop[None]])
    e = len(all_edges)

    init = [np.asarray(sim3.identity())]
    for k in range(1, n):
        init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), meas[k - 1])))
    init = jnp.asarray(np.stack(init))
    opt_mask = np.ones(n, bool)
    opt_mask[0] = False

    n_pad, e_pad = 32, 32
    nodes = pad(np.asarray(init), n_pad, np.asarray(sim3.identity()))
    edges = pad(np.asarray(all_edges, np.int32), e_pad, np.zeros(2, np.int32))
    poses = pad(np.asarray(all_meas), e_pad, np.asarray(sim3.identity()))
    confs = pad(np.ones((e, 7), np.float32), e_pad, np.zeros(7, np.float32))
    valid = pad(np.ones(e, bool), e_pad, np.zeros((), bool))
    mask = pad(opt_mask, n_pad, np.zeros((), bool))
    _cross_check(nodes, edges, poses, confs, valid, mask,
                 loss_rtol=5e-3, pose_atol=3e-2,
                 cfg=PGOConfig(max_steps=60, rel_decrease=1e-8, patience=6,
                               solver="pcg"))


def test_dense_solver_config_matrix_agrees():
    """Blocked-vs-monolithic factorization and refinement on/off must land
    on the same optimum: on CPU every matmul precision is fp32, so the
    blocked strips/refinement restructuring (ops/linalg.py, added for TPU
    memory/throughput) is a pure reorganization. Compares achieved loss
    (elementwise pose comparison is gauge-sensitive, see CLAUDE.md)."""
    gt, meas, edges = make_chain(90, jax.random.PRNGKey(11), noise=0.08)
    loops = [(60, 5), (85, 30)]
    extra = [sim3.mul(sim3.inv(gt[j]), gt[i]) for i, j in loops]
    opt = np.ones(90, bool)
    opt[0] = False

    losses = {}
    for name, kw in {
        "mono_refine0": dict(chol_panel=10_000, factor_refine=0),
        "mono_refine2": dict(chol_panel=10_000, factor_refine=2),
        "blocked_refine0": dict(chol_panel=64, factor_refine=0),
        "blocked_refine2": dict(chol_panel=64, factor_refine=2),
    }.items():
        cfg = PGOConfig(max_steps=25, solver="dense",
                        factor_precision="highest", **kw)
        n = gt.shape[0]
        init = [np.asarray(sim3.identity())]
        for k in range(1, n):
            init.append(np.asarray(sim3.mul(jnp.asarray(init[-1]), meas[k - 1])))
        init = jnp.asarray(np.stack(init))
        all_edges = list(map(tuple, edges)) + loops
        all_meas = jnp.concatenate([meas] + [m[None] for m in extra])
        e = len(all_edges)
        nodes = pad(np.asarray(init), 128, np.asarray(sim3.identity()))
        ebuf = pad(np.asarray(all_edges, np.int32), 128, np.zeros(2, np.int32))
        poses = pad(np.asarray(all_meas), 128, np.asarray(sim3.identity()))
        confs = jnp.ones((128, 7))
        valid = pad(np.ones(e, bool), 128, np.zeros((), bool))
        mask = pad(opt, 128, np.zeros((), bool))
        out, info = optimize_pose_graph(nodes, ebuf, poses, confs, valid,
                                        mask, cfg)
        losses[name] = float(info["loss"])
        assert losses[name] < 0.5 * float(info["loss0"]), (name, losses[name])

    ref = losses["mono_refine0"]
    for name, v in losses.items():
        assert abs(v - ref) <= 1e-3 * max(ref, 1e-6) + 1e-7, (losses,)
