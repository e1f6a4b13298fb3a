"""Test-only exact PGO solver: LM over DENSE normal equations with a
Cholesky factorization — the reference's solver shape (reference:
vista_slam/slam.py:43,123-137, pypose LM + ppos.Cholesky) — sharing the
production solver's residuals, Jacobians, weighting and retraction
(vista_slam_tpu/slam/pgo.py). The only difference is the linear solve:
exact dense fp64 over the FULL node set here vs the production paths — a
windowed fp32 equilibrated dense Cholesky up to dense_max optimized nodes
and chain-preconditioned matrix-free PCG beyond (the measured v5e
crossover; see PGOConfig.solver).

Used by test_pgo.py to cross-check that the production solver's optimum
matches an exact solve — it is what caught the block-Jacobi truncated-PCG
stall in round 3 (and then certified the round-4 block-tridiagonal
preconditioner that fixed it); any regression on either path fails there.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from vista_slam_tpu.ops import sim3
from vista_slam_tpu.slam.pgo import _loss, _residuals_and_jacobians


def exact_lm(nodes, edges, edge_poses, edge_confs, edge_valid, opt_mask, *,
             max_steps=100, lam0=1e-4, lam_up=4.0, lam_down=0.5,
             lam_min=1e-8, lam_max=1e6, rel_tol=1e-10, patience=5):
    """Returns (nodes [N,8], final_loss). Semantics mirror
    optimize_pose_graph: only opt_mask nodes move; edges with at least one
    opt endpoint contribute; damping is lam * diag(H) + 1e-10."""
    nodes = jnp.asarray(nodes, jnp.float32)
    edges = np.asarray(edges)
    edge_poses = jnp.asarray(edge_poses, jnp.float32)
    opt_mask = np.asarray(opt_mask, bool)

    mi = opt_mask[edges[:, 0]].astype(np.float64)[:, None]
    mj = opt_mask[edges[:, 1]].astype(np.float64)[:, None]
    related = ((mi + mj) > 0).astype(np.float64)
    w = (np.asarray(edge_confs, np.float64)
         * np.asarray(edge_valid, np.float64)[:, None] * related)   # [E,7]
    w_jax = jnp.asarray(w, jnp.float32)

    opt_idx = np.where(opt_mask)[0]
    col_of = np.full(len(opt_mask), -1, np.int64)
    col_of[opt_idx] = np.arange(len(opt_idx))
    K = len(opt_idx)

    x = nodes
    loss = float(_loss(x, jnp.asarray(edges), edge_poses, w_jax)[0])
    lam = lam0
    stall = 0
    for _ in range(max_steps):
        r, Ji, Jj = _residuals_and_jacobians(x, jnp.asarray(edges), edge_poses)
        r = np.asarray(r, np.float64)
        Ji = np.asarray(Ji, np.float64) * mi[..., None]
        Jj = np.asarray(Jj, np.float64) * mj[..., None]

        # dense J [7E, 7K] over the optimized DOFs, row-weighted by W
        E = len(edges)
        J = np.zeros((7 * E, 7 * K))
        for e in range(E):
            for n, Jn in ((edges[e, 0], Ji[e]), (edges[e, 1], Jj[e])):
                c = col_of[n]
                if c >= 0:
                    J[7 * e: 7 * e + 7, 7 * c: 7 * c + 7] += Jn
        W = w.reshape(-1)                                   # [7E]
        g = J.T @ (W * r.reshape(-1))                       # [7K]
        H = J.T @ (W[:, None] * J)                          # [7K, 7K]

        accepted = False
        for _retry in range(30):
            Hd = H + np.diag(lam * np.diag(H) + 1e-10)
            try:
                cf = scipy.linalg.cho_factor(Hd)
                delta_flat = scipy.linalg.cho_solve(cf, -g)
            except np.linalg.LinAlgError:
                lam = min(lam * lam_up, lam_max)
                continue
            delta = np.zeros((len(opt_mask), 7))
            delta[opt_idx] = delta_flat.reshape(K, 7)
            x_new = sim3.normalize(sim3.retract(x, jnp.asarray(delta, jnp.float32)))
            new_loss = float(_loss(x_new, jnp.asarray(edges), edge_poses,
                                   w_jax)[0])
            if np.isfinite(new_loss) and new_loss < loss:
                rel = (loss - new_loss) / max(loss, 1e-12)
                x, loss = x_new, new_loss
                lam = max(lam * lam_down, lam_min)
                stall = 0 if rel >= rel_tol else stall + 1
                accepted = True
                break
            lam = min(lam * lam_up, lam_max)
        if not accepted or stall >= patience:
            break
    return x, loss
