"""Windowed Sim(3) pose-graph optimization, jit-compiled end to end.

Replaces the reference's pypose Levenberg-Marquardt stack (reference:
vista_slam/slam.py:108-140, vista_slam/pose_graph.py:57-154) with a
TPU-native solver:

  * Buffers are padded to static maxima (the reference preallocates the same
    buffers, pose_graph.py:5-54), so the whole optimization compiles ONCE.
  * Per-edge residuals r_e = Log(Z_e * X_i^-1 * X_j) and their two 7x7
    tangent-space Jacobians are computed with vmapped forward-mode autodiff.
  * The normal equations are never materialized: Gauss-Newton steps solve
    (J^T W J + lambda D) delta = -J^T W r matrix-free with preconditioned
    conjugate gradients (block-Jacobi 7x7 preconditioner assembled by
    segment-sum). Memory is O(E + N) instead of the reference's dense
    (7N)^2 Cholesky factor.
  * The LM outer loop with damping adaptation and plateau early-exit runs
    inside lax.while_loop (semantics of pypose's TrustRegion +
    StopOnPlateau(steps=20, patience=3, decreasing=1e-4), slam.py:125-127).

Window semantics match the reference: only nodes in the optimization window
move; edges with at least one windowed endpoint contribute to the cost
(pose_graph.py:104-154); everything else is frozen.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import sim3


class PGOConfig(NamedTuple):
    max_steps: int = 20
    patience: int = 3
    rel_decrease: float = 1e-4
    lambda0: float = 1e-4
    lambda_min: float = 1e-8
    lambda_max: float = 1e6
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    cg_iters: int = 128
    cg_tol: float = 1e-6
    max_step_norm: float = 1.0  # per-node tangent-space trust region


def _edge_residual(xi_i, xi_j, node_i, node_j, edge_pose):
    """r(delta_i, delta_j) = Log(Z * (X_i Exp(d_i))^-1 * (X_j Exp(d_j)))."""
    gi = sim3.mul(node_i, sim3.exp(xi_i))
    gj = sim3.mul(node_j, sim3.exp(xi_j))
    return sim3.log(sim3.mul(sim3.mul(edge_pose, sim3.inv(gi)), gj))


def _residuals_and_jacobians(nodes, edges, edge_poses):
    """Residuals [E,7] and per-edge Jacobians Ji, Jj [E,7,7] at delta=0."""
    ni = nodes[edges[:, 0]]
    nj = nodes[edges[:, 1]]
    zero = jnp.zeros(7, dtype=nodes.dtype)

    def per_edge(n_i, n_j, z):
        r = _edge_residual(zero, zero, n_i, n_j, z)
        Ji = jax.jacfwd(lambda d: _edge_residual(d, zero, n_i, n_j, z))(zero)
        Jj = jax.jacfwd(lambda d: _edge_residual(zero, d, n_i, n_j, z))(zero)
        return r, Ji, Jj

    return jax.vmap(per_edge)(ni, nj, edge_poses)


def _loss(nodes, edges, edge_poses, w):
    ni = nodes[edges[:, 0]]
    nj = nodes[edges[:, 1]]
    r = sim3.log(sim3.mul(sim3.mul(edge_poses, sim3.inv(ni)), nj))
    return jnp.sum(w * r * r), r


@functools.partial(jax.jit, static_argnames=("cfg",))
def optimize_pose_graph(
    nodes: jnp.ndarray,       # [N, 8] Sim(3) elements (padding = identity)
    edges: jnp.ndarray,       # [E, 2] int32 node indices (padding = 0, 0)
    edge_poses: jnp.ndarray,  # [E, 8] measured relative Sim(3)
    edge_confs: jnp.ndarray,  # [E, 7] per-tangent-dim confidence weights
    edge_valid: jnp.ndarray,  # [E] bool
    opt_mask: jnp.ndarray,    # [N] bool — nodes allowed to move
    cfg: PGOConfig = PGOConfig(),
):
    """Run windowed LM-PGO; returns (new_nodes, info dict).

    All matmuls run at full fp32 precision: TPU's default reduced-precision
    matmul corrupts the tiny 7-dim Jacobian/CG products enough to make every
    Gauss-Newton step get rejected. The arrays involved are small, so
    HIGHEST costs nothing here.
    """
    with jax.default_matmul_precision("highest"):
        return _optimize_pose_graph_impl(nodes, edges, edge_poses, edge_confs,
                                         edge_valid, opt_mask, cfg)


def _optimize_pose_graph_impl(nodes, edges, edge_poses, edge_confs,
                              edge_valid, opt_mask, cfg: PGOConfig):
    N = nodes.shape[0]
    f32 = jnp.float32
    nodes = nodes.astype(f32)
    edge_poses = edge_poses.astype(f32)

    mi = opt_mask[edges[:, 0]].astype(f32)[:, None]          # [E,1]
    mj = opt_mask[edges[:, 1]].astype(f32)[:, None]
    related = ((mi + mj) > 0).astype(f32)
    w = edge_confs.astype(f32) * edge_valid.astype(f32)[:, None] * related  # [E,7]
    opt = opt_mask.astype(f32)[:, None]                      # [N,1]

    ei = edges[:, 0]
    ej = edges[:, 1]

    def linearize(x):
        """Everything lambda-independent at the point x: residual Jacobians,
        gradient, H diagonal and undamped block-Jacobi blocks. Carried
        across REJECTED LM steps (x unchanged there), so the dominant
        vmapped-jacfwd cost is paid only on acceptance."""
        r, Ji, Jj = _residuals_and_jacobians(x, edges, edge_poses)
        Ji = Ji * mi[..., None]   # fixed endpoints do not move
        Jj = Jj * mj[..., None]

        # gradient g = J^T W r, scattered to nodes
        wr = w * r                                             # [E,7]
        g = jnp.zeros((N, 7), f32)
        g = g.at[ei].add(jnp.einsum("erc,er->ec", Ji, wr))
        g = g.at[ej].add(jnp.einsum("erc,er->ec", Jj, wr))
        g = g * opt

        # diagonal of H for LM damping
        diag = jnp.zeros((N, 7), f32)
        diag = diag.at[ei].add(jnp.einsum("er,erc->ec", w, Ji * Ji))
        diag = diag.at[ej].add(jnp.einsum("er,erc->ec", w, Jj * Jj))

        # undamped block-Jacobi blocks of H (damping added per lambda)
        blocks0 = jnp.zeros((N, 7, 7), f32)
        blocks0 = blocks0.at[ei].add(jnp.einsum("era,er,erb->eab", Ji, w, Ji))
        blocks0 = blocks0.at[ej].add(jnp.einsum("era,er,erb->eab", Jj, w, Jj))
        return Ji, Jj, g, diag, blocks0

    def gn_step(lin, lam):
        Ji, Jj, g, diag, blocks0 = lin
        damp = lam * diag + 1e-10
        blocks = blocks0 + jax.vmap(jnp.diag)(damp)
        blocks = blocks + jnp.eye(7, dtype=f32) * 1e-8
        blocks_inv = jnp.linalg.inv(blocks)

        def Hv(v):  # v [N,7] -> (J^T W J + lam D) v, restricted to opt nodes
            v = v * opt
            Jv = (jnp.einsum("erc,ec->er", Ji, v[ei])
                  + jnp.einsum("erc,ec->er", Jj, v[ej]))     # [E,7]
            wJv = w * Jv
            out = jnp.zeros((N, 7), f32)
            out = out.at[ei].add(jnp.einsum("erc,er->ec", Ji, wJv))
            out = out.at[ej].add(jnp.einsum("erc,er->ec", Jj, wJv))
            return (out + damp * v) * opt

        def precond(v):
            return jnp.einsum("nab,nb->na", blocks_inv, v) * opt

        # PCG for H delta = -g
        b = -g

        def dot(a, c):
            return jnp.sum(a * c)

        def cg_body(state):
            k, xk, rk, zk, pk, rz = state
            Hp = Hv(pk)
            pHp = dot(pk, Hp)
            # zero the step along (numerically) non-positive curvature
            # directions instead of dividing by ~0
            alpha = jnp.where(pHp > 1e-20, rz / jnp.maximum(pHp, 1e-20), 0.0)
            xk = xk + alpha * pk
            rk = rk - alpha * Hp
            zk = precond(rk)
            rz_new = dot(rk, zk)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            pk = zk + beta * pk
            return k + 1, xk, rk, zk, pk, rz_new

        def cg_cond(state):
            k, xk, rk, zk, pk, rz = state
            return (k < cfg.cg_iters) & (jnp.sqrt(jnp.sum(rk * rk)) > cfg.cg_tol * (1.0 + jnp.sqrt(jnp.sum(b * b))))

        x0 = jnp.zeros((N, 7), f32)
        z0 = precond(b)
        state = (0, x0, b, z0, z0, dot(b, z0))
        _, delta, *_ = jax.lax.while_loop(cg_cond, cg_body, state)
        # trust region: cap the per-node tangent step so a bad linear solve
        # cannot launch Exp() into overflow (pypose bounds steps through its
        # TrustRegion strategy, slam.py:125)
        norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
        scale_cap = jnp.minimum(1.0, cfg.max_step_norm / jnp.maximum(norm, 1e-12))
        # guard the PRODUCT: one NaN component makes norm (and so scale_cap)
        # NaN for that node — checking only delta would leak NaN through the
        # finite components' delta * scale_cap
        capped = delta * scale_cap
        return jnp.where(jnp.isfinite(capped), capped, 0.0)

    loss0, _ = _loss(nodes, edges, edge_poses, w)

    def lm_cond(state):
        x, lin, lam, best, plateau, step, done = state
        return (step < cfg.max_steps) & (~done)

    def lm_body(state):
        x, lin, lam, best, plateau, step, done = state
        delta = gn_step(lin, lam)
        x_new = sim3.normalize(sim3.retract(x, delta * opt))
        new_loss, _ = _loss(x_new, edges, edge_poses, w)
        new_loss = jnp.where(jnp.isfinite(new_loss), new_loss, jnp.inf)
        accept = new_loss < best
        x = jnp.where(accept, x_new, x)
        # re-linearize only when x moved; a rejected step keeps the current
        # linearization (identical math, the jacfwd pass is the cost)
        lin = jax.lax.cond(accept, lambda: linearize(x_new), lambda: lin)
        lam = jnp.where(
            accept,
            jnp.maximum(lam * cfg.lambda_down, cfg.lambda_min),
            jnp.minimum(lam * cfg.lambda_up, cfg.lambda_max),
        )
        # plateau counts ACCEPTED steps without meaningful relative decrease
        # (rejected steps retry with stronger damping and don't count,
        # matching the optimizer-internal retry of the reference stack)
        rel = (best - new_loss) / jnp.maximum(best, 1e-12)
        improved = accept & (rel >= cfg.rel_decrease)
        plateau = jnp.where(improved, 0, jnp.where(accept, plateau + 1, plateau))
        best = jnp.minimum(best, new_loss)
        done = plateau >= cfg.patience
        return x, lin, lam, best, plateau, step + 1, done

    init = (nodes, linearize(nodes), jnp.asarray(cfg.lambda0, f32), loss0,
            0, 0, False)
    x, _, lam, best, plateau, steps, _ = jax.lax.while_loop(
        lm_cond, lm_body, init)
    info = {"loss0": loss0, "loss": best, "steps": steps, "lambda": lam}
    return x, info
