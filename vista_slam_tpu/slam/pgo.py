"""Windowed Sim(3) pose-graph optimization, jit-compiled end to end.

Replaces the reference's pypose Levenberg-Marquardt stack (reference:
vista_slam/slam.py:108-140, vista_slam/pose_graph.py:57-154) with a
TPU-native solver:

  * Buffers are padded to static maxima (the reference preallocates the same
    buffers, pose_graph.py:5-54), so the whole optimization compiles ONCE.
  * Per-edge residuals r_e = Log(Z_e * X_i^-1 * X_j) and their two 7x7
    tangent-space Jacobians are computed with vmapped forward-mode autodiff.
  * Two linear solvers for the Gauss-Newton system
    (J^T W J + lambda D) delta = -J^T W r, chosen per call (PGOConfig.
    solver). "dense" gathers the optimization window into a padded static
    bucket and solves exactly with an equilibrated dense Cholesky — the
    reference's solver shape, sized by the WINDOW rather than the full
    node buffer. "pcg" is matrix-free PCG with O(E + N) memory,
    preconditioned by an exact solve of the block-TRIDIAGONAL part of H
    (the odometry chain — ops/block_tridiag.py, cyclic reduction); the
    chain preconditioner is what lets PCG match the fp64 dense-Cholesky
    oracle (tests/test_pgo.py, tests/exact_pgo.py) on the ill-conditioned
    long-chain windows where plain block-Jacobi PCG stalls ~2x above the
    optimum. "auto" picks dense up to dense_max optimized nodes and pcg
    beyond — the measured v5e crossover (BASELINE.md): dense 0.80/1.87 s
    per solve at 1024/2048-node windows vs PCG's flat ~2.6-3.8 s, but
    12.8 s at the 4800-node full-graph window where PCG takes 3.8 s.
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
from ..ops.block_tridiag import factor_block_tridiag, solve_block_tridiag
from ..ops.linalg import blocked_cholesky, gauss_jordan_inv


class PGOConfig(NamedTuple):
    max_steps: int = 20
    patience: int = 3
    rel_decrease: float = 1e-4
    lambda0: float = 1e-4
    lambda_min: float = 1e-8
    lambda_max: float = 1e6
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    # Linear solver for the normal equations. "dense": gather the optimized
    # nodes into a padded window and solve exactly with an equilibrated
    # Cholesky — the reference's solver shape (pypose LM + ppos.Cholesky,
    # slam.py:43,123-137). "pcg": matrix-free PCG, O(E + N) memory,
    # chain-preconditioned (pcg_precond below). "auto" (default): dense up
    # to dense_max optimized nodes, pcg beyond. dense_max=1024 is the
    # measured v5e crossover, RE-swept after the precond_inv fix cut the
    # PCG solve ~4x (paired ABBA, scripts/profile_pgo.py --ab --solver
    # pcg, 2026-08-19, fixed 4800/5200 buffers): dense 236/414 ms per
    # solve at 512/1024-padded windows vs PCG 454/723 ms — dense still
    # wins small windows — but at the 2048-padded window PCG 920 ms beats
    # dense 1557 ms (-41%), and at the 4800 full graph 0.90 s vs 12.78 s
    # (-93%), same final loss at every point (within the oracle
    # contract, e.g. 0.009982 vs 0.009968 at 2000 real).
    # Accuracy is solver-independent since round 4: with the tridiag
    # preconditioner PCG matches the fp64 oracle on the very windows that
    # forced the dense default in round 3 (tests/test_pgo.py::
    # test_pcg_tridiag_matches_exact_on_production_padded_window).
    solver: str = "auto"
    dense_max: int = 1024
    # CG budget: the tolerance exit means the 128 cap rarely binds with
    # the tridiag preconditioner — 32/64-iter caps were A/B'd at the
    # full-graph window and refuted (9.6%/5.7% faster but the 32-iter
    # final loss drifts outside the fp64-oracle contract; BASELINE.md).
    cg_iters: int = 128
    cg_tol: float = 1e-6
    # PCG preconditioner. "tridiag" (default): exact solve of the
    # block-TRIDIAGONAL part of H per CG iteration (cyclic reduction,
    # ops/block_tridiag.py) — the odometry chain that dominates a SLAM
    # window Hessian lives entirely inside the band, so preconditioned CG
    # only has to resolve the low-rank loop-closure couplings. This is
    # what fixes the documented block-Jacobi stall (information crossing
    # the chain one node per iteration): with it, solver="pcg" matches the
    # fp64 dense oracle on the same stress windows that forced the dense
    # default in round 3 (tests/test_pgo.py::test_pcg_tridiag_*).
    # "jacobi": per-node 7x7 blocks only — the round-2/3 behavior, kept
    # for comparison and as the fallback if a window's node ordering is
    # ever non-temporal (the tridiag band would then be empty of chain
    # edges and degrade TO block-Jacobi, so even that is safe).
    pcg_precond: str = "tridiag"
    # Batched small-matrix inverse used when BUILDING either preconditioner
    # ("unrolled" Gauss-Jordan vs "lapack" `jnp.linalg.inv`). A profiler
    # trace of the full-graph PCG solve (scripts/profile_pgo.py
    # --trace-dir) attributed 67% of device time to the LAPACK path's
    # `LuDecompositionBlock` TPU custom-call on the [4800, 7, 7] blocks
    # (~5.4 ms per inverse, 14 per tridiag factorization); the unrolled
    # Gauss-Jordan (ops/linalg.py) is pure fused VPU work. Paired ABBA at
    # the 4790-node window (v5e, 2026-08-19): 898 ms vs 3459 ms per
    # 20-step solve, identical trajectory (loss 0.02334 both arms), at
    # the cost of a bigger cache-cold compile (581 s vs 52 s — amortized
    # by the persistent cache). "lapack" stays as the A/B arm and escape
    # hatch.
    precond_inv: str = "unrolled"
    # The dense factorization is the FLOPs bulk of a windowed solve
    # (O((7K)^3/3) per LM step) and XLA's TPU cholesky runs it at a fixed
    # ~17 TFLOP/s regardless of the ambient matmul precision (measured,
    # BASELINE.md). ops/linalg.blocked_cholesky restructures it so the
    # trailing updates are large MXU matmuls at factor_precision, polished
    # by factor_refine iterative-refinement passes (mixed-precision
    # Cholesky; the refinement residual is matrix-free so only one full
    # matrix is ever live). chol_panel is a granularity FLOOR: the
    # effective panel grows so the unrolled factorization stays at <= 16
    # panels (compile-time bound — see ops/linalg.py); a value >= D/2
    # selects XLA's monolithic cholesky.
    #
    # DEFAULTS ship the monolithic fp32 factorization (chol_panel past any
    # window dim, no refinement). The blocked mixed-precision path
    # (`pgo: {chol_panel: 512, factor_refine: 2}` in the YAML) is A/B'd on
    # v5e at BOTH window scales (paired ABBA, scripts/profile_pgo.py --ab;
    # BASELINE.md "Windowed PGO" row): 13% faster at the 2000-node window
    # (1889 vs 2180 ms, identical 20-step LM trajectory) but only 3.5%
    # faster at the 4790-node production window (12.34 vs 12.78 s/solve,
    # same 20 steps, final loss 0.02325 vs 0.02329 — numerically
    # equivalent, not bit-identical) at 2.4x the first-compile cost
    # (171 vs 70 s). A 3.5% worst-case win does not buy the extra compile
    # and the trajectory perturbation, so it stays OPT-IN for mid-size
    # windows where its 13% holds. "high" (bf16_3x) + >=1 refinement is
    # required for convergence; "default" single-pass bf16 factors are
    # non-contractive under refinement and are never offered. The rest of
    # the solver runs at "highest" — the tiny 7-dim Jacobian/CG products
    # are corrupted by TPU's bf16 default matmuls (see
    # _optimize_pose_graph_jit).
    factor_precision: str = "high"
    factor_refine: int = 0
    chol_panel: int = 1 << 30
    # Adaptive per-node tangent-space trust region (semantics of pypose's
    # TrustRegion strategy, reference: slam.py:125 with radius=1e4): the cap
    # starts at radius0, doubles on every accepted step and shrinks 4x on
    # every rejection. A fixed cap is NOT enough: a windowed PGO entered
    # with large accumulated drift needs per-node corrections of O(100) in
    # the tangent space, and clipping them to O(1) strands the solver far
    # from the optimum (found by the dense-Cholesky cross-check in
    # tests/test_pgo.py).
    radius0: float = 1e4
    radius_up: float = 2.0
    radius_down: float = 0.25
    radius_min: float = 1e-3
    radius_max: float = 1e6


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

    Host-level dispatch (PGO is called with concrete arrays, at most once
    per pgo_every keyframes): resolves cfg.solver="auto" by counting the
    optimized nodes and, for the dense solver, buckets the window size to
    the next power of two so each bucket compiles once.
    """
    import numpy as np

    solver = cfg.solver
    k = int(np.asarray(opt_mask).sum())
    if solver == "auto":
        solver = "dense" if k <= cfg.dense_max else "pcg"
    if solver == "dense":
        k_pad = min(max(32, 1 << max(k - 1, 0).bit_length()),
                    int(opt_mask.shape[0]))
    else:
        k_pad = 0
    return _optimize_pose_graph_jit(nodes, edges, edge_poses, edge_confs,
                                    edge_valid, opt_mask, cfg, solver, k_pad)


@functools.partial(jax.jit, static_argnames=("cfg", "solver", "k_pad"))
def _optimize_pose_graph_jit(nodes, edges, edge_poses, edge_confs,
                             edge_valid, opt_mask, cfg, solver, k_pad):
    """All matmuls run at full fp32 precision: TPU's default
    reduced-precision matmul corrupts the tiny 7-dim Jacobian/CG products
    enough to make every Gauss-Newton step get rejected. The arrays
    involved are small, so HIGHEST costs nothing here."""
    with jax.default_matmul_precision("highest"):
        return _optimize_pose_graph_impl(nodes, edges, edge_poses, edge_confs,
                                         edge_valid, opt_mask, cfg, solver,
                                         k_pad)


def _optimize_pose_graph_impl(nodes, edges, edge_poses, edge_confs,
                              edge_valid, opt_mask, cfg: PGOConfig,
                              solver: str = "pcg", k_pad: int = 0):
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

    def dense_solve(lin, lam):
        """The reference's solver shape: gather the k_pad optimized-node
        window, assemble the damped normal equations densely, factor with an
        equilibrated Cholesky (pypose LM + ppos.Cholesky, slam.py:43,
        123-137; equilibration is ours — it keeps the fp32 factorization
        honest on the ill-conditioned long-chain windows the cross-check
        tests construct). Non-PD H yields NaNs, which the LM reject path
        absorbs (loss -> inf -> reject -> stronger damping)."""
        Ji, Jj, g, diag, _ = lin
        opt_idx = jnp.nonzero(opt_mask, size=k_pad, fill_value=N)[0]
        slot_ok = opt_idx < N
        col_of = jnp.full((N,), k_pad, jnp.int32).at[opt_idx].set(
            jnp.arange(k_pad, dtype=jnp.int32), mode="drop")
        ci = col_of[ei]
        cj = col_of[ej]
        D = 7 * k_pad
        a7 = jnp.arange(7)

        def rows(c):
            return c[:, None, None] * 7 + a7[None, :, None]

        def cols(c):
            return c[:, None, None] * 7 + a7[None, None, :]

        Bii = jnp.einsum("era,er,erb->eab", Ji, w, Ji)
        Bjj = jnp.einsum("era,er,erb->eab", Jj, w, Jj)
        Bij = jnp.einsum("era,er,erb->eab", Ji, w, Jj)

        damp = lam * diag + 1e-10                            # [N, 7]
        damp_k = jnp.where(slot_ok[:, None],
                           damp[jnp.minimum(opt_idx, N - 1)], 1.0)
        b = jnp.where(slot_ok[:, None],
                      -g[jnp.minimum(opt_idx, N - 1)], 0.0).reshape(-1)

        # The equilibration scale is known analytically (diag(H) = scattered
        # undamped diagonal + damping), so the EQUILIBRATED system Hs is
        # assembled directly from per-edge-scaled 7x7 blocks — the
        # unequilibrated [D, D] H is never materialized. At the production
        # window (D = 33600, 4.2 GB per full matrix) building H first and
        # rescaling it cost two extra full-matrix buffers inside the LM
        # loop body and pushed the program past HBM.
        diag_k = jnp.where(slot_ok[:, None],
                           diag[jnp.minimum(opt_idx, N - 1)], 0.0)
        s2d = jax.lax.rsqrt(jnp.maximum(diag_k + damp_k, 1e-30))  # [k_pad,7]
        s = s2d.reshape(-1)
        s_pad = jnp.concatenate([s2d, jnp.ones((1, 7), f32)])     # row k_pad
        si = s_pad[jnp.minimum(ci, k_pad)]                        # [E,7]
        sj = s_pad[jnp.minimum(cj, k_pad)]
        Bii = Bii * si[:, :, None] * si[:, None, :]
        Bjj = Bjj * sj[:, :, None] * sj[:, None, :]
        Bij = Bij * si[:, :, None] * sj[:, None, :]
        Hs = jnp.zeros((D, D), f32)
        # out-of-window endpoints map to column k_pad -> row/col >= D -> drop
        Hs = Hs.at[rows(ci), cols(ci)].add(Bii, mode="drop")
        Hs = Hs.at[rows(cj), cols(cj)].add(Bjj, mode="drop")
        Hs = Hs.at[rows(ci), cols(cj)].add(Bij, mode="drop")
        Hs = Hs.at[rows(cj), cols(ci)].add(jnp.swapaxes(Bij, 1, 2),
                                           mode="drop")
        aD = jnp.arange(D)
        # diagonal damping (pad slots: I) via indexed add — jnp.diag(vec)
        # would build a second [D, D] operand just to add a diagonal
        Hs = Hs.at[aD, aD].add((damp_k * s2d * s2d).reshape(-1))
        bs = b * s
        # Factor at cfg.factor_precision (the O(D^3) bulk, as large MXU
        # matmuls — see ops/linalg.py), then polish with iterative
        # refinement: the triangular solves and residuals r = bs - Hs y run
        # at the ambient "highest" precision, so the refined solution
        # reaches fp32-factor accuracy with a reduced-precision
        # factorization. The residual matvec Hs @ y is computed MATRIX-FREE
        # through the per-edge Jacobians (same scatter form as pcg_solve's
        # Hv, re-equilibrated) so Hs is dead the moment the factorization
        # consumes it — keeping the 4.2 GB Hs live across the refinement
        # loop alongside L pushed the production window past HBM. The upper
        # solve uses trans=1 rather than materializing L.T (another full-
        # matrix copy at this size).
        L = blocked_cholesky(Hs, panel=cfg.chol_panel,
                             update_precision=cfg.factor_precision)

        def tri_solve(rhs):
            u = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(L, u, trans=1,
                                                     lower=True)

        def hs_matvec(y):
            """Equilibrated window matvec: S (J^T W J + damp) S y, with
            identity rows/cols on pad slots (matches the assembled Hs)."""
            yk = y.reshape(k_pad, 7)
            v = jnp.where(slot_ok[:, None], yk * s2d, 0.0)
            vN = jnp.zeros((N, 7), f32).at[opt_idx].set(v, mode="drop")
            Jv = (jnp.einsum("erc,ec->er", Ji, vN[ei])
                  + jnp.einsum("erc,ec->er", Jj, vN[ej]))
            wJv = w * Jv
            out = jnp.zeros((N, 7), f32)
            out = out.at[ei].add(jnp.einsum("erc,er->ec", Ji, wJv))
            out = out.at[ej].add(jnp.einsum("erc,er->ec", Jj, wJv))
            out = out + damp * vN
            out_k = out[jnp.minimum(opt_idx, N - 1)] * s2d
            return jnp.where(slot_ok[:, None], out_k, yk).reshape(-1)

        y = tri_solve(bs)
        for _ in range(cfg.factor_refine):
            y = y + tri_solve(bs - hs_matvec(y))
        delta_k = y.reshape(k_pad, 7) * s.reshape(k_pad, 7)
        return jnp.zeros((N, 7), f32).at[opt_idx].set(
            jnp.where(slot_ok[:, None], delta_k, 0.0), mode="drop")

    def gn_step(lin, lam, radius):
        if solver == "dense":
            delta = dense_solve(lin, lam)
            return _cap_step(delta, radius)
        return _cap_step(pcg_solve(lin, lam), radius)

    def _cap_step(delta, radius):
        # adaptive trust region: cap the per-node tangent step at the
        # current radius so a bad linear solve cannot launch Exp() into
        # overflow; the radius itself adapts in the LM loop (pypose
        # TrustRegion semantics, slam.py:125)
        norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
        scale_cap = jnp.minimum(1.0, radius / jnp.maximum(norm, 1e-12))
        # guard the PRODUCT: one NaN component makes norm (and so scale_cap)
        # NaN for that node — checking only delta would leak NaN through the
        # finite components' delta * scale_cap
        capped = delta * scale_cap
        return jnp.where(jnp.isfinite(capped), capped, 0.0)

    def pcg_solve(lin, lam):
        Ji, Jj, g, diag, blocks0 = lin
        damp = lam * diag + 1e-10
        blocks = blocks0 + jax.vmap(jnp.diag)(damp)
        blocks = blocks + jnp.eye(7, dtype=f32) * 1e-8

        if cfg.pcg_precond == "tridiag":
            # super-diagonal blocks of H: the full PSD contribution of
            # every chain edge (|i-j| == 1) lands inside the band; all
            # other edges keep only their diagonal blocks (already in
            # `blocks`), so the preconditioner stays SPD (dropping the
            # off-diagonal coupling of a PSD 2x2-block contribution is
            # PSD-preserving). Fixed/pad endpoints contribute zero here
            # (Ji/Jj are opt-masked), so non-opt rows decouple exactly.
            Bij = jnp.einsum("era,er,erb->eab", Ji, w, Jj)
            fwd = (ej == ei + 1).astype(f32)[:, None, None]
            bwd = (ei == ej + 1).astype(f32)[:, None, None]
            Csup = jnp.zeros((N, 7, 7), f32)
            Csup = Csup.at[ei].add(Bij * fwd)
            Csup = Csup.at[ej].add(jnp.swapaxes(Bij, 1, 2) * bwd)
            Bt = jnp.where(opt_mask[:, None, None], blocks,
                           jnp.eye(7, dtype=f32))
            fac = factor_block_tridiag(Bt, Csup, inv_impl=cfg.precond_inv)

            def precond(v):
                return solve_block_tridiag(fac, v) * opt
        else:
            blocks_inv = (gauss_jordan_inv(blocks)
                          if cfg.precond_inv == "unrolled"
                          else jnp.linalg.inv(blocks))

            def precond(v):
                return jnp.einsum("nab,nb->na", blocks_inv, v) * opt

        def Hv(v):  # v [N,7] -> (J^T W J + lam D) v, restricted to opt nodes
            v = v * opt
            Jv = (jnp.einsum("erc,ec->er", Ji, v[ei])
                  + jnp.einsum("erc,ec->er", Jj, v[ej]))     # [E,7]
            wJv = w * Jv
            out = jnp.zeros((N, 7), f32)
            out = out.at[ei].add(jnp.einsum("erc,er->ec", Ji, wJv))
            out = out.at[ej].add(jnp.einsum("erc,er->ec", Jj, wJv))
            return (out + damp * v) * opt

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
        return delta

    loss0, _ = _loss(nodes, edges, edge_poses, w)

    def lm_cond(state):
        x, lin, lam, radius, best, plateau, step, done = state
        return (step < cfg.max_steps) & (~done)

    def lm_body(state):
        x, lin, lam, radius, best, plateau, step, done = state
        delta = gn_step(lin, lam, radius)
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
        radius = jnp.where(
            accept,
            jnp.minimum(radius * cfg.radius_up, cfg.radius_max),
            jnp.maximum(radius * cfg.radius_down, cfg.radius_min),
        )
        # plateau counts ACCEPTED steps without meaningful relative decrease
        # (rejected steps retry with stronger damping and don't count,
        # matching the optimizer-internal retry of the reference stack)
        rel = (best - new_loss) / jnp.maximum(best, 1e-12)
        improved = accept & (rel >= cfg.rel_decrease)
        plateau = jnp.where(improved, 0, jnp.where(accept, plateau + 1, plateau))
        best = jnp.minimum(best, new_loss)
        done = plateau >= cfg.patience
        return x, lin, lam, radius, best, plateau, step + 1, done

    init = (nodes, linearize(nodes), jnp.asarray(cfg.lambda0, f32),
            jnp.asarray(cfg.radius0, f32), loss0, 0, 0, False)
    x, _, lam, radius, best, plateau, steps, _ = jax.lax.while_loop(
        lm_cond, lm_body, init)
    info = {"loss0": loss0, "loss": best, "steps": steps, "lambda": lam}
    return x, info
