"""Block-tridiagonal SPD solver via cyclic reduction, built for the PGO
chain preconditioner.

Why it exists: the pose-graph Hessian of a long keyframe chain is
dominated by the odometry edges linking consecutive nodes — exactly the
structure block-Jacobi preconditioning cannot see (information needs one
CG iteration per node to travel the chain, which is why the round-3
cross-checks measured truncated PCG stalling ~2x above the exact optimum
on drifted long-chain windows, and even an fp64 2048-iteration replica
stalling — see tests/test_pgo.py and PGOConfig.solver). Solving the
block-TRIDIAGONAL part of H exactly per CG iteration propagates
corrections across the whole chain at once, leaving CG only the low-rank
loop-closure couplings. (reference contrast: vista_slam/slam.py:43,123-137
solves the normal equations densely via pypose/cuSOLVER every time; this
module is what lets the TPU build keep an O(E+N)-memory matrix-free
solver that still matches the fp64 oracle — evidence in tests/test_pgo.py
and BASELINE.md.)

Why cyclic reduction and not a block-Thomas scan: Thomas is a sequential
recurrence over the N~5k window nodes — thousands of data-dependent 7x7
ops in a lax.scan, pure latency on a TPU. Cyclic reduction restructures
the same elimination into ceil(log2(N)) LEVELS, each a batched-over-nodes
set of 7x7 matmuls/inverses (vectorized over the full node buffer) — the
whole factor+solve is ~13 levels of large batched ops, no sequential
dependency longer than the level count. For SPD block-tridiagonal
matrices cyclic reduction is Gaussian elimination in a nested-dissection
order: every reduced system is again SPD (Schur complements of SPD
blocks), so no pivoting is needed and the batched 7x7 inverses are safe.

Static shapes throughout: the level count is ceil(log2(M)) with M the
(padded) node-buffer length, so one compilation serves every window.
Inactive rows carry identity diagonal blocks and zero couplings, which
makes padding and fixed nodes exact identity equations (M^-1 v = v there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import gauss_jordan_inv


def _shift_down(x, s, fill):
    """y[i] = x[i-s] (y[:s] = fill)."""
    pad = jnp.broadcast_to(fill, (s,) + x.shape[1:])
    return jnp.concatenate([pad, x[:-s]], axis=0)


def _shift_up(x, s, fill):
    """y[i] = x[i+s] (y[-s:] = fill)."""
    pad = jnp.broadcast_to(fill, (s,) + x.shape[1:])
    return jnp.concatenate([x[s:], pad], axis=0)


def factor_block_tridiag(B: jnp.ndarray, C: jnp.ndarray,
                         inv_impl: str = "unrolled"):
    """Cyclic-reduction factorization of the SPD block-tridiagonal matrix
    with diagonal blocks ``B[i]`` ([M, d, d]) and super-diagonal blocks
    ``C[i]`` coupling rows i and i+1 ([M, d, d]; ``C[M-1]`` must be zero).
    The sub-diagonal is ``C[i]^T`` (symmetry is assumed, not checked).

    Returns an opaque factorization consumed by `solve_block_tridiag`.
    Rows that should act as identity equations (padding, fixed nodes) must
    be passed as B=I, C=0 — they then decouple exactly.

    Cost: ceil(log2(M)) levels of batched d x d matmuls + one batched
    d x d inverse per level — O(M log M * d^3) FLOPs total, all batched.

    inv_impl picks the batched d x d inverse: "unrolled" (default) is the
    Gauss-Jordan elimination in ops/linalg.py — safe here because every
    level's ACTIVE blocks are Schur complements of an SPD matrix, hence
    SPD, and its pivot floor keeps the never-read stale rows finite;
    "lapack" is `jnp.linalg.inv`, whose TPU `LuDecompositionBlock`
    custom-call was measured at 67% of the whole full-graph PGO solve
    (~5.4 ms x 14 inverses per factorization at [4800, 7, 7] — see
    BASELINE.md; the A/B: 898 ms vs 3459 ms per 20-step solve). Kept for A/B and as the fallback should a non-SPD input
    ever need pivoting.
    """
    M, d = B.shape[0], B.shape[1]
    inv = gauss_jordan_inv if inv_impl == "unrolled" else jnp.linalg.inv
    eye = jnp.eye(d, dtype=B.dtype)
    A = jnp.swapaxes(_shift_down(C, 1, jnp.zeros((d, d), B.dtype)), 1, 2)

    levels = []
    s = 1
    while s < M:
        Binv = inv(B)
        Binv_dn = _shift_down(Binv, s, eye)
        Binv_up = _shift_up(Binv, s, eye)
        z = jnp.zeros((d, d), B.dtype)
        A_dn, C_dn = _shift_down(A, s, z), _shift_down(C, s, z)
        A_up, C_up = _shift_up(A, s, z), _shift_up(C, s, z)
        P = A @ Binv_dn                 # A_i B_{i-s}^{-1}
        Q = C @ Binv_up                 # C_i B_{i+s}^{-1}
        levels.append((Binv, A, C, P, Q))
        # Schur complement onto rows i (== 0 mod 2s), eliminating i +- s.
        # Computed for ALL rows — rows not active at the next level hold
        # stale values that are never read there (reads at stride 2s only
        # touch offsets +-2s^k, all multiples of s).
        B = B - P @ C_dn - Q @ A_up
        A = -(P @ A_dn)
        C = -(Q @ C_up)
        s *= 2
    root_inv = inv(B)                   # only row 0 is read at the root
    return (M, d, tuple(levels), root_inv)


def solve_block_tridiag(fac, r: jnp.ndarray) -> jnp.ndarray:
    """Solve T x = r ([M, d]) for the factorization from
    `factor_block_tridiag`. Exact up to fp roundoff; identity rows return
    their rhs unchanged."""
    M, d, levels, root_inv = fac
    zero = jnp.zeros((d,), r.dtype)
    idx = jnp.arange(M)

    # forward: fold eliminated rows' rhs into the kept rows, level by level
    rs = []
    s = 1
    for (_, _, _, P, Q) in levels:
        rs.append(r)
        r = (r
             - jnp.einsum("mab,mb->ma", P, _shift_down(r, s, zero))
             - jnp.einsum("mab,mb->ma", Q, _shift_up(r, s, zero)))
        s *= 2

    # root (only row 0 survives all reductions)
    x = jnp.where((idx == 0)[:, None],
                  jnp.einsum("mab,mb->ma", root_inv, r), 0.0)

    # backward substitution, finest level last
    for l in range(len(levels) - 1, -1, -1):
        s = 1 << l
        Binv, A, C, _, _ = levels[l]
        rhs = (rs[l]
               - jnp.einsum("mab,mb->ma", A, _shift_down(x, s, zero))
               - jnp.einsum("mab,mb->ma", C, _shift_up(x, s, zero)))
        cand = jnp.einsum("mab,mb->ma", Binv, rhs)
        x = jnp.where((idx % (2 * s) == s)[:, None], cand, x)
    return x
