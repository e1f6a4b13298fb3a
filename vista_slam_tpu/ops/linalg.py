"""Blocked dense linear algebra tuned for the TPU MXU.

XLA's built-in `jnp.linalg.cholesky` on TPU runs its trailing updates at a
fixed internal precision and reaches only ~17 TFLOP/s on the pose-graph
normal matrices (measured at 14336^2 on v5e — see BASELINE.md "Windowed PGO"
row). `blocked_cholesky` restructures the factorization left-looking over
static panels, so ~all of the O(D^3/3) FLOPs land in ONE large matmul per
panel that the MXU runs at the precision the caller picks
(`jax.default_matmul_precision`): "default" (bf16 inputs, fp32 accumulate)
is the fast path, to be paired with fp32 iterative refinement of the
subsequent solve (classic mixed-precision Cholesky; the PGO solver in
slam/pgo.py does exactly that).

Memory layout is the load-bearing part. A first formulation that updated a
full [D, D] factor with `L.at[rows].set(panel)` per panel OOMed at the
production window (D=33600: XLA materialized three extra 4.2 GB
full-matrix temporaries — pad-to-full + select per update — inside the
surrounding LM loop body, 17 GB > 15.75 GB HBM). This version never
updates a full matrix incrementally: the factor lives as per-panel STRIPS
(strip p holds rows p*panel.. of columns p*panel..(p+1)*panel, total
D^2/2 elements), each panel's left-looking update reads the previous
strips through one concatenate (<= D^2/4 transient), and the full
lower-triangular L is assembled exactly once at the end with a single
pad+concatenate. Peak extra memory beyond the input is ~3/4 D^2 instead
of ~3 D^2.

The panel loop is a Python loop UNROLLED at trace time: every slice has a
static shape, there is no dynamic control flow, and the whole factorization
compiles to a flat chain of matmul / small-cholesky / triangular-solve ops.
(reference: the CUDA build solves the same normal equations with pypose's
dense Cholesky, vista_slam/slam.py:43,123-137 — single-precision cuSOLVER.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_jordan_inv(B: jnp.ndarray, pivot_floor: float = 1e-30) -> jnp.ndarray:
    """Batched inverse of SMALL well-conditioned matrices ([..., d, d],
    d <= ~16) via Gauss-Jordan elimination unrolled at trace time.

    Why not `jnp.linalg.inv`: on TPU every batched LU lowers to the
    `LuDecompositionBlock` custom-call, which serializes per pivot row and
    runs tiny batched blocks pathologically slowly — a profiler trace of
    the full-graph PGO PCG solve (BASELINE.md "PGO solver crossover")
    showed 67% of device time (1.74 s of a 2.59 s 20-LM-step solve) in
    these custom-calls: ~5.4 ms per inv([4800, 7, 7]) execution, 14
    inverse ops per preconditioner factorization.
    This routine is d unrolled elimination steps of pure vectorized
    elementwise work on a [..., d, 2d] augmented matrix — no custom-call,
    fuses with its consumers, and measures in the tens of microseconds at
    the same shape.

    No pivoting: intended for SPD (or otherwise diagonally-dominant)
    inputs, where pivots stay positive — Gauss-Jordan without pivoting on
    SPD matrices is backward-stable. Rows whose pivot collapses below
    `pivot_floor` (e.g. structurally-stale rows of a cyclic-reduction
    level that are never read — see ops/block_tridiag.py) divide by 1.0
    instead, so they yield garbage-but-FINITE values rather than inf/NaN
    that could leak into neighbors through a later subtraction.
    """
    d = B.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=B.dtype), B.shape)
    aug = jnp.concatenate([B, eye], axis=-1)  # [..., d, 2d]
    for k in range(d):
        piv = aug[..., k, k]
        piv = jnp.where(jnp.abs(piv) > pivot_floor, piv, 1.0)
        row = aug[..., k, :] / piv[..., None]
        fac = aug[..., :, k]
        # eliminates column k everywhere INCLUDING row k (which becomes 0),
        # then writes the normalized pivot row back
        aug = aug - fac[..., None] * row[..., None, :]
        aug = aug.at[..., k, :].set(row)
    return aug[..., :, d:]


def cramer_solve3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched solve of 3x3 systems A x = b ([..., 3, 3], [..., 3]) via the
    adjugate (Cramer's rule), as ~30 fused elementwise ops.

    Exists for the same reason as `gauss_jordan_inv`: `jnp.linalg.solve`
    on a batched [..., 3, 3] lowers to TPU's `LuDecompositionBlock`
    custom-call (measured ~2.5 ms per solve([5200, 3, 3]) execution
    inside the PGO loop — sim3.log's W-solve, ~98 ms of the traced
    20-step solve). For 3x3 the explicit adjugate is exact
    algebra, accurate for the well-conditioned W matrices Sim(3) produces
    (cond(W) stays moderate for all sigma/theta — the coefficient guards
    in ops/sim3.py keep W away from singularity), and fuses into the
    surrounding computation. A singular A yields inf/NaN exactly like the
    LU path would.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    # adj[i, j] = cofactor(j, i)
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) / det
    x1 = (c10 * b0 + c11 * b1 + c12 * b2) / det
    x2 = (c20 * b0 + c21 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def adjugate_inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of general 3x3 matrices ([..., 3, 3]) via the
    adjugate — the matrix form of `cramer_solve3`, same rationale: a
    batched `jnp.linalg.inv` lowers to TPU's serial `LuDecompositionBlock`
    custom-call, while the adjugate is ~30 fused elementwise ops. Exact
    algebra; a singular A yields inf/NaN exactly like the LU path would
    (callers relying on that failure mode, e.g. the Newton pose-head
    variant's pinned degenerate-input contract, keep it)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    adj = jnp.stack([jnp.stack([c00, c01, c02], axis=-1),
                     jnp.stack([c10, c11, c12], axis=-1),
                     jnp.stack([c20, c21, c22], axis=-1)], axis=-2)
    return adj / det[..., None, None]


def blocked_cholesky(H: jnp.ndarray, panel: int = 512,
                     update_precision: str = "default") -> jnp.ndarray:
    """Lower-triangular Cholesky factor of a symmetric PD matrix.

    Left-looking blocked algorithm: for each panel of `panel` columns,
    subtract the contribution of all previously factored columns with one
    large matmul (run at `update_precision`), factor the panel's diagonal
    block exactly (small, XLA cholesky), and form the sub-diagonal block
    with a triangular solve.

    If `panel` does not divide D, the largest divisor of D <= `panel` is
    used instead (PGO window dims are 7 * k_pad, so 448 or 224 always
    divides) — padding H instead would copy the full O(D^2) matrix, which
    at the 33600^2 production window is a 4.5 GB HBM copy that pushed the
    whole solve out of memory. A prime-ish D falls back to XLA's cholesky.
    Non-PD input produces NaNs in the affected panel and everything
    downstream of it, mirroring `jnp.linalg.cholesky` — the PGO LM loop
    absorbs NaNs through its reject path.
    """
    D = H.shape[-1]
    if D <= 2 * panel:
        return jnp.linalg.cholesky(H)
    # `panel` is a granularity FLOOR: the effective panel grows with D so
    # the unrolled chain stays at <= ~16 panels. At the 33600^2 production
    # window a 512-wide panel means 70 unrolled panel iterations, which
    # XLA's TPU backend took >55 min to compile (the per-panel gather
    # concats scale quadratically with the panel count); 16 panels compile
    # in minutes and still keep >99% of the O(D^3/3) FLOPs in the trailing
    # MXU matmuls (the exact diagonal-block factorizations are
    # nblk*(panel/D)^2 of the work).
    panel = max(panel, -(-D // 16))
    if D % panel:
        panel = next((d for d in range(panel, 0, -1) if D % d == 0), 1)
        if panel < 64:  # degenerate divisor: unrolled chain not worth it
            return jnp.linalg.cholesky(H)
    if D <= 2 * panel:
        return jnp.linalg.cholesky(H)
    nblk = D // panel

    # strips[p]: rows p*panel..D of columns p*panel..(p+1)*panel of L
    strips = []
    for p in range(nblk):
        r0 = p * panel
        A = H[r0:, r0:r0 + panel]                        # [D-r0, panel]
        if p:
            # rows r0.. of the first r0 columns of L, gathered from the
            # strips (strip j starts at row j*panel); one concat, then one
            # MXU matmul carrying this panel's whole left-looking update
            below = jnp.concatenate(
                [strips[j][r0 - j * panel:] for j in range(p)], axis=1)
            with jax.default_matmul_precision(update_precision):
                A = A - below @ below[:panel].T
        Lpp = jnp.linalg.cholesky(A[:panel])             # exact, small
        Lbelow = jax.scipy.linalg.solve_triangular(
            Lpp, A[panel:].T, lower=True).T
        strips.append(jnp.concatenate([Lpp, Lbelow], axis=0))

    # single assembly of the full factor: pad each strip to full height on
    # top with zeros (also zeroing the strictly-upper triangle) and
    # concatenate along columns
    return jnp.concatenate(
        [jnp.pad(s, ((p * panel, 0), (0, 0)))
         for p, s in enumerate(strips)], axis=1)
