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
