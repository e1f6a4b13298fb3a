"""Exactness tests for the cyclic-reduction block-tridiagonal solver
(ops/block_tridiag.py) — the PGO chain preconditioner's engine. The
oracle is a dense fp64 numpy solve of the same matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.ops.block_tridiag import (factor_block_tridiag,
                                              solve_block_tridiag)


def _random_spd_tridiag(M, d, rng, identity_rows=()):
    """Build (B [M,d,d], C [M,d,d], dense [M*d, M*d]) the way the PGO
    Hessian builds it: a sum of per-chain-edge PSD contributions
    [Ji;Jj]^T [Ji;Jj] plus positive diagonal damping — SPD by
    construction. `identity_rows` become exact identity equations."""
    B = np.zeros((M, d, d))
    C = np.zeros((M, d, d))
    for i in range(M - 1):
        if i in identity_rows or (i + 1) in identity_rows:
            continue
        Ji = rng.standard_normal((d, d))
        Jj = rng.standard_normal((d, d))
        B[i] += Ji.T @ Ji
        B[i + 1] += Jj.T @ Jj
        C[i] += Ji.T @ Jj
    damp = 0.3 + rng.random((M, d))
    for i in range(M):
        B[i][np.arange(d), np.arange(d)] += damp[i]
        if i in identity_rows:
            B[i] = np.eye(d)
            C[i] = 0.0
            if i > 0:
                C[i - 1] = 0.0

    dense = np.zeros((M * d, M * d))
    for i in range(M):
        dense[i * d:(i + 1) * d, i * d:(i + 1) * d] = B[i]
        if i + 1 < M:
            dense[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = C[i]
            dense[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = C[i].T
    return B, C, dense


@pytest.mark.parametrize("inv_impl", ["unrolled", "lapack"])
@pytest.mark.parametrize("M,d", [(1, 7), (2, 7), (3, 7), (5, 3), (8, 7),
                                 (37, 7), (64, 5), (100, 7)])
def test_cr_matches_dense_solve(M, d, inv_impl):
    rng = np.random.default_rng(M * 100 + d)
    B, C, dense = _random_spd_tridiag(M, d, rng)
    r = rng.standard_normal((M, d))
    x_ref = np.linalg.solve(dense, r.reshape(-1)).reshape(M, d)

    fac = factor_block_tridiag(jnp.asarray(B, jnp.float32),
                               jnp.asarray(C, jnp.float32),
                               inv_impl=inv_impl)
    x = np.asarray(solve_block_tridiag(fac, jnp.asarray(r, jnp.float32)))
    assert np.allclose(x, x_ref, rtol=2e-4, atol=2e-4), \
        np.abs(x - x_ref).max()


def test_cr_identity_rows_decouple():
    """Padding / fixed nodes are passed as identity equations: the solve
    must return their rhs unchanged and must not couple across them."""
    M, d = 24, 7
    rng = np.random.default_rng(0)
    fixed = (0, 11, 23)
    B, C, dense = _random_spd_tridiag(M, d, rng, identity_rows=fixed)
    r = rng.standard_normal((M, d))
    x_ref = np.linalg.solve(dense, r.reshape(-1)).reshape(M, d)

    fac = factor_block_tridiag(jnp.asarray(B, jnp.float32),
                               jnp.asarray(C, jnp.float32))
    x = np.asarray(solve_block_tridiag(fac, jnp.asarray(r, jnp.float32)))
    assert np.allclose(x, x_ref, rtol=2e-4, atol=2e-4)
    for i in fixed:
        assert np.allclose(x[i], r[i], rtol=1e-5, atol=1e-6)


def test_cr_jits_once_for_fixed_shape():
    """factor+solve compile under jit with static M (the production
    contract: one compilation per node-buffer size)."""
    M, d = 32, 7
    rng = np.random.default_rng(7)
    B, C, dense = _random_spd_tridiag(M, d, rng)

    @jax.jit
    def run(B, C, r):
        return solve_block_tridiag(factor_block_tridiag(B, C), r)

    r = rng.standard_normal((M, d))
    x = np.asarray(run(jnp.asarray(B, jnp.float32),
                       jnp.asarray(C, jnp.float32),
                       jnp.asarray(r, jnp.float32)))
    x_ref = np.linalg.solve(dense, r.reshape(-1)).reshape(M, d)
    assert np.allclose(x, x_ref, rtol=2e-4, atol=2e-4)
