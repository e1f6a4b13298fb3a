"""ops/linalg.blocked_cholesky vs the exact factorization, plus the
small-matrix routines (gauss_jordan_inv, cramer_solve3) that replace
TPU's LuDecompositionBlock custom-call on the PGO hot path."""

import numpy as np
import jax.numpy as jnp

from vista_slam_tpu.ops.linalg import (adjugate_inv3, blocked_cholesky,
                                       cramer_solve3, gauss_jordan_inv)


def _spd(n, cond=1e4, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eig = np.logspace(0, -np.log10(cond), n)
    return (q * eig) @ q.T


def test_matches_numpy_small():
    # below the 2*panel threshold -> exact XLA path
    a = _spd(96)
    L = np.asarray(blocked_cholesky(jnp.asarray(a, jnp.float32), panel=64))
    np.testing.assert_allclose(L, np.linalg.cholesky(a), atol=2e-4)


def test_blocked_path_matches_numpy():
    # 5 panels + ragged pad (n not a multiple of panel)
    for n, panel in [(320, 64), (300, 64), (448, 128)]:
        a = _spd(n, seed=n)
        L = np.asarray(blocked_cholesky(jnp.asarray(a, jnp.float32),
                                        panel=panel,
                                        update_precision="highest"))
        ref = np.linalg.cholesky(a)
        assert np.allclose(L, ref, atol=5e-4), (n, panel)
        # strictly lower-triangular output, no pad leakage
        assert np.allclose(L, np.tril(L)), (n, panel)


def test_solve_with_refinement_reaches_fp32_accuracy():
    """bf16-equivalent trailing updates + 2 refinement passes on the fp32
    system must reproduce the direct fp64 solution — the contract the PGO
    dense solver relies on (slam/pgo.py dense_solve). On CPU all matmul
    precisions are fp32, so this validates the refinement algebra; the
    mixed-precision speed/accuracy trade is validated on TPU via the
    oracle cross-check (tests/test_pgo.py) and scripts/profile_pgo.py."""
    import jax
    import jax.scipy.linalg as jsl

    n = 640
    a = _spd(n, cond=1e6, seed=3)
    b = np.random.default_rng(4).standard_normal(n)
    s = 1.0 / np.sqrt(np.diag(a))
    a_eq = a * s[:, None] * s[None, :]
    b_eq = b * s

    H = jnp.asarray(a_eq, jnp.float32)
    rhs = jnp.asarray(b_eq, jnp.float32)
    L = blocked_cholesky(H, panel=128)

    def tri_solve(r):
        u = jsl.solve_triangular(L, r, lower=True)
        return jsl.solve_triangular(L.T, u, lower=False)

    y = tri_solve(rhs)
    for _ in range(2):
        y = y + tri_solve(rhs - H @ y)
    x = np.asarray(y) * s
    ref = np.linalg.solve(a, b)

    # fp64 yardstick: the direct fp32 XLA cholesky solve of the same
    # equilibrated system (what the solver would do without blocking)
    L32 = jnp.linalg.cholesky(H)
    u = jsl.solve_triangular(L32, rhs, lower=True)
    x32 = np.asarray(jsl.solve_triangular(L32.T, u, lower=False)) * s

    err = np.linalg.norm(x - ref) / np.linalg.norm(ref)
    err32 = np.linalg.norm(x32 - ref) / np.linalg.norm(ref)
    # both sit at the fp32 cond*eps floor; blocked+refined must not be
    # meaningfully worse than the monolithic fp32 factorization
    assert err < max(2.0 * err32, 1e-5), (err, err32)
    assert np.isfinite(x).all()


def test_non_pd_produces_nans_not_garbage():
    a = _spd(256, seed=7)
    a[0, 0] = -1.0  # breaks PD in the first panel
    L = np.asarray(blocked_cholesky(jnp.asarray(a, jnp.float32), panel=64))
    assert np.isnan(L[0, 0])


def test_panel_floor_scales_with_dimension():
    """The effective panel grows to keep <= 16 panels (compile-time bound);
    result must still match the exact factorization."""
    n = 1792  # production-shaped 7 * 256; floor 64 -> effective panel 112
    a = _spd(n, cond=1e5, seed=9)
    L = np.asarray(blocked_cholesky(jnp.asarray(a, jnp.float32), panel=64,
                                    update_precision="highest"))
    ref = np.linalg.cholesky(a)
    assert np.allclose(L, ref, atol=2e-3)
    assert np.allclose(L, np.tril(L))


def _batched_spd(m, d, seed=0, damp=0.3):
    rng = np.random.default_rng(seed)
    j = rng.standard_normal((m, 2 * d, d))
    b = np.einsum("mkd,mke->mde", j, j)
    b[:, np.arange(d), np.arange(d)] += damp + rng.random((m, d))
    return b


def test_gauss_jordan_inv_matches_numpy():
    """The unrolled SPD inverse vs np.linalg.inv at the PGO block shapes
    ([M, 7, 7] preconditioner blocks, [M, 3, 3]) and a leading-batch-dims
    shape, at fp32 tolerances."""
    for m, d, seed in [(64, 7, 1), (128, 3, 2), (5, 5, 3)]:
        b = _batched_spd(m, d, seed=seed)
        inv = np.asarray(gauss_jordan_inv(jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(inv, np.linalg.inv(b),
                                   rtol=2e-3, atol=2e-4)
    # arbitrary leading batch dims
    b = _batched_spd(12, 4, seed=4).reshape(3, 4, 4, 4)
    inv = np.asarray(gauss_jordan_inv(jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(inv, np.linalg.inv(b), rtol=2e-3, atol=2e-4)


def test_gauss_jordan_inv_pivot_floor_keeps_finite():
    """A structurally-singular block (e.g. a stale cyclic-reduction row)
    must come back garbage-but-FINITE — inf/NaN there could leak into
    neighboring valid rows through a later level's subtraction."""
    b = _batched_spd(4, 7, seed=5)
    b[2] = 0.0  # exactly singular: every pivot hits the floor
    inv = np.asarray(gauss_jordan_inv(jnp.asarray(b, jnp.float32)))
    assert np.isfinite(inv).all()
    good = np.linalg.inv(b[[0, 1, 3]])
    np.testing.assert_allclose(inv[[0, 1, 3]], good, rtol=2e-3, atol=2e-4)


def test_cramer_solve3_matches_numpy():
    rng = np.random.default_rng(6)
    a = _batched_spd(200, 3, seed=6)
    # also non-symmetric well-conditioned systems (sim3.log's W is aI +
    # b*hat(phi) + c*hat(phi)^2 — NOT symmetric)
    a[100:] += 0.5 * rng.standard_normal((100, 3, 3))
    x_ref = rng.standard_normal((200, 3))
    b = (a @ x_ref[..., None])[..., 0]
    x = np.asarray(cramer_solve3(jnp.asarray(a, jnp.float32),
                                 jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-4)


def test_adjugate_inv3_matches_numpy():
    """General (non-symmetric) 3x3 inverse vs np.linalg.inv: calibration
    K matrices, random well-conditioned batches, and arbitrary leading
    batch dims."""
    K = np.asarray([[40.0, 0, 16], [0, 44.0, 16], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(adjugate_inv3(jnp.asarray(K))),
                               np.linalg.inv(K), rtol=1e-5, atol=1e-6)
    rng = np.random.default_rng(8)
    a = _batched_spd(60, 3, seed=8) + 0.5 * rng.standard_normal((60, 3, 3))
    a = a.reshape(3, 20, 3, 3).astype(np.float32)
    np.testing.assert_allclose(np.asarray(adjugate_inv3(jnp.asarray(a))),
                               np.linalg.inv(a), rtol=2e-3, atol=2e-4)


def test_production_window_trace_stays_small():
    """The unrolled chain at the 33600^2 production PGO window must stay at
    <= 16 panels: a 70-panel trace took XLA's TPU backend >55 min to
    compile (and crashed the dev relay). Shape-level trace only — nothing
    is allocated or executed."""
    import jax

    spec = jax.ShapeDtypeStruct((33600, 33600), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda H: blocked_cholesky(H, panel=512))(spec).jaxpr
    prims = [e.primitive.name for e in jaxpr.eqns]
    assert prims.count("cholesky") <= 16, prims.count("cholesky")
    # one trailing-update matmul per panel after the first
    assert prims.count("dot_general") <= 15
