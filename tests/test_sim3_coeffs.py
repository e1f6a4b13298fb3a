"""Sim(3) W-coefficients against float64 numerical quadrature, across the
series/closed-form regime boundaries (incl. the near-identity magnitudes
where TPU transcendental rounding used to collapse W to singular)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.ops import sim3


def quad_coeffs(theta, sigma, n=20001):
    """a, b, c = int_0^1 e^{sigma u} {1, sin(tu)/t, (1-cos(tu))/t^2} du in
    float64 via Simpson-ish trapezoid."""
    u = np.linspace(0.0, 1.0, n)
    w = np.exp(sigma * u)
    a = np.trapezoid(w, u)
    if theta < 1e-12:
        b = np.trapezoid(w * u, u)
        c = np.trapezoid(w * u * u / 2, u)
    else:
        b = np.trapezoid(w * np.sin(theta * u) / theta, u)
        # 1 - cos(x) = 2 sin^2(x/2) avoids float64 cancellation at tiny theta
        c = np.trapezoid(w * 2 * np.sin(theta * u / 2) ** 2 / theta ** 2, u)
    return a, b, c


@pytest.mark.parametrize("theta", [0.0, 1e-7, 3.7e-6, 1e-3, 0.05, 0.099,
                                   0.101, 0.5, 2.0, 3.1])
@pytest.mark.parametrize("sigma", [0.0, 3.7e-6, -1e-4, 0.05, -0.099, 0.101,
                                   -0.5, 1.0])
def test_w_coeffs_match_quadrature(theta, sigma):
    a, b, c = sim3._sim3_W_coeffs(jnp.asarray(theta ** 2, jnp.float32),
                                  jnp.asarray(sigma, jnp.float32))
    a_ref, b_ref, c_ref = quad_coeffs(theta, sigma)
    np.testing.assert_allclose(float(a), a_ref, rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(b), b_ref, rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(float(c), c_ref, rtol=3e-4, atol=1e-6)


def test_exp_log_roundtrip_near_identity():
    """The magnitudes that broke on TPU: tiny rotations with small-but-not-
    negligible log-scales."""
    rng = np.random.default_rng(0)
    for mag_phi, mag_sig in [(1e-12, 3.7e-6), (1e-7, 1e-7), (1e-4, 1e-2),
                             (0.099, 0.101), (0.2, 0.05)]:
        xi = np.zeros((8, 7), np.float32)
        xi[:, :3] = rng.standard_normal((8, 3)) * 0.1
        xi[:, 3:6] = rng.standard_normal((8, 3)) * mag_phi
        xi[:, 6] = rng.standard_normal(8) * mag_sig
        g = sim3.exp(jnp.asarray(xi))
        assert np.isfinite(np.asarray(g)).all(), (mag_phi, mag_sig)
        xi2 = sim3.log(g)
        assert np.isfinite(np.asarray(xi2)).all(), (mag_phi, mag_sig)
        np.testing.assert_allclose(np.asarray(xi2), xi, rtol=1e-3, atol=1e-5)
