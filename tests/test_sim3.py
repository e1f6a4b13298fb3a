import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.ops import sim3


def rand_sim3(key, batch=(), max_angle=2.5):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    axis = jax.random.normal(k1, batch + (3,))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    angle = jax.random.uniform(k2, batch + (1,), minval=0.01, maxval=max_angle)
    q = sim3.so3_exp_quat(axis * angle)
    t = jax.random.normal(k3, batch + (3,))
    s = jnp.exp(jax.random.uniform(k4, batch + (1,), minval=-1.0, maxval=1.0))
    return jnp.concatenate([t, q, s], axis=-1)


def test_identity_and_inverse():
    key = jax.random.PRNGKey(0)
    g = rand_sim3(key, (5,))
    e = sim3.mul(g, sim3.inv(g))
    np.testing.assert_allclose(np.asarray(sim3.trans(e)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim3.scale(e)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(sim3.quat(e))[..., 3]), 1.0, atol=1e-5)


def test_associativity_and_action():
    key = jax.random.PRNGKey(1)
    ka, kb, kc, kp = jax.random.split(key, 4)
    a, b, c = rand_sim3(ka, (3,)), rand_sim3(kb, (3,)), rand_sim3(kc, (3,))
    lhs = sim3.mul(sim3.mul(a, b), c)
    rhs = sim3.mul(a, sim3.mul(b, c))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    pts = jax.random.normal(kp, (3, 3))
    np.testing.assert_allclose(
        np.asarray(sim3.act(sim3.mul(a, b), pts)),
        np.asarray(sim3.act(a, sim3.act(b, pts))),
        atol=1e-4,
    )


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    xi = jax.random.normal(key, (16, 7)) * jnp.asarray([1, 1, 1, 0.7, 0.7, 0.7, 0.5])
    g = sim3.exp(xi)
    xi2 = sim3.log(g)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_log_exp_roundtrip():
    key = jax.random.PRNGKey(3)
    g = rand_sim3(key, (16,))
    g2 = sim3.exp(sim3.log(g))
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-4)


def test_exp_small_angle_stable():
    xi = jnp.zeros((7,)).at[0].set(0.3)
    g = sim3.exp(xi)
    np.testing.assert_allclose(np.asarray(sim3.trans(g)), [0.3, 0, 0], atol=1e-6)
    np.testing.assert_allclose(float(sim3.scale(g)), 1.0, atol=1e-6)
    # gradient must be finite at the singular point xi = 0
    grad = jax.jacfwd(sim3.exp)(jnp.zeros((7,)))
    assert np.isfinite(np.asarray(grad)).all()
    grad_log = jax.jacfwd(sim3.log)(sim3.identity())
    assert np.isfinite(np.asarray(grad_log)).all()


def test_matrix_roundtrip():
    key = jax.random.PRNGKey(4)
    g = rand_sim3(key, (8,))
    m = sim3.to_pose_matrix(g)
    g2 = sim3.from_matrix(m, sim3.scale(g))
    # quaternion sign is canonicalized; compare rotations via matrices
    np.testing.assert_allclose(
        np.asarray(sim3.to_pose_matrix(g2)), np.asarray(m), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(sim3.trans(g2)), np.asarray(sim3.trans(g)), atol=1e-5)


def test_matrix_to_quat_all_branches():
    # rotations near each extraction branch (180 deg about each axis + identity)
    mats = [np.eye(3)]
    for axis in np.eye(3):
        phi = jnp.asarray(axis * (np.pi - 1e-3))
        mats.append(np.asarray(sim3.quat_to_matrix(sim3.so3_exp_quat(phi))))
    for m in mats:
        q = sim3.matrix_to_quat(jnp.asarray(m))
        m2 = sim3.quat_to_matrix(q)
        np.testing.assert_allclose(np.asarray(m2), m, atol=1e-4)


def test_act_matches_matrix():
    key = jax.random.PRNGKey(5)
    g = rand_sim3(key)
    pts = jax.random.normal(jax.random.PRNGKey(6), (10, 3))
    m = sim3.to_matrix(g)  # [sR | t]
    expected = pts @ np.asarray(m[:3, :3]).T + np.asarray(m[:3, 3])
    np.testing.assert_allclose(np.asarray(sim3.act(g, pts)), expected, atol=1e-4)


def test_edge_residual_convention():
    """Residual log(Z * Xi^-1 * Xj) is zero iff Xi = Xj * Z.

    This is the convention of the reference pose graph: an edge (i, j, Z)
    constrains node i to equal node j composed with Z (reference:
    vista_slam/pose_graph.py:142-148 and node init at slam.py:232-236).
    """
    key = jax.random.PRNGKey(7)
    xj = rand_sim3(key)
    z = rand_sim3(jax.random.PRNGKey(8))
    xi_node = sim3.mul(xj, z)
    r = sim3.log(sim3.mul(sim3.mul(z, sim3.inv(xi_node)), xj))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)


def test_log_near_pi_rotation_roundtrip():
    """theta -> pi is the classic quaternion-log failure corner (w -> 0,
    atan2 branch): exp(log(g)) must still reproduce g there."""
    axis = np.array([[1.0, 0, 0], [0, 1.0, 0],
                     [1.0, 1.0, 1.0] / np.sqrt(3.0)], np.float32)
    for eps in (1e-3, 1e-5, 0.0):
        angle = np.float32(np.pi - eps)
        q = np.asarray(sim3.so3_exp_quat(jnp.asarray(axis * angle)))
        g = jnp.concatenate([
            jnp.asarray(np.array([[0.3, -0.2, 1.0]] * 3, np.float32)),
            jnp.asarray(q),
            jnp.full((3, 1), 1.7, jnp.float32)], axis=-1)
        g2 = sim3.exp(sim3.log(g))
        # compare as group elements: d = g^-1 g2 ~ identity (quaternion
        # double cover makes raw component comparison invalid at pi)
        d = sim3.mul(sim3.inv(g), g2)
        np.testing.assert_allclose(np.asarray(sim3.trans(d)), 0.0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(sim3.scale(d)), 1.0, atol=1e-4)
        assert np.all(np.abs(np.asarray(sim3.quat(d))[..., 3]) > 1.0 - 1e-4)


def test_extreme_scale_roundtrip():
    """Large |sigma| exercises the W-coefficient branches (exp(sigma)
    dominating or vanishing against theta)."""
    for sigma in (-6.0, -2.0, 2.0, 6.0):
        xi = jnp.asarray(
            np.array([[0.5, -1.0, 2.0, 0.3, -0.4, 0.2, sigma]], np.float32))
        g = sim3.exp(xi)
        xi2 = sim3.log(g)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi),
                                   rtol=2e-3, atol=2e-3)
        assert np.isfinite(np.asarray(g)).all()


def test_zero_tangent_is_identity():
    g = sim3.exp(jnp.zeros((4, 7), jnp.float32))
    np.testing.assert_allclose(np.asarray(sim3.trans(g)), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(sim3.scale(g)), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(sim3.log(g)), 0.0, atol=0)
