"""Sim(3) Lie group operations in pure JAX.

The pose-graph backend of the pipeline optimizes similarity transforms
(rotation R, translation t, scale s) acting on points as ``x -> s * R @ x + t``.
The reference implementation leans on the ``pypose`` library for this algebra
(reference: vista_slam/pose_graph.py:5-154, vista_slam/slam.py:123-137); here
it is a self-contained, fully-vmappable JAX implementation so residuals,
Jacobians and retractions jit into a single XLA program with static shapes.

Data layouts (trailing dimension):
  group element g[..., 8]  = (tx, ty, tz, qx, qy, qz, qw, s)
  tangent      xi[..., 7]  = (tau_x, tau_y, tau_z, phi_x, phi_y, phi_z, sigma)

The tangent ordering (translation, rotation, log-scale) matters: edge
confidence weights in the pose graph are laid out as 6 pose entries followed
by 1 scale entry (reference: vista_slam/slam.py:228).

All functions operate on the trailing axis and broadcast over leading axes.
Double-where guards make every function safe under jax.grad / jax.jacfwd at
the small-angle / zero-scale singularities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import cramer_solve3

_EPS = 1e-8
_SMALL = 1e-6  # switch point to Taylor expansions


# ---------------------------------------------------------------------------
# quaternion helpers (layout: x, y, z, w)
# ---------------------------------------------------------------------------

def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(shape + (4,))
    return q.at[..., 3].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v[..., 3] by unit quaternions q[..., 4]."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion (x, y, z, w).

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions and select the numerically best one, so it is safe under vmap
    and jit (no data-dependent python control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidates, each scaled by 4*q_k^2 (guaranteed >= 0 up to fp error)
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # candidate built from w
    sw = safe_sqrt(qw2) * 2.0
    cand_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, sw / 4.0], -1)
    sx = safe_sqrt(qx2) * 2.0
    cand_x = jnp.stack([sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    sy = safe_sqrt(qy2) * 2.0
    cand_y = jnp.stack([(m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    sz = safe_sqrt(qz2) * 2.0
    cand_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0, (m10 - m01) / sz], -1)

    mags = jnp.stack([qx2, qy2, qz2, qw2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # canonical sign: w >= 0
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO(3) exp/log via quaternions
# ---------------------------------------------------------------------------

def so3_exp_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle phi[..., 3] -> unit quaternion."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _SMALL
    half = 0.5 * theta
    # sin(half)/theta with Taylor fallback 0.5 - theta^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> axis-angle phi[..., 3] (angle in [0, pi])."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # take the short way around
    v = q[..., :3]
    w = q[..., 3]
    vn2 = jnp.sum(v * v, axis=-1)
    vn = jnp.sqrt(jnp.maximum(vn2, _EPS * _EPS))
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < _SMALL * _SMALL
    # angle/vn with Taylor fallback 2/w * (1 - vn^2/(3 w^2))
    w_safe = jnp.maximum(w, _EPS)
    k = jnp.where(small, 2.0 / w_safe * (1.0 - vn2 / (3.0 * w_safe * w_safe)), angle / vn)
    return v * k[..., None]


def hat(phi: jnp.ndarray) -> jnp.ndarray:
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Sim(3) group ops
# ---------------------------------------------------------------------------

def identity(shape=()) -> jnp.ndarray:
    g = jnp.zeros(shape + (8,))
    return g.at[..., 6].set(1.0).at[..., 7].set(1.0)


def make(t: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, q, s[..., None] if s.ndim == t.ndim - 1 else s], axis=-1)


def trans(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 0:3]


def quat(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 3:7]


def scale(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., 7]


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: (a * b)(x) = a(b(x)).

    With a = (Ra, ta, sa), b = (Rb, tb, sb):
      R = Ra Rb;  t = sa * Ra tb + ta;  s = sa * sb.
    """
    t = scale(a)[..., None] * quat_rotate(quat(a), trans(b)) + trans(a)
    q = quat_normalize(quat_mul(quat(a), quat(b)))
    s = scale(a) * scale(b)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    qc = quat_conj(quat(g))
    s_inv = 1.0 / jnp.maximum(scale(g), _EPS)
    t = -s_inv[..., None] * quat_rotate(qc, trans(g))
    return jnp.concatenate([t, qc, s_inv[..., None]], axis=-1)


def act(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply g to points pts[..., 3]: s * R @ x + t."""
    return scale(g)[..., None] * quat_rotate(quat(g), pts) + trans(g)


def to_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix with the scaled rotation block [sR | t]."""
    R = quat_to_matrix(quat(g)) * scale(g)[..., None, None]
    return _rt_to_mat44(R, trans(g))


def to_pose_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 rigid pose [R | t] with the scale factored out.

    Matches how the reference exports camera poses: the Sim(3) node's rotation
    and translation form the pose while the scale multiplies the depth map
    (reference: vista_slam/slam.py:304-315).
    """
    R = quat_to_matrix(quat(g))
    return _rt_to_mat44(R, trans(g))


def _rt_to_mat44(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    m = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def from_rt(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    q = matrix_to_quat(R)
    s = jnp.broadcast_to(jnp.asarray(s, dtype=t.dtype), t.shape[:-1])
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def from_matrix(m: jnp.ndarray, s: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """4x4 rigid pose matrix -> Sim(3) with explicit scale."""
    return from_rt(m[..., :3, :3], m[..., :3, 3], s)


# ---------------------------------------------------------------------------
# Sim(3) exp/log
# ---------------------------------------------------------------------------

def _moment_series(k: int, sigma: jnp.ndarray) -> jnp.ndarray:
    """Taylor series of M_k(sigma) = int_0^1 u^k e^{sigma u} du =
    sum_j sigma^j / (j! (k+j+1)), truncated at j=5 (rel. error < 1e-8 for
    |sigma| < 0.1)."""
    import math

    out = 0.0
    for j in reversed(range(6)):
        out = out * sigma + 1.0 / (math.factorial(j) * (k + j + 1))
    return out


def _sim3_W_coeffs(theta2: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (a, b, c) of W = a I + b Omega + c Omega^2 where
    W = integral_0^1 exp(sigma u) R(u theta) du  and t = W tau.

    Every closed form here suffers catastrophic fp32 cancellation near the
    origin — and TPU transcendentals are only ~1 ulp, so e.g. exp(3.7e-6)
    rounds to exactly 1.0 and the naive (e^s - 1)/s collapses W to a
    singular matrix. Wide series regions (|sigma|, theta < 0.1) with the
    moment expansion M_k = int u^k e^{sigma u} du keep everything accurate:
      a = M0,  b = M1 - t^2/6 M3 + t^4/120 M5,  c = M2/2 - t^2/24 M4 + t^4/720 M6.
    Outside the series region the trig/exp closed forms are well
    conditioned. All divisions are where-guarded (grad-safe). The function
    takes theta^2 (a SMOOTH function of phi) rather than theta, because
    d|phi|/dphi is NaN at phi = 0 and would poison the series branch's
    tangents through 0 * NaN.
    """
    sigma2 = sigma * sigma
    s = jnp.exp(sigma)

    small_s = jnp.abs(sigma) < 0.1
    small_t = theta2 < 0.01
    sigma_safe = jnp.where(small_s, 1.0, sigma)
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta2))  # trig branch only
    theta_safe = theta

    # ---- a = M0 -----------------------------------------------------------
    a = jnp.where(small_s, _moment_series(0, sigma),
                  jnp.expm1(sigma) / sigma_safe)

    # ---- exact moments (safe for |sigma| >= 0.1) --------------------------
    s2, s3 = sigma_safe ** 2, sigma_safe ** 3
    s4, s5 = s2 * s2, s2 * s3
    s6, s7 = s3 * s3, s3 * s4
    M1e = (s * (sigma - 1.0) + 1.0) / s2
    M2e = (s * (sigma2 - 2.0 * sigma + 2.0) - 2.0) / s3
    M3e = (s * (s3 - 3.0 * s2 + 6.0 * sigma - 6.0) + 6.0) / s4
    M4e = (s * (s4 - 4.0 * s3 + 12.0 * s2 - 24.0 * sigma + 24.0) - 24.0) / s5
    M5e = (s * (s5 - 5.0 * s4 + 20.0 * s3 - 60.0 * s2 + 120.0 * sigma - 120.0)
           + 120.0) / s6
    M6e = (s * (s6 - 6.0 * s5 + 30.0 * s4 - 120.0 * s3 + 360.0 * s2
                - 720.0 * sigma + 720.0) - 720.0) / s7

    def pick(k, exact):
        return jnp.where(small_s, _moment_series(k, sigma), exact)

    M1, M2, M3 = pick(1, M1e), pick(2, M2e), pick(3, M3e)
    M4, M5, M6 = pick(4, M4e), pick(5, M5e), pick(6, M6e)

    # ---- theta-series for b, c (valid for theta < 0.1, any sigma) ---------
    theta4 = theta2 * theta2
    b_series = M1 - theta2 / 6.0 * M3 + theta4 / 120.0 * M5
    c_series = 0.5 * M2 - theta2 / 24.0 * M4 + theta4 / 720.0 * M6

    # ---- trig closed forms (well conditioned for theta >= 0.1) ------------
    denom = jnp.where(small_t, 1.0, sigma2 + theta2)
    I_s = (s * (sigma * jnp.sin(theta) - theta * jnp.cos(theta)) + theta) / denom
    I_c = (s * (sigma * jnp.cos(theta) + theta * jnp.sin(theta)) - sigma) / denom
    b_trig = I_s / theta_safe
    c_trig = (a - I_c) / jnp.where(small_t, 1.0, theta2)

    b = jnp.where(small_t, b_series, b_trig)
    c = jnp.where(small_t, c_series, c_trig)
    return a, b, c


def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1)  # smooth at phi = 0, unlike norm
    a, b, c = _sim3_W_coeffs(theta2, sigma)
    Om = hat(phi)
    Om2 = Om @ Om
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Om.shape)
    return a[..., None, None] * eye + b[..., None, None] * Om + c[..., None, None] * Om2


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map sim(3) -> Sim(3). xi = (tau, phi, sigma)."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6]
    q = so3_exp_quat(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau)
    return jnp.concatenate([t, q, s[..., None]], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map Sim(3) -> sim(3).

    The 3x3 W-solve uses the explicit adjugate (ops/linalg.cramer_solve3)
    rather than `jnp.linalg.solve`: on TPU the batched LU lowers to the
    serial `LuDecompositionBlock` custom-call (~2.5 ms per [5200, 3, 3]
    solve execution inside the PGO loop — profiler trace, BASELINE.md),
    while the adjugate is ~30 fused elementwise ops. W is kept well-conditioned by
    the series/trig coefficient guards in `_sim3_W_coeffs` (covered down
    to the pi-rotation and extreme-scale corners in tests/test_sim3.py).
    """
    phi = so3_log_quat(quat(g))
    sigma = jnp.log(jnp.maximum(scale(g), _EPS))
    W = _sim3_W(phi, sigma)
    tau = cramer_solve3(W, trans(g))
    return jnp.concatenate([tau, phi, sigma[..., None]], axis=-1)


def retract(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative retraction g * Exp(xi) used by the PGO solver."""
    return mul(g, exp(xi))


def normalize(g: jnp.ndarray) -> jnp.ndarray:
    """Re-normalize the quaternion part (drift control after many updates)."""
    return jnp.concatenate([trans(g), quat_normalize(quat(g)), g[..., 7:8]], axis=-1)


# SE(3) convenience (pose-head output -> graph edges, scale fixed to 1).

def se3_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    return from_matrix(m, 1.0)


__all__ = [
    "quat_identity", "quat_mul", "quat_conj", "quat_normalize", "quat_rotate",
    "quat_to_matrix", "matrix_to_quat", "so3_exp_quat", "so3_log_quat", "hat",
    "identity", "make", "trans", "quat", "scale", "mul", "inv", "act",
    "to_matrix", "to_pose_matrix", "from_rt", "from_matrix", "exp", "log",
    "retract", "normalize", "se3_from_matrix",
]
