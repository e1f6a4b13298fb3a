"""Camera geometry utilities (JAX, batched, static shapes).

Functional equivalents of the reference's geometry helpers
(reference: vista_slam/utils/slam_utils.py:8-190, utils/geometry.py), written
for batched jit use: intrinsics estimation from pointmaps, depth<->pointcloud
conversion, and relative scale estimation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.linalg import adjugate_inv3
from .image_ops import pixel_grid


def _safe_div(a, b):
    r = a / b
    return jnp.where(jnp.isfinite(r), r, 0.0)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid [..., 4, 4] transforms:
    inv([R t; 0 1]) = [R^T -R^T t; 0 1].

    Use instead of `jnp.linalg.inv` for camera poses: the batched LU
    lowers to TPU's serial `LuDecompositionBlock` custom-call (the same
    pathology ops/linalg.gauss_jordan_inv documents), while this is a
    transpose + one matvec that fuses with its consumers — and it is
    exactly orthogonality-preserving where LU only is to roundoff."""
    R = T[..., :3, :3]
    Rt = jnp.swapaxes(R, -1, -2)
    t = -jnp.einsum("...ij,...j->...i", Rt, T[..., :3, 3])
    top = jnp.concatenate([Rt, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def _weighted_focals(pts3d, conf, axis):
    """Confidence-weighted LS fit of (X/Z, Y/Z) against the centered pixel
    grid. axis=None pools the whole batch (shared K); axis=1 is per-image.
    Returns (fx, fy, cx, cy)."""
    B, H, W, _ = pts3d.shape
    cx, cy = W / 2.0, H / 2.0
    grid = pixel_grid(H, W, pts3d.dtype)
    u = (grid[..., 0] - cx).reshape(1, -1)
    v = (grid[..., 1] - cy).reshape(1, -1)
    X = pts3d[..., 0].reshape(B, -1)
    Y = pts3d[..., 1].reshape(B, -1)
    Z = pts3d[..., 2].reshape(B, -1)
    w = jnp.maximum(conf.reshape(B, -1), 1e-6)
    xz = _safe_div(X, Z)
    yz = _safe_div(Y, Z)
    fx = jnp.sum(w * xz * u, axis) / jnp.maximum(jnp.sum(w * xz * xz, axis), 1e-12)
    fy = jnp.sum(w * yz * v, axis) / jnp.maximum(jnp.sum(w * yz * yz, axis), 1e-12)
    return fx, fy, cx, cy


def estimate_intrinsics_shared(pts3d: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Confidence-weighted least-squares focal estimate, shared over the batch.

    pts3d [B,H,W,3], conf [B,H,W] -> K [3,3] with cx, cy fixed at the image
    center (reference: slam_utils.py:8-61 with shared_intrinsic=True).
    """
    fx, fy, cx, cy = _weighted_focals(pts3d, conf, axis=None)
    K = jnp.zeros((3, 3), pts3d.dtype)
    return (K.at[0, 0].set(fx).at[1, 1].set(fy)
            .at[0, 2].set(cx).at[1, 2].set(cy).at[2, 2].set(1.0))


def estimate_intrinsics_batched(pts3d: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Per-image focal estimate: [B,H,W,3], [B,H,W] -> [B,3,3]
    (reference: slam_utils.py:63-79)."""
    B = pts3d.shape[0]
    fx, fy, cx, cy = _weighted_focals(pts3d, conf, axis=1)
    K = jnp.zeros((B, 3, 3), pts3d.dtype)
    K = K.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
    return K.at[:, 0, 2].set(cx).at[:, 1, 2].set(cy).at[:, 2, 2].set(1.0)


def _pixel_rays(K, n, h, w, dtype):
    """Per-pixel K^-1 rays [n, H, W, 3]; K is [3,3] shared or [n,3,3]."""
    pix = pixel_grid(h, w, dtype).reshape(-1, 3)  # [HW, 3]
    # adjugate_inv3 instead of jnp.linalg.inv: no LuDecompositionBlock
    # custom-call in the decode-adjacent unprojection programs
    if K.ndim == 2:
        rays = pix @ adjugate_inv3(K).T
        return jnp.broadcast_to(rays.reshape(1, h, w, 3), (n, h, w, 3))
    return jnp.einsum("nij,pj->npi", adjugate_inv3(K), pix).reshape(n, h, w, 3)


def depth_to_pointcloud(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unproject depth maps: [N,H,W] + K ([3,3] or [N,3,3]) -> [N,H,W,3]
    (reference: slam_utils.py:82-121)."""
    N, H, W = depth.shape
    return _pixel_rays(K, N, H, W, depth.dtype) * depth[..., None]


def depth_from_pointcloud(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """RAY-LENGTH depth (projection onto the unit ray), NOT z-depth:
    [B,H,W,3] -> [B,H,W]. Up to ~15% larger than pts[..., 2] at image
    corners — this deliberately matches the reference's dot-product
    definition (reference: slam_utils.py:124-165); the rest of the
    pipeline (pointmap store, consistency checks) uses z-depth, so do NOT
    use this as the inverse of depth_to_pointcloud."""
    B, H, W, _ = pts.shape
    rays = _pixel_rays(K, B, H, W, pts.dtype)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    return jnp.sum(pts * rays, axis=-1)


def estimate_scale(d_i, d_j, c_i, c_j):
    """Least-squares scale s with D_j ~= s * D_i under dual confidence
    weights (reference: slam_utils.py:168-190)."""
    w = jnp.maximum(c_i * c_j, 1e-6)
    return jnp.sum(w * d_i * d_j) / jnp.maximum(jnp.sum(w * d_i * d_i), 1e-12)


def estimate_scale_np(d_i, d_j, c_i, c_j):
    """Host (numpy) version for per-node graph bookkeeping."""
    import numpy as np

    w = np.maximum(c_i.astype(np.float64) * c_j.astype(np.float64), 1e-6)
    return float(np.sum(w * d_i * d_j) / max(np.sum(w * d_i * d_i), 1e-12))
