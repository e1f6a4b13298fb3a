"""Camera geometry utilities (JAX, batched, static shapes).

Functional equivalents of the reference's geometry helpers
(reference: vista_slam/utils/slam_utils.py:8-190, utils/geometry.py), written
for batched jit use: intrinsics estimation from pointmaps, depth<->pointcloud
conversion, and relative scale estimation.
"""

from __future__ import annotations

import jax.numpy as jnp

from .image_ops import pixel_grid


def estimate_intrinsics_shared(pts3d: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Confidence-weighted least-squares focal estimate, shared over the batch.

    pts3d [B,H,W,3], conf [B,H,W] -> K [3,3] with cx, cy fixed at the image
    center (reference: slam_utils.py:8-61 with shared_intrinsic=True).
    """
    B, H, W, _ = pts3d.shape
    cx, cy = W / 2.0, H / 2.0
    grid = pixel_grid(H, W, pts3d.dtype)
    u = (grid[..., 0] - cx).reshape(-1)
    v = (grid[..., 1] - cy).reshape(-1)

    X = pts3d[..., 0].reshape(B, -1)
    Y = pts3d[..., 1].reshape(B, -1)
    Z = pts3d[..., 2].reshape(B, -1)
    w = jnp.maximum(conf.reshape(B, -1), 1e-6)

    def safe_div(a, b):
        r = a / b
        return jnp.where(jnp.isfinite(r), r, 0.0)

    xz = safe_div(X, Z)
    yz = safe_div(Y, Z)
    fx = jnp.sum(w * xz * u) / jnp.maximum(jnp.sum(w * xz * xz), 1e-12)
    fy = jnp.sum(w * yz * v) / jnp.maximum(jnp.sum(w * yz * yz), 1e-12)
    K = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 0]], dtype=pts3d.dtype)
    K = K * jnp.stack([fx, fy, jnp.asarray(0.0, pts3d.dtype)])[:, None]
    return K + jnp.asarray([[0, 0, cx], [0, 0, cy], [0, 0, 1]], dtype=pts3d.dtype)


def estimate_intrinsics_batched(pts3d: jnp.ndarray, conf: jnp.ndarray) -> jnp.ndarray:
    """Per-image focal estimate: [B,H,W,3], [B,H,W] -> [B,3,3]
    (reference: slam_utils.py:63-79)."""
    B, H, W, _ = pts3d.shape
    cx, cy = W / 2.0, H / 2.0
    grid = pixel_grid(H, W, pts3d.dtype)
    u = (grid[..., 0] - cx).reshape(1, -1)
    v = (grid[..., 1] - cy).reshape(1, -1)
    X = pts3d[..., 0].reshape(B, -1)
    Y = pts3d[..., 1].reshape(B, -1)
    Z = pts3d[..., 2].reshape(B, -1)
    w = jnp.maximum(conf.reshape(B, -1), 1e-6)

    def safe_div(a, b):
        r = a / b
        return jnp.where(jnp.isfinite(r), r, 0.0)

    xz = safe_div(X, Z)
    yz = safe_div(Y, Z)
    fx = jnp.sum(w * xz * u, 1) / jnp.maximum(jnp.sum(w * xz * xz, 1), 1e-12)
    fy = jnp.sum(w * yz * v, 1) / jnp.maximum(jnp.sum(w * yz * yz, 1), 1e-12)
    K = jnp.zeros((B, 3, 3), pts3d.dtype)
    K = K.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
    K = K.at[:, 0, 2].set(cx).at[:, 1, 2].set(cy).at[:, 2, 2].set(1.0)
    return K


def depth_to_pointcloud(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unproject depth maps: [N,H,W] + K ([3,3] or [N,3,3]) -> [N,H,W,3]
    (reference: slam_utils.py:82-121)."""
    N, H, W = depth.shape
    pix = pixel_grid(H, W, depth.dtype).reshape(-1, 3)  # [HW, 3]
    if K.ndim == 2:
        rays = pix @ jnp.linalg.inv(K).T
        rays = jnp.broadcast_to(rays.reshape(1, H, W, 3), (N, H, W, 3))
    else:
        rays = jnp.einsum("nij,pj->npi", jnp.linalg.inv(K), pix).reshape(N, H, W, 3)
    return rays * depth[..., None]


def depth_from_pointcloud(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Ray-dot-product depth: [B,H,W,3] -> [B,H,W]
    (reference: slam_utils.py:124-165)."""
    B, H, W, _ = pts.shape
    pix = pixel_grid(H, W, pts.dtype).reshape(-1, 3)
    if K.ndim == 2:
        rays = pix @ jnp.linalg.inv(K).T
        rays = jnp.broadcast_to(rays.reshape(1, H, W, 3), (B, H, W, 3))
    else:
        rays = jnp.einsum("bij,pj->bpi", jnp.linalg.inv(K), pix).reshape(B, H, W, 3)
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
