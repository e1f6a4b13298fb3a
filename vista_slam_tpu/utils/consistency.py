"""Geometric cross-view consistency checks (JAX, batched).

Functional equivalents of the reference's consistency utilities
(reference: vista_slam/utils/slam_utils.py:193-419 —
compute_geo_valid_mask_batched, compute_symmetric_geo_valid_mask,
view_consistency_check). Present in the reference but unused on the online
path; provided here for offline filtering and analysis tooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linalg import adjugate_inv3
from .geometry import inv_se3
from .image_ops import pixel_grid


def _project(pts, K):
    uv = pts @ jnp.swapaxes(K, -1, -2)
    z = uv[..., 2:3]
    return uv[..., :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8), pts[..., 2]


def _sample_nearest(depth, u, v):
    """depth [H,W]; integer-rounded nearest sample with validity."""
    H, W = depth.shape
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    valid = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    d = depth[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
    return d, valid


def symmetric_geo_valid_mask(depths: jnp.ndarray, K: jnp.ndarray,
                             relative_pose: jnp.ndarray) -> jnp.ndarray:
    """depths [2,H,W], shared K [3,3], relative_pose [4,4] (cam1 -> cam2).
    Returns [2,H,W] masks of mutually consistent pixels with adaptive
    (2x median error) thresholds (reference: slam_utils.py:269-343)."""
    H, W = depths.shape[1:]
    pix = pixel_grid(H, W, depths.dtype).reshape(-1, 3)
    rays = pix @ adjugate_inv3(K).T

    def one_direction(depth_src, depth_tgt, T):
        pts = rays * depth_src.reshape(-1, 1)
        pts = pts @ T[:3, :3].T + T[:3, 3]
        uv, z = _project(pts, K)
        d_tgt, valid = _sample_nearest(depth_tgt, uv[..., 0], uv[..., 1])
        err = jnp.abs(d_tgt - z)
        big = jnp.nanmax(err) + 1.0
        masked_err = jnp.where(valid, err, big)
        # median over valid entries via sorted quantile of masked values
        n_valid = jnp.maximum(valid.sum(), 1)
        thres = 2.0 * jnp.sort(masked_err)[(n_valid - 1) // 2]
        return (err < thres) & valid

    m1 = one_direction(depths[0], depths[1], relative_pose)
    m2 = one_direction(depths[1], depths[0], inv_se3(relative_pose))
    return jnp.stack([m1.reshape(H, W), m2.reshape(H, W)])


def view_consistency_count(depths: jnp.ndarray, intrinsics: jnp.ndarray,
                           poses: jnp.ndarray, threshold: float = 0.05,
                           window: int = 4) -> jnp.ndarray:
    """Per-pixel count of +-window neighbor views whose depth agrees after
    reprojection (reference: slam_utils.py:346-419). depths [N,H,W],
    intrinsics [N,3,3], poses [N,4,4] cam-to-world -> counts [N,H,W]."""
    N, H, W = depths.shape
    pix = pixel_grid(H, W, depths.dtype).reshape(-1, 3)

    def count_for(i):
        K_inv = adjugate_inv3(intrinsics[i])
        cam = (pix @ K_inv.T) * depths[i].reshape(-1, 1)
        world = cam @ poses[i, :3, :3].T + poses[i, :3, 3]

        def against(j):
            Tj_inv = inv_se3(poses[j])
            cam_j = world @ Tj_inv[:3, :3].T + Tj_inv[:3, 3]
            uv, z = _project(cam_j, intrinsics[j])
            d_j, valid = _sample_nearest(depths[j], uv[..., 0], uv[..., 1])
            agree = (jnp.abs(d_j - z) < threshold) & (z > 0) & valid & (j != i)
            return agree.astype(jnp.int32)

        # static-length window of traced offsets (arange bounds must be
        # concrete under vmap)
        js = jnp.clip(i + jnp.arange(-window, window + 1), 0, N - 1)
        return jax.vmap(against)(js).sum(0).reshape(H, W)

    return jax.vmap(count_for)(jnp.arange(N))
