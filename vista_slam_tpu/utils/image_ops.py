"""Static-shape image resampling helpers.

TPU-friendly bilinear resize with ``align_corners=True`` semantics (which
``jax.image.resize`` does not provide but the reference's DPT fusion blocks
require, reference: vista_slam/sta_model/heads/dpt_block.py:213-216,320).

Because all shapes are static under jit, each 2D resize is expressed as two
small dense interpolation matrices applied via matmul — this runs on the MXU
and is exact (no gather/scatter).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    for i in range(n_out):
        if align_corners and n_out > 1:
            p = i * (n_in - 1) / (n_out - 1)
        else:
            p = (i + 0.5) * n_in / n_out - 0.5
            p = min(max(p, 0.0), n_in - 1)
        j0 = int(np.floor(p))
        j1 = min(j0 + 1, n_in - 1)
        w = p - j0
        A[i, j0] += 1.0 - w
        A[i, j1] += w
    return A


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) tensors to ``out_hw``."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, h, w, _ = x.shape
    oh, ow = out_hw
    Ah = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=x.dtype)
    Aw = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=x.dtype)
    # out[b, i, j, c] = sum_{y, x} Ah[i, y] Aw[j, x] in[b, y, x, c]
    y = jnp.einsum("iy,byxc->bixc", Ah, x)
    y = jnp.einsum("jx,bixc->bijc", Aw, y)
    return y[0] if squeeze else y


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel coordinates [(x, y, 1)] of shape [H, W, 3]."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
