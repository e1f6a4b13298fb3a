"""2D rotary position embedding (RoPE2D) for ViT patch tokens.

The reference uses an in-place CUDA kernel (curope) with a pure-torch
fallback defining the semantics (reference:
vista_slam/sta_model/pos_embed/pos_embed.py:113-185): the head dimension D is
split into a y-half and an x-half; each half of size d = D/2 is rotated by
position-dependent sin/cos at frequencies ``1 / base**(k/(d/2))``.

On TPU the token positions are static per image resolution, so the sin/cos
tables are computed once at trace time and folded into the compiled program
as constants; the elementwise rotation fuses into the surrounding attention
matmuls via XLA. No custom kernel is needed for this op to run at memory
speed (the tables are tiny: [N, D]).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _tables_np(n_h: int, n_w: int, dim_head: int, base: float, n_special: int):
    """Host-side table build (cached): cos/sin of shape [n_special + n_h*n_w, D].

    ``n_special`` leading tokens sit at position (-1, -1) — the learned pose
    token of the two-view decoder (reference: sta_model.py:214-219).
    """
    assert dim_head % 4 == 0, "head dim must be divisible by 4 for RoPE2D"
    d = dim_head // 2  # per-axis half
    q = d // 2  # rotation pair count per axis
    inv_freq = 1.0 / (base ** (np.arange(q, dtype=np.float64) / q))

    ys, xs = np.meshgrid(np.arange(n_h), np.arange(n_w), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(np.float64)
    if n_special:
        special = -np.ones((n_special, 2))
        pos = np.concatenate([special, pos], axis=0)

    def axis_tables(p):  # p: [N]
        f = p[:, None] * inv_freq[None, :]  # [N, q]
        c = np.cos(f)
        s = np.sin(f)
        # duplicated like the reference: cat((cos, cos), -1)
        return np.concatenate([c, c], -1), np.concatenate([s, s], -1)  # [N, d]

    cy, sy = axis_tables(pos[:, 0])
    cx, sx = axis_tables(pos[:, 1])
    cos = np.concatenate([cy, cx], axis=-1)  # [N, D]
    sin = np.concatenate([sy, sx], axis=-1)
    return cos.astype(np.float32), sin.astype(np.float32)


def rope2d_tables(n_h: int, n_w: int, dim_head: int, base: float = 100.0,
                  n_special: int = 0, dtype=jnp.float32):
    cos, sin = _tables_np(n_h, n_w, dim_head, float(base), n_special)
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def apply_rope2d(tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate tokens [..., N, D] with tables [N, D].

    Within each axis-half h = (h1, h2), rotate_half(h) = (-h2, h1)
    (reference: pos_embed.py:122-125,149-167).
    """
    D = tokens.shape[-1]
    d = D // 2
    q = d // 2
    y, x = tokens[..., :d], tokens[..., d:]
    ry = jnp.concatenate([-y[..., q:], y[..., :q]], axis=-1)
    rx = jnp.concatenate([-x[..., q:], x[..., :q]], axis=-1)
    rot = jnp.concatenate([ry, rx], axis=-1)
    cos = cos.astype(tokens.dtype)
    sin = sin.astype(tokens.dtype)
    return tokens * cos + rot * sin
