"""Pallas TPU attention kernel (q-block tiled, fp32 softmax).

Replaces the reference's xformers memory_efficient_attention (reference:
vista_slam/sta_model/blocks/sta_blocks.py:115-148) for large token counts:
the score matrix is never materialized in HBM — each grid step computes one
q-block against the full key set resident in VMEM. For the STA geometry
(N up to a few thousand tokens at higher input resolutions, head dim 64)
keys+values for one (batch, head) fit comfortably in VMEM, so a single-pass
tile is faster than a multi-pass online-softmax variant while having the
same O(N) memory footprint.

Interface: flash_attention(q, k, v, scale) with [B, H, N, D] tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_kv: int):
    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [N, D]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, N]
    if n_kv < k.shape[0]:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_kv, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """q [B,H,Nq,D], k/v [B,H,Nk,D] -> [B,H,Nq,D]."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq = min(block_q, max(8, Nq))
    nq_pad = pl.cdiv(Nq, bq) * bq
    nk_pad = pl.cdiv(Nk, 128) * 128

    qf = _pad_to(q.reshape(B * H, Nq, D), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, D), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, D), nk_pad, 1)

    grid = (B * H, nq_pad // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale), n_kv=Nk),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(B * H * (Nq + 2 * Nk) * D * q.dtype.itemsize
                            + B * H * Nq * D * q.dtype.itemsize),
            transcendentals=B * H * Nq * Nk,
        ),
    )(qf, kf, vf)
    return out[:, :Nq].reshape(B, H, Nq, D)
