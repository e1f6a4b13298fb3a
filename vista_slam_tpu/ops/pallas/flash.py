"""Pallas TPU attention kernel (q-block tiled, fp32 softmax) with backward.

Replaces the reference's xformers memory_efficient_attention (reference:
vista_slam/sta_model/blocks/sta_blocks.py:115-148) for large token counts:
the score matrix is never materialized in HBM — each grid step computes one
q-block against the full key set resident in VMEM. For the STA geometry
(N up to a few thousand tokens at higher input resolutions, head dim 64)
keys+values for one (batch, head) fit comfortably in VMEM, so a single-pass
tile is faster than a multi-pass online-softmax variant while having the
same O(N) memory footprint.

The kernel is differentiable via ``jax.custom_vjp`` (the reference trains
*through* its fused attention — xformers provides the backward used by
vista_slam/sta_model/train.py:278): the forward saves (q, k, v, out, lse)
and the backward recomputes the probabilities blockwise in two Pallas
kernels — one tiled over q-blocks producing dq, one tiled over k-blocks
producing dk/dv — so the N^2 score matrix never hits HBM in either
direction.

Interface: flash_attention(q, k, v, scale) with [B, H, N, D] tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256

# The single-pass design keeps the full key/value set of one (batch, head)
# resident in VMEM, so sequence length is bounded by the per-core VMEM
# capacity (128 MiB on v5e), not by HBM. The dominant per-grid-step
# residents are the fp32 score tiles ([block, N] several times over) plus
# the K/V (forward, dq) or Q/dO (dk/dv) panels; _check_vmem estimates them
# against a conservative budget and REFUSES to trace past it — a clear
# Python error at jit time instead of a Mosaic allocation failure (or a
# silent spill) at compile time. At D=64/bf16/block 256 the bound works out
# to ~20k tokens — far beyond any STA resolution (1024x1024/16 is 4097
# tokens); tests/test_flash.py pins parity at 1537 and 3073 tokens and the
# boundary behavior of this check.
VMEM_BUDGET_BYTES = 96 * 1024 * 1024


def _check_vmem(bq: int, nq_pad: int, nk_pad: int, D: int, itemsize: int,
                kind: str) -> None:
    fp32 = 4
    if kind == "fwd":
        # k+v panels (double-buffered) + q/o blocks + fp32 s and p tiles
        need = (2 * nk_pad * D * itemsize * 2
                + 2 * bq * D * itemsize * 2
                + 2 * bq * nk_pad * fp32)
    elif kind == "bwd_dq":
        # k+v panels + q/do/lse/delta/dq blocks + s, p, dp, ds tiles
        need = (2 * nk_pad * D * itemsize * 2
                + 3 * bq * D * itemsize * 2
                + 4 * bq * nk_pad * fp32)
    else:  # bwd_dkv
        # q+do panels + k/v/dk/dv blocks + st, pt, dpt, dst tiles
        need = (2 * nq_pad * D * itemsize * 2
                + 4 * bq * D * itemsize * 2
                + 4 * bq * nq_pad * fp32)
    if need > VMEM_BUDGET_BYTES:
        raise ValueError(
            f"flash_attention {kind}: estimated VMEM use "
            f"{need / 2**20:.0f} MiB exceeds the {VMEM_BUDGET_BYTES / 2**20:.0f}"
            f" MiB budget (block_q={bq}, N_q={nq_pad}, N_kv={nk_pad}, D={D})."
            f" The single-pass kernel keeps full K/V per (batch, head) in"
            f" VMEM; reduce block_q, lower the input resolution, or add a"
            f" k-tiled online-softmax variant for this regime.")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n_kv: int):
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
    lse_ref[0] = m + jnp.log(denom)  # [bq, 1]


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_impl(q, k, v, scale, block_q):
    """Returns (out [B,H,Nq,D], lse [B*H, nq_pad, 1] fp32)."""
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq = min(block_q, max(8, Nq))
    nq_pad = pl.cdiv(Nq, bq) * bq
    nk_pad = pl.cdiv(Nk, 128) * 128
    _check_vmem(bq, nq_pad, nk_pad, D, q.dtype.itemsize, "fwd")

    qf = _pad_to(q.reshape(B * H, Nq, D), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, D), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, D), nk_pad, 1)

    grid = (B * H, nq_pad // bq)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, scale=float(scale), n_kv=Nk),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, nq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, nq_pad, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(B * H * (Nq + 2 * Nk) * D * q.dtype.itemsize
                            + B * H * Nq * D * q.dtype.itemsize),
            transcendentals=B * H * Nq * Nk,
        ),
    )(qf, kf, vf)
    return out[:, :Nq].reshape(B, H, Nq, D), lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float, n_kv: int):
    q = q_ref[0]          # [bq, D]
    k = k_ref[0]          # [Nk, D]
    v = v_ref[0]
    do = do_ref[0]        # [bq, D]
    lse = lse_ref[0]      # [bq, 1]
    delta = delta_ref[0]  # [bq, 1]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [bq, Nk]
    if n_kv < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_kv, s, -jnp.inf)
    p = jnp.exp(s - lse)                                              # [bq, Nk]
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)         # [bq, Nk]
    ds = p * (dp - delta)
    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float):
    # One k-block against the full (padded) query set. Padded q rows have
    # do == 0 and delta == 0, so their contributions vanish without a mask.
    k = k_ref[0]          # [bk, D]
    q = q_ref[0]          # [Nq, D]
    do = do_ref[0]        # [Nq, D]
    lse = lse_ref[0]      # [1, Nq] (pre-transposed outside the kernel)
    delta = delta_ref[0]  # [1, Nq]
    st = jnp.dot(k, q.T, preferred_element_type=jnp.float32) * scale  # [bk, Nq]
    pt = jnp.exp(st - lse)                                            # [bk, Nq]
    dv = jnp.dot(pt.astype(do.dtype), do, preferred_element_type=jnp.float32)
    dpt = jnp.dot(v_ref[0], do.T, preferred_element_type=jnp.float32)  # [bk, Nq]
    dst = pt * (dpt - delta)
    dk = jnp.dot(dst.astype(q.dtype), q, preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention(q, k, v, scale, block_q):
    out, _ = _fwd_impl(q, k, v, scale, block_q)
    return out


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """q [B,H,Nq,D], k/v [B,H,Nk,D] -> [B,H,Nq,D]. Differentiable."""
    return _flash_attention(q, k, v, float(scale), int(block_q))


def _flash_fwd(q, k, v, scale, block_q):
    out, lse = _fwd_impl(q, k, v, scale, block_q)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, res, do):
    q, k, v, out, lse = res
    B, H, Nq, D = q.shape
    Nk = k.shape[2]
    bq = min(block_q, max(8, Nq))
    nq_pad = pl.cdiv(Nq, bq) * bq
    nk_pad = pl.cdiv(Nk, 128) * 128
    bk = min(block_q, nk_pad)
    # the dkv grid tiles nk by bk — pad keys up so bk divides the buffer
    # (nk_pad is a multiple of 128 but not necessarily of bk; a floor-divided
    # grid would leave the tail rows of dk/dv unwritten)
    nk_pad = pl.cdiv(nk_pad, bk) * bk
    _check_vmem(bq, nq_pad, nk_pad, D, q.dtype.itemsize, "bwd_dq")
    _check_vmem(bk, nq_pad, nk_pad, D, q.dtype.itemsize, "bwd_dkv")

    qf = _pad_to(q.reshape(B * H, Nq, D), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, D), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, D), nk_pad, 1)
    dof = _pad_to(do.reshape(B * H, Nq, D), nq_pad, 1)
    # delta_i = <do_i, o_i>; padded rows are zero because dof is zero there.
    delta = jnp.sum(dof.astype(jnp.float32)
                    * _pad_to(out.reshape(B * H, Nq, D), nq_pad, 1).astype(jnp.float32),
                    axis=-1)  # [BH, nq_pad]
    delta_q = delta[..., None]        # [BH, nq_pad, 1] (dq kernel: rows)
    delta_t = delta[:, None, :]       # [BH, 1, nq_pad] (dkv kernel: cols)
    lse_q = lse                       # [BH, nq_pad, 1]
    lse_t = jnp.swapaxes(lse, 1, 2)   # [BH, 1, nq_pad]

    itemsize = q.dtype.itemsize
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=float(scale), n_kv=Nk),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, D), q.dtype),
        grid=(B * H, nq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Nq * Nk * D,
            bytes_accessed=B * H * (3 * Nq + 2 * Nk) * D * itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(qf, kf, vf, dof, lse_q, delta_q)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=float(scale)),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, nk_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, nk_pad, D), v.dtype),
        ),
        grid=(B * H, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bk, D), lambda bh, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda bh, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, D), lambda bh, ki: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, D), lambda bh, ki: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq_pad), lambda bh, ki: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq_pad), lambda bh, ki: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, D), lambda bh, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda bh, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * Nq * Nk * D,
            bytes_accessed=B * H * (2 * Nq + 3 * Nk) * D * itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(kf, vf, qf, dof, lse_t, delta_t)

    dq = dq[:, :Nq].reshape(B, H, Nq, D)
    dk = dk[:, :Nk].reshape(B, H, Nk, D)
    dv = dv[:, :Nk].reshape(B, H, Nk, D)
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd, _flash_bwd)
