"""Pallas TPU training-attention kernel specialized for SHORT sequences
(the STA regime: 197 tokens at 224x224/16).

Motivation (trace-backed, BASELINE.md "training-step roofline"): under plain
autodiff the einsum attention path costs the batch-8 train step ~13 ms —
~10 ms of score/softmax/PV ops plus ~3 ms of fp32 [B,H,N,N] probability
copies saved for the backward. This kernel removes the residual traffic
entirely and collapses the backward into ONE Pallas kernel:

  * forward: one grid step per (batch, head) — the whole token set fits in
    VMEM at these lengths — producing out and the log-sum-exp.
  * backward: one grid step per (batch, head) recomputes the probabilities
    from (q, k, lse) and emits dq, dk, dv together; the [N, N] score matrix
    never exists in HBM in either direction, and unlike the general flash
    kernel (ops/pallas/flash.py, q-tiled + two backward kernels for long
    sequences) nothing is read twice.

The reference trains through xformers' fused attention backward the same
way (reference: vista_slam/sta_model/train.py:278 with
blocks/sta_blocks.py:129-148).

Interface: fused_attention(q, k, v, scale) with [B, H, N, D] tensors,
N_q == N_kv <= MAX_FUSED_TOKENS. Differentiable; numerics match mha_xla to
bf16-matmul tolerance (tests/test_attn_train.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One (batch, head)'s whole problem must fit in VMEM: the backward holds
# q/k/v/do/dq/dk/dv panels [Np, D] plus four fp32 [Np, Np] score-sized
# intermediates; at 1024 tokens that is ~17 MB — comfortable. Past this,
# dispatch to the q-tiled flash kernel instead (ops/attention.py does).
MAX_FUSED_TOKENS = 1024


def _pad_tokens(x, n_pad):
    pad = n_pad - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n: int):
    q = q_ref[0]  # [Np, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if n < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = (jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32) / denom
                ).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(denom)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, n: int):
    q = q_ref[0]          # [Np, D]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]      # [Np, 1]
    delta = delta_ref[0]  # [Np, 1]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    if n < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n, s, -jnp.inf)
    p = jnp.exp(s - lse)                                      # [Np, Np]
    dv_ref[0] = jnp.dot(p.astype(do.dtype).T, do,
                        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)                   # [Np, Np]
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                 * scale).astype(dk_ref.dtype)


def _panel_spec(n_pad, D):
    return pl.BlockSpec((1, n_pad, D), lambda bh: (bh, 0, 0),
                        memory_space=pltpu.VMEM)


def _col_spec(n_pad):
    return pl.BlockSpec((1, n_pad, 1), lambda bh: (bh, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_impl(q, k, v, scale):
    B, H, N, D = q.shape
    n_pad = pl.cdiv(N, 128) * 128
    qf = _pad_tokens(q, n_pad).reshape(B * H, n_pad, D)
    kf = _pad_tokens(k, n_pad).reshape(B * H, n_pad, D)
    vf = _pad_tokens(v, n_pad).reshape(B * H, n_pad, D)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=float(scale), n=N),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad, 1), jnp.float32),
        ),
        grid=(B * H,),
        in_specs=[_panel_spec(n_pad, D)] * 3,
        out_specs=(_panel_spec(n_pad, D), _col_spec(n_pad)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=4 * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf)
    return out[:, :N].reshape(B, H, N, D), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale):
    """q/k/v [B,H,N,D] -> [B,H,N,D]; fused fwd+bwd, no HBM score residuals."""
    if q.shape[2] != k.shape[2]:
        raise ValueError("fused_attention expects N_q == N_kv; use "
                         "flash_attention for asymmetric lengths")
    if q.shape[2] > MAX_FUSED_TOKENS:
        raise ValueError(
            f"fused_attention holds one (batch, head) entirely in VMEM and "
            f"is capped at {MAX_FUSED_TOKENS} tokens (got {q.shape[2]}); "
            f"use the q-tiled flash_attention for long sequences")
    return _fwd_impl(q, k, v, scale)[0]


def _fa_fwd(q, k, v, scale):
    out, lse = _fwd_impl(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, res, do):
    q, k, v, out, lse = res
    B, H, N, D = q.shape
    n_pad = pl.cdiv(N, 128) * 128
    qf = _pad_tokens(q, n_pad).reshape(B * H, n_pad, D)
    kf = _pad_tokens(k, n_pad).reshape(B * H, n_pad, D)
    vf = _pad_tokens(v, n_pad).reshape(B * H, n_pad, D)
    dof = _pad_tokens(do, n_pad).reshape(B * H, n_pad, D)
    outf = _pad_tokens(out, n_pad).reshape(B * H, n_pad, D)
    delta = jnp.sum(dof.astype(jnp.float32) * outf.astype(jnp.float32),
                    axis=-1, keepdims=True)               # [BH, n_pad, 1]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=float(scale), n=N),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad, D), k.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad, D), v.dtype),
        ),
        grid=(B * H,),
        in_specs=[_panel_spec(n_pad, D)] * 4 + [_col_spec(n_pad)] * 2,
        out_specs=(_panel_spec(n_pad, D),) * 3,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * D,
            bytes_accessed=7 * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf, dof, lse, delta)
    trim = lambda x, d: x[:, :N].reshape(B, H, N, D).astype(d)
    return trim(dq, q.dtype), trim(dk, k.dtype), trim(dv, v.dtype)


fused_attention.defvjp(_fa_fwd, _fa_bwd)
