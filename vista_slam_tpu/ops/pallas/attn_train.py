"""Pallas TPU training-attention kernel specialized for SHORT sequences
(the STA regime: 197 tokens at 224x224/16).

Motivation (trace-backed, BASELINE.md "training-step roofline"): under plain
autodiff the einsum attention path costs the batch-8 train step ~13 ms —
~10 ms of score/softmax/PV ops plus ~3 ms of fp32 [B,H,N,N] probability
copies saved for the backward. This kernel removes the residual traffic
entirely and collapses the backward into ONE Pallas kernel.

MEASURED OUTCOME (v5e, paired same-session A/B 2026-08-19, BASELINE.md
"fused training attention"): the kernel LOSES to the einsum path on the
batch-8 224x224 train step at every group size (158 ms best vs 150 ms
einsum) — the fp32 residual copies it eliminates were already overlapped
with MXU work (the same reason attn_bf16_grad measured speed-neutral), and
~100 Pallas custom calls per step each break XLA fusion with the
surrounding RoPE/projection ops. What it does deliver is MEMORY: 0.60 GB
less XLA temp arena (8.48 vs 9.08 GB). It therefore stays opt-in
(STAConfig.attn_fused_train) as a memory knob, NOT the training default:

  * forward: each grid step processes a GROUP of (batch, head) slices —
    the whole token set fits in VMEM at these lengths — producing out and
    the log-sum-exp. Grouping matters: one (batch, head) at 197 tokens is
    ~17 MFLOP, far too little to amortize a grid step, and the first
    (ungrouped) formulation measured SLOWER than einsum end-to-end
    (168 vs 150 ms batch-8 step, ABBA 2026-08-19) for exactly that reason.
  * backward: one grid step per group recomputes the probabilities from
    (q, k, lse) and emits dq, dk, dv together; the [N, N] score matrix
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

# One grid step's whole problem must fit in VMEM: the backward holds
# q/k/v/do/dq/dk/dv panels [G, Np, D] plus four fp32 [G, Np, Np]
# score-sized intermediates; at G=8 and 1024 tokens that is ~140 MB — past
# VMEM. The cap keeps the worst case (with the group-size reduction below)
# comfortable; past it, dispatch to the q-tiled flash kernel instead
# (ops/attention.py does).
MAX_FUSED_TOKENS = 1024

# (batch, head) slices fused into one grid step. Measured batch-8 train-step
# ladder on v5e (2026-08-19, einsum baseline 150 ms): G=1 168 ms, G=8
# 158 ms, G=32 171 ms — G=8 is the optimum (big enough to amortize the
# per-grid-step pipeline overhead, small enough that the fp32 [G, Np, Np]
# intermediates stay cheap and the grid still pipelines). Full analysis in
# BASELINE.md "fused training attention".
_GROUP = 8


# Mosaic's default scoped-VMEM stack is 16 MB — far below the physical
# 128 MB — and the grouped backward's four fp32 [G, Np, Np] intermediates
# blow through it at G=32 (measured compile OOM 2026-08-19: "21.13M vs
# limit 16.00M"). Raise the cap explicitly and budget the group size
# against it, leaving headroom for the double-buffered qkv/do panels.
_VMEM_LIMIT = 100 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _group_for(bh: int, n_pad: int) -> int:
    g = _GROUP
    # keep the backward's four fp32 score intermediates within the raised
    # scoped-VMEM cap (panels + double buffering take the rest)
    while g > 1 and g * n_pad * n_pad * 4 * 4 > 64 * 1024 * 1024:
        g //= 2
    while bh % g:
        g //= 2
    return g


def _pad_tokens(x, n_pad):
    pad = n_pad - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


# [G,N,D] x [G,M,D] -> [G,N,M] (contract D, batch G)
_QKT = (((2,), (2,)), ((0,), (0,)))
# [G,N,M] x [G,M,D] -> [G,N,D] (contract M, batch G)
_PV = (((2,), (1,)), ((0,), (0,)))
# [G,N,M] x [G,N,D] -> [G,M,D] (contract N = transpose-first, batch G)
_PT_DO = (((1,), (1,)), ((0,), (0,)))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, n: int):
    q = q_ref[...]  # [G, Np, D]
    k = k_ref[...]
    v = v_ref[...]
    s = _dot(q, k, _QKT) * scale  # [G, Np, Np] fp32
    if n < k.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = (_dot(p.astype(v.dtype), v, _PV) / denom).astype(o_ref.dtype)
    lse_ref[...] = m + jnp.log(denom)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, n: int):
    q = q_ref[...]          # [G, Np, D]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    lse = lse_ref[...]      # [G, Np, 1]
    delta = delta_ref[...]  # [G, Np, 1]
    s = _dot(q, k, _QKT) * scale
    if n < k.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n, s, -jnp.inf)
    p = jnp.exp(s - lse)                                    # [G, Np, Np]
    dv_ref[...] = _dot(p.astype(do.dtype), do, _PT_DO).astype(dv_ref.dtype)
    dp = _dot(do, v, _QKT)
    ds = (p * (dp - delta)).astype(q.dtype)                 # [G, Np, Np]
    dq_ref[...] = (_dot(ds, k, _PV) * scale).astype(dq_ref.dtype)
    dk_ref[...] = (_dot(ds, q, _PT_DO) * scale).astype(dk_ref.dtype)


def _panel_spec(g, n_pad, D):
    return pl.BlockSpec((g, n_pad, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _col_spec(g, n_pad):
    return pl.BlockSpec((g, n_pad, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_impl(q, k, v, scale):
    B, H, N, D = q.shape
    n_pad = pl.cdiv(N, 128) * 128
    g = _group_for(B * H, n_pad)
    qf = _pad_tokens(q, n_pad).reshape(B * H, n_pad, D)
    kf = _pad_tokens(k, n_pad).reshape(B * H, n_pad, D)
    vf = _pad_tokens(v, n_pad).reshape(B * H, n_pad, D)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=float(scale), n=N),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, n_pad, 1), jnp.float32),
        ),
        grid=(B * H // g,),
        in_specs=[_panel_spec(g, n_pad, D)] * 3,
        out_specs=(_panel_spec(g, n_pad, D), _col_spec(g, n_pad)),
        compiler_params=_COMPILER_PARAMS,
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
            f"fused_attention holds one (batch, head) group entirely in VMEM "
            f"and is capped at {MAX_FUSED_TOKENS} tokens (got {q.shape[2]}); "
            f"use the q-tiled flash_attention for long sequences")
    return _fwd_impl(q, k, v, scale)[0]


def _fa_fwd(q, k, v, scale):
    out, lse = _fwd_impl(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, res, do):
    q, k, v, out, lse = res
    B, H, N, D = q.shape
    n_pad = pl.cdiv(N, 128) * 128
    g = _group_for(B * H, n_pad)
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
        grid=(B * H // g,),
        in_specs=[_panel_spec(g, n_pad, D)] * 4 + [_col_spec(g, n_pad)] * 2,
        out_specs=(_panel_spec(g, n_pad, D),) * 3,
        compiler_params=_COMPILER_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * D,
            bytes_accessed=7 * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf, dof, lse, delta)
    trim = lambda x, d: x[:, :N].reshape(B, H, N, D).astype(d)
    return trim(dq, q.dtype), trim(dk, k.dtype), trim(dv, v.dtype)


fused_attention.defvjp(_fa_fwd, _fa_bwd)
