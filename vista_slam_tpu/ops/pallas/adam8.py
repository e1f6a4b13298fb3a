"""Fused AdamW update kernel with compressed moment state (Pallas TPU).

The trace-backed training roofline (BASELINE.md) attributes ~12.5% of the
batch-8 train step to memory-bound loop fusions, dominated by AdamW's fp32
state traffic: the XLA chain reads g/mu/nu/p and writes mu/nu/p in fp32
(~32 B/param/step of HBM at the 819 GB/s roofline). Storing the moments
compressed helps memory but NOT time under XLA when re-quantization needs
a per-block max *reduction*: that splits the update into several fusions
that re-materialize the fp32 moments (measured: the XLA int8 path is 7 ms
SLOWER per step than fp32, 130 vs 123 ms — BASELINE.md "Optimizer state").
The same sweep measured this kernel's int8 mode at 122-127 ms (the reduction
splits removed) and the PLAIN-XLA bf16 carrier at 118 ms — a dtype cast
needs no reduction, so XLA already fuses it single-pass. Verdict: bf16 is
the throughput default; this kernel's int8 mode is the memory knob (moment
state at the 2.65 GB floor at ~fp32 speed).

This kernel is the single-pass formulation XLA cannot produce: one grid
step streams a row-tile of (g, p, moment state) through VMEM and performs
clip-scale -> moment update -> bias correction -> weight decay -> param
update -> re-quantization locally, so each array is read and written
exactly once per step:

  * ``int8``: moments stored as int8 codes + one fp32 scale per 1024
    contiguous elements (blockwise quantization in the style of Dettmers
    et al., 8-bit Optimizers — see PAPERS.md): linear max-abs codes for
    the signed mu, LOG-domain codes for the non-negative nu (see
    NU_LOG_RANGE). ~18 B/param/step of traffic, 3 B/param state.
  * ``bf16``: moments stored bfloat16, no scales. ~24 B/param/step,
    4 B/param state.

The reference trains the same AdamW(0.9, 0.95) in fp32 under torch DDP/AMP
(reference: vista_slam/sta_model/train.py:403-404); the update math here is
identical to optax's chain(clip_by_global_norm, adamw) up to the moment
storage rounding, and tests/test_quantized_opt.py pins single-step and
trajectory parity against that chain.

Layout contract (host side, train/quantized_opt.py): a leaf of N elements
is viewed as [C, QBLOCK] rows (N must divide QBLOCK; others take the fp32
fallback path). The grid tiles ROWS_PER_STEP rows per step; the last block
may be ragged (Pallas masks out-of-bounds reads/writes; scale rows only
exist for real rows, and quantization is row-local, so padding garbage
never reaches real state).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 1024        # quantization block = one row of the [C, QBLOCK] view
# rows per grid step (1 MB fp32 per streamed array). 512 rows overflow the
# 16 MB scoped-VMEM stack on real Mosaic once the double-buffered in/out
# tiles are summed (measured on v5e: bf16 kernel 16.10M > 16M limit); 256
# compiles with headroom and the kernel is HBM-streaming, so smaller tiles
# pipeline at the same bandwidth.
ROWS_PER_STEP = 256

# nu is quantized GEOMETRICALLY: code c in [1,127] maps to
# scale * exp((c-127) * NU_LOG_RANGE / 126), code 0 maps to exactly 0.
# Linear codes starve small-variance coordinates inside a 1024-block (their
# relative error approaches 100% and Adam's u = m/sqrt(v) explodes); log
# codes give a uniform ~5.5% relative error across 6 decades, and values
# below scale*e^-R round UP to the floor — which DAMPS those updates
# instead of amplifying them (the conservative direction).
NU_LOG_RANGE = 13.8155  # ln(1e6)


def _adam_kernel_int8(scal_ref, g_ref, p_ref, muq_ref, mus_ref, nuq_ref,
                      nus_ref, pout_ref, muq_out, mus_out, nuq_out, nus_out,
                      *, b1: float, b2: float, eps: float, wd: float):
    coef = scal_ref[0]   # global-norm clip coefficient
    lr = scal_ref[1]
    c1 = scal_ref[2]     # 1 - b1**t
    c2 = scal_ref[3]     # 1 - b2**t

    g = g_ref[:].astype(jnp.float32) * coef
    mu = muq_ref[:].astype(jnp.float32) * mus_ref[:]
    nc = nuq_ref[:].astype(jnp.float32)
    k = NU_LOG_RANGE / 126.0
    nu = jnp.where(nc > 0.0, nus_ref[:] * jnp.exp((nc - 127.0) * k), 0.0)

    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * g * g

    u = (mu / c1) / (jnp.sqrt(nu / c2) + eps)  # optax's exact denominator
    p = p_ref[:].astype(jnp.float32)
    pout_ref[:] = (p - lr * (u + wd * p)).astype(pout_ref.dtype)

    ms = jnp.maximum(jnp.max(jnp.abs(mu), axis=1, keepdims=True), 1e-10) / 127.0
    muq_out[:] = jnp.round(mu / ms).astype(jnp.int8)
    mus_out[:] = ms
    ss = jnp.maximum(jnp.max(nu, axis=1, keepdims=True), 1e-30)
    logc = 127.0 + jnp.log(jnp.maximum(nu, 1e-38) / ss) / k
    nuq_out[:] = jnp.clip(jnp.round(logc), 1.0, 127.0).astype(jnp.int8)
    nus_out[:] = ss


def _adam_kernel_bf16(scal_ref, g_ref, p_ref, mu_ref, nu_ref,
                      pout_ref, mu_out, nu_out,
                      *, b1: float, b2: float, eps: float, wd: float):
    coef = scal_ref[0]
    lr = scal_ref[1]
    c1 = scal_ref[2]
    c2 = scal_ref[3]

    g = g_ref[:].astype(jnp.float32) * coef
    mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * g * g
    u = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
    p = p_ref[:].astype(jnp.float32)
    pout_ref[:] = (p - lr * (u + wd * p)).astype(pout_ref.dtype)
    mu_out[:] = mu.astype(jnp.bfloat16)
    nu_out[:] = nu.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd",
                                             "interpret"))
def fused_adamw_int8(p, g, mu_q, mu_s, nu_q, nu_s, scalars, *,
                     b1: float, b2: float, eps: float, wd: float,
                     interpret: bool = False):
    """One fused AdamW step for one leaf with int8 moment state.

    p, g: [N] fp32 (flat); mu_q/nu_q: [C, QBLOCK] int8; mu_s/nu_s: [C, 1]
    fp32; scalars: [4] fp32 = (clip_coef, lr, 1-b1^t, 1-b2^t).
    Returns (p_new, mu_q', mu_s', nu_q', nu_s').
    """
    n = p.size
    C = n // QBLOCK
    assert C * QBLOCK == n and mu_q.shape == (C, QBLOCK)
    grid = pl.cdiv(C, ROWS_PER_STEP)

    row = lambda i: (i, 0)
    dat = pl.BlockSpec((ROWS_PER_STEP, QBLOCK), row, memory_space=pltpu.VMEM)
    scl = pl.BlockSpec((ROWS_PER_STEP, 1), row, memory_space=pltpu.VMEM)

    kernel = functools.partial(_adam_kernel_int8, b1=b1, b2=b2, eps=eps,
                               wd=wd)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            dat, dat,                               # g, p
            dat, scl, dat, scl,
        ],
        out_specs=[dat, dat, scl, dat, scl],
        out_shape=[
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.float32),
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.int8),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.int8),
            jax.ShapeDtypeStruct((C, 1), jnp.float32),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4},
        interpret=interpret,
    )(scalars, g.reshape(C, QBLOCK), p.reshape(C, QBLOCK),
      mu_q, mu_s, nu_q, nu_s)
    p_new = out[0].reshape(p.shape)
    return (p_new,) + tuple(out[1:])


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd",
                                             "interpret"))
def fused_adamw_bf16(p, g, mu, nu, scalars, *, b1: float, b2: float,
                     eps: float, wd: float, interpret: bool = False):
    """One fused AdamW step for one leaf with bf16 moment state.

    p, g: [N] fp32 (flat); mu/nu: [C, QBLOCK] bf16; scalars as above.
    Returns (p_new, mu', nu').
    """
    n = p.size
    C = n // QBLOCK
    assert C * QBLOCK == n and mu.shape == (C, QBLOCK)
    grid = pl.cdiv(C, ROWS_PER_STEP)

    row = lambda i: (i, 0)
    dat = pl.BlockSpec((ROWS_PER_STEP, QBLOCK), row, memory_space=pltpu.VMEM)

    kernel = functools.partial(_adam_kernel_bf16, b1=b1, b2=b2, eps=eps,
                               wd=wd)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  dat, dat, dat, dat],
        out_specs=[dat, dat, dat],
        out_shape=[
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.float32),
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.bfloat16),
            jax.ShapeDtypeStruct((C, QBLOCK), jnp.bfloat16),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, g.reshape(C, QBLOCK), p.reshape(C, QBLOCK), mu, nu)
    return out[0].reshape(p.shape), out[1], out[2]
