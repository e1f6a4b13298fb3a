"""Multi-head attention compute paths.

Two implementations behind one interface:
  * ``mha_xla`` — einsum attention; for the STA token counts (197 tokens at
    224x224/16) XLA fuses this competitively, and the fp32 softmax matches
    the numerics of the reference's xformers path (reference:
    vista_slam/sta_model/blocks/sta_blocks.py:129-148).
  * ``mha_flash`` — a Pallas TPU flash-attention kernel (ops/pallas/flash.py)
    for larger resolutions where the O(N^2) score matrix stops fitting VMEM.

Inputs are [B, H, N, Dh] (q, k, v already projected and RoPE-rotated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def mha_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale) -> jnp.ndarray:
    """Attention with fp32 logits/softmax, output in v.dtype. [B,H,N,Dh].

    NOT jax.checkpoint-ed: measured on v5e (batch-8 224x224 train step),
    rematerializing the fp32 score tensors made the step 3x SLOWER (147 ->
    440 ms) — the checkpoint boundary blocks XLA's fusion across the
    attention, which costs far more than the ~14 ms/step of score-tensor
    copies it saves. cfg.remat (whole-block checkpointing for batch 16+)
    remains the supported memory/compute trade."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, dtype=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def mha_xla_bf16res(q, k, v, scale):
    """`mha_xla` with bf16 BACKWARD residuals (identical forward numerics).

    Under plain autodiff of `mha_xla`, XLA saves the fp32 [B,H,N,N]
    probability tensor of every attention for the backward pass — the
    trace-measured "fp32 attention-score residual copies" slice of the
    training-step roofline (BASELINE.md, ~10% of the 147 ms batch-8 step).
    This custom_vjp saves the probabilities in bf16 instead (the same
    values the PV matmul consumes anyway at bf16 compute dtype) and
    recomputes the softmax VJP from them, at the cost of ~2^-8 relative
    error on d(logits) — the same error scale every other bf16 matmul in
    the model already injects (grad parity pinned in
    tests/test_attention_grads.py). Forward output is bit-identical to
    `mha_xla`. MEASURED NEUTRAL on v5e on both axes it was built for
    (BASELINE.md "Training-step roofline"): step time 149 vs 150 ms at
    batch 8 (the residual copies were already overlapped with MXU work)
    and peak memory 10.73 vs 10.74 GB temp at batch 16 no-remat — XLA's
    remat pass already compresses the fp32 residuals to bf16 on its own.
    Kept as a documented experiment; leave the flag off."""
    return _bf16res_fwd(q, k, v, scale)[0]


def _bf16res_fwd(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.asarray(scale, dtype=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype), (q, k, v, probs.astype(jnp.bfloat16))


def _bf16res_bwd(scale, res, ct):
    q, k, v, pb = res
    dv = jnp.einsum("bhqk,bhqd->bhkd", pb, ct,
                    preferred_element_type=jnp.float32).astype(v.dtype)
    dp = jnp.einsum("bhqd,bhkd->bhqk", ct, v,
                    preferred_element_type=jnp.float32)
    p32 = pb.astype(jnp.float32)
    # softmax VJP: dlogits = p * (dp - sum(dp * p)); fp32 arithmetic over
    # bf16-stored probabilities
    dlog = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    dlog = (dlog * jnp.asarray(scale, jnp.float32)).astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", dlog, k,
                    preferred_element_type=jnp.float32).astype(q.dtype)
    dk = jnp.einsum("bhqk,bhqd->bhkd", dlog, q,
                    preferred_element_type=jnp.float32).astype(k.dtype)
    return dq, dk, dv


mha_xla_bf16res.defvjp(_bf16res_fwd, _bf16res_bwd)


def mha(q, k, v, scale, use_flash: bool | None = None,
        bf16_grad: bool = False, fused_train: bool = False):
    """Dispatch between the XLA path and the Pallas kernels.

    ``use_flash=None`` picks flash automatically once the sequence is long
    enough for tiling to pay off. ``bf16_grad`` selects the bf16-residual
    backward (`mha_xla_bf16res`) on the einsum path; the Pallas kernels
    manage their own residuals. ``fused_train`` selects the short-sequence
    fused fwd+bwd Pallas kernel (ops/pallas/attn_train.py) below the flash
    threshold — built for the TRAINING step, where it removes the fp32
    [B,H,N,N] probability residuals autodiff of the einsum path saves.
    Measured on v5e (full decode+heads, BASELINE.md "flash vs einsum"): at
    197 tokens (224x224/16) einsum wins the forward (9.3 vs 11.5 ms/iter);
    at 769 tokens (384x512/16) flash wins 1.76x and at 1025 tokens 1.94x —
    the crossover sits between, threshold 512.
    """
    n = q.shape[-2]
    if use_flash is None:
        use_flash = n >= 512
    if use_flash:
        from .pallas.flash import flash_attention
        return flash_attention(q, k, v, scale)
    if fused_train and n == k.shape[-2]:
        from .pallas.attn_train import MAX_FUSED_TOKENS, fused_attention
        if n <= MAX_FUSED_TOKENS:
            return fused_attention(q, k, v, float(scale))
    if bf16_grad:
        return mha_xla_bf16res(q, k, v, float(scale))
    return mha_xla(q, k, v, scale)
