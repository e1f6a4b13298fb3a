"""Fused short-sequence training-attention kernel (ops/pallas/attn_train.py)
vs the einsum reference: forward and one-kernel-backward parity in interpret
mode, cap behavior, and the mha/STAConfig dispatch plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.ops.attention import mha, mha_xla


@pytest.mark.parametrize("n", [197, 130, 256])
def test_fused_forward_matches_xla(n):
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.pallas.attn_train import fused_attention

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 2, 3, 64
    q = jax.random.normal(kq, (B, H, n, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, n, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, n, D), jnp.float32)
    scale = D ** -0.5

    want = mha_xla(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = fused_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("n", [197, 130])
def test_fused_grads_match_xla(n):
    """dq/dk/dv from the single fused backward kernel must match autodiff of
    the einsum path (the training contract; reference trains through
    xformers' fused backward, sta_model/train.py:278)."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.pallas.attn_train import fused_attention

    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 2, 2, 64
    q = jax.random.normal(kq, (B, H, n, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, n, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, n, D), jnp.float32)
    scale = D ** -0.5
    w = jnp.sin(jnp.arange(D, dtype=jnp.float32))

    def f_ref(q, k, v):
        return (mha_xla(q, k, v, scale) * w).sum()

    def f_fused(q, k, v):
        return (fused_attention(q, k, v, scale) * w).sum()

    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    for g, gw, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gw), atol=5e-4,
                                   err_msg=f"d{name}")


def test_fused_caps_and_dispatch():
    from vista_slam_tpu.ops.pallas.attn_train import (MAX_FUSED_TOKENS,
                                                      fused_attention)

    D = 64
    big = jax.ShapeDtypeStruct((1, 1, MAX_FUSED_TOKENS + 1, D), jnp.float32)
    with pytest.raises(ValueError, match="capped"):
        jax.eval_shape(lambda q: fused_attention(q, q, q, 0.125), big)

    # asymmetric lengths refuse (cross-attention with mismatched memory)
    qa = jax.ShapeDtypeStruct((1, 1, 128, D), jnp.float32)
    ka = jax.ShapeDtypeStruct((1, 1, 256, D), jnp.float32)
    with pytest.raises(ValueError, match="N_q == N_kv"):
        jax.eval_shape(lambda q, k: fused_attention(q, k, k, 0.125), qa, ka)

    # mha dispatch: fused_train picks the fused kernel below the flash
    # threshold and falls back to einsum gracefully on asymmetric lengths
    from jax.experimental.pallas import tpu as pltpu

    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 2, 197, D), jnp.float32)
    kv = jax.random.normal(key, (1, 2, 260, D), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        sym = mha(q, q, q, 0.125, use_flash=False, fused_train=True)
        asym = mha(q, kv, kv, 0.125, use_flash=False, fused_train=True)
    np.testing.assert_allclose(np.asarray(sym),
                               np.asarray(mha_xla(q, q, q, 0.125)), atol=2e-5)
    np.testing.assert_allclose(np.asarray(asym),
                               np.asarray(mha_xla(q, kv, kv, 0.125)),
                               atol=2e-5)


def test_train_step_through_fused_attention():
    """A full tiny train step with cfg.attn_fused_train: loss finite,
    gradients flow, and the values match the einsum-attention step to
    kernel tolerance."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.models.sta import STA, STAConfig
    from vista_slam_tpu.train.step import make_loss_fn

    def run(fused):
        cfg = STAConfig(img_size=(32, 32), patch_size=8, enc_dim=32,
                        enc_depth=1, enc_heads=2, dec_dim=32, dec_depth=2,
                        dec_heads=2, mlp_ratio=2, head_type="linear",
                        compute_dtype=jnp.float32, attn_fused_train=fused)
        model = STA(cfg)
        B, S, H, W = 1, 1, *cfg.img_size
        rng = np.random.default_rng(0)
        img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
        simgs = rng.standard_normal((S, B, H, W, 3), dtype=np.float32)
        pts = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0
        view = {
            "pts3d_cam": pts,
            "valid_mask": np.ones((B, H, W), bool),
            "camera_pose": np.broadcast_to(np.eye(4, dtype=np.float32),
                                           (B, 4, 4)).copy(),
            "camera_intrinsics": np.broadcast_to(
                np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                         np.float32), (B, 3, 3)).copy(),
        }
        batch = {"main": {"img": img, **view}, "support_imgs": simgs,
                 "supports": {k: np.stack([v]) for k, v in view.items()}}
        with pltpu.force_tpu_interpret_mode():
            params = model.init(jax.random.PRNGKey(0), img, simgs,
                                method=STA.train_forward)
            loss_fn = make_loss_fn(model, n_support=S)
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, 0.4)
        return float(loss), grads

    loss_fused, grads_fused = run(True)
    loss_ref, grads_ref = run(False)
    assert np.isfinite(loss_fused)
    np.testing.assert_allclose(loss_fused, loss_ref, rtol=1e-4)
    for gf, gr in zip(jax.tree_util.tree_leaves(grads_fused),
                      jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-3, atol=2e-4)
