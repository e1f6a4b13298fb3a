"""Pallas attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.ops.attention import mha_xla


@pytest.mark.parametrize("nq,nk", [(197, 197), (130, 260)])
def test_flash_matches_xla(nq, nk, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.pallas import flash

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 2, 3, 64
    q = jax.random.normal(kq, (B, H, nq, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, nk, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, nk, D), jnp.float32)
    scale = D ** -0.5

    want = mha_xla(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash.flash_attention(q, k, v, scale, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("nq,nk", [(197, 197), (130, 260), (769, 769)])
def test_flash_grad_matches_xla(nq, nk):
    """The kernel must be trainable: the reference trains *through* its fused
    attention (xformers backward, reference: sta_model/train.py:278 with
    blocks/sta_blocks.py:143); our custom_vjp recomputes probabilities in two
    Pallas kernels. dq/dk/dv must match the einsum path."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.pallas import flash

    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 2, 3, 64
    q = jax.random.normal(kq, (B, H, nq, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, nk, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, nk, D), jnp.float32)
    scale = D ** -0.5
    w = jnp.sin(jnp.arange(D, dtype=jnp.float32))

    def f_ref(q, k, v):
        return (mha_xla(q, k, v, scale) * w).sum()

    def f_flash(q, k, v):
        return (flash.flash_attention(q, k, v, scale, block_q=128) * w).sum()

    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for g, gw, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gw), atol=5e-4,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("n", [1537, 3073])
def test_flash_envelope_beyond_769_tokens(n):
    """Round-3 verdict: hardware + CI evidence stopped at 769 tokens while
    the single-pass design claims 'a few thousand'. Pin forward AND grad
    parity at 1537 and 3073 tokens (512x768/16 and 768x1024/16 + pose
    token) in interpret mode; the >769-token on-device point lives in
    BASELINE.md."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.pallas import flash

    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    B, H, D = 1, 1, 64
    q = jax.random.normal(kq, (B, H, n, D), jnp.float32)
    k = jax.random.normal(kk, (B, H, n, D), jnp.float32)
    v = jax.random.normal(kv, (B, H, n, D), jnp.float32)
    scale = D ** -0.5
    w = jnp.cos(jnp.arange(D, dtype=jnp.float32))

    want = mha_xla(q, k, v, scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash.flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def f_ref(q):
        return (mha_xla(q, k, v, scale) * w).sum()

    def f_flash(q):
        return (flash.flash_attention(q, k, v, scale) * w).sum()

    want_g = jax.grad(f_ref)(q)
    with pltpu.force_tpu_interpret_mode():
        got_g = jax.grad(f_flash)(q)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               atol=5e-4)


def test_flash_vmem_envelope_fails_loudly():
    """Past the VMEM budget the kernel must refuse at trace time with an
    actionable error, not die inside Mosaic (or silently spill). The
    documented envelope at D=64/bf16/block 256: forward to ~39k tokens,
    training (backward) to ~21k."""
    from vista_slam_tpu.ops.pallas import flash

    D = 64
    ok, too_big = 20_000, 24_000

    def shapes(n):
        x = jax.ShapeDtypeStruct((1, 1, n, D), jnp.bfloat16)
        return x, x, x

    # forward estimator: fine at 20k AND 24k, refuses at 48k
    for n in (ok, too_big):
        jax.eval_shape(lambda q, k, v: flash.flash_attention(q, k, v, 0.125),
                       *shapes(n))
    with pytest.raises(ValueError, match="VMEM"):
        jax.eval_shape(lambda q, k, v: flash.flash_attention(q, k, v, 0.125),
                       *shapes(48_000))

    # backward estimator: fine at 20k, refuses at 24k
    def loss(q, k, v):
        return flash.flash_attention(q, k, v, 0.125).astype(jnp.float32).sum()

    jax.eval_shape(jax.grad(loss), *shapes(ok))
    with pytest.raises(ValueError, match="VMEM"):
        jax.eval_shape(jax.grad(loss), *shapes(too_big))


def test_mha_auto_dispatch_is_differentiable():
    """Regression for the round-2 hole: at >=512 tokens ``mha`` auto-selects
    the flash kernel (ops/attention.py) and jax.grad through it must work."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.ops.attention import mha

    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(ki, (1, 2, 513, 64), jnp.float32)
               for ki in jax.random.split(key, 3))

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda q: mha(q, k, v, 0.125, None).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_highres_train_step_through_flash():
    """A train step in the >=512-token regime (the high-res fine-tuning that
    configs/highres.yaml names as its weight provenance): tiny dims but 1025
    tokens, so the auto-dispatch genuinely picks the flash path, and the full
    loss/grad pipeline must produce finite gradients."""
    from jax.experimental.pallas import tpu as pltpu

    from vista_slam_tpu.models.sta import STA, STAConfig
    from vista_slam_tpu.train.step import make_loss_fn

    cfg = STAConfig(img_size=(128, 128), patch_size=4, enc_dim=16, enc_depth=1,
                    enc_heads=2, dec_dim=16, dec_depth=2, dec_heads=2,
                    mlp_ratio=2, head_type="linear", compute_dtype=jnp.float32)
    assert cfg.num_patches + 1 >= 512  # the regime under test
    model = STA(cfg)
    B, S, H, W = 1, 1, *cfg.img_size
    rng = np.random.default_rng(0)
    img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
    simgs = rng.standard_normal((S, B, H, W, 3), dtype=np.float32)

    def gt_view():
        pts = rng.standard_normal((B, H, W, 3)).astype(np.float32)
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0
        return {
            "pts3d_cam": pts,
            "valid_mask": np.ones((B, H, W), bool),
            "camera_pose": np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy(),
            "camera_intrinsics": np.broadcast_to(
                np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                         np.float32), (B, 3, 3)).copy(),
        }

    batch = {"main": {"img": img, **gt_view()},
             "support_imgs": simgs,
             "supports": {k: np.stack([v]) for k, v in gt_view().items()
                          if k != "img"}}

    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(0), img, simgs,
                            method=STA.train_forward)
        loss_fn = make_loss_fn(model, n_support=S)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, 0.4)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert flat and all(np.isfinite(np.asarray(g)).all() for g in flat)
    # and the gradient actually flows into the attention projections
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in flat)
    assert total > 0.0
