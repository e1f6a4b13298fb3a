"""mha_xla_bf16res: identical forward, bf16-accurate gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from vista_slam_tpu.ops.attention import mha, mha_xla, mha_xla_bf16res


def _qkv(seed=0, B=2, H=4, N=96, Dh=32, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, H, N, Dh)), dtype)
    return mk(), mk(), mk()


def test_forward_bit_identical():
    q, k, v = _qkv()
    a = mha_xla(q, k, v, 32 ** -0.5)
    b = mha_xla_bf16res(q, k, v, 32 ** -0.5)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_grads_match_autodiff_within_bf16():
    q, k, v = _qkv(seed=1)

    def loss(fn, q, k, v):
        out = fn(q, k, v, 32 ** -0.5)
        # non-uniform cotangent so dV/dP aren't trivially mean-like
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) % 7
        return jnp.sum(out.astype(jnp.float32) * w)

    g_ref = jax.grad(lambda *a: loss(mha_xla, *a), argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(lambda *a: loss(mha_xla_bf16res, *a),
                     argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g_new):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.linalg.norm(a)
        assert denom > 0
        rel = np.linalg.norm(a - b) / denom
        # bf16 probabilities bound the softmax-VJP error at ~2^-8
        assert rel < 2e-2, (name, rel)


def test_mha_dispatch_flag():
    q, k, v = _qkv(seed=2)
    a = mha(q, k, v, 32 ** -0.5, use_flash=False, bf16_grad=True)
    b = mha_xla(q, k, v, 32 ** -0.5)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_train_step_runs_with_bf16_grad():
    """The flag threads through STAConfig into a differentiable step."""
    from vista_slam_tpu.models.sta import STA, STAConfig, init_params_host

    cfg = STAConfig(img_size=(32, 32), patch_size=16, enc_dim=64, enc_depth=2,
                    enc_heads=2, dec_dim=64, dec_depth=2, dec_heads=2,
                    head_type="linear", attn_bf16_grad=True)
    model, params = init_params_host(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)

    def loss_fn(p):
        out = model.apply(p, img, img)
        return jnp.mean(out["pts3d"].astype(jnp.float32) ** 2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
