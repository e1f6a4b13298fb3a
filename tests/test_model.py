import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.models.sta import STA, STAConfig, init_params, param_count

TINY = STAConfig(img_size=(64, 64), patch_size=16, enc_dim=64, enc_depth=2,
                 enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                 mlp_ratio=2, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def tiny_model():
    return init_params(TINY, seed=0)


def test_full_forward_shapes(tiny_model):
    model, params = tiny_model
    key = jax.random.PRNGKey(1)
    img1 = jax.random.normal(key, (2, 64, 64, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    out = model.apply(params, img1, img2)
    assert out["pts3d"].shape == (4, 64, 64, 3)
    assert out["conf"].shape == (4, 64, 64)
    assert out["pose"].shape == (4, 4, 4)
    assert out["pose_conf"].shape == (4,)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # conf mode ('exp', 1, inf): conf > 1 everywhere
    assert float(out["conf"].min()) > 1.0
    # pose is rigid: R orthonormal, last row (0,0,0,1)
    R = np.asarray(out["pose"][:, :3, :3])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pose"][:, 3]), [[0, 0, 0, 1]] * 4, atol=1e-6)


def test_swap_symmetry(tiny_model):
    """decode(f1, f2) direction-2 outputs == decode(f2, f1) direction-1:
    the batched symmetric decoder must treat both streams identically."""
    model, params = tiny_model
    f1 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 64))
    f2 = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 64))
    out_a = model.apply(params, f1, f2, method=STA.decode_and_heads)
    out_b = model.apply(params, f2, f1, method=STA.decode_and_heads)
    np.testing.assert_allclose(np.asarray(out_a["pts3d"][1]),
                               np.asarray(out_b["pts3d"][0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_a["pose"][1]),
                               np.asarray(out_b["pose"][0]), atol=1e-4)


def test_param_count_full_size():
    """The full-size config must have ViT-L-scale parameters (same
    architecture family as the reference: 24x1024 encoder + 12x768 decoder)."""
    cfg = STAConfig()
    # count without instantiating the full model: use shape inference via
    # jax.eval_shape to avoid allocating 1.3GB in the test
    model = STA(cfg)
    dummy = jnp.zeros((1, 224, 224, 3))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), dummy, dummy))
    n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(shapes))
    # 24x1024 encoder (~302M) + 12x768 dual-attention decoder (~86M) +
    # embeds + DPT + pose head ~= 437M
    assert 400e6 < n < 500e6, f"unexpected param count {n/1e6:.1f}M"


def test_rope_matches_independent_reference():
    """RoPE2D against a direct numpy transcription of the rotation formula."""
    from vista_slam_tpu.ops.rope2d import apply_rope2d, rope2d_tables

    rng = np.random.default_rng(0)
    nh, nw, dh = 3, 4, 8
    tok = rng.standard_normal((1, 2, 1 + nh * nw, dh)).astype(np.float32)
    cos, sin = rope2d_tables(nh, nw, dh, base=100.0, n_special=1)
    got = np.asarray(apply_rope2d(jnp.asarray(tok), cos, sin))

    # independent reference: split dim in (y, x) halves, rotate each half by
    # angle pos * (base ** (-k/(dh//4)))
    pos = [(-1, -1)] + [(y, x) for y in range(nh) for x in range(nw)]
    d = dh // 2
    q = d // 2
    inv_freq = 1.0 / (100.0 ** (np.arange(q) / q))
    want = np.empty_like(tok)
    for n, (py, px) in enumerate(pos):
        for axis, p in ((0, py), (1, px)):
            half = tok[..., n, axis * d:(axis + 1) * d]
            c = np.cos(p * inv_freq)
            s = np.sin(p * inv_freq)
            cc = np.concatenate([c, c])
            ss = np.concatenate([s, s])
            rot = np.concatenate([-half[..., q:], half[..., :q]], -1)
            want[..., n, axis * d:(axis + 1) * d] = half * cc + rot * ss
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    from vista_slam_tpu.utils.image_ops import resize_bilinear

    x = np.random.default_rng(1).standard_normal((2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (14, 18), align_corners=True))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 18),
                         mode="bilinear", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_svd_orthogonalize_matches_torch_reference():
    """SVD orthogonalization against a direct torch transcription of the
    reference formula (heads/pose_head.py:38-57)."""
    import torch

    from vista_slam_tpu.models.heads import svd_orthogonalize

    rng = np.random.default_rng(2)
    m = rng.standard_normal((8, 9)).astype(np.float32)
    got = np.asarray(svd_orthogonalize(jnp.asarray(m)))

    mt = torch.from_numpy(m).reshape(-1, 3, 3)
    mt = torch.nn.functional.normalize(mt, p=2, dim=-1).transpose(-1, -2)
    u, s, v = torch.svd(mt)
    det = torch.det(torch.matmul(v, u.transpose(-2, -1)))
    want = torch.matmul(
        torch.cat([v[:, :, :-1], v[:, :, -1:] * det.view(-1, 1, 1)], dim=2),
        u.transpose(-2, -1)).numpy()
    # SVD sign conventions can differ between backends; the projected
    # rotation must nonetheless be identical.
    np.testing.assert_allclose(got, want, atol=1e-4)
    eye = got @ got.transpose(0, 2, 1)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(got), 1.0, atol=1e-5)


def test_remat_matches_plain_gradients(tiny_model):
    """cfg.remat=True (gradient checkpointing) must not change values or
    gradients, only the backward-pass memory schedule."""
    import dataclasses

    model, params = tiny_model
    model_r = STA(dataclasses.replace(TINY, remat=True))

    rng = np.random.default_rng(7)
    img1 = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)

    def loss(m):
        def f(p):
            out = m.apply(p, img1, img2)
            return (out["pts3d"].mean() + out["conf"].mean()
                    + out["pose"].mean() + out["pose_conf"].mean())
        return f

    l0, g0 = jax.value_and_grad(loss(model))(params)
    l1, g1 = jax.value_and_grad(loss(model_r))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    # remat recomputes through different fusions, so reduction order (and
    # thus fp32 rounding) legitimately differs; worst observed is ~2e-4 abs
    # on the patch-embed kernel gradient (a b*gh*gw-long contraction whose
    # split differs between the remat and plain programs) against O(1)
    # gradient magnitudes — rounding, not a remat bug
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=5e-4),
        g0, g1)


def test_patchify_embed_matches_conv():
    """PatchifyEmbed computes the reference's Conv2d(k=P, s=P) patch
    projection as space-to-depth + matmul (a 3-channel stride-P conv runs
    at ~9 TF/s on the MXU; the matmul at full rate — BASELINE.md encoder
    roofline). Same param pytree, same numerics."""
    import flax.linen as nn

    from vista_slam_tpu.models.sta import PatchifyEmbed

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 48, 3)), jnp.float32)
    conv = nn.Conv(32, (16, 16), strides=(16, 16), dtype=jnp.float32,
                   name="patch_embed")
    pe = PatchifyEmbed(32, 16, jnp.float32, name="patch_embed")
    pc = conv.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(pc)
            == jax.tree_util.tree_structure(pe.init(jax.random.PRNGKey(1), x)))
    # conv-initialized params straight through the matmul formulation
    np.testing.assert_allclose(np.asarray(pe.apply(pc, x)),
                               np.asarray(conv.apply(pc, x)),
                               rtol=1e-5, atol=1e-5)


def test_gelu_approx_close_and_differentiable(tiny_model):
    """cfg.gelu_approx swaps the MLPs' exact-erf GELU for the tanh
    approximation (a perf knob — BASELINE.md encoder roofline). Same
    params must produce close-but-not-identical outputs, and the full
    two-view forward must stay differentiable and finite."""
    import dataclasses

    model, params = tiny_model
    model_a = STA(dataclasses.replace(TINY, gelu_approx=True))

    rng = np.random.default_rng(11)
    img1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)

    out_e = model.apply(params, img1, img2)
    out_a = model_a.apply(params, img1, img2)
    ref = np.asarray(out_e["pts3d"], np.float64)
    got = np.asarray(out_a["pts3d"], np.float64)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel > 0, "approximate GELU must actually change the activations"
    assert rel < 2e-2, f"tanh-GELU drift too large: {rel}"

    def loss(p):
        out = model_a.apply(p, img1, img2)
        return out["pts3d"].mean() + out["conf"].mean()

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_head_bf16_close_and_differentiable(tiny_model):
    """cfg.head_bf16 runs the DPT conv pyramid in bf16 (fp32 params, fp32
    output — a training-throughput knob, BASELINE.md). Same params must
    produce close outputs, fp32 output dtype, and finite gradients."""
    import dataclasses

    model, params = tiny_model
    model_h = STA(dataclasses.replace(TINY, head_bf16=True))

    rng = np.random.default_rng(13)
    img1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)

    out_e = model.apply(params, img1, img2)
    out_h = model_h.apply(params, img1, img2)
    assert out_h["pts3d"].dtype == jnp.float32
    ref = np.asarray(out_e["pts3d"], np.float64)
    got = np.asarray(out_h["pts3d"], np.float64)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel > 0, "bf16 head must actually change the numerics"
    assert rel < 5e-2, f"bf16 head drift too large: {rel}"
    # pose head stays fp32 — poses must be much tighter than the pointmap
    np.testing.assert_allclose(np.asarray(out_h["pose"]),
                               np.asarray(out_e["pose"]), atol=1e-2)

    def loss(p):
        out = model_h.apply(p, img1, img2)
        return out["pts3d"].mean() + out["conf"].mean()

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)
