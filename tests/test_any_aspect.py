"""Non-square and portrait inputs: the same weights must serve any aspect
(transpose_to_landscape semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vista_slam_tpu.models.sta import (STA, STAConfig, init_params,
                                       predict_pair_any_aspect)

CFG = STAConfig(img_size=(64, 96), patch_size=16, enc_dim=64, enc_depth=1,
                enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                mlp_ratio=2, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def model_params():
    return init_params(CFG, seed=0)


def test_landscape_rect_shapes(model_params):
    model, params = model_params
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96, 3))
    out = model.apply(params, img, img)
    assert out["pts3d"].shape == (2, 64, 96, 3)
    assert np.isfinite(np.asarray(out["pts3d"])).all()


def test_portrait_transposes_back(model_params):
    model, params = model_params
    img1 = jax.random.normal(jax.random.PRNGKey(1), (1, 96, 64, 3))
    img2 = jax.random.normal(jax.random.PRNGKey(2), (1, 96, 64, 3))
    out = predict_pair_any_aspect(model, params, img1, img2)
    assert out["pts3d"].shape == (2, 96, 64, 3)
    assert out["conf"].shape == (2, 96, 64)
    # exact equivalence with manually transposed landscape prediction
    want = model.apply(params, jnp.swapaxes(img1, 1, 2), jnp.swapaxes(img2, 1, 2))
    np.testing.assert_allclose(np.asarray(out["pts3d"]),
                               np.asarray(jnp.swapaxes(want["pts3d"], 1, 2)),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["pose"]), np.asarray(want["pose"]),
                               atol=1e-6)


def test_mixed_forward_all_landscape_matches_plain():
    """mixed_forward with no portrait samples must equal the plain forward."""
    import jax.numpy as jnp
    import numpy as np

    from vista_slam_tpu.models.sta import STA, STAConfig

    cfg = STAConfig(img_size=(32, 48), patch_size=16, enc_dim=32, enc_depth=1,
                    enc_heads=2, dec_dim=32, dec_depth=4, dec_heads=2,
                    mlp_ratio=2, compute_dtype=jnp.float32)
    model = STA(cfg)
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))
    import jax

    params = model.init(jax.random.PRNGKey(0), img1, img2)
    plain = model.apply(params, img1, img2)
    mask = jnp.zeros(2, bool)
    mixed = model.apply(params, img1, img2, mask, mask,
                        method=STA.mixed_forward)
    np.testing.assert_allclose(np.asarray(mixed["pts3d"]),
                               np.asarray(plain["pts3d"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mixed["pose"]),
                               np.asarray(plain["pose"]), atol=1e-5)
