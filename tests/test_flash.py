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
