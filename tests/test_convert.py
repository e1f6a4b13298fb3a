"""Checkpoint-conversion parity: a torch model with the reference state-dict
layout is converted via models/convert.py and must reproduce the torch
forward in JAX to fp32 tolerance."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_ref import TorchSTA
from vista_slam_tpu.models.convert import (convert_state_dict, flatten_params,
                                           load_params_npz, save_params_npz,
                                           unflatten_params)
from vista_slam_tpu.models.sta import STA, STAConfig


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tm = TorchSTA(img=64, patch=16, ed=64, edep=2, eh=4, dd=48, ddep=4, dh=4)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, enc_depth=2, dec_depth=4)
    cfg = STAConfig(img_size=(64, 64), patch_size=16, enc_dim=64, enc_depth=2,
                    enc_heads=4, dec_dim=48, dec_depth=4, dec_heads=4,
                    mlp_ratio=2, compute_dtype=jnp.float32)
    jm = STA(cfg)
    return tm, jm, params


def test_converted_forward_matches_torch(pair):
    tm, jm, params = pair
    rng = np.random.default_rng(0)
    img1 = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    img2 = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        tout = tm(torch.from_numpy(img1).permute(0, 3, 1, 2),
                  torch.from_numpy(img2).permute(0, 3, 1, 2))

    jout = jm.apply(params, jnp.asarray(img1), jnp.asarray(img2))
    B = 2
    np.testing.assert_allclose(np.asarray(jout["pts3d"][:B]),
                               tout["pts3d_i"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["pts3d"][B:]),
                               tout["pts3d_j"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["conf"][:B]),
                               tout["conf_i"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["pose"][:B]),
                               tout["pose_i"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["pose"][B:]),
                               tout["pose_j"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["pose_conf"][:B]),
                               tout["pose_conf_i"].numpy(), atol=1e-3)


def test_npz_roundtrip(tmp_path, pair):
    _, _, params = pair
    p = str(tmp_path / "w.npz")
    save_params_npz(p, params)
    loaded = load_params_npz(p)
    flat_a = flatten_params(params)
    flat_b = flatten_params(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_unflatten_inverts_flatten():
    tree = {"a": {"b": np.ones(3), "c": {"d": np.zeros(2)}}, "e": np.arange(4)}
    flat = flatten_params(tree)
    back = unflatten_params(flat)
    assert set(flat) == {"a/b", "a/c/d", "e"}
    np.testing.assert_array_equal(back["a"]["c"]["d"], tree["a"]["c"]["d"])
