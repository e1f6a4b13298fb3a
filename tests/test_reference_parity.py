"""Full-forward numerical parity against the ACTUAL reference model.

Unlike test_convert.py (which checks against tests/torch_ref.py, a
re-transcription), these tests import /root/reference/vista_slam's own
SymmetricTwoViewAssociation (via the plain-torch xformers stub in
reference_oracle.py), randomly initialize it, convert its state dict with
models/convert.py, and require the JAX rebuild to reproduce pts3d / conf /
pose / pose_conf on the slam.py:142-189 inference path. A deviation anywhere
in patch embed, RoPE, encoder/decoder blocks, DPT reassembly, or heads fails
here even if both transcriptions share a bug.

Reduced config runs in CI (dec_depth must stay >9: the reference DPT head
asserts it, reference heads/dpt_head.py:103). The full-size 24x1024/12x768
config at 224x224 runs when VSLAM_FULL_PARITY=1 (minutes on the 1-core CI
host); its result is recorded in PARITY.md.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_oracle import load_reference_sta, reference_pair_forward
from vista_slam_tpu.models.convert import convert_state_dict
from vista_slam_tpu.models.sta import STA, STAConfig


def _parity_case(img, enc_dim, enc_depth, enc_heads, dec_dim, dec_depth,
                 dec_heads, mlp_ratio, batch=2, seed=0,
                 atol_pts=2e-3, atol_pose=2e-3):
    torch.manual_seed(seed)
    tm = load_reference_sta(
        img_size=(img, img), patch_size=16,
        enc_embed_dim=enc_dim, enc_depth=enc_depth, enc_num_heads=enc_heads,
        dec_embed_dim=dec_dim, dec_depth=dec_depth, dec_num_heads=dec_heads,
        mlp_ratio=mlp_ratio)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, enc_depth=enc_depth, dec_depth=dec_depth)

    cfg = STAConfig(img_size=(img, img), patch_size=16, enc_dim=enc_dim,
                    enc_depth=enc_depth, enc_heads=enc_heads, dec_dim=dec_dim,
                    dec_depth=dec_depth, dec_heads=dec_heads,
                    mlp_ratio=mlp_ratio, compute_dtype=jnp.float32)
    jm = STA(cfg)

    rng = np.random.default_rng(seed)
    img1 = rng.standard_normal((batch, img, img, 3)).astype(np.float32)
    img2 = rng.standard_normal((batch, img, img, 3)).astype(np.float32)

    tout = reference_pair_forward(
        tm, torch.from_numpy(img1).permute(0, 3, 1, 2),
        torch.from_numpy(img2).permute(0, 3, 1, 2))
    jout = jm.apply(params, jnp.asarray(img1), jnp.asarray(img2))

    B = batch
    np.testing.assert_allclose(np.asarray(jout["pts3d"][:B]),
                               tout["pts3d_i"].numpy(), atol=atol_pts)
    np.testing.assert_allclose(np.asarray(jout["pts3d"][B:]),
                               tout["pts3d_j"].numpy(), atol=atol_pts)
    np.testing.assert_allclose(np.asarray(jout["conf"][:B]),
                               tout["conf_i"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["conf"][B:]),
                               tout["conf_j"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["pose"][:B]),
                               tout["pose_i"].numpy(), atol=atol_pose)
    np.testing.assert_allclose(np.asarray(jout["pose"][B:]),
                               tout["pose_j"].numpy(), atol=atol_pose)
    np.testing.assert_allclose(np.asarray(jout["pose_conf"][:B]),
                               tout["pose_conf_i"].numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["pose_conf"][B:]),
                               tout["pose_conf_j"].numpy(), atol=1e-3)


def test_reference_parity_reduced():
    """64x64 / enc 64x2 / dec 48x12 (dec_depth>9 required by the reference
    DPT factory) — the real reference code is the oracle."""
    _parity_case(img=64, enc_dim=64, enc_depth=2, enc_heads=4,
                 dec_dim=48, dec_depth=12, dec_heads=4, mlp_ratio=2)


def test_reference_parity_mixed_aspect():
    """Mixed portrait/landscape batch vs the reference's ManyAR_PatchEmbed +
    transpose_to_landscape path (patch_embed.py:40-68, utils/misc.py:36-78).
    Non-square 64x96 buffer; sample 0 landscape, sample 1 portrait (stored
    transposed)."""
    torch.manual_seed(1)
    Hh, Ww = 64, 96
    tm = load_reference_sta(
        img_size=(Hh, Ww), patch_size=16,
        enc_embed_dim=64, enc_depth=2, enc_num_heads=4,
        dec_embed_dim=48, dec_depth=12, dec_num_heads=4, mlp_ratio=2,
        patch_embed_cls="ManyAR_PatchEmbed")
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd, enc_depth=2, dec_depth=12)

    cfg = STAConfig(img_size=(Hh, Ww), patch_size=16, enc_dim=64, enc_depth=2,
                    enc_heads=4, dec_dim=48, dec_depth=12, dec_heads=4,
                    mlp_ratio=2, compute_dtype=jnp.float32)
    jm = STA(cfg)

    rng = np.random.default_rng(1)
    img1 = rng.standard_normal((2, Hh, Ww, 3)).astype(np.float32)
    img2 = rng.standard_normal((2, Hh, Ww, 3)).astype(np.float32)
    # sample 0 landscape (64, 96); sample 1 portrait (96, 64), stored
    # transposed in the landscape buffer
    ts = torch.tensor([[Hh, Ww], [Ww, Hh]])

    t1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
    with torch.no_grad():
        f1, p1 = tm._encode_image(t1, ts, normalize=False)
        f2, p2 = tm._encode_image(t2, ts, normalize=False)
        d12, d21 = tm._decode_stereo(f1, f2, p1, p2)
        pose12 = tm.head_pose_s(d12[-1][:, 0, :])
        in12 = [f1] + [t[:, 1:, :].float() for t in d12]
        in21 = [f2] + [t[:, 1:, :].float() for t in d21]
        r12 = tm.head_pts(in12, ts)
        r21 = tm.head_pts(in21, ts)

    from vista_slam_tpu.models.sta import predict_pair_mixed_aspect

    jout = predict_pair_mixed_aspect(
        jm, params, jnp.asarray(img1), jnp.asarray(img2),
        np.asarray([[Hh, Ww], [Ww, Hh]]), np.asarray([[Hh, Ww], [Ww, Hh]]))

    np.testing.assert_allclose(np.asarray(jout["pts3d"][:2]),
                               r12["pts3d"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["pts3d"][2:]),
                               r21["pts3d"].numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jout["conf"][:2]),
                               r12["conf"].numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["pose"][:2]),
                               pose12["pose"].numpy(), atol=2e-3)


@pytest.mark.skipif(os.environ.get("VSLAM_FULL_PARITY") != "1",
                    reason="full-size parity is minutes on 1 CPU core; "
                           "set VSLAM_FULL_PARITY=1 (result recorded in "
                           "PARITY.md)")
def test_reference_parity_full_size():
    """Flagship config: 224x224, enc 1024x24x16, dec 768x12x12, DPT head —
    randomly initialized, full forward parity vs the actual reference."""
    _parity_case(img=224, enc_dim=1024, enc_depth=24, enc_heads=16,
                 dec_dim=768, dec_depth=12, dec_heads=12, mlp_ratio=4,
                 batch=1, atol_pts=5e-3, atol_pose=5e-3)
