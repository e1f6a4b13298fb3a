"""Load the ACTUAL reference STA model as a numerical-parity oracle.

The reference model (reference: vista_slam/sta_model/sta_model.py:26-291) is
importable with CPU torch except for one external CUDA dependency:
``xformers.ops.memory_efficient_attention`` (reference:
sta_model/blocks/sta_blocks.py:22,143). We register a plain-torch stub with
identical semantics (scaled dot-product attention over (B, N, H, K) layout)
before importing, so the genuine reference code — not a transcription — is
the oracle. tests/torch_ref.py remains as a fast secondary oracle.

The reference tree is treated strictly as code-under-test: imported and
executed, never copied.
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


def _install_xformers_stub():
    if "xformers" in sys.modules:
        return
    ops = types.ModuleType("xformers.ops")

    def memory_efficient_attention(query, key, value, attn_bias=None, p=0.0,
                                   scale=None):
        # xformers layout: (B, M, num_heads, K); returns the same layout.
        if scale is None:
            scale = query.shape[-1] ** -0.5
        q = query.transpose(1, 2)
        k = key.transpose(1, 2)
        v = value.transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) * scale
        if attn_bias is not None:
            attn = attn + attn_bias
        attn = attn.softmax(dim=-1)
        if p:
            attn = torch.nn.functional.dropout(attn, p=p)
        return (attn @ v).transpose(1, 2)

    ops.memory_efficient_attention = memory_efficient_attention
    pkg = types.ModuleType("xformers")
    pkg.ops = ops
    sys.modules["xformers"] = pkg
    sys.modules["xformers.ops"] = ops


def load_reference_sta(**kwargs):
    """Instantiate the reference SymmetricTwoViewAssociation (random init,
    eval mode). kwargs are passed straight to the reference constructor."""
    _install_xformers_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from vista_slam.sta_model.sta_model import SymmetricTwoViewAssociation

    model = SymmetricTwoViewAssociation(**kwargs)
    model.eval()
    return model


def reference_pair_forward(model, img1: torch.Tensor, img2: torch.Tensor):
    """Mirror the reference's inference path for one two-view pair
    (reference: vista_slam/slam.py:142-189 — encode with normalize=False,
    _decode_stereo, pose head on the final pose token, pointmap head over
    [enc] + all decoder states with the pose token stripped)."""
    B, _, H, W = img1.shape
    shape = torch.tensor([[H, W]] * B)
    with torch.no_grad():
        f1, p1 = model._encode_image(img1, shape, normalize=False)
        f2, p2 = model._encode_image(img2, shape, normalize=False)
        d12, d21 = model._decode_stereo(f1, f2, p1, p2)
        pose12 = model.head_pose_s(d12[-1][:, 0, :])
        pose21 = model.head_pose_s(d21[-1][:, 0, :])
        in12 = [f1] + [t[:, 1:, :].float() for t in d12]
        in21 = [f2] + [t[:, 1:, :].float() for t in d21]
        r12 = model.head_pts(in12, shape)
        r21 = model.head_pts(in21, shape)
    return {
        "pts3d_i": r12["pts3d"], "conf_i": r12["conf"],
        "pose_i": pose12["pose"], "pose_conf_i": pose12["conf"],
        "pts3d_j": r21["pts3d"], "conf_j": r21["conf"],
        "pose_j": pose21["pose"], "pose_conf_j": pose21["conf"],
    }
