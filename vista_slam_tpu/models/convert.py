"""PyTorch checkpoint -> JAX parameter conversion for the STA frontend.

The reference ships weights as a torch state dict (loaded at
vista_slam/slam.py:95-106 from pretrains/frontend_sta_weights.pth with the
key layout of vista_slam/sta_model/sta_model.py). This module maps that
layout onto the flax parameter tree of models/sta.py.

Layout transforms:
  Linear  w[out,in]        -> kernel = w.T
  Conv2d  w[out,in,kh,kw]  -> kernel = w.transpose(2,3,1,0)   (HWIO)
  ConvT2d w[in,out,k,k]    -> StridedUpsample dense kernel
                              w.transpose(0,2,3,1).reshape(in, k*k*out),
                              bias tiled k*k times
  LayerNorm weight/bias    -> scale/bias

Note: the reference's ``enc_norm`` is created but never applied on the
inference or training paths (all `_encode_image` call sites pass
normalize=False, sta_model.py:144,258,266), so its weights are not mapped.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _linear(sd, src):
    out = {"kernel": np.ascontiguousarray(sd[f"{src}.weight"].T)}
    if f"{src}.bias" in sd:
        out["bias"] = sd[f"{src}.bias"]
    return out


def _conv(sd, src):
    out = {"kernel": np.ascontiguousarray(sd[f"{src}.weight"].transpose(2, 3, 1, 0))}
    if f"{src}.bias" in sd:
        out["bias"] = sd[f"{src}.bias"]
    return out


def _convT_as_dense(sd, src, k):
    w = sd[f"{src}.weight"]  # [in, out, k, k]
    cin, cout = w.shape[0], w.shape[1]
    kernel = np.ascontiguousarray(w.transpose(0, 2, 3, 1).reshape(cin, k * k * cout))
    out = {"proj": {"kernel": kernel}}
    if f"{src}.bias" in sd:
        out["proj"]["bias"] = np.tile(sd[f"{src}.bias"], k * k)
    return out


def _ln(sd, src):
    return {"scale": sd[f"{src}.weight"], "bias": sd[f"{src}.bias"]}


def _enc_block(sd, i):
    p = f"enc_blocks.{i}"
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn": {"qkv": _linear(sd, f"{p}.attn.qkv"),
                 "proj": _linear(sd, f"{p}.attn.proj")},
        "norm2": _ln(sd, f"{p}.norm2"),
        "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2")},
    }


def _dec_block(sd, i):
    p = f"dec_block.{i}"
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn": {"qkv": _linear(sd, f"{p}.attn.qkv"),
                 "proj": _linear(sd, f"{p}.attn.proj")},
        "norm_y": _ln(sd, f"{p}.norm_y"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "cross_attn": {
            "projq": _linear(sd, f"{p}.cross_attn.projq"),
            "projk": _linear(sd, f"{p}.cross_attn.projk"),
            "projv": _linear(sd, f"{p}.cross_attn.projv"),
            "proj": _linear(sd, f"{p}.cross_attn.proj"),
        },
        "norm3": _ln(sd, f"{p}.norm3"),
        "mlp": {"fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2")},
    }


def _rcu(sd, src):
    return {"conv1": _conv(sd, f"{src}.conv1"), "conv2": _conv(sd, f"{src}.conv2")}


def _dpt(sd):
    p = "downstream_head_pts.dpt"
    out = {
        "act0_proj": _conv(sd, f"{p}.act_postprocess.0.0"),
        "act0_up": _convT_as_dense(sd, f"{p}.act_postprocess.0.1", 4),
        "act1_proj": _conv(sd, f"{p}.act_postprocess.1.0"),
        "act1_up": _convT_as_dense(sd, f"{p}.act_postprocess.1.1", 2),
        "act2_proj": _conv(sd, f"{p}.act_postprocess.2.0"),
        "act3_proj": _conv(sd, f"{p}.act_postprocess.3.0"),
        "act3_down": _conv(sd, f"{p}.act_postprocess.3.1"),
        "head0": _conv(sd, f"{p}.head.0"),
        "head2": _conv(sd, f"{p}.head.2"),
        "head4": _conv(sd, f"{p}.head.4"),
    }
    for n in range(1, 5):
        src = (f"{p}.scratch.layer{n}_rn"
               if f"{p}.scratch.layer{n}_rn.weight" in sd
               else f"{p}.scratch.layer_rn.{n - 1}")
        out[f"layer{n}_rn"] = _conv(sd, src)
        rf = f"{p}.scratch.refinenet{n}"
        out[f"refinenet{n}"] = {
            "res_conv_unit1": _rcu(sd, f"{rf}.resConfUnit1"),
            "res_conv_unit2": _rcu(sd, f"{rf}.resConfUnit2"),
            "out_conv": _conv(sd, f"{rf}.out_conv"),
        }
    return out


def _pose_head(sd):
    return {
        "mlp0": _linear(sd, "head_pose_s.mlp.0"),
        "mlp1": _linear(sd, "head_pose_s.mlp.2"),
        "mlp2": _linear(sd, "head_pose_s.mlp.4"),
        "fc_t": _linear(sd, "head_pose_s.fc_t"),
        "fc_rot": _linear(sd, "head_pose_s.fc_rot"),
        "fc_conf": _linear(sd, "head_pose_s.fc_conf.0"),
    }


def _infer_depth(sd: Mapping[str, np.ndarray], prefix: str) -> int:
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.")
    idxs = {int(m.group(1)) for k in sd if (m := pat.match(k))}
    if not idxs:
        raise KeyError(f"no '{prefix}.<i>.*' keys in the state dict — not a "
                       "reference-layout STA checkpoint?")
    return max(idxs) + 1


def convert_state_dict(sd: Mapping[str, np.ndarray],
                       enc_depth: int | None = None,
                       dec_depth: int | None = None) -> dict:
    """Torch state dict (numpy values) -> flax params pytree
    {'params': {...}} for models.sta.STA. Depths default to what the state
    dict itself contains (24/12 for the released full-size checkpoint)."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    if enc_depth is None:
        enc_depth = _infer_depth(sd, "enc_blocks")
    if dec_depth is None:
        dec_depth = _infer_depth(sd, "dec_block")
    params = {
        "patch_embed": _conv(sd, "patch_embed.proj"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "pose_token": sd["init_pose_token"],
        "dec_norm": _ln(sd, "dec_norm"),
        "head_pts": _dpt(sd),
        "head_pose": _pose_head(sd),
    }
    for i in range(enc_depth):
        params[f"enc_block{i}"] = _enc_block(sd, i)
    for i in range(dec_depth):
        params[f"dec_block{i}"] = _dec_block(sd, i)
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Read a .pth checkpoint on the host and return numpy state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# -- flat npz (de)serialization of flax param trees ------------------------

def flatten_params(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(path: str, params):
    import jax

    np.savez(path, **flatten_params(jax.device_get(params)))


def load_params_npz(path: str) -> dict:
    z = np.load(path)
    return unflatten_params({k: z[k] for k in z.files})


def convert_checkpoint_file(src_pth: str, dst_npz: str,
                            enc_depth: int | None = None,
                            dec_depth: int | None = None):
    sd = load_torch_checkpoint(src_pth)
    params = convert_state_dict(sd, enc_depth, dec_depth)
    np.savez(dst_npz, **flatten_params(params))
    return params


if __name__ == "__main__":
    import sys

    convert_checkpoint_file(sys.argv[1], sys.argv[2])
    print(f"converted {sys.argv[1]} -> {sys.argv[2]}")
