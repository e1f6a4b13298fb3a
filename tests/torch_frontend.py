"""The ACTUAL reference model as a SLAM frontend, for trajectory-level
differential parity.

This adapter wraps the reference's own SymmetricTwoViewAssociation (imported
as code-under-test via reference_oracle.py, never copied) in the duck-typed
frontend protocol that OnlineSLAM consumes (encode / decode_pairs, the same
protocol tests/synthetic.py implements). Pairs are decoded serially exactly
like the reference SLAM loop (reference: vista_slam/slam.py:153-189):
_decode_stereo per pair, pose head on the final pose token, pointmap heads
on [enc] + decoder states with the pose token stripped, shared intrinsics
via the reference's own estimate_intrinsic_from_pts3d.

Running the SAME synthetic sequence through OnlineSLAM once with the JAX
FrontendEngine and once with this adapter (same converted weights) turns the
model-forward parity evidence into trajectory-level evidence: every graph
decision (edge accept/reject, loop edges, scale edges) and the post-PGO
trajectory must match across frontends.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import torch

from reference_oracle import REFERENCE_ROOT, _install_xformers_stub


def _reference_intrinsics():
    _install_xformers_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from vista_slam.utils.slam_utils import estimate_intrinsic_from_pts3d

    return estimate_intrinsic_from_pts3d


class TorchReferenceFrontend:
    """FrontendEngine protocol over the reference torch model.

    encode() returns the reference's (enc_feat, enc_pos) tuple as the cached
    feature; decode_pairs() mirrors regress_two_views for every pair in the
    batch and emits the host/dense layout FrontendEngine.decode_pairs
    produces (rows [0, n) = view-i maps, rows [bucket, bucket+n) = view-j).
    """

    def __init__(self, model):
        self.model = model
        self._estimate_K = _reference_intrinsics()
        self.time_encode = 0.0
        self.time_decode = 0.0

    def encode(self, rgb: np.ndarray):
        """rgb: HWC float32 in [-1, 1] (the shared SLAM input convention)."""
        t0 = time.time()
        img = torch.from_numpy(np.asarray(rgb, np.float32)).permute(2, 0, 1)[None]
        H, W = rgb.shape[:2]
        shape = torch.tensor([[H, W]])
        with torch.no_grad():
            feat, pos = self.model._encode_image(img, shape, normalize=False)
        self.time_encode += time.time() - t0
        return (feat, pos, shape)

    def decode_pairs(self, feats_i: list, feats_j: list, fetch: bool = True) -> dict:
        n = len(feats_i)
        out = {k: [] for k in ["pose_ij", "pose_conf_ij", "pose_ji",
                               "pose_conf_ji", "mean_conf_i", "mean_conf_j", "K"]}
        depths_i, depths_j, confs_i, confs_j = [], [], [], []
        t0 = time.time()
        for (f_i, p_i, sh_i), (f_j, p_j, sh_j) in zip(feats_i, feats_j):
            with torch.no_grad():
                d_ij, d_ji = self.model._decode_stereo(f_i, f_j, p_i, p_j)
                pose_ij = self.model.head_pose_s(d_ij[-1][:, 0, :])
                pose_ji = self.model.head_pose_s(d_ji[-1][:, 0, :])
                in_ij = [f_i] + [t[:, 1:, :].float() for t in d_ij]
                in_ji = [f_j] + [t[:, 1:, :].float() for t in d_ji]
                r_ij = self.model.head_pts(in_ij, sh_i)
                r_ji = self.model.head_pts(in_ji, sh_j)
                pcls = torch.cat([r_ij["pts3d"], r_ji["pts3d"]], dim=0)
                cfs = torch.cat([r_ij["conf"], r_ji["conf"]], dim=0)
                K = self._estimate_K(pcls, cfs, shared_intrinsic=True)
            out["pose_ij"].append(pose_ij["pose"][0].numpy())
            out["pose_conf_ij"].append(float(pose_ij["conf"][0]))
            out["pose_ji"].append(pose_ji["pose"][0].numpy())
            out["pose_conf_ji"].append(float(pose_ji["conf"][0]))
            out["mean_conf_i"].append(float(r_ij["conf"].mean()))
            out["mean_conf_j"].append(float(r_ji["conf"].mean()))
            out["K"].append(np.asarray(K, np.float32))
            depths_i.append(r_ij["pts3d"][0, ..., 2].numpy())
            depths_j.append(r_ji["pts3d"][0, ..., 2].numpy())
            confs_i.append(r_ij["conf"][0].numpy())
            confs_j.append(r_ji["conf"][0].numpy())

        result = {k: np.asarray(v, np.float32) for k, v in out.items()}
        result["bucket"] = n
        # same fp16 dense-map crossing as FrontendEngine (slam/frontend.py)
        f16_max = 6.0e4
        result["depth_dev"] = np.clip(np.stack(depths_i + depths_j),
                                      -f16_max, f16_max).astype(np.float16)
        result["conf_dev"] = np.clip(np.stack(confs_i + confs_j),
                                     0.0, f16_max).astype(np.float16)
        return result
