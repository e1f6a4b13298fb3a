"""Synthetic deterministic frontend for testing the SLAM graph logic on CPU
without model weights (test strategy per SURVEY.md section 4).

The fake frontend replays ground-truth geometry: each decoded pair gets an
arbitrary per-pair scale factor (mimicking the scale gauge of two-view
pointmap regression) applied consistently to depths and the relative-pose
translation; the pose graph must undo these through scale edges + PGO.
"""

from __future__ import annotations

import numpy as np

from vista_slam_tpu.slam import host_math as hm


def circle_trajectory(n, radius=3.0, height_wobble=0.2):
    """Ground-truth cam-to-world poses on a circle, looking inward."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        c = np.array([radius * np.cos(a), radius * np.sin(a),
                      height_wobble * np.sin(3 * a)])
        # camera z-axis looks at the origin
        z = -c / np.linalg.norm(c)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, c
        poses.append(T.astype(np.float32))
    return np.stack(poses)


class SyntheticFrontend:
    """Implements the FrontendEngine protocol (encode / decode_pairs) from
    ground truth. 'Images' are ignored; views are identified by ingestion
    order."""

    def __init__(self, gt_poses, depth_hw=(16, 16), pair_scale_range=(0.5, 2.0),
                 noise=0.0, pose_conf=1.0, seed=0, focal=20.0):
        self.gt = gt_poses  # [V, 4, 4] cam-to-world
        self.h, self.w = depth_hw
        self.rng = np.random.default_rng(seed)
        self.pair_scale_range = pair_scale_range
        self.noise = noise
        self.pose_conf = pose_conf
        self.K = np.array([[focal, 0, self.w / 2],
                           [0, focal, self.h / 2],
                           [0, 0, 1]], np.float32)
        self._count = 0
        # deterministic per-view "true" depth pattern
        yy, xx = np.meshgrid(np.arange(self.h), np.arange(self.w), indexing="ij")
        self._base = 2.0 + 0.3 * np.sin(xx / 3.0) * np.cos(yy / 2.0)
        self.time_decode = 0.0
        self.time_encode = 0.0

    # -- protocol ---------------------------------------------------------
    def encode(self, rgb):
        idx = self._count
        self._count += 1
        return np.full((1, 1), idx, np.int32)

    def _view_depth(self, v):
        return (self._base * (1.0 + 0.05 * np.sin(v))).astype(np.float32)

    def decode_pairs(self, feats_i, feats_j, fetch=True):
        n = len(feats_i)
        out = {k: [] for k in ["pose_ij", "pose_conf_ij", "pose_ji", "pose_conf_ji",
                               "mean_conf_i", "mean_conf_j", "K"]}
        depths_i, depths_j, confs = [], [], []
        for a, b in zip(feats_i, feats_j):
            i, j = int(a[0, 0]), int(b[0, 0])
            rho = float(self.rng.uniform(*self.pair_scale_range))
            rel = np.linalg.inv(self.gt[j]) @ self.gt[i]  # pose of cam i in cam j
            rel = rel.copy()
            rel[:3, 3] *= rho
            if self.noise:
                d = self.noise * self.rng.standard_normal(3)
                rel[:3, 3] += d * rho
            depths_i.append(self._view_depth(i) * rho)
            depths_j.append(self._view_depth(j) * rho)
            confs.append(np.full((self.h, self.w), 10.0, np.float32))
            out["pose_ij"].append(rel.astype(np.float32))
            out["pose_conf_ij"].append(self.pose_conf)
            out["pose_ji"].append(np.linalg.inv(rel).astype(np.float32))
            out["pose_conf_ji"].append(self.pose_conf)
            out["mean_conf_i"].append(10.0)
            out["mean_conf_j"].append(10.0)
            out["K"].append(self.K)
        result = {k: np.asarray(v) for k, v in out.items()}
        # device-layout contract of FrontendEngine.decode_pairs:
        # rows [0, n) = direction i, rows [bucket, bucket + n) = direction j
        result["bucket"] = n
        result["depth_dev"] = np.stack(depths_i + depths_j)
        result["conf_dev"] = np.stack(confs + confs)
        return result


def umeyama_ate(est_poses, gt_poses):
    """RMSE of translations after Sim(3) alignment (Umeyama)."""
    x = np.asarray([p[:3, 3] for p in est_poses], np.float64)
    y = np.asarray([p[:3, 3] for p in gt_poses], np.float64)
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / len(x)
    u, d, vt = np.linalg.svd(cov)
    s = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2, 2] = -1
    R = u @ s @ vt
    var = (xc ** 2).sum() / len(x)
    c = np.trace(np.diag(d) @ s) / var if var > 0 else 1.0
    t = my - c * R @ mx
    x_aligned = (c * (R @ x.T)).T + t
    return float(np.sqrt(((x_aligned - y) ** 2).sum(-1).mean()))
