"""Device-resident per-node pointmap store.

The reference parks every node's (depth, conf) maps on the CPU and shuttles
them back to the GPU per use (reference: vista_slam/pose_graph.py:37,
slam.py:221-223). On TPU the dominant cost off-chip is host<->device
transfer, so this store keeps the maps in HBM (fp16, preallocated
[max_nodes, H, W]) and performs the per-node reductions that consume them —
relative scale estimation between two nodes of the same view
(slam.py:218-232) — on device, returning scalars only. Dense maps leave the
chip once, at save/eval time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _write(depth_buf, conf_buf, idxs, depths, confs):
    depth_buf = depth_buf.at[idxs].set(depths.astype(depth_buf.dtype))
    conf_buf = conf_buf.at[idxs].set(confs.astype(conf_buf.dtype))
    return depth_buf, conf_buf


@jax.jit
def _scales(depth_buf, conf_buf, new_idx, first_idx):
    """Batched least-squares scale + scale confidence between node pairs
    (semantics of slam_utils.py:168-190 + slam.py:227)."""
    d_new = depth_buf[new_idx].astype(jnp.float32)
    d_first = depth_buf[first_idx].astype(jnp.float32)
    c_new = conf_buf[new_idx].astype(jnp.float32)
    c_first = conf_buf[first_idx].astype(jnp.float32)
    w = jnp.maximum(c_new * c_first, 1e-6)
    s = (jnp.sum(w * d_new * d_first, axis=(1, 2))
         / jnp.maximum(jnp.sum(w * d_new * d_new, axis=(1, 2)), 1e-12))
    scale_conf = jnp.sqrt(c_new * c_first).mean(axis=(1, 2))
    return s, scale_conf


class DevicePointmapStore:
    def __init__(self, max_nodes: int, hw=(224, 224), dtype=jnp.float16,
                 sharding=None):
        self.max_nodes = max_nodes
        self.hw = hw
        self.depth = jnp.zeros((max_nodes,) + hw, dtype)
        self.conf = jnp.zeros((max_nodes,) + hw, dtype)
        if sharding is not None:  # multi-chip inference: replicate over mesh
            self.depth = jax.device_put(self.depth, sharding)
            self.conf = jax.device_put(self.conf, sharding)
        self.intri = np.zeros((max_nodes, 3, 3), np.float32)  # tiny: host

    def reset(self):
        self.depth = jnp.zeros_like(self.depth)
        self.conf = jnp.zeros_like(self.conf)
        self.intri[:] = 0

    def write_batch(self, idxs, depths, confs, intris=None):
        """idxs: [M] node indices; depths/confs [M,H,W] device or host arrays;
        intris [M,3,3] host (may be set later via set_intri)."""
        idx = jnp.asarray(np.asarray(idxs, np.int32))
        self.depth, self.conf = _write(self.depth, self.conf, idx,
                                       jnp.asarray(depths), jnp.asarray(confs))
        if intris is not None:
            self.set_intri(idxs, intris)

    def set_intri(self, idxs, intris):
        self.intri[np.asarray(idxs)] = np.asarray(intris, np.float32)

    def scales_batch_async(self, new_idxs, first_idxs):
        """Dispatch the batched scale reduction; returns DEVICE (s, conf)."""
        return _scales(self.depth, self.conf,
                       jnp.asarray(np.asarray(new_idxs, np.int32)),
                       jnp.asarray(np.asarray(first_idxs, np.int32)))

    def scales_batch(self, new_idxs, first_idxs):
        """Relative scales of node pairs; returns host (s[M], scale_conf[M])."""
        s, c = self.scales_batch_async(new_idxs, first_idxs)
        return np.asarray(s), np.asarray(c)

    def fetch(self, idx: int):
        """One node's (depth fp32, conf fp32, intri) on host."""
        return (np.asarray(self.depth[idx], np.float32),
                np.asarray(self.conf[idx], np.float32),
                self.intri[idx])

    def fetch_many(self, idxs):
        idx = jnp.asarray(np.asarray(idxs, np.int32))
        return (np.asarray(self.depth[idx], np.float32),
                np.asarray(self.conf[idx], np.float32),
                self.intri[np.asarray(idxs)])
