"""STA frontend engine for online SLAM: jitted, bucketed, pair-batched.

Structural redesign versus the reference: the reference decodes candidate
edges one pair at a time in a Python loop (reference: vista_slam/slam.py:
263-277 calling _decode_stereo per edge, sta_model.py:177-244); here ALL
candidate pairs of a keyframe are decoded in ONE forward whose batch axis is
the pair set (and both decode directions ride the same batch). Pair counts
vary per keyframe, so batches are padded to a small set of bucket sizes to
keep shapes static — each bucket compiles once.

Per-pair outputs are everything the graph needs, computed on device in the
same program (pointmaps, confidences, relative pose, shared intrinsics,
depths, mean confidences) and fetched with a single host transfer.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.sta import STA, STAConfig
from ..utils.geometry import estimate_intrinsics_shared
from .host_math import from_matrix as sim3_from_matrix_np

_BUCKETS = (1, 2, 4, 8)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"pair batch {n} exceeds the largest bucket {_BUCKETS[-1]}")


# Per-pair host outputs of the fused edge step, in packing order. Through a
# high-RTT link (the dev relay) a device_get of a dict pays one round trip
# PER LEAF; packing everything into ONE flat fp32 vector on device makes the
# per-keyframe synchronization a single small transfer. (The reference has no
# analog: it fetches per-pair tensors one at a time inside its serial edge
# loop, vista_slam/slam.py:163-189.)
_HOST_SPEC = (("pose_ij", 16), ("pose_conf_ij", 1), ("pose_ji", 16),
              ("pose_conf_ji", 1), ("mean_conf_i", 1), ("mean_conf_j", 1),
              ("K", 9))
_HOST_SHAPES = {"pose_ij": (4, 4), "pose_ji": (4, 4), "K": (3, 3)}
_PAIR_FLOATS = sum(w for _, w in _HOST_SPEC)  # 45


def _pack_host(host: dict, b: int) -> "jnp.ndarray":
    """[b*_PAIR_FLOATS + 2*j_max] fp32 vector: per-pair block, then the
    scale/scale_conf job rows. Device-side; inverse of _unpack_host."""
    pair = jnp.concatenate(
        [host[k].reshape(b, w).astype(jnp.float32) for k, w in _HOST_SPEC],
        axis=1).reshape(-1)
    return jnp.concatenate(
        [pair, host["scale"].astype(jnp.float32),
         host["scale_conf"].astype(jnp.float32)])


def _unpack_host(flat: np.ndarray, b: int) -> dict:
    pair = flat[: b * _PAIR_FLOATS].reshape(b, _PAIR_FLOATS)
    out, off = {}, 0
    for k, w in _HOST_SPEC:
        col = pair[:, off: off + w]
        out[k] = (col.reshape((b,) + _HOST_SHAPES[k])
                  if k in _HOST_SHAPES else col.reshape(b))
        off += w
    rest = flat[b * _PAIR_FLOATS:]
    j_max = rest.shape[0] // 2
    out["scale"], out["scale_conf"] = rest[:j_max], rest[j_max:]
    return out


@dataclass
class FrontendEngine:
    """Owns the model params and the jitted encode / pair-decode programs.

    With ``mesh`` set (a jax.sharding.Mesh with dp/tp axes), inference runs
    multi-chip: params take the training-side megatron layout (tp over
    attention/MLP hidden dims, parallel/mesh.py) and pair batches shard over
    dp — XLA inserts the collectives over ICI. The reference is strictly
    single-GPU at inference (reference: vista_slam/slam.py:28).
    """

    cfg: STAConfig
    params: Any
    cache_dtype: Any = jnp.float32
    mesh: Any = None
    model: STA = field(init=False)

    def __post_init__(self):
        self.model = STA(self.cfg)
        self.store_sharding = None
        self._batch_sharding = None
        # When set, every pair decode pads to this ONE bucket. Point: the
        # per-bucket fused programs may pick different layouts for the
        # DONATED pointmap-store buffers; alternating buckets then converts
        # the multi-hundred-MB buffers on every call. One bucket = one
        # program = stable layout. (A few ms of padded compute is noise.)
        self.fixed_bucket: int | None = None
        if self.mesh is not None:
            from ..parallel.mesh import param_shardings, replicated

            self.params = jax.device_put(
                self.params, param_shardings(self.params, self.mesh))
            self._batch_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("dp"))
            self.store_sharding = replicated(self.mesh)

        def encode_fn(params, img):
            return self.model.apply(params, img, method=STA.encode)

        def decode_fn(params, f1, f2):
            out = self.model.apply(params, f1, f2, method=STA.decode_and_heads)
            B = f1.shape[0]
            pts_i, pts_j = out["pts3d"][:B], out["pts3d"][B:]
            conf_i, conf_j = out["conf"][:B], out["conf"][B:]

            # shared intrinsics per pair over both views
            # (reference: slam.py:182-184 with shared_intrinsic=True)
            def per_pair_K(p_i, p_j, c_i, c_j):
                pts = jnp.stack([p_i, p_j])
                cf = jnp.stack([c_i, c_j])
                return estimate_intrinsics_shared(pts, cf)

            K = jax.vmap(per_pair_K)(pts_i, pts_j, conf_i, conf_j)
            host = {
                "pose_ij": out["pose"][:B],
                "pose_conf_ij": out["pose_conf"][:B],
                "pose_ji": out["pose"][B:],
                "pose_conf_ji": out["pose_conf"][B:],
                "mean_conf_i": conf_i.mean(axis=(1, 2)),
                "mean_conf_j": conf_j.mean(axis=(1, 2)),
                "K": K,
            }
            # dense maps stay ON DEVICE (fp16) — the pointmap store consumes
            # them without a host round trip; layout [dir-i rows; dir-j rows].
            # clip to the fp16 range: the exp depth/conf heads are unbounded
            # and un-/under-trained weights can otherwise produce inf
            f16_max = 6.0e4
            dense = {
                "depth": jnp.clip(out["pts3d"][..., 2], -f16_max, f16_max).astype(jnp.float16),
                "conf": jnp.clip(out["conf"], 0.0, f16_max).astype(jnp.float16),
            }
            return host, dense

        def decode_store_scales_body(params, f1, f2, depth_buf, conf_buf,
                                     node_idx, job_new, job_first):
            host, dense = decode_fn(params, f1, f2)
            b = f1.shape[0]
            # rows of dense in pair order (dir-i of pair k, then dir-j)
            perm = jnp.stack([jnp.arange(b), b + jnp.arange(b)], 1).reshape(-1)
            depth_buf = depth_buf.at[node_idx].set(dense["depth"][perm])
            conf_buf = conf_buf.at[node_idx].set(dense["conf"][perm])

            d_new = depth_buf[job_new].astype(jnp.float32)
            d_first = depth_buf[job_first].astype(jnp.float32)
            c_new = conf_buf[job_new].astype(jnp.float32)
            c_first = conf_buf[job_first].astype(jnp.float32)
            wgt = jnp.maximum(c_new * c_first, 1e-6)
            host["scale"] = (jnp.sum(wgt * d_new * d_first, axis=(1, 2))
                             / jnp.maximum(jnp.sum(wgt * d_new * d_new, axis=(1, 2)),
                                           1e-12))
            host["scale_conf"] = jnp.sqrt(c_new * c_first).mean(axis=(1, 2))
            return host, depth_buf, conf_buf

        def decode_store_scales_fn(params, f1, f2, depth_buf, conf_buf,
                                   node_idx, job_new, job_first):
            """Fused per-keyframe edge step: decode + pointmap-store scatter
            + speculative scale reductions in ONE program (one dispatch, one
            fetch). node_idx [2b]: store slots in (n_i(k), n_j(k)) pair
            order; jobs: padded (new, first) slot pairs. The small host
            outputs leave as ONE packed fp32 vector (_pack_host) so the
            per-keyframe sync is a single transfer."""
            host, depth_buf, conf_buf = decode_store_scales_body(
                params, f1, f2, depth_buf, conf_buf, node_idx, job_new,
                job_first)
            return _pack_host(host, f1.shape[0]), depth_buf, conf_buf

        def encode_decode_store_scales_fn(params, img, f2, depth_buf,
                                          conf_buf, node_idx, job_new,
                                          job_first):
            """decode_store_scales_fn with the NEW frame's encode fused into
            the same program: the i-side of every pair in a keyframe's edge
            batch is the frame just ingested, so its encode is computed once
            here and broadcast over the pair batch — one dispatch per
            keyframe instead of encode + decode (the reference pays a
            separate serial encoder forward per keyframe,
            vista_slam/slam.py:144-151 then 263-277). Returns the fresh
            token cache as the 3rd output for the host-side feature cache."""
            feat = encode_fn(params, img)                       # [1, N, C]
            f1 = jnp.broadcast_to(feat, (f2.shape[0],) + feat.shape[1:])
            host, depth_buf, conf_buf = decode_store_scales_body(
                params, f1, f2, depth_buf, conf_buf, node_idx, job_new,
                job_first)
            return (_pack_host(host, f1.shape[0]), depth_buf, conf_buf,
                    feat.astype(self.cache_dtype))

        self._encode = jax.jit(encode_fn)
        self._decode = jax.jit(decode_fn)
        self._decode_store_scales = jax.jit(decode_store_scales_fn,
                                            donate_argnums=(3, 4))
        self._encode_decode_store_scales = jax.jit(
            encode_decode_store_scales_fn, donate_argnums=(3, 4))
        self.time_encode = 0.0
        self.time_decode = 0.0
        # host-synchronization accounting (the offline-throughput lever):
        # fetch_count = blocking device->host syncs, fetch_arrays = array
        # leaves those syncs transferred (each leaf pays a round trip on
        # high-RTT links)
        self.fetch_count = 0
        self.fetch_arrays = 0

    # ------------------------------------------------------------------
    def _bucket_for(self, n: int) -> int:
        if self.fixed_bucket is not None and n <= self.fixed_bucket:
            return self.fixed_bucket
        return _bucket(n)

    def _put_batch(self, x: jax.Array) -> jax.Array:
        """dp-shard a batch-leading array when the mesh divides it evenly
        (padded buckets are mesh-divisible by construction)."""
        if (self._batch_sharding is not None
                and x.shape[0] % self.mesh.shape["dp"] == 0):
            return jax.device_put(x, self._batch_sharding)
        return x

    def encode(self, img_np: np.ndarray) -> jax.Array:
        """img_np: [H, W, 3] float32 in [-1, 1]. Returns cached tokens
        [1, N, enc_dim] left on device."""
        t0 = time.time()
        feat = self._encode(self.params, jnp.asarray(img_np)[None])
        feat = feat.astype(self.cache_dtype)
        # no block: the decode that consumes this feature queues behind it
        # on device, and host work (BoW retrieval) overlaps
        self.time_encode += time.time() - t0
        return feat

    def encode_batch(self, imgs_np: np.ndarray) -> list[jax.Array]:
        """Encode B frames in one bucketed forward (offline prefetch path).

        imgs_np: [B, H, W, 3] float32 in [-1, 1]. Returns B per-view token
        caches [1, N, enc_dim], all left on device. The reference encodes
        strictly one keyframe at a time (reference: vista_slam/slam.py:
        142-151); when keyframes are known upfront (stride keyframing /
        dataset evaluation) batching fills the MXU and amortizes dispatch.
        """
        n = int(imgs_np.shape[0])
        assert n >= 1
        t0 = time.time()
        b = _bucket(n)
        pad = b - n
        imgs = jnp.asarray(imgs_np, jnp.float32)
        if pad:
            imgs = jnp.concatenate([imgs, imgs[-1:].repeat(pad, axis=0)], axis=0)
        feats = self._encode(self.params, self._put_batch(imgs)).astype(self.cache_dtype)
        out = [feats[k: k + 1] for k in range(n)]
        self.time_encode += time.time() - t0
        return out

    def decode_pairs(self, feats_i: list[jax.Array], feats_j: list[jax.Array],
                     fetch: bool = True) -> dict:
        """Decode len(feats_i) pairs in one bucketed forward.

        Returns a dict of small per-pair outputs (poses, confidences,
        intrinsics) trimmed to the true pair count, plus device arrays
        'depth_dev'/'conf_dev' of shape [2*bucket, H, W] (row k = direction
        i of pair k, row bucket+k = direction j) and 'bucket'.

        With fetch=False the small outputs stay ON DEVICE and the call
        returns without synchronizing — the SLAM loop dispatches the store
        scatter + scale reduction behind it and performs ONE joint fetch.
        """
        n = len(feats_i)
        assert n >= 1
        t0 = time.time()
        b = self._bucket_for(n)
        pad = b - n
        f1 = jnp.concatenate(feats_i + [feats_i[-1]] * pad, axis=0).astype(jnp.float32)
        f2 = jnp.concatenate(feats_j + [feats_j[-1]] * pad, axis=0).astype(jnp.float32)
        host, dense = self._decode(self.params, self._put_batch(f1),
                                   self._put_batch(f2))
        if fetch:
            host = jax.device_get(host)
            self.fetch_count += 1
            self.fetch_arrays += len(host)
        out = {k: v[:n] for k, v in host.items()}
        out["depth_dev"] = dense["depth"]
        out["conf_dev"] = dense["conf"]
        out["bucket"] = b
        self.time_decode += time.time() - t0
        return out

    def _fused_paddings(self, n: int, b: int, store, node_idxs, jobs):
        """Static per-bucket paddings: slots for padded pairs go to the
        scrap slot (last buffer row, never registered in the graph)."""
        scrap = store.max_nodes - 1
        idx = np.full(2 * b, scrap, np.int32)
        idx[: 2 * n] = node_idxs
        j_max = 2 * b + b * (b - 1) // 2
        jn = np.zeros(j_max, np.int32)
        jf = np.zeros(j_max, np.int32)
        jn[: len(jobs)] = [a for a, _ in jobs]
        jf[: len(jobs)] = [f for _, f in jobs]
        return jnp.asarray(idx), jnp.asarray(jn), jnp.asarray(jf)

    def _fetch_packed(self, packed, n: int, b: int, n_jobs: int) -> dict:
        """ONE-array blocking fetch of the fused step's host outputs,
        unpacked and trimmed to the true pair/job counts."""
        host = _unpack_host(np.asarray(jax.device_get(packed)), b)
        self.fetch_count += 1
        self.fetch_arrays += 1
        return {k: (v[:n] if k not in ("scale", "scale_conf") else v[:n_jobs])
                for k, v in host.items()}

    def decode_pairs_fused(self, feats_i, feats_j, store, node_idxs,
                           jobs) -> dict:
        """One-dispatch edge step (decode + store write + scale reductions).

        feats: lists of cached [1,N,C] tokens; store: DevicePointmapStore;
        node_idxs: [2n] speculative slots in (n_i(k), n_j(k)) order;
        jobs: list of (new_slot, first_slot). Returns the fetched host dict
        trimmed to n pairs with 'scale'/'scale_conf' aligned to jobs.
        """
        n = len(feats_i)
        t0 = time.time()
        b = self._bucket_for(n)
        pad = b - n
        f1 = jnp.concatenate(feats_i + [feats_i[-1]] * pad, axis=0).astype(jnp.float32)
        f2 = jnp.concatenate(feats_j + [feats_j[-1]] * pad, axis=0).astype(jnp.float32)
        idx, jn, jf = self._fused_paddings(n, b, store, node_idxs, jobs)

        packed, store.depth, store.conf = self._decode_store_scales(
            self.params, self._put_batch(f1), self._put_batch(f2),
            store.depth, store.conf, idx, jn, jf)
        out = self._fetch_packed(packed, n, b, len(jobs))
        self.time_decode += time.time() - t0
        return out

    def encode_decode_pairs_fused(self, img_np, feats_j, store, node_idxs,
                                  jobs) -> tuple[dict, jax.Array]:
        """decode_pairs_fused with the i-side encode fused in: ONE dispatch
        covers encode(new frame) + all pair decodes + store writes + scale
        reductions — the online hot loop's whole device step. Returns
        (host dict as decode_pairs_fused, the new frame's token cache
        [1, N, enc_dim] left on device)."""
        n = len(feats_j)
        t0 = time.time()
        b = self._bucket_for(n)
        pad = b - n
        f2 = jnp.concatenate(feats_j + [feats_j[-1]] * pad, axis=0).astype(jnp.float32)
        idx, jn, jf = self._fused_paddings(n, b, store, node_idxs, jobs)

        packed, store.depth, store.conf, feat = self._encode_decode_store_scales(
            self.params, jnp.asarray(img_np, jnp.float32)[None],
            self._put_batch(f2), store.depth, store.conf, idx, jn, jf)
        out = self._fetch_packed(packed, n, b, len(jobs))
        self.time_decode += time.time() - t0
        return out, feat

    # ------------------------------------------------------------------
    @staticmethod
    def pose_to_sim3(pose_4x4: np.ndarray, scale: float = 1.0) -> np.ndarray:
        return sim3_from_matrix_np(pose_4x4, scale)
