"""Downstream heads of the STA frontend: dense pointmap (DPT / linear) and
relative-pose regression.

Behavioral spec comes from the reference implementation:
  * DPT head: 4 hook levels reassembled to spatial maps, refinement pyramid,
    4-channel output (xyz + conf) at full resolution
    (reference: vista_slam/sta_model/heads/dpt_head.py:98-117,
     heads/dpt_block.py:264-450).
  * postprocess: pts3d = (xyz/|xyz|) * expm1(|xyz|), conf = 1 + exp(x)
    (reference: heads/postprocess.py:10-62).
  * pose head: 3-layer ReLU MLP -> translation(3) + 9D rotation with SVD
    orthogonalization + sigmoid confidence (reference: heads/pose_head.py).

Everything is NHWC and fp32 — the reference also pins its heads to fp32 by
disabling autocast around them (reference: vista_slam/slam.py:164,178).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.linalg import adjugate_inv3
from ..utils.image_ops import resize_bilinear


class StridedUpsample(nn.Module):
    """ConvTranspose with kernel == stride, expressed as a dense projection +
    depth-to-space shuffle: out[i*k+a, j*k+b, co] = sum_ci x[i,j,ci] W[ci,a,b,co].

    Mathematically identical to torch.nn.ConvTranspose2d(k, stride=k) but maps
    onto one MXU matmul with unambiguous weight layout for checkpoint
    conversion.
    """
    features: int
    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        y = nn.Dense(self.k * self.k * self.features, dtype=self.dtype, name="proj")(x)
        y = y.reshape(b, h, w, self.k, self.k, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * self.k, w * self.k, self.features)
        return y


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3, residual add."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """DPT fusion: optional skip refinement, refinement, 2x upsample, 1x1 conv."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        rcu1 = ResidualConvUnit(self.features, self.dtype, name="res_conv_unit1")
        rcu2 = ResidualConvUnit(self.features, self.dtype, name="res_conv_unit2")
        if skip is not None:
            x = x + rcu1(skip)
        x = rcu2(x)
        h, w = x.shape[1], x.shape[2]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        x = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)
        return x


class DPTHead(nn.Module):
    """Dense prediction head over 4 hooked token levels.

    Inputs: list of 4 token maps [B, N, C_l] (pose token already stripped),
    with dims (enc_dim, dec_dim, dec_dim, dec_dim); output [B, H, W, out_ch].
    """
    patch_size: int = 16
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128  # create_dpt_head passes feature_dim//2 (dpt_head.py:104-105)
    out_channels: int = 4
    # compute dtype for the conv pyramid. fp32 is the parity default (the
    # reference disables autocast around its heads, slam.py:164,178 — and
    # trains everything fp32); bf16 is a measured MEMORY knob
    # (STAConfig.head_bf16): the batch-8 ABBA A/B found step-time parity
    # (the conv-slice saving hides under MXU work) but -0.70 GB XLA temp
    # arena (BASELINE.md "Encoder roofline"). Params stay fp32 either way;
    # the 4-channel output is always returned fp32 for postprocess/losses.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hooks: Sequence[jnp.ndarray], img_hw: tuple[int, int]):
        H, W = img_hw
        nh, nw = H // self.patch_size, W // self.patch_size

        def tokens_to_map(t):
            b, n, c = t.shape
            return t.reshape(b, nh, nw, c)

        maps = [tokens_to_map(t.astype(self.dtype)) for t in hooks]
        dt = self.dtype

        # per-level reassembly to multi-scale maps (act_postprocess)
        l0 = nn.Conv(self.layer_dims[0], (1, 1), dtype=dt, name="act0_proj")(maps[0])
        l0 = StridedUpsample(self.layer_dims[0], 4, dt, name="act0_up")(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), dtype=dt, name="act1_proj")(maps[1])
        l1 = StridedUpsample(self.layer_dims[1], 2, dt, name="act1_up")(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), dtype=dt, name="act2_proj")(maps[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), dtype=dt, name="act3_proj")(maps[3])
        l3 = nn.Conv(self.layer_dims[3], (3, 3), strides=(2, 2), padding=1, dtype=dt, name="act3_down")(l3)

        # project all levels to the fusion feature dim
        rn = [
            nn.Conv(self.feature_dim, (3, 3), padding=1, use_bias=False, dtype=dt, name=f"layer{i+1}_rn")(l)
            for i, l in enumerate([l0, l1, l2, l3])
        ]

        p4 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet4")(rn[3])
        p4 = p4[:, : rn[2].shape[1], : rn[2].shape[2], :]
        p3 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet3")(p4, rn[2])
        p2 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet2")(p3, rn[1])
        p1 = FeatureFusionBlock(self.feature_dim, dt, name="refinenet1")(p2, rn[0])

        # regression head to full resolution
        x = nn.Conv(self.feature_dim // 2, (3, 3), padding=1, dtype=dt, name="head0")(p1)
        x = resize_bilinear(x, (H, W), align_corners=True)
        x = nn.Conv(self.last_dim, (3, 3), padding=1, dtype=dt, name="head2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=dt, name="head4")(x)
        return x.astype(jnp.float32)  # [B, H, W, out_channels]


class LinearPtsHead(nn.Module):
    """Per-token linear projection + depth-to-space upsample (reference:
    heads/linear_head.py:30-41)."""
    patch_size: int = 16
    out_channels: int = 4

    @nn.compact
    def __call__(self, hooks, img_hw):
        H, W = img_hw
        nh, nw = H // self.patch_size, W // self.patch_size
        tokens = hooks[-1].astype(jnp.float32)  # [B, N, dec_dim]
        p = self.patch_size
        x = nn.Dense(self.out_channels * p * p, name="proj")(tokens)
        b = x.shape[0]
        x = x.reshape(b, nh, nw, p, p, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, self.out_channels)
        return x


def postprocess_pts3d(raw: jnp.ndarray, conf_offset: float = 1.0):
    """Map raw 4-channel head output to (pts3d, conf).

    pts3d: direction * expm1(norm); conf: offset + exp(x)
    (reference: heads/postprocess.py:22-62 with modes 'exp'/'exp').
    """
    xyz = raw[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = conf_offset + jnp.exp(raw[..., 3])
    return pts, conf


def svd_orthogonalize(m: jnp.ndarray) -> jnp.ndarray:
    """9D -> SO(3) via row-normalization + SVD projection with reflection fix
    (reference: heads/pose_head.py:38-57)."""
    m = m.reshape(m.shape[:-1] + (3, 3)) if m.shape[-1] == 9 else m
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-8)
    mt = jnp.swapaxes(m, -1, -2)
    u, _, vh = jnp.linalg.svd(mt.astype(jnp.float32), full_matrices=False)
    v = jnp.swapaxes(vh, -1, -2)
    det = jnp.linalg.det(v @ jnp.swapaxes(u, -1, -2))
    v = jnp.concatenate([v[..., :, :-1], v[..., :, -1:] * det[..., None, None]], axis=-1)
    return v @ jnp.swapaxes(u, -1, -2)


def svd_orthogonalize_stable(m: jnp.ndarray, n_iter: int = 100) -> jnp.ndarray:
    """SVD-free orthogonal projection via Newton iteration
    O <- (O + O^-T)/2, with reflection fix — alternative numerics path
    (reference: heads/pose_head.py:60-70, kept for hardware-specific SVD
    instabilities).

    n_iter=100 and the degenerate-input behavior (rank-deficient O makes
    inv() non-finite; det==0 zeroes the last column) deliberately mirror
    the reference — Newton converges in ~10 iterations, but the extra
    iterations and failure modes are part of the pinned parity contract
    (tests/test_pose_head_variants.py vs the torch oracle)."""
    m = m.reshape(m.shape[:-1] + (3, 3)) if m.shape[-1] == 9 else m
    o = m / (jnp.linalg.norm(m, axis=(-2, -1), keepdims=True) + 1e-8)

    def body(_, o):
        # adjugate inverse instead of jnp.linalg.inv: the batched LU is a
        # serial LuDecompositionBlock custom-call PER Newton iteration
        # (x100); the adjugate is exact 3x3 algebra with the identical
        # degenerate-input contract (det==0 -> non-finite)
        return 0.5 * (o + adjugate_inv3(jnp.swapaxes(o, -1, -2)))

    o = jax.lax.fori_loop(0, n_iter, body, o.astype(jnp.float32))
    det = jnp.linalg.det(o)
    return o.at[..., :, -1].multiply(jnp.sign(det)[..., None])


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D -> SO(3) via Gram-Schmidt (reference:
    heads/pose_head.py:72-92)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


class PoseHead(nn.Module):
    """Relative-pose regression from the decoder's pose token.

    rot_representation: '9D' (SVD orthogonalization, default),
    '9D_stable' (Newton-iteration projection), or '6D' (Gram-Schmidt)
    (reference: heads/pose_head.py:7-119).
    """
    hidden: int = 512
    rot_representation: str = "9D"

    @nn.compact
    def __call__(self, token: jnp.ndarray):
        x = token.astype(jnp.float32)
        for i in range(3):
            x = nn.relu(nn.Dense(self.hidden, name=f"mlp{i}")(x))
        t = nn.Dense(3, name="fc_t")(x)
        conf = nn.sigmoid(nn.Dense(1, name="fc_conf")(x))[..., 0]
        # Zero-kernel + identity-bias init for the rotation regressor — a
        # deliberate init-only deviation from the reference (its fc_rot
        # uses torch's default init, pose_head.py:34-36, but it always
        # trains from pretrained weights). From scratch, a random-rotation
        # init can land in the loss's conf-gated 180-degree saddle: rot
        # error ~pi makes the optimal pose_conf = alpha/err ~ 0.015, which
        # gates the pose gradient ~70x down while the clamped-arccos
        # gradient is zero at pi and the identity constraint is satisfied
        # by the flip pair — measured on the synthetic scene: the head
        # collapses to a constant ~Rz(pi) (pose_conf 0.0147, BASELINE.md
        # 'From-scratch pose-head saddle'). R=I at init starts the error at
        # the gt scale instead; the zero kernel trains away immediately
        # (dL/dW = x^T delta). Loaded checkpoints are unaffected. The 9D
        # bias is a sheared near-identity, NOT the exact identity: the SVD
        # derivative blows up at repeated singular values (measured: NaN
        # loss from step 1 at bias=I — and the head's row normalization
        # makes any diagonal bias exactly orthonormal again), so the bias
        # is chosen to have ALL-distinct singular values after row
        # normalization (1.09/1.06/0.83) while projecting to R only 3.3
        # degrees from the identity with finite, healthy gradients.
        def id_bias(vals):
            return lambda key, shape, dtype=jnp.float32: jnp.asarray(
                vals, dtype).reshape(shape)

        if self.rot_representation == "6D":
            R = rotation_6d_to_matrix(nn.Dense(
                6, kernel_init=nn.initializers.zeros,
                bias_init=id_bias([1.0, 0, 0, 0, 1.0, 0]),
                name="fc_rot")(x))
        else:
            r9 = nn.Dense(9, kernel_init=nn.initializers.zeros,
                          bias_init=id_bias([1.0, 0.1, -0.05,
                                             0.05, 1.0, 0.15,
                                             -0.1, 0.05, 1.0]),
                          name="fc_rot")(x)
            R = (svd_orthogonalize_stable(r9)
                 if self.rot_representation == "9D_stable"
                 else svd_orthogonalize(r9))
        b = token.shape[0]
        pose = jnp.zeros((b, 4, 4), dtype=jnp.float32)
        pose = pose.at[:, :3, :3].set(R).at[:, :3, 3].set(t).at[:, 3, 3].set(1.0)
        return {"pose": pose, "conf": conf}
