"""Symmetric Two-view Association (STA) frontend — TPU-native design.

Architecture (capability-matched to the reference
vista_slam/sta_model/sta_model.py:26-291):
  * 16x16 conv patch embedding -> 24-layer ViT encoder (1024 dim, 16 heads)
    with RoPE2D (base 100) applied to q/k inside every attention.
  * 12-layer symmetric cross-attention decoder (768 dim, 12 heads) over the
    two views, with a learned pose token prepended at RoPE position (-1, -1).
  * DPT pointmap head over hook levels [enc, dec6, dec9, dec12] and a pose
    head over the final pose token.

TPU-first design decisions (deliberately NOT a port):
  * Both decode directions run as one batch: the reference calls each
    decoder block twice per layer (sta_model.py:224-238); here the two
    streams are stacked on the batch axis and each layer is a single fused
    forward, doubling MXU utilization.
  * All shapes static; RoPE tables are trace-time constants.
  * Mixed precision: encoder/decoder matmuls in bfloat16 with fp32
    accumulation and fp32 layernorm/softmax; heads in fp32, mirroring the
    reference's autocast boundaries (slam.py:164,178).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import mha
from ..ops.rope2d import apply_rope2d, rope2d_tables
from .heads import DPTHead, LinearPtsHead, PoseHead, postprocess_pts3d


@dataclasses.dataclass(frozen=True)
class STAConfig:
    img_size: tuple[int, int] = (224, 224)
    patch_size: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    mlp_ratio: int = 4
    rope_base: float = 100.0
    head_type: str = "dpt"  # 'dpt' | 'linear'
    conf_offset: float = 1.0  # conf_mode ('exp', 1, inf)
    compute_dtype: Any = jnp.bfloat16
    use_flash: bool | None = None  # None = auto by sequence length
    remat: bool = False  # rematerialize blocks in backward (train memory)
    # store attention probabilities in bf16 for the backward pass
    # (ops/attention.mha_xla_bf16res); forward numerics are identical
    attn_bf16_grad: bool = False
    # fused short-sequence Pallas attention (fwd + one-kernel bwd, no HBM
    # probability residuals — ops/pallas/attn_train.py); built for the
    # training step at 197 tokens, measured in BASELINE.md
    attn_fused_train: bool = False
    # tanh-approximate GELU in the MLPs instead of the reference's exact
    # erf GELU (torch.nn.GELU default). The exact erf is fp32 VPU work in
    # the epilogue of the MLP matmul fusions and is the single largest
    # encoder inefficiency (measured 48->63% MFU at batch 8 — BASELINE.md
    # "Encoder roofline"); approximate=True trades ~2e-3 relative
    # activation error for MXU throughput. Keep False when
    # loading/verifying reference checkpoints.
    gelu_approx: bool = False
    # bf16 compute in the DPT head's conv pyramid (params stay fp32, the
    # 4-channel output is returned fp32). fp32 heads are the parity
    # default (the reference disables autocast around them, reference:
    # vista_slam/slam.py:164,178); bf16 is the measured training-
    # throughput knob for the head's fwd+bwd convs (BASELINE.md).
    head_bf16: bool = False

    @property
    def grid(self) -> tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw

    # DPT hook positions into [enc] + [embed, blk1..blk12]:
    # [0, d*2//4+1, d*3//4+1, d+1] (reference: heads/dpt_head.py:112)
    @property
    def hooks(self) -> tuple[int, ...]:
        d = self.dec_depth
        return (0, d * 2 // 4 + 1, d * 3 // 4 + 1, d + 1)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.gelu_approx)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


def _ln(name):
    return nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)


class PatchifyEmbed(nn.Module):
    """Patch embedding as space-to-depth + one MXU matmul.

    The same contraction as the reference's Conv2d(k=16, s=16) patch
    projection (reference: vista_slam/sta_model/patch_embed.py:11-14 via
    blocks/sta_blocks.py:235-280), but a stride-16 conv over a 3-channel
    input cannot tile onto the MXU (measured 9 TF/s — BASELINE.md encoder
    roofline) while the identical reshape to [B, N, P*P*3] @ [P*P*3, D]
    runs at matmul rate. Parameter names and shapes are exactly nn.Conv's
    ([P, P, 3, D] "kernel" + [D] "bias", fp32), so checkpoints and
    models/convert.py are unaffected.
    """
    features: int
    patch: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        p, d = self.patch, self.features
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, cin, d))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, cin)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, p * p * cin)
        y = jnp.dot(x.astype(self.dtype),
                    kernel.reshape(p * p * cin, d).astype(self.dtype))
        return y + bias.astype(self.dtype)


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any
    use_flash: bool | None
    bf16_grad: bool = False
    fused_train: bool = False

    @nn.compact
    def __call__(self, x, rope):
        B, N, C = x.shape
        hd = C // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        if rope is not None:
            cos, sin = rope
            q = apply_rope2d(q, cos, sin)
            k = apply_rope2d(k, cos, sin)
        out = mha(q, k, v, hd ** -0.5, self.use_flash, bf16_grad=self.bf16_grad, fused_train=self.fused_train)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    dim: int
    heads: int
    dtype: Any
    use_flash: bool | None
    bf16_grad: bool = False
    fused_train: bool = False

    @nn.compact
    def __call__(self, x, y, rope_q, rope_k):
        B, Nq, C = x.shape
        Nk = y.shape[1]
        hd = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="projq")(x).reshape(B, Nq, self.heads, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(C, dtype=self.dtype, name="projk")(y).reshape(B, Nk, self.heads, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(C, dtype=self.dtype, name="projv")(y).reshape(B, Nk, self.heads, hd).transpose(0, 2, 1, 3)
        if rope_q is not None:
            q = apply_rope2d(q, *rope_q)
            k = apply_rope2d(k, *rope_k)
        out = mha(q, k, v, hd ** -0.5, self.use_flash, bf16_grad=self.bf16_grad, fused_train=self.fused_train)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int
    dtype: Any
    use_flash: bool | None
    bf16_grad: bool = False
    fused_train: bool = False
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x, rope):
        h = _ln("norm1")(x).astype(self.dtype)
        x = x + SelfAttention(self.dim, self.heads, self.dtype, self.use_flash, self.bf16_grad, self.fused_train, name="attn")(h, rope)
        h = _ln("norm2")(x).astype(self.dtype)
        x = x + Mlp(self.dim, self.dim * self.mlp_ratio, self.dtype, self.gelu_approx, name="mlp")(h)
        return x


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn (with layernormed memory) + MLP, pre-LN
    (reference: blocks/sta_blocks.py:210-231)."""
    dim: int
    heads: int
    mlp_ratio: int
    dtype: Any
    use_flash: bool | None
    bf16_grad: bool = False
    fused_train: bool = False
    gelu_approx: bool = False

    @nn.compact
    def __call__(self, x, y, rope, rope_y=None):
        if rope_y is None:
            rope_y = rope
        h = _ln("norm1")(x).astype(self.dtype)
        x = x + SelfAttention(self.dim, self.heads, self.dtype, self.use_flash, self.bf16_grad, self.fused_train, name="attn")(h, rope)
        y_ = _ln("norm_y")(y).astype(self.dtype)
        h = _ln("norm2")(x).astype(self.dtype)
        x = x + CrossAttention(self.dim, self.heads, self.dtype, self.use_flash, self.bf16_grad, self.fused_train, name="cross_attn")(
            h, y_, rope, rope_y)
        h = _ln("norm3")(x).astype(self.dtype)
        x = x + Mlp(self.dim, self.dim * self.mlp_ratio, self.dtype, self.gelu_approx, name="mlp")(h)
        return x


class STA(nn.Module):
    """The full two-view frontend as a flax module.

    Methods:
      encode(img)                      -> enc tokens [B, N, enc_dim] (un-normed)
      decode_pair(f1, f2)              -> hook states for both directions
      pair_heads(f1, f2, hooks)        -> pointmaps/confs/poses for both sides
      __call__(img1, img2)             -> full two-view forward (init / train)
    """
    cfg: STAConfig

    def setup(self):
        c = self.cfg
        # gradient checkpointing: activations inside each block are
        # rematerialized in the backward pass (jax.checkpoint), trading
        # ~1/3 more FLOPs for O(depth) less activation memory
        Enc = nn.remat(EncoderBlock) if c.remat else EncoderBlock
        Dec = nn.remat(DecoderBlock) if c.remat else DecoderBlock
        self.patch_proj = PatchifyEmbed(c.enc_dim, c.patch_size,
                                        c.compute_dtype, name="patch_embed")
        self.enc_blocks = [
            Enc(c.enc_dim, c.enc_heads, c.mlp_ratio, c.compute_dtype,
                c.use_flash, c.attn_bf16_grad, c.attn_fused_train, c.gelu_approx, name=f"enc_block{i}")
            for i in range(c.enc_depth)
        ]
        self.enc_norm = _ln("enc_norm")
        self.decoder_embed = nn.Dense(c.dec_dim, dtype=c.compute_dtype, name="decoder_embed")
        self.dec_blocks = [
            Dec(c.dec_dim, c.dec_heads, c.mlp_ratio, c.compute_dtype,
                c.use_flash, c.attn_bf16_grad, c.attn_fused_train, c.gelu_approx, name=f"dec_block{i}")
            for i in range(c.dec_depth)
        ]
        self.dec_norm = _ln("dec_norm")
        self.pose_token = self.param(
            "pose_token", nn.initializers.normal(0.02), (1, 1, c.dec_dim))
        if c.head_type == "dpt":
            self.head_pts = DPTHead(
                patch_size=c.patch_size,
                dtype=jnp.bfloat16 if c.head_bf16 else jnp.float32,
                name="head_pts")
        else:
            self.head_pts = LinearPtsHead(patch_size=c.patch_size, name="head_pts")
        self.head_pose = PoseHead(name="head_pose")

    # ------------------------------------------------------------------
    def _enc_rope(self, gh: int, gw: int):
        c = self.cfg
        return rope2d_tables(gh, gw, c.enc_dim // c.enc_heads, c.rope_base, 0)

    def _dec_rope(self, gh: int, gw: int):
        c = self.cfg
        return rope2d_tables(gh, gw, c.dec_dim // c.dec_heads, c.rope_base, 1)

    def encode(self, img: jnp.ndarray) -> jnp.ndarray:
        """img: [B, H, W, 3] normalized to [-1, 1]. Returns un-layernormed
        encoder tokens, matching the reference which feeds unnormalized
        features to the decoder and heads (sta_model.py:144,163-174 with
        normalize=False)."""
        c = self.cfg
        x = self.patch_proj(img.astype(c.compute_dtype))
        b, gh, gw, d = x.shape
        x = x.reshape(b, gh * gw, d)
        rope = self._enc_rope(gh, gw)
        for blk in self.enc_blocks:
            x = blk(x, rope)
        return x.astype(jnp.float32)

    def decode_pair(self, f1: jnp.ndarray, f2: jnp.ndarray, grid=None):
        """Run the symmetric decoder on a batch of pairs.

        f1, f2: [B, N, enc_dim]. Internally both directions are stacked on
        the batch axis (x = [f1; f2] attends to y = [f2; f1]) so each layer
        is one kernel launch instead of two.

        Returns (h_mid1, h_mid2, final): the DPT hook states
        (after blocks hooks[1]-1 and hooks[2]-1) and the layernormed final
        state, each [2B, 1+N, dec_dim]; index 0 of the token axis is the
        pose token. First B rows = direction 1 (view-i queries), last B =
        direction 2.
        """
        c = self.cfg
        gh, gw = grid if grid is not None else c.grid
        rope = self._dec_rope(gh, gw)
        return self._decode_pair_impl(f1, f2, rope, rope)

    def _decode_pair_impl(self, f1, f2, rope_x, rope_y):
        """Decoder body with explicit (possibly per-sample) RoPE tables for
        the query stream [f1; f2] and the memory stream [f2; f1]."""
        c = self.cfg
        B = f1.shape[0]
        x = jnp.concatenate([f1, f2], axis=0).astype(c.compute_dtype)
        x = self.decoder_embed(x)
        pose_tok = jnp.broadcast_to(
            self.pose_token.astype(c.compute_dtype), (2 * B, 1, c.dec_dim))
        x = jnp.concatenate([pose_tok, x], axis=1)

        hook_after = {c.hooks[1] - 1, c.hooks[2] - 1}  # block indices (1-based)
        mids = {}
        for i, blk in enumerate(self.dec_blocks):
            y = jnp.concatenate([x[B:], x[:B]], axis=0)  # swap streams
            x = blk(x, y, rope_x, rope_y)
            if (i + 1) in hook_after:
                mids[i + 1] = x.astype(jnp.float32)
        final = self.dec_norm(x).astype(jnp.float32)
        return mids[c.hooks[1] - 1], mids[c.hooks[2] - 1], final

    def pair_heads(self, f1, f2, h6, h9, final, grid=None):
        """Apply pointmap + pose heads to both directions of a decoded pair.

        Returns a dict of fp32 outputs, leading axis 2B = [dir1; dir2]:
          pts3d [2B,H,W,3], conf [2B,H,W], pose [2B,4,4], pose_conf [2B].
        Direction 1 predicts view-i's pointmap in view-i's frame and the
        relative pose; direction 2 the symmetric quantities.
        """
        c = self.cfg
        gh, gw = grid if grid is not None else c.grid
        enc = jnp.concatenate([f1, f2], axis=0).astype(jnp.float32)
        hooks = [enc, h6[:, 1:], h9[:, 1:], final[:, 1:]]
        raw = self.head_pts(hooks, (gh * c.patch_size, gw * c.patch_size))
        pts3d, conf = postprocess_pts3d(raw, c.conf_offset)
        pose_out = self.head_pose(final[:, 0])
        return {
            "pts3d": pts3d,
            "conf": conf,
            "pose": pose_out["pose"],
            "pose_conf": pose_out["conf"],
        }

    def decode_and_heads(self, f1, f2, grid=None):
        h6, h9, final = self.decode_pair(f1, f2, grid)
        return self.pair_heads(f1, f2, h6, h9, final, grid)

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray):
        p = self.cfg.patch_size
        grid = (img1.shape[1] // p, img1.shape[2] // p)
        f1 = self.encode(img1)
        f2 = self.encode(img2)
        return self.decode_and_heads(f1, f2, grid)

    # -- mixed-aspect (ManyAR) path -------------------------------------
    def _mixed_rope(self, gh: int, gw: int, dim_head: int, n_special: int,
                    portrait_mask: jnp.ndarray):
        """Per-sample RoPE tables: portrait samples are stored transposed in
        the landscape buffer, so their token positions index a (gw, gh) grid
        (reference: sta_model/patch_embed.py:40-68)."""
        c = self.cfg
        tl = rope2d_tables(gh, gw, dim_head, c.rope_base, n_special)
        tp = rope2d_tables(gw, gh, dim_head, c.rope_base, n_special)
        m = portrait_mask[:, None, None, None]  # [B,1,1,1] vs [B,heads,N,D]
        cos = jnp.where(m, tp[0][None, None], tl[0][None, None])
        sin = jnp.where(m, tp[1][None, None], tl[1][None, None])
        return cos, sin

    def encode_mixed(self, img: jnp.ndarray, portrait_mask: jnp.ndarray):
        """Encode a batch that mixes portrait and landscape aspect ratios
        (the reference's ManyAR_PatchEmbed capability, patch_embed.py:31-68).

        img [B, H, W, 3] is the landscape storage buffer (W >= H); portrait
        samples are stored spatially transposed and flagged in
        portrait_mask [B]. The patch projection runs on both orientations
        (the conv kernel is not transpose-symmetric) and each sample selects
        its own; RoPE positions follow per sample.
        """
        c = self.cfg
        xl = self.patch_proj(img.astype(c.compute_dtype))
        xp = self.patch_proj(jnp.swapaxes(img, 1, 2).astype(c.compute_dtype))
        b, gh, gw, d = xl.shape
        x = jnp.where(portrait_mask[:, None, None],
                      xp.reshape(b, gh * gw, d), xl.reshape(b, gh * gw, d))
        rope = self._mixed_rope(gh, gw, c.enc_dim // c.enc_heads, 0,
                                portrait_mask)
        for blk in self.enc_blocks:
            x = blk(x, rope)
        return x.astype(jnp.float32)

    def mixed_forward(self, img1: jnp.ndarray, img2: jnp.ndarray,
                      portrait1: jnp.ndarray, portrait2: jnp.ndarray):
        """Full two-view forward over a mixed-aspect batch. Outputs stay in
        the landscape buffer layout (portrait samples' dense maps are
        transposed relative to their true orientation), matching the
        reference's transpose_to_landscape contract (utils/misc.py:36-78):
        consumers un-transpose portrait samples via their true_shape.
        """
        c = self.cfg
        p = c.patch_size
        gh, gw = img1.shape[1] // p, img1.shape[2] // p
        f1 = self.encode_mixed(img1, portrait1)
        f2 = self.encode_mixed(img2, portrait2)

        hd = c.dec_dim // c.dec_heads
        mx = jnp.concatenate([portrait1, portrait2])  # query stream [f1; f2]
        my = jnp.concatenate([portrait2, portrait1])  # memory stream [f2; f1]
        rope_x = self._mixed_rope(gh, gw, hd, 1, mx)
        rope_y = self._mixed_rope(gh, gw, hd, 1, my)
        h6, h9, final = self._decode_pair_impl(f1, f2, rope_x, rope_y)

        enc = jnp.concatenate([f1, f2], axis=0).astype(jnp.float32)
        hooks = [enc, h6[:, 1:], h9[:, 1:], final[:, 1:]]
        # run the pointmap head in both orientations and select per sample
        # (reference runs it per aspect subset, utils/misc.py:64-66)
        raw_l = self.head_pts(hooks, (gh * p, gw * p))
        raw_p = self.head_pts(hooks, (gw * p, gh * p))
        raw = jnp.where(mx[:, None, None, None],
                        jnp.swapaxes(raw_p, 1, 2), raw_l)
        pts3d, conf = postprocess_pts3d(raw, c.conf_offset)
        pose_out = self.head_pose(final[:, 0])
        return {
            "pts3d": pts3d,
            "conf": conf,
            "pose": pose_out["pose"],
            "pose_conf": pose_out["conf"],
        }

    def train_forward(self, main_img: jnp.ndarray, support_imgs: jnp.ndarray):
        """Training forward over one main view and S support views
        (reference: sta_model.py:247-291 — encode main once, decode each
        (main, support) pair and run both heads).

        main_img [B,H,W,3], support_imgs [S,B,H,W,3]. TPU redesign: all S
        supports are encoded in one batched call and all S pair-decodes run
        as one batch of size S*B (the reference loops over supports).

        Returns dict with leading axis 2*S*B: first S*B rows are the main
        view's predictions per support pairing, last S*B rows the support
        views' predictions.
        """
        S, B = support_imgs.shape[0], support_imgs.shape[1]
        p = self.cfg.patch_size
        grid = (main_img.shape[1] // p, main_img.shape[2] // p)
        f_main = self.encode(main_img)                       # [B,N,C]
        f_supp = self.encode(support_imgs.reshape((S * B,) + support_imgs.shape[2:]))
        f_main_tiled = jnp.tile(f_main, (S, 1, 1))           # [S*B,N,C]
        return self.decode_and_heads(f_main_tiled, f_supp, grid)


def predict_pair_any_aspect(model: STA, params, img1: jnp.ndarray,
                            img2: jnp.ndarray):
    """Landscape-only prediction with portrait handling by transposition.

    Capability of the reference's transpose_to_landscape wrapper +
    ManyAR patch embedding (reference: utils/misc.py:36-78,
    sta_model/patch_embed.py:31-68): portrait inputs are spatially
    transposed into landscape, predicted, and the dense outputs transposed
    back; batches must share one aspect (the training sampler guarantees
    this, reference: datasets/base/batched_sampler.py). For batches MIXING
    aspects use predict_pair_mixed_aspect.
    """
    h, w = img1.shape[1:3]
    portrait = h > w
    if portrait:
        img1 = jnp.swapaxes(img1, 1, 2)
        img2 = jnp.swapaxes(img2, 1, 2)
    out = model.apply(params, img1, img2)
    if portrait:
        out = dict(out)
        out["pts3d"] = jnp.swapaxes(out["pts3d"], 1, 2)
        out["conf"] = jnp.swapaxes(out["conf"], 1, 2)
    return out


def predict_pair_mixed_aspect(model: STA, params, img1, img2,
                              true_shape1, true_shape2):
    """Mixed portrait/landscape batches (the reference's ManyAR capability,
    patch_embed.py:40-68 + utils/misc.py:36-78).

    img1/img2 [B, H, W, 3] with W >= H: every sample lives in the landscape
    storage buffer, portrait samples stored spatially transposed;
    true_shape* [B, 2] gives each sample's actual (h, w). Static shapes
    forbid per-sample ragged outputs, so — exactly like the reference's
    transpose_to_landscape scatter (utils/misc.py:69-76) — the dense maps
    are returned in buffer layout with a portrait mask for consumers to
    un-transpose per sample.
    """
    ts1 = jnp.asarray(true_shape1)
    ts2 = jnp.asarray(true_shape2)
    p1 = ts1[:, 0] > ts1[:, 1]
    p2 = ts2[:, 0] > ts2[:, 1]
    out = model.apply(params, img1, img2, p1, p2, method=STA.mixed_forward)
    out = dict(out)
    out["portrait_mask"] = jnp.concatenate([p1, p2])
    return out


def init_params(cfg: STAConfig, seed: int = 0):
    model = STA(cfg)
    h, w = cfg.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy, dummy)
    return model, params


def init_params_host(cfg: STAConfig, seed: int = 0, scale: float = 0.02):
    """Fast host-side random init: derive the param tree structure via
    eval_shape (no device compile) and fill with small numpy gaussians.
    For benchmarks/smoke tests where weight values don't matter."""
    import numpy as np

    model = STA(cfg)
    h, w = cfg.img_size
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(seed), dummy, dummy))
    rng = np.random.default_rng(seed)

    def fill(leaf):
        arr = (rng.standard_normal(leaf.shape) * scale).astype(np.float32)
        return jnp.asarray(arr)

    params = jax.tree_util.tree_map(fill, shapes)
    return model, params


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
