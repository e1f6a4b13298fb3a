"""Training losses for the STA frontend, in JAX.

Capability-matched to the reference criterion
  ConfLoss(PointRegrLoss(L21), alpha=0.4)
  + RelPoseLoss(trans_loss='l2', identity_constraint=True, conf=True, conf_alpha=0.05)
  + ReprojLoss(L21)
(reference: vista_slam/sta_model/train.py:128-134, losses_pcl.py, losses_geo.py).

JAX redesign: boolean-indexed reductions become mask-weighted means so every
term is static-shape and jit/vmap/grad-safe. All functions take one
(main, support) pair of batched views; the criterion sums over support views.

View dicts (all [B, ...]):
  gt:   pts3d_cam [B,H,W,3], valid_mask [B,H,W], camera_pose [B,4,4],
        camera_intrinsics [B,3,3]
  pred: pts3d [B,H,W,3], conf [B,H,W], pose [B,4,4] (relative, this view's
        frame -> other view's frame), pose_conf [B]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.geometry import inv_se3


def masked_mean(x, mask, axis=None, eps=1e-8):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + eps)


def l21(a, b):
    """Euclidean distance per point (reference L21Loss, losses_pcl.py:50-58)."""
    d = jnp.where(jnp.isfinite(a - b), a - b, 0.0)
    return jnp.linalg.norm(d, axis=-1)


def joint_norm_factor(pts1, pts2, valid1, valid2, eps=1e-8):
    """'avg_dis' normalization factor over the union of two pointmaps
    (reference: utils/geometry.py:150-213)."""
    d1 = jnp.linalg.norm(pts1 * valid1[..., None], axis=-1)  # [B,H,W]
    d2 = jnp.linalg.norm(pts2 * valid2[..., None], axis=-1)
    num = d1.sum(axis=(1, 2)) + d2.sum(axis=(1, 2))
    den = valid1.sum(axis=(1, 2)) + valid2.sum(axis=(1, 2)) + eps
    return jnp.maximum(num / den, eps)  # [B]


def pointmap_conf_loss(gt_main, gt_supp, pred_main, pred_supp, alpha=0.4):
    """ConfLoss(PointRegrLoss(L21)): jointly 'avg_dis'-normalized pointmaps,
    per-pixel euclidean error weighted by learned confidence minus
    alpha*log(conf) (reference: losses_pcl.py:138-278)."""
    vm = gt_main["valid_mask"]
    vs = gt_supp["valid_mask"]
    f_gt = joint_norm_factor(gt_main["pts3d_cam"], gt_supp["pts3d_cam"], vm, vs)
    f_pr = joint_norm_factor(pred_main["pts3d"], pred_supp["pts3d"], vm, vs)

    def term(gt_pts, pred_pts, conf, mask, f_g, f_p):
        d = l21(pred_pts / f_p[:, None, None, None], gt_pts / f_g[:, None, None, None])
        conf_loss = d * conf - alpha * jnp.log(conf)
        return masked_mean(conf_loss, mask)

    lm = term(gt_main["pts3d_cam"], pred_main["pts3d"], pred_main["conf"], vm, f_gt, f_pr)
    ls = term(gt_supp["pts3d_cam"], pred_supp["pts3d"], pred_supp["conf"], vs, f_gt, f_pr)
    return lm + ls


def _rot_geodesic(ra, rb):
    """Geodesic angle with the reference's exact clamp
    (losses_geo.py:166-168). Note the inherited 180-degree saddle: inside
    the clamp the gradient is exactly zero, the identity constraint does
    not break the tie (Rz(pi) @ Rz(pi) = I), and the conf weighting locks
    it in (optimal conf = alpha/err ~ 0.015 at err ~ pi gates the pose
    gradient ~70x down). Measured on the synthetic scene: from-scratch
    runs collapse to a constant ~Rz(pi) pose with pointmaps converged —
    even at 5000 steps. Kept identical to the reference for parity; the
    fix is the pose head's near-identity rotation init (models/heads.py
    PoseHead, BASELINE.md 'From-scratch pose-head saddle')."""
    tr = jnp.trace(jnp.swapaxes(ra, -1, -2) @ rb, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1) / 2, -0.99999, 0.99999))


def rel_pose_loss(gt_main, gt_supp, pred_main, pred_supp, w_rot=1.0,
                  w_trans=1.0, trans_loss="l2", identity_constraint=True,
                  use_conf=True, conf_alpha=0.05):
    """RelPoseLoss: geodesic rotation error + (normalized) translation error
    vs GT, plus the forward∘backward identity constraint, optionally weighted
    by the pose confidence (reference: losses_geo.py:132-335).

    Note the reference SUMS over the batch for this term (losses_geo.py:
    305-309)."""
    vm = gt_main["valid_mask"]
    vs = gt_supp["valid_mask"]
    f_gt = joint_norm_factor(gt_main["pts3d_cam"], gt_supp["pts3d_cam"], vm, vs)
    f_pr = joint_norm_factor(pred_main["pts3d"], pred_supp["pts3d"], vm, vs)

    # closed-form rigid inverse: GT camera poses are SE(3), and the batched
    # jnp.linalg.inv would put a LuDecompositionBlock custom-call in every
    # train step (see utils/geometry.inv_se3)
    gt_rel = inv_se3(gt_supp["camera_pose"]) @ gt_main["camera_pose"]
    gt_rot = gt_rel[:, :3, :3]
    gt_trans = gt_rel[:, :3, 3] / f_gt[:, None]

    ms_rot = pred_main["pose"][:, :3, :3]
    ms_trans = pred_main["pose"][:, :3, 3] / f_pr[:, None]
    sm_rot = pred_supp["pose"][:, :3, :3]
    sm_trans = pred_supp["pose"][:, :3, 3] / f_pr[:, None]

    rot_err = jnp.abs(_rot_geodesic(ms_rot, gt_rot))
    if trans_loss == "l2":
        trans_err = jnp.linalg.norm(
            jnp.where(jnp.isfinite(ms_trans - gt_trans), ms_trans - gt_trans, 0.0),
            axis=-1)
    else:  # angle
        dot = jnp.sum(ms_trans * gt_trans, axis=-1)
        denom = jnp.linalg.norm(ms_trans, axis=-1) * jnp.linalg.norm(gt_trans, axis=-1)
        cosang = jnp.clip(dot / jnp.maximum(denom, 1e-12), -0.99999, 0.99999)
        trans_err = jnp.where(denom > 1e-12, jnp.arccos(cosang), 0.0)
    trans_err = jnp.abs(trans_err)

    if identity_constraint:
        rot_id = _rot_geodesic(ms_rot @ sm_rot,
                               jnp.broadcast_to(jnp.eye(3), ms_rot.shape))
        back = jnp.einsum("bij,bj->bi", ms_rot, sm_trans)
        if trans_loss == "l2":
            t_id = jnp.linalg.norm(ms_trans + back, axis=-1)
        else:
            dot = jnp.sum(ms_trans * (-back), axis=-1)
            denom = jnp.linalg.norm(ms_trans, axis=-1) * jnp.linalg.norm(back, axis=-1)
            t_id = jnp.arccos(jnp.clip(dot / jnp.maximum(denom, 1e-12), -0.99999, 0.99999))
        rot_err = rot_err + rot_id
        trans_err = trans_err + t_id

    per_sample = w_rot * rot_err + w_trans * trans_err
    if use_conf:
        conf = jnp.clip(pred_main["pose_conf"], 1e-6, 1.0)
        return jnp.sum(per_sample * conf - conf_alpha * jnp.log(conf))
    return jnp.sum(per_sample)


def _nearest_indices(grid_xy, H, W):
    """grid in [-1,1] xy [B,H,W,2] -> (flat row indices [B,HW], in-bounds
    mask [B,H,W]) for nearest sampling (torch grid_sample mode='nearest',
    align_corners=True rounding)."""
    gx = (grid_xy[..., 0] + 1) * 0.5 * (W - 1)
    gy = (grid_xy[..., 1] + 1) * 0.5 * (H - 1)
    ix = jnp.round(gx).astype(jnp.int32)
    iy = jnp.round(gy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    B = grid_xy.shape[0]
    return flat.reshape(B, -1), valid


@jax.custom_vjp
def _take_rows_bf16grad(v, idx):
    """take_along_axis rows v[B,HW,C] at idx[B,HW] whose VJP scatters the
    cotangent in bfloat16. TPU scatter-add is row-serial (no atomics) and
    its cost scales with the row payload: measured on v5e at this shape
    (8x50176x3), fp32 scatter = 22 ms, bf16 = 11.7 ms, while the forward
    gather is fastest in fp32 (8.6 ms). bf16 gradient accumulation here is
    AMP-grade — the reference trains this very sampling under fp16 autocast
    with fp16 atomic adds (reference: sta_model/train.py:278 autocast +
    losses_geo.py grid_sample backward)."""
    return jnp.take_along_axis(v, idx[..., None], axis=1)


def _take_rows_fwd(v, idx):
    # the scatter target has the same shape/dtype as the cotangent (the
    # gather maps [B,HW,C] -> [B,HW,C]), so idx is the only residual
    return _take_rows_bf16grad(v, idx), idx


def _take_rows_bwd(idx, ct):
    ct16 = ct.astype(jnp.bfloat16)

    def one(ix, g):
        return jnp.zeros(g.shape, jnp.bfloat16).at[ix].add(g)

    return jax.vmap(one)(idx, ct16).astype(ct.dtype), None


_take_rows_bf16grad.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def _take_rows_sortedgrad(v, idx):
    """take_along_axis rows v[B,N,C] at idx[B,N] whose VJP computes the
    gather-transpose WITHOUT a scatter: argsort the indices, cumsum the
    sorted cotangent in fp32, and difference the cumsum at each output
    slot's [lo, hi) run boundaries (binary search). sort / cumsum / gather
    are all parallel on the TPU where scatter-add is row-serial (no
    atomics, reference contrast: the CUDA grid_sample backward uses fp16
    atomicAdd under autocast, sta_model/train.py:278); accumulation is
    fp32 instead of the bf16 the scatter path needs to be affordable."""
    return jnp.take_along_axis(v, idx[..., None], axis=1)


def _take_rows_sorted_fwd(v, idx):
    return _take_rows_sortedgrad(v, idx), idx


def _take_rows_sorted_bwd(idx, ct):
    N, C = ct.shape[1], ct.shape[2]

    def one(ix, g):
        order = jnp.argsort(ix)
        ix_s = ix[order]
        csum = jnp.cumsum(g[order].astype(jnp.float32), axis=0)
        padded = jnp.concatenate([jnp.zeros((1, C), jnp.float32), csum], 0)
        slots = jnp.arange(N, dtype=ix.dtype)
        lo = jnp.searchsorted(ix_s, slots, side="left")
        hi = jnp.searchsorted(ix_s, slots, side="right")
        return padded[hi] - padded[lo]

    return jax.vmap(one)(idx, ct).astype(ct.dtype), None


_take_rows_sortedgrad.defvjp(_take_rows_sorted_fwd, _take_rows_sorted_bwd)

_TAKE_ROWS = {
    "f32": lambda v, idx: jnp.take_along_axis(v, idx[..., None], axis=1),
    "bf16_scatter": _take_rows_bf16grad,
    "sorted": _take_rows_sortedgrad,
}


def _grid_sample_nearest(img, grid_xy, align_corners=True, grad_impl="f32"):
    """img [B,H,W,C], grid in [-1,1] xy [B,H,W,2] -> nearest sample with
    zero padding (matches torch grid_sample mode='nearest'). ``grad_impl``
    selects the VJP of the gather: 'f32' (XLA fp32 scatter-add),
    'bf16_scatter' (_take_rows_bf16grad) or 'sorted'
    (_take_rows_sortedgrad, scatter-free). Forward math is identical."""
    B, H, W, C = img.shape
    flat, valid = _nearest_indices(grid_xy, H, W)
    v = img.reshape(B, H * W, C)
    out = _TAKE_ROWS[grad_impl](v, flat)
    out = out.reshape(B, H, W, C)
    return jnp.where(valid[..., None], out, 0.0), valid


class Correspondence(NamedTuple):
    grid: jnp.ndarray        # [B,H,W,2] in [-1,1]
    valid: jnp.ndarray       # [B,H,W]


def gt_correspondence(gt_src, gt_tgt, depth_tol=0.05) -> Correspondence:
    """Project GT source points into the target view and build the sampling
    grid + visibility mask (reference: losses_geo.py:18-63)."""
    src_pts = gt_src["pts3d_cam"]
    B, H, W, _ = src_pts.shape
    rel = inv_se3(gt_tgt["camera_pose"]) @ gt_src["camera_pose"]
    pts = src_pts.reshape(B, -1, 3) @ jnp.swapaxes(rel[:, :3, :3], 1, 2) + rel[:, None, :3, 3]
    K = gt_tgt["camera_intrinsics"]
    proj = pts @ jnp.swapaxes(K, 1, 2)
    z = proj[..., 2:3]
    uv = proj[..., :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    x = 2 * uv[..., 0] / (W - 1) - 1
    y = 2 * uv[..., 1] / (H - 1) - 1
    grid = jnp.stack([x, y], -1).reshape(B, H, W, 2)

    # ONE fused gather for every GT channel (target z + validity): TPU
    # gathers of [B*HW, C] rows cost ~the same regardless of C at these
    # widths, and each extra gather is ~4-8 ms/step on v5e (trace-confirmed)
    packed = jnp.concatenate(
        [gt_tgt["pts3d_cam"][..., 2:3],
         gt_tgt["valid_mask"][..., None].astype(jnp.float32)], axis=-1)
    sel, inb = _grid_sample_nearest(packed, grid)
    pts_in_tgt = pts.reshape(B, H, W, 3)
    visible = jnp.abs(pts_in_tgt[..., 2] - sel[..., 0]) < depth_tol
    valid = (gt_src["valid_mask"] & (sel[..., 1] >= 1.0) & visible & inb)
    return Correspondence(grid, valid)


def reproj_loss(gt_main, gt_supp, pred_main, pred_supp,
                grad_impl="bf16_scatter"):
    """ReprojLoss(L21): predicted main points mapped through the predicted
    relative pose must agree with the supported view's prediction sampled at
    GT correspondences, both scaled by the prediction's joint norm factor
    (reference: losses_geo.py:11-129). ``grad_impl`` picks the sampler VJP
    (see _grid_sample_nearest)."""
    corr = gt_correspondence(gt_main, gt_supp)
    B, H, W, _ = pred_main["pts3d"].shape

    both = jnp.concatenate(
        [pred_main["pts3d"].reshape(B, -1, 3), pred_supp["pts3d"].reshape(B, -1, 3)], 1)
    vmask = jnp.concatenate(
        [gt_main["valid_mask"].reshape(B, -1), gt_supp["valid_mask"].reshape(B, -1)], 1)
    scale = masked_mean(jnp.linalg.norm(both * vmask[..., None], axis=-1), vmask, axis=1)
    scale = jnp.where(jnp.isfinite(scale), scale, 1.0)[:, None, None, None]

    supp_sel, _ = _grid_sample_nearest(pred_supp["pts3d"], corr.grid,
                                       grad_impl=grad_impl)

    rel = pred_main["pose"]
    pts = pred_main["pts3d"].reshape(B, -1, 3) @ jnp.swapaxes(rel[:, :3, :3], 1, 2) \
        + rel[:, None, :3, 3]
    pts = pts.reshape(B, H, W, 3)

    d = l21(pts / scale, supp_sel / scale)
    return masked_mean(d, corr.valid)


def sta_criterion(gt_main, gt_supports, pred_mains, pred_supports, *,
                  conf_alpha=0.4, pose_conf_alpha=0.05,
                  reproj_grad="bf16_scatter"):
    """The full training criterion summed over support views (reference
    default: train.py:128-130). Returns (loss, details)."""
    total = 0.0
    details = {}
    n = len(gt_supports)
    for i in range(n):
        lp = pointmap_conf_loss(gt_main, gt_supports[i], pred_mains[i],
                                pred_supports[i], alpha=conf_alpha)
        lr = rel_pose_loss(gt_main, gt_supports[i], pred_mains[i],
                           pred_supports[i], conf_alpha=pose_conf_alpha)
        lj = reproj_loss(gt_main, gt_supports[i], pred_mains[i],
                         pred_supports[i], grad_impl=reproj_grad)
        total = total + lp + lr + lj
        details[f"pts_{i}"] = lp
        details[f"pose_{i}"] = lr
        details[f"reproj_{i}"] = lj
    return total, details
