"""Pose loss: detection loss + OKS keypoint location + visibility BCE.

Functional equivalent of reference v8PoseLoss (utils/loss.py v8PoseLoss,
KeypointLoss:138-155): per-fg-anchor keypoints gathered from the TAL
assignment; location term 1-exp(-d²/(2σ)²·area·2) with the COCO OKS
sigmas; visibility BCE on the 3rd channel. Fixed-shape: computed densely
over all anchors and masked by fg (identical sums)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import bbox2dist, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou, xywh2xyxy
from .loss import LossMetrics, bce_with_logits, df_loss
from .tal import task_aligned_assign

OKS_SIGMA = (
    np.array(
        [0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89]
    )
    / 10.0
)


@partial(
    jax.jit,
    static_argnames=("nc", "kpt_shape", "reg_max", "strides", "box_gain", "cls_gain", "dfl_gain", "pose_gain", "kobj_gain"),
)
def pose_loss(
    feats,  # list of (B, H, W, 4*reg_max+nc)
    pred_kpts_raw,  # (B, A, K*nd)
    gt_cls,  # (B, G)
    gt_xywhn,  # (B, G, 4)
    gt_mask,  # (B, G)
    gt_kpts,  # (B, G, K, nd) xy normalized + visibility
    nc: int = 1,
    kpt_shape: tuple = (17, 3),
    reg_max: int = 16,
    strides: tuple = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    pose_gain: float = 12.0,
    kobj_gain: float = 1.0,
):
    b = feats[0].shape[0]
    nk, nd = kpt_shape
    no = 4 * reg_max + nc
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1).astype(jnp.float32)
    pred_distri, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]

    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)

    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(gt_xywhn.astype(jnp.float32) * scale)
    valid = (gt_mask > 0) & (gt_bboxes.sum(-1) > 0)
    gt_bboxes = gt_bboxes * valid[..., None]
    gt_labels = (gt_cls * valid).astype(jnp.int32)[..., None]

    pd = pred_distri.reshape(b, -1, 4, reg_max)
    dist = (jax.nn.softmax(pd, axis=-1) * jnp.arange(reg_max, dtype=jnp.float32)).sum(-1)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)

    # decode predicted kpts to grid units (reference kpts_decode)
    pk = pred_kpts_raw.astype(jnp.float32).reshape(b, -1, nk, nd)
    pk_xy = pk[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    pred_kpts = jnp.concatenate([pk_xy, pk[..., 2:]], axis=-1) if nd == 3 else pk_xy

    assigned = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        valid[..., None].astype(jnp.float32),
        topk=10,
        num_classes=nc,
    )
    target_bboxes, target_scores, fg_mask = assigned.target_bboxes, assigned.target_scores, assigned.fg_mask
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    loss_cls = bce_with_logits(pred_scores, target_scores).sum() / target_scores_sum
    tb_g = target_bboxes / stride_tensor[None]
    weight = target_scores.sum(-1) * fg_mask
    iou = bbox_iou(pred_bboxes, tb_g, xywh=False, CIoU=True)[..., 0]
    loss_box = (((1.0 - iou) * weight) * fg_mask).sum() / target_scores_sum
    target_ltrb = bbox2dist(anchor_points[None], tb_g, reg_max - 1)
    loss_dfl = (df_loss(pd, target_ltrb)[..., 0] * weight * fg_mask).sum() / target_scores_sum

    # ---- keypoints (reference calculate_keypoints_loss) ----
    # gather assigned GT kpts per anchor, scale to pixels then /stride
    kpx = gt_kpts.astype(jnp.float32) * jnp.asarray(
        [imgsz_w, imgsz_h] + ([1.0] if nd == 3 else []), jnp.float32
    )
    # gather-free: one-hot MXU contraction over G instead of a per-anchor
    # TPU gather (exact — one term per row; see utils/tal.py)
    oh_tgt = jax.nn.one_hot(assigned.target_gt_idx, kpx.shape[1], dtype=jnp.float32)  # (B, A, G)
    sel = jnp.einsum(
        "bag,bgkd->bakd", oh_tgt, kpx, precision=jax.lax.Precision.HIGHEST
    )  # (B, A, K, nd)
    sel_xy = sel[..., :2] / stride_tensor[None, :, None, :]
    kpt_mask = (sel[..., 2] != 0) if nd == 3 else jnp.ones(sel.shape[:-1], bool)  # (B, A, K)

    area = (tb_g[..., 2] - tb_g[..., 0]) * (tb_g[..., 3] - tb_g[..., 1])  # (B, A) grid units²
    sigmas = jnp.asarray(OKS_SIGMA if (nk, nd) == (17, 3) else np.ones(nk) / nk, jnp.float32)
    d = ((pred_kpts[..., 0] - sel_xy[..., 0]) ** 2 + (pred_kpts[..., 1] - sel_xy[..., 1]) ** 2)  # (B, A, K)
    e = d / ((2 * sigmas[None, None]) ** 2 * (area[..., None] + 1e-9) * 2)
    factor = nk / (kpt_mask.sum(-1, keepdims=True) + 1e-9)  # (B, A, 1)
    per_el = factor * (1 - jnp.exp(-e)) * kpt_mask  # (B, A, K)
    fg_f = fg_mask.astype(jnp.float32)
    n_fg = jnp.maximum(fg_f.sum(), 1.0)
    loss_kpt = (per_el.mean(-1) * fg_f).sum() / n_fg  # mean over fg anchors

    if nd == 3:
        obj_bce = bce_with_logits(pk[..., 2], kpt_mask.astype(jnp.float32))  # (B, A, K)
        loss_kobj = (obj_bce.mean(-1) * fg_f).sum() / n_fg
    else:
        loss_kobj = jnp.zeros(())

    loss = jnp.stack(
        [loss_box * box_gain, loss_kpt * pose_gain, loss_kobj * kobj_gain, loss_cls * cls_gain, loss_dfl * dfl_gain]
    )
    total = loss.sum() * b
    return total, LossMetrics(box=loss[0], cls=loss[3], dfl=loss[4]), (loss[1], loss[2])
