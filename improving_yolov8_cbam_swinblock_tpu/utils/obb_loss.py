"""OBB loss: rotated TAL assignment + probiou box loss + DFL.

Functional equivalent of reference v8OBBLoss / RotatedBboxLoss /
RotatedTaskAlignedAssigner (utils/loss.py:607+, utils/tal.py:329):
dense fixed-shape like detection_loss, with probiou replacing CIoU in
both the assigner metric and the box loss, rotated-rect candidate
gating, and dist2rbox decoding with the head's angle branch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, make_anchors
from ..ops.boxes import xywh2xyxy
from ..ops.rotated import dist2rbox, probiou, select_candidates_in_rotated_gts
from .loss import LossMetrics, bce_with_logits, df_loss
from .tal import select_highest_overlaps


def rotated_task_aligned_assign(
    pd_scores, pd_bboxes_r, anc_points, gt_labels, gt_bboxes_r, mask_gt,
    topk=10, num_classes=80, alpha=0.5, beta=6.0, eps=1e-9,
):
    """Rotated TAL: identical flow to tal.task_aligned_assign with probiou
    overlaps and rotated candidate gating."""
    b, a, nc = pd_scores.shape
    f32 = jnp.float32
    pd_scores = pd_scores.astype(f32)
    gt_mask = (mask_gt[..., 0] > 0).astype(f32)

    mask_in = select_candidates_in_rotated_gts(anc_points, gt_bboxes_r).astype(f32)
    cand = mask_in * gt_mask[..., None]

    # gather-free + top_k-free forms as in tal.task_aligned_assign (the
    # sort-based top_k measured 12x the iterative loop at train shapes,
    # and TPU gathers ~20 ms — see utils/tal.py)
    gt_cls = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)
    oh_cls = jax.nn.one_hot(gt_cls, nc, dtype=f32)  # (B, G, nc)
    bbox_scores = (
        jnp.einsum("bgc,bac->bga", oh_cls, pd_scores, precision=jax.lax.Precision.HIGHEST) * cand
    )
    iou = probiou(gt_bboxes_r[:, :, None, :], pd_bboxes_r[:, None, :, :])
    overlaps = jnp.clip(iou, 0, None) * cand
    align = bbox_scores**alpha * overlaps**beta

    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, a), 2)
    mask_topk = jnp.zeros_like(align)
    live = align
    for _ in range(min(topk, a)):
        hit = (col == live.argmax(-1)[..., None]).astype(f32)
        mask_topk = mask_topk + hit
        live = jnp.where(hit > 0, -jnp.inf, live)
    mask_pos = mask_topk * mask_in * gt_mask[..., None]
    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps)

    g = gt_bboxes_r.shape[1]
    oh_tgt = jax.nn.one_hot(target_gt_idx, g, dtype=f32)  # (B, A, G)
    tgt_labels = jnp.einsum(
        "bag,bg->ba", oh_tgt, gt_cls.astype(f32), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32)
    tgt_bboxes = jnp.einsum(
        "bag,bgc->bac", oh_tgt, gt_bboxes_r, precision=jax.lax.Precision.HIGHEST
    )  # (B, A, 5)
    fg_bool = fg_mask > 0
    tgt_scores = jnp.where(fg_bool[..., None], jax.nn.one_hot(tgt_labels, num_classes, dtype=f32), 0.0)

    align = align * mask_pos
    pos_align = align.max(-1, keepdims=True)
    pos_over = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align * pos_over / (pos_align + eps)).max(-2)[..., None]
    tgt_scores = tgt_scores * norm
    return tgt_labels, tgt_bboxes, tgt_scores, fg_bool, target_gt_idx


@partial(
    jax.jit,
    static_argnames=("nc", "reg_max", "strides", "box_gain", "cls_gain", "dfl_gain"),
)
def obb_loss(
    feats,  # list of (B, H, W, 4*reg_max+nc)
    pred_angle,  # (B, A, 1) decoded angle in radians (head applies the
    # (sigmoid-0.25)*pi transform, reference head.py OBB.forward)
    gt_cls,  # (B, G)
    gt_xywhrn,  # (B, G, 5) normalized xywh + angle (radians)
    gt_mask,  # (B, G)
    nc: int = 80,
    reg_max: int = 16,
    strides: tuple = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
):
    b = feats[0].shape[0]
    no = 4 * reg_max + nc
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1).astype(jnp.float32)
    pred_distri, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]
    pred_angle = pred_angle.astype(jnp.float32)

    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)

    # reference filters tiny rboxes (<2px) for stability (loss.py:656)
    scale_wh = jnp.asarray([imgsz_w, imgsz_h], jnp.float32)
    wh_px = gt_xywhrn[..., 2:4] * scale_wh
    valid = (gt_mask > 0) & (wh_px >= 2.0).all(-1)
    gt_r = jnp.concatenate(
        [gt_xywhrn[..., :2] * scale_wh, wh_px, gt_xywhrn[..., 4:5]], axis=-1
    ) * valid[..., None]  # (B, G, 5) pixels
    gt_labels = (gt_cls * valid).astype(jnp.int32)[..., None]

    pd = pred_distri.reshape(b, -1, 4, reg_max)
    dist = (jax.nn.softmax(pd, axis=-1) * jnp.arange(reg_max, dtype=jnp.float32)).sum(-1)
    rbox = dist2rbox(dist, pred_angle, anchor_points[None])  # (B, A, 4) grid units
    pred_r = jnp.concatenate([rbox, pred_angle], -1)  # (B, A, 5)

    pred_r_px = jnp.concatenate(
        [pred_r[..., :4] * stride_tensor[None], pred_r[..., 4:5]], -1
    )
    tgt_labels, tgt_bboxes, tgt_scores, fg_mask, _ = rotated_task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_r_px),
        anchor_points * stride_tensor,
        gt_labels,
        gt_r,
        valid[..., None].astype(jnp.float32),
        topk=10,
        num_classes=nc,
    )
    tss = jnp.maximum(tgt_scores.sum(), 1.0)

    loss_cls = bce_with_logits(pred_scores, tgt_scores).sum() / tss

    tb = jnp.concatenate([tgt_bboxes[..., :4] / stride_tensor[None], tgt_bboxes[..., 4:5]], -1)
    weight = tgt_scores.sum(-1) * fg_mask
    iou = probiou(pred_r, tb)
    loss_box = (((1.0 - iou) * weight) * fg_mask).sum() / tss
    target_ltrb = bbox2dist(anchor_points[None], xywh2xyxy(tb[..., :4]), reg_max - 1)
    loss_dfl = (df_loss(pd, target_ltrb)[..., 0] * weight * fg_mask).sum() / tss

    loss = jnp.stack([loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain])
    return loss.sum() * b, LossMetrics(box=loss[0], cls=loss[1], dfl=loss[2])
