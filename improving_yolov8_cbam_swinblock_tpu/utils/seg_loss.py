"""Segmentation loss: detection loss + prototype mask BCE.

Functional equivalent of reference v8SegmentationLoss
(reference utils/loss.py v8SegmentationLoss): the detection parts reuse
detection_loss's TAL assignment; the mask term reproduces
single_mask_loss — per-foreground-anchor BCE of (coeffs @ protos)
against the assigned instance mask (from the overlap map), cropped to
the target box and normalized by box area — with one fixed-shape
change: instead of boolean-indexing a ragged set of fg anchors, the
top-`max_masks` anchors by assignment weight are gathered (ragged ->
static gather). When the true fg count <= max_masks this is exact
(the surplus gathered anchors carry zero weight); beyond that the
lowest-weight fg anchors are dropped, so max_masks defaults to
max_gt * tal_topk-scale headroom (256) to make truncation rare.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou, xywh2xyxy
from .loss import LossMetrics, bce_with_logits, df_loss
from .tal import task_aligned_assign


@partial(
    jax.jit,
    static_argnames=("nc", "nm", "reg_max", "strides", "box_gain", "cls_gain", "dfl_gain", "tal_topk", "max_masks"),
)
def segmentation_loss(
    feats,  # list of (B, H, W, 4*reg_max + nc) raw maps
    mask_coeffs,  # (B, A, nm)
    protos,  # (B, h4, w4, nm)
    gt_cls,  # (B, G)
    gt_xywhn,  # (B, G, 4)
    gt_mask,  # (B, G)
    seg_map,  # (B, h4, w4) int: GT index + 1 overlap map
    nc: int = 80,
    nm: int = 32,
    reg_max: int = 16,
    strides: tuple = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
    max_masks: int = 256,
):
    b = feats[0].shape[0]
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

    assigned = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        valid[..., None].astype(jnp.float32),
        topk=tal_topk,
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

    # ---- mask loss (reference calculate_segmentation_loss) ----
    h4, w4 = protos.shape[1], protos.shape[2]
    k = min(max_masks, weight.shape[1])  # small-imgsz graphs have < max_masks anchors
    sel_w, sel_idx = jax.lax.top_k(weight, k)  # (B, K) fg anchors by weight
    sel_valid = jnp.take_along_axis(fg_mask, sel_idx, axis=1) & (sel_w > 0)
    sel_coeff = jnp.take_along_axis(mask_coeffs.astype(jnp.float32), sel_idx[..., None], axis=1)  # (B,K,nm)
    sel_gtidx = jnp.take_along_axis(assigned.target_gt_idx, sel_idx, axis=1)  # (B, K)
    sel_boxes = jnp.take_along_axis(target_bboxes, sel_idx[..., None], axis=1)  # (B,K,4) image px

    pred_masks = jnp.einsum(
        "bkn,bhwn->bkhw", sel_coeff, protos.astype(jnp.float32), preferred_element_type=jnp.float32
    )  # logits (B, K, h4, w4)
    if seg_map.shape[-2:] != (h4, w4):
        # mask_ratio != 4: GT built at imgsz/mask_ratio — nearest-resize the
        # index/bit map to proto resolution (reference F.interpolate of the
        # GT masks when shapes mismatch, loss.py calculate_segmentation_loss)
        seg_map = jax.image.resize(seg_map, seg_map.shape[:-2] + (h4, w4), method="nearest")
    if seg_map.ndim == 4:
        # overlap_mask=False: (B, P, h4, w4) int32 bitplanes — instance j is
        # plane j//32 bit j%32, so occluded instances keep their full mask
        planes = seg_map.shape[1]
        plane_sel = jax.nn.one_hot(sel_gtidx // 32, planes, dtype=jnp.int32)  # (B,K,P)
        sel_plane = jnp.einsum("bkp,bphw->bkhw", plane_sel, seg_map)
        gt_masks = ((sel_plane >> (sel_gtidx % 32)[:, :, None, None]) & 1).astype(jnp.float32)
    else:
        gt_masks = (seg_map[:, None, :, :] == (sel_gtidx[:, :, None, None] + 1)).astype(jnp.float32)

    bce = bce_with_logits(pred_masks, gt_masks)  # (B, K, h4, w4)
    # crop to target boxes scaled to proto grid
    bx = sel_boxes * jnp.asarray([w4 / imgsz_w, h4 / imgsz_h, w4 / imgsz_w, h4 / imgsz_h], jnp.float32)
    rows = jnp.arange(h4, dtype=jnp.float32)[None, None, :, None]
    cols = jnp.arange(w4, dtype=jnp.float32)[None, None, None, :]
    inbox = (
        (cols >= bx[..., 0, None, None])
        & (cols < bx[..., 2, None, None])
        & (rows >= bx[..., 1, None, None])
        & (rows < bx[..., 3, None, None])
    )
    area = jnp.clip((bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1]), 1.0, None)  # (B,K)
    per_anchor = (bce * inbox).sum((-1, -2)) / area  # (B, K)
    # reference v8SegmentationLoss.calculate_segmentation_loss divides by the
    # foreground-anchor count, not target_scores_sum (reference loss.py:438)
    loss_seg = (per_anchor * sel_valid).sum() / jnp.maximum(fg_mask.sum(), 1.0)

    loss = jnp.stack([loss_box * box_gain, loss_seg * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain])
    total = loss.sum() * b
    return total, LossMetrics(box=loss[0], cls=loss[2], dfl=loss[3]), loss[1]
