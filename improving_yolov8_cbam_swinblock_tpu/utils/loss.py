"""v8 detection loss — functional, fixed-shape (BCE + CIoU + DFL).

Re-implementation of reference v8DetectionLoss / BboxLoss / DFLoss
(/root/reference/ultralytics/utils/loss.py:65-255) as a pure function
of (feats, padded targets). Shape contract changes vs the reference:

  * targets arrive pre-padded as (B, max_gt, 5) [cls, x, y, w, h]
    normalized xywh plus a (B, max_gt) validity mask — the collate
    step produces this directly instead of the reference's runtime
    `preprocess` re-batching (loss.py:175-190), so the jitted step
    sees static shapes;
  * all masked reductions are dense `where`-sums (identical values:
    the reference's boolean indexing just skips zero terms);
  * loss math runs in fp32 regardless of the feature dtype (the
    reference runs the assigner/loss outside autocast).

Returns (total_loss_scaled_by_batch, detached components) like the
reference (loss.py:255).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.anchors import bbox2dist, dist2bbox, make_anchors
from ..ops.boxes import bbox_iou, xywh2xyxy
from .tal import task_aligned_assign


class LossMetrics(NamedTuple):
    box: jnp.ndarray
    cls: jnp.ndarray
    dfl: jnp.ndarray


def bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (torch BCEWithLogitsLoss
    reduction='none')."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, pred_is_logp: bool = False) -> jnp.ndarray:
    """Distribution focal loss (reference loss.py:65-87).

    Args:
        pred_dist: (..., 4, reg_max) logits — or log-probabilities when
            `pred_is_logp` (lets the caller share one log_softmax with
            the DFL box decode instead of normalizing the same 275 MB
            tensor twice at train shapes).
        target: (..., 4) continuous ltrb in [0, reg_max-1).

    Returns: (..., 1) mean over the 4 sides.
    """
    reg_max = pred_dist.shape[-1]
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = (tl + 1).astype(target.dtype) - target
    wr = 1.0 - wl
    logp = pred_dist if pred_is_logp else jax.nn.log_softmax(pred_dist, axis=-1)
    # gather-free: last-dim take_along_axis lowers to a slow TPU gather
    # (and its grad to a scatter — together ~25% of the train step,
    # measured); the equivalent one-hot contraction fuses into the
    # log_softmax on the VPU. bins is tiny (reg_max=16).
    bins = jax.lax.broadcasted_iota(jnp.int32, (reg_max,), 0)
    w = wl[..., None] * (bins == tl[..., None]) + wr[..., None] * (bins == tr[..., None])
    ce = -(logp * w).sum(-1)  # (..., 4)
    return ce.mean(-1, keepdims=True)


@partial(
    jax.jit,
    static_argnames=("nc", "reg_max", "strides", "box_gain", "cls_gain", "dfl_gain", "tal_topk"),
)
def detection_loss(
    feats,  # list of (B, H, W, 4*reg_max + nc) raw maps, NHWC
    gt_cls: jnp.ndarray,  # (B, G) int
    gt_xywhn: jnp.ndarray,  # (B, G, 4) normalized xywh
    gt_mask: jnp.ndarray,  # (B, G) float 0/1
    nc: int = 80,
    reg_max: int = 16,
    strides: tuple = (8, 16, 32),
    box_gain: float = 7.5,
    cls_gain: float = 0.5,
    dfl_gain: float = 1.5,
    tal_topk: int = 10,
):
    b = feats[0].shape[0]
    no = 4 * reg_max + nc
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1).astype(jnp.float32)  # (B, A, no)
    pred_distri, pred_scores = flat[..., : 4 * reg_max], flat[..., 4 * reg_max :]

    imgsz_h = feats[0].shape[1] * strides[0]
    imgsz_w = feats[0].shape[2] * strides[0]
    anchor_points, stride_tensor = make_anchors(shapes, strides, 0.5)  # (A,2),(A,1)

    # targets: normalized xywh -> pixel xyxy (reference preprocess tail)
    scale = jnp.asarray([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    gt_bboxes = xywh2xyxy(gt_xywhn.astype(jnp.float32) * scale)  # (B, G, 4)
    # reference mask: bbox coord sum > 0 AND padded rows zeroed; honour both
    mask_gt = (gt_mask > 0) & (gt_bboxes.sum(-1) > 0)
    gt_bboxes = gt_bboxes * mask_gt[..., None]
    gt_labels = (gt_cls * mask_gt).astype(jnp.int32)[..., None]  # (B, G, 1)

    # decode predicted boxes in grid units (reference bbox_decode).
    # One log_softmax is shared between the decode (softmax = exp(logp))
    # and df_loss below — the two normalizations of this (B, A, 4,
    # reg_max) tensor were separate full passes.
    pd = pred_distri.reshape(b, -1, 4, reg_max)
    pd_logp = jax.nn.log_softmax(pd, axis=-1)
    dist = (jnp.exp(pd_logp) * jnp.arange(reg_max, dtype=jnp.float32)).sum(-1)
    pred_bboxes = dist2bbox(dist, anchor_points[None], xywh=False)  # (B, A, 4) grid units

    assigned = task_aligned_assign(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes * stride_tensor[None]),
        anchor_points * stride_tensor,
        gt_labels,
        gt_bboxes,
        mask_gt[..., None].astype(jnp.float32),
        topk=tal_topk,
        num_classes=nc,
        alpha=0.5,
        beta=6.0,
    )
    target_bboxes, target_scores, fg_mask = assigned.target_bboxes, assigned.target_scores, assigned.fg_mask

    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

    # cls: BCE over all anchors/classes (reference loss.py:242)
    loss_cls = bce_with_logits(pred_scores, target_scores).sum() / target_scores_sum

    # box: weighted (1 - CIoU) on foreground (reference BboxLoss)
    target_bboxes_g = target_bboxes / stride_tensor[None]  # grid units
    weight = target_scores.sum(-1) * fg_mask  # (B, A)
    iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True)[..., 0]  # (B, A)
    loss_box = (((1.0 - iou) * weight) * fg_mask).sum() / target_scores_sum

    # dfl
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, reg_max - 1)
    dfl = df_loss(pd_logp, target_ltrb, pred_is_logp=True)[..., 0]  # (B, A)
    loss_dfl = (dfl * weight * fg_mask).sum() / target_scores_sum

    loss = jnp.stack([loss_box * box_gain, loss_cls * cls_gain, loss_dfl * dfl_gain])
    total = loss.sum() * b
    return total, LossMetrics(box=loss[0], cls=loss[1], dfl=loss[2])


def __getattr__(name):
    """Reference class names (v8DetectionLoss, TaskAlignedAssigner, ...)
    resolve lazily from utils/loss_api.py — the class wrappers over these
    functional kernels (reference utils/loss.py:152-700 contracts)."""
    from . import loss_api

    if name in loss_api.__all__:
        return getattr(loss_api, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
