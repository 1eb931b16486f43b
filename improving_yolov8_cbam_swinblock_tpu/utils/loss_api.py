"""Reference-idiom loss/assigner classes over the functional kernels.

The reference exposes training criteria as classes constructed from a
model — `v8DetectionLoss(model)` then `loss, items = criterion(preds,
batch)` (reference utils/loss.py:152-700, utils/tal.py:14-361). This
framework's losses are pure functions feeding one jitted train step
(utils/loss.py detection_loss, utils/{seg,pose,obb}_loss.py,
ops/pallas/tal_kernel.py), which is the right shape for XLA; these
wrappers provide the reference class surface for code that constructs
criteria directly. Batches are accepted in either layout:

  * this framework's padded layout: cls (B, G), bboxes (B, G, 4)
    normalized xywh, mask (B, G);
  * the reference collate layout: batch_idx (N,), cls (N, 1) or (N,),
    bboxes (N, 4) normalized xywh (reference v8DetectionLoss.preprocess
    builds the padded (B, max_gt, 5) tensor from exactly this).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .loss import detection_loss

__all__ = [
    "v8DetectionLoss", "v8SegmentationLoss", "v8PoseLoss", "v8OBBLoss",
    "v8ClassificationLoss", "E2EDetectLoss", "TaskAlignedAssigner",
    "RotatedTaskAlignedAssigner",
]


def _padded_targets(batch: Dict, bs: int, max_gt: int = 32):
    """Either layout -> (cls (B,G), bboxes (B,G,4), mask (B,G))."""
    if "batch_idx" in batch:
        bi = np.asarray(batch["batch_idx"]).reshape(-1).astype(int)
        cls = np.asarray(batch["cls"]).reshape(-1)
        boxes = np.asarray(batch["bboxes"]).reshape(-1, 4)
        counts = np.bincount(bi, minlength=bs)
        g = max(int(counts.max(initial=0)), 1)
        out_c = np.zeros((bs, g), np.float32)
        out_b = np.zeros((bs, g, 4), np.float32)
        out_m = np.zeros((bs, g), np.float32)
        slot = np.zeros(bs, int)
        for k in range(len(bi)):
            i, j = bi[k], slot[bi[k]]
            out_c[i, j] = cls[k]
            out_b[i, j] = boxes[k]
            out_m[i, j] = 1.0
            slot[i] += 1
        return jnp.asarray(out_c), jnp.asarray(out_b), jnp.asarray(out_m)
    return (
        jnp.asarray(batch["cls"], jnp.float32),
        jnp.asarray(batch["bboxes"], jnp.float32),
        jnp.asarray(batch.get("mask", np.ones(np.asarray(batch["cls"]).shape, np.float32)), jnp.float32),
    )


class v8DetectionLoss:
    """reference utils/loss.py:152: criterion(preds, batch) ->
    (total_loss, (box, cls, dfl) items)."""

    def __init__(self, model, tal_topk: int = 10):
        self.nc = int(model.nc)
        self.strides = tuple(int(s) for s in model.strides)
        self.tal_topk = tal_topk
        args = getattr(model, "args", None)
        self.gains = {
            "box": float(getattr(args, "box", 7.5) or 7.5),
            "cls": float(getattr(args, "cls", 0.5) or 0.5),
            "dfl": float(getattr(args, "dfl", 1.5) or 1.5),
        }

    def __call__(self, preds, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = preds[1] if isinstance(preds, tuple) else preds
        gc, gb, gm = _padded_targets(batch, feats[0].shape[0])
        total, items = detection_loss(
            feats, gc, gb, gm, nc=self.nc, strides=self.strides,
            box_gain=self.gains["box"], cls_gain=self.gains["cls"],
            dfl_gain=self.gains["dfl"], tal_topk=self.tal_topk,
        )
        return total, jnp.stack([items.box, items.cls, items.dfl])


class E2EDetectLoss:
    """reference utils/loss.py:700: one2many (topk-10) + one2one (topk-1)."""

    def __init__(self, model):
        self.one2many = v8DetectionLoss(model, tal_topk=10)
        self.one2one = v8DetectionLoss(model, tal_topk=1)

    def __call__(self, preds, batch: Dict):
        feats = preds[1] if isinstance(preds, tuple) else preds
        l1, i1 = self.one2many(feats["one2many"], batch)
        l2, i2 = self.one2one(feats["one2one"], batch)
        return l1 + l2, i1 + i2


class v8SegmentationLoss(v8DetectionLoss):
    """reference utils/loss.py:257: preds = (det_feats, mask_coeffs,
    protos); batch additionally carries 'seg_map' — the (B, h4, w4)
    GT-index overlap map this framework renders instead of per-instance
    mask stacks (data/dataset.py seg targets)."""

    def __call__(self, preds, batch: Dict):
        from .seg_loss import segmentation_loss

        det_feats, mask_coeffs, protos = preds
        gc, gb, gm = _padded_targets(batch, det_feats[0].shape[0])
        total, items, seg_item = segmentation_loss(
            det_feats, mask_coeffs, protos, gc, gb, gm,
            jnp.asarray(batch["seg_map"]),
            nc=self.nc, strides=self.strides,
            box_gain=self.gains["box"], cls_gain=self.gains["cls"],
            dfl_gain=self.gains["dfl"], tal_topk=self.tal_topk,
        )
        return total, jnp.stack([items.box, seg_item, items.cls, items.dfl])


class v8PoseLoss(v8DetectionLoss):
    """reference utils/loss.py:350: preds = (det_feats, kpts_raw);
    batch carries 'keypoints'/'kpts' (B, G, K, nd) normalized."""

    def __init__(self, model):
        super().__init__(model)
        self.kpt_shape = tuple(dict(model.specs[-1].kwargs).get("kpt_shape", (17, 3)))
        args = getattr(model, "args", None)
        self.pose_gain = float(getattr(args, "pose", 12.0) or 12.0)
        self.kobj_gain = float(getattr(args, "kobj", 1.0) or 1.0)

    def __call__(self, preds, batch: Dict):
        from .pose_loss import pose_loss

        det_feats, kpt_raw = preds
        gc, gb, gm = _padded_targets(batch, det_feats[0].shape[0])
        kpts = jnp.asarray(batch.get("kpts", batch.get("keypoints")))
        total, items, (kpt_loc, kpt_obj) = pose_loss(
            det_feats, kpt_raw, gc, gb, gm, kpts,
            nc=self.nc, kpt_shape=self.kpt_shape, strides=self.strides,
            box_gain=self.gains["box"], cls_gain=self.gains["cls"],
            dfl_gain=self.gains["dfl"], pose_gain=self.pose_gain,
            kobj_gain=self.kobj_gain,
        )
        # reference item order: box, pose, kobj, cls, dfl (loss.py:350)
        return total, jnp.stack([items.box, kpt_loc, kpt_obj, items.cls, items.dfl])


class v8OBBLoss(v8DetectionLoss):
    """reference utils/loss.py:583: preds = (det_feats, angle);
    batch bboxes are (B, G, 5) normalized xywh + angle."""

    def __call__(self, preds, batch: Dict):
        from .obb_loss import obb_loss

        det_feats, angle = preds
        bs = det_feats[0].shape[0]
        cls = jnp.asarray(batch["cls"], jnp.float32)
        boxes = jnp.asarray(batch["bboxes"], jnp.float32)
        mask = jnp.asarray(batch.get("mask", np.ones(cls.shape, np.float32)), jnp.float32)
        total, items = obb_loss(
            det_feats, angle, cls, boxes, mask,
            nc=self.nc, strides=self.strides,
            box_gain=self.gains["box"], cls_gain=self.gains["cls"],
            dfl_gain=self.gains["dfl"],
        )
        return total, jnp.stack([items.box, items.cls, items.dfl])


class v8ClassificationLoss:
    """reference utils/loss.py:570: mean cross-entropy on logits."""

    def __call__(self, preds, batch: Dict):
        logits = preds[1] if isinstance(preds, tuple) else preds
        logits = jnp.asarray(logits, jnp.float32)
        cls = jnp.asarray(batch["cls"]).reshape(-1).astype(jnp.int32)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), cls[:, None], axis=-1)
        loss = -logp.mean()
        return loss, jnp.stack([loss])


class TaskAlignedAssigner:
    """reference utils/tal.py:14: assigner(pd_scores, pd_bboxes,
    anc_points, gt_labels, gt_bboxes, mask_gt) -> (target_labels,
    target_bboxes, target_scores, fg_mask, target_gt_idx). Delegates to
    the functional assigner (Pallas-fused on TPU, utils/tal.py:78)."""

    def __init__(self, topk: int = 10, num_classes: int = 80,
                 alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        from .tal import task_aligned_assign

        res = task_aligned_assign(
            jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc_points),
            jnp.asarray(gt_labels), jnp.asarray(gt_bboxes),
            jnp.asarray(mask_gt, jnp.float32),
            topk=self.topk, num_classes=self.num_classes,
            alpha=self.alpha, beta=self.beta, eps=self.eps,
        )
        return (
            res.target_labels, res.target_bboxes, res.target_scores,
            res.fg_mask.astype(bool), res.target_gt_idx,
        )

    forward = __call__


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """reference utils/tal.py:329: probiou alignment for rotated boxes —
    this framework routes OBB assignment through obb_loss's probiou TAL
    (utils/obb_loss.py); the class keeps the reference entry point and
    signature for direct users."""

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt):
        from .obb_loss import rotated_task_aligned_assign

        tgt_labels, tgt_bboxes, tgt_scores, fg_mask, tgt_gt_idx = rotated_task_aligned_assign(
            jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc_points),
            jnp.asarray(gt_labels), jnp.asarray(gt_bboxes),
            jnp.asarray(mask_gt, jnp.float32),
            topk=self.topk, num_classes=self.num_classes,
            alpha=self.alpha, beta=self.beta, eps=self.eps,
        )
        return tgt_labels, tgt_bboxes, tgt_scores, fg_mask, tgt_gt_idx

    forward = __call__
