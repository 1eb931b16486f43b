"""Rotated-box math: probiou, corner conversion, dist2rbox.

Functional ports of reference utils/metrics.py:_get_covariance_matrix/
probiou and utils/ops.py xywhr2xyxyxyxy / utils/tal.py dist2rbox."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _covariance(boxes: jnp.ndarray):
    """xywhr (..., 5) -> gaussian covariance terms (a, b, c)."""
    a = boxes[..., 2] ** 2 / 12.0
    b = boxes[..., 3] ** 2 / 12.0
    r = boxes[..., 4]
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1: jnp.ndarray, obb2: jnp.ndarray, CIoU: bool = False, eps: float = 1e-7) -> jnp.ndarray:
    """Probabilistic IoU between broadcastable xywhr boxes
    (reference metrics.py:198, arXiv:2106.06072)."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _covariance(obb1)
    a2, b2, c2 = _covariance(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = (
        jnp.log(
            ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
            / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None) * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
            + eps
        )
        * 0.5
    )
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def xywhr2xyxyxyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """xywhr (..., 5) -> 4 corners (..., 4, 2) (reference ops.py)."""
    c, s = jnp.cos(boxes[..., 4]), jnp.sin(boxes[..., 4])
    w2, h2 = boxes[..., 2] / 2, boxes[..., 3] / 2
    vx = jnp.stack([w2 * c, w2 * s], -1)
    vy = jnp.stack([-h2 * s, h2 * c], -1)
    ctr = boxes[..., :2]
    return jnp.stack([ctr + vx + vy, ctr + vx - vy, ctr - vx - vy, ctr - vx + vy], axis=-2)


def dist2rbox(pred_dist: jnp.ndarray, pred_angle: jnp.ndarray, anchor_points: jnp.ndarray) -> jnp.ndarray:
    """Decode ltrb + angle -> rotated box center/size (reference tal.py:397).

    Returns (..., 4): rotated center xy + wh. Angle stays separate."""
    lt, rb = jnp.split(pred_dist, 2, axis=-1)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf = ((rb - lt) / 2)[..., 0:1]
    yf = ((rb - lt) / 2)[..., 1:2]
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], -1) + anchor_points
    return jnp.concatenate([xy, lt + rb], -1)


def regularize_rboxes(rboxes: jnp.ndarray) -> jnp.ndarray:
    """Canonicalize xywhr so w >= h and angle in [0, pi)
    (reference ops.py regularize_rboxes)."""
    x, y, w, h, t = (rboxes[..., i] for i in range(5))
    swap = w > h
    w_ = jnp.where(swap, w, h)
    h_ = jnp.where(swap, h, w)
    t_ = jnp.where(swap, t, t + math.pi / 2) % math.pi
    return jnp.stack([x, y, w_, h_, t_], axis=-1)


def select_candidates_in_rotated_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """(A, 2), (B, G, 5 xywhr) -> (B, G, A) bool: anchor inside rotated box
    (reference RotatedTaskAlignedAssigner.select_candidates_in_gts)."""
    corners = xywhr2xyxyxyxy(gt_bboxes)  # (B, G, 4, 2)
    a = corners[..., 0, :][..., None, :]  # (B, G, 1, 2)
    b = corners[..., 1, :][..., None, :]
    d = corners[..., 3, :][..., None, :]
    ab = b - a
    ad = d - a
    ap = xy_centers[None, None] - a  # (B, G, A, 2)
    norm_ab = (ab * ab).sum(-1)
    norm_ad = (ad * ad).sum(-1)
    ap_ab = (ap * ab).sum(-1)
    ap_ad = (ap * ad).sum(-1)
    return (ap_ab >= 0) & (ap_ab <= norm_ab) & (ap_ad >= 0) & (ap_ad <= norm_ad)


def nms_rotated(boxes, scores, threshold: float = 0.45):
    """Fast-NMS for oriented boxes via a probiou matrix (reference
    utils/ops.py nms_rotated): sort by score, compute pairwise probiou,
    keep boxes not suppressed by any higher-scoring box.

    boxes: (N, 5) xywhr; scores: (N,). Returns a numpy array of kept
    indices (into the original order), descending score — a host-side
    utility like the reference's (used by OBB val postprocessing);
    the jitted OBB predict path uses ops.nms.non_max_suppression.
    """
    import numpy as np

    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    if boxes.shape[0] == 0:
        return np.zeros((0,), np.int64)
    order = jnp.argsort(-scores)
    sb = boxes[order]
    ious = probiou(sb[:, None, :], sb[None, :, :])
    ious = jnp.triu(ious, k=1)  # upper triangle: suppression only by higher-scored
    keep = (ious >= threshold).sum(0) <= 0
    return np.asarray(order)[np.asarray(keep)]


def xyxyxyxy2xywhr(corners: jnp.ndarray) -> jnp.ndarray:
    """4 corners (..., 4, 2) -> xywhr (..., 5) via the first edge's
    orientation (reference ops.py:550 uses cv2.minAreaRect; for true
    rectangles — which YOLO OBB corners always are — the edge-based
    closed form is exact and jittable)."""
    a, b, c = corners[..., 0, :], corners[..., 1, :], corners[..., 2, :]
    ctr = (a + c) / 2
    e1 = b - a
    e2 = c - b
    w = jnp.linalg.norm(e1, axis=-1)
    h = jnp.linalg.norm(e2, axis=-1)
    r = jnp.arctan2(e1[..., 1], e1[..., 0]) % math.pi
    return jnp.concatenate([ctr, jnp.stack([w, h, r], -1)], -1)
