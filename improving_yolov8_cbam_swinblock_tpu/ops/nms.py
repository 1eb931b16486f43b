"""Fixed-shape batched NMS for XLA.

The reference postprocess (utils/ops.py:181-332) filters by confidence,
offsets boxes by class (so NMS is per-class), and calls
torchvision.ops.nms — all with data-dependent shapes. On TPU we keep
every shape static:

  * candidate selection = top-K by (masked) score instead of boolean
    filtering;
  * greedy NMS = a `max_det`-step `lax.fori_loop`; each step picks the
    highest remaining score and suppresses overlapping candidates.
    Because greedy NMS's kept set is exactly the first `max_det` picks,
    this is *exact* greedy NMS truncated at max_det, matching
    torchvision semantics for the returned detections.

Outputs are padded to (batch, max_det, 6) with a validity column
(score > 0 means valid).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy


def _nms_single(
    boxes: jnp.ndarray,  # (K, 4) xyxy, class-offset applied
    scores: jnp.ndarray,  # (K,) masked scores (invalid = -1)
    classes: jnp.ndarray,  # (K,)
    raw_boxes: jnp.ndarray,  # (K, 4) xyxy without offset (output coords)
    extra: jnp.ndarray,  # (K, ne) features carried through (mask coeffs...)
    iou_thres: float,
    max_det: int,
):
    """Greedy NMS over one image's K candidates. Returns (max_det, 6+ne)."""
    k = boxes.shape[0]
    ne = extra.shape[1]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = jnp.clip(x2 - x1, 0, None) * jnp.clip(y2 - y1, 0, None)

    def body(i, state):
        live_scores, out = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > 0.0

        bx1, by1, bx2, by2 = x1[best], y1[best], x2[best], y2[best]
        inter = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0, None) * jnp.clip(
            jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0, None
        )
        iou = inter / (areas + areas[best] - inter + 1e-7)
        suppress = iou > iou_thres  # class-offset boxes: cross-class IoU ~ 0

        row = jnp.where(
            valid,
            jnp.concatenate(
                [raw_boxes[best], best_score[None], classes[best].astype(raw_boxes.dtype)[None], extra[best]]
            ),
            jnp.zeros((6 + ne,), dtype=raw_boxes.dtype),
        )
        out = out.at[i].set(row)
        live_scores = jnp.where(suppress | (jnp.arange(k) == best), -1.0, live_scores)
        live_scores = jnp.where(valid, live_scores, jnp.full_like(live_scores, -1.0))
        return live_scores, out

    out0 = jnp.zeros((max_det, 6 + ne), dtype=raw_boxes.dtype)
    _, out = jax.lax.fori_loop(0, max_det, body, (scores, out0))
    return out


@partial(jax.jit, static_argnames=("max_det", "nc"))
def e2e_postprocess(prediction: jnp.ndarray, max_det: int = 300, nc: int = 80) -> jnp.ndarray:
    """NMS-free postprocess for end2end (v10) heads
    (reference nn/modules/head.py:161-183 Detect.postprocess).

    prediction: (B, 4+nc, A) with XYXY boxes (end2end decode). Returns
    (B, max_det, 6): x1, y1, x2, y2, conf, cls — the same contract as
    non_max_suppression so downstream code is shared."""
    p = jnp.transpose(prediction, (0, 2, 1)).astype(jnp.float32)
    boxes, scores = p[..., :4], p[..., 4 : 4 + nc]
    b, a = boxes.shape[0], boxes.shape[1]
    k = min(max_det, a)
    conf = scores.max(-1)
    _, idx = jax.lax.top_k(conf, k)
    boxes_k = jnp.take_along_axis(boxes, idx[..., None], axis=1)  # (B, k, 4)
    scores_k = jnp.take_along_axis(scores, idx[..., None], axis=1)  # (B, k, nc)
    top2, idx2 = jax.lax.top_k(scores_k.reshape(b, k * nc), k)
    anchor2 = idx2 // nc
    cls2 = (idx2 % nc).astype(jnp.float32)
    out_boxes = jnp.take_along_axis(boxes_k, anchor2[..., None], axis=1)
    return jnp.concatenate([out_boxes, top2[..., None], cls2[..., None]], axis=-1)


def _nms_single_rotated(
    boxes: jnp.ndarray,  # (K, 4) xywh, class offset applied to centers
    scores: jnp.ndarray,  # (K,) masked scores (invalid = -1)
    classes: jnp.ndarray,  # (K,)
    raw_boxes: jnp.ndarray,  # (K, 4) xywh without offset (output coords)
    extra: jnp.ndarray,  # (K, ne) angle first, then any carried features
    iou_thres: float,
    max_det: int,
):
    """Greedy rotated NMS via probiou (reference ops.py nms_rotated).
    Returns (max_det, 6+ne) rows: x, y, w, h, conf, cls, angle, ..."""
    from .rotated import probiou

    k = boxes.shape[0]
    ne = extra.shape[1]
    xywhr = jnp.concatenate([boxes, extra[:, :1]], axis=-1)  # (K, 5)

    def body(i, state):
        live_scores, out = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > 0.0

        iou = probiou(xywhr, xywhr[best][None])  # (K,)
        suppress = iou > iou_thres

        row = jnp.where(
            valid,
            jnp.concatenate(
                [raw_boxes[best], best_score[None], classes[best].astype(raw_boxes.dtype)[None], extra[best]]
            ),
            jnp.zeros((6 + ne,), dtype=raw_boxes.dtype),
        )
        out = out.at[i].set(row)
        live_scores = jnp.where(suppress | (jnp.arange(k) == best), -1.0, live_scores)
        live_scores = jnp.where(valid, live_scores, jnp.full_like(live_scores, -1.0))
        return live_scores, out

    out0 = jnp.zeros((max_det, 6 + ne), dtype=raw_boxes.dtype)
    _, out = jax.lax.fori_loop(0, max_det, body, (scores, out0))
    return out


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "multi_label", "agnostic", "nc", "rotated"))
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 4096,
    multi_label: bool = False,
    agnostic: bool = False,
    nc: int = 80,
    rotated: bool = False,
) -> jnp.ndarray:
    """Batched fixed-shape NMS.

    Args:
        prediction: (B, 4 + nc + ne, A) — xywh boxes, per-class scores,
            then ne extra per-anchor features (mask coefficients, angles)
            carried through to the output (the Detect/Segment head
            inference layout, reference head.py:142, ops.py:286).
        rotated: boxes are rotated xywh with the angle as the FIRST extra
            column; suppression uses probiou and boxes stay xywh in the
            output (reference ops.py:286 rotated branch + nms_rotated).

    Returns:
        (B, max_det, 6 + ne): x1, y1, x2, y2, conf, cls, extra...
        (rotated: x, y, w, h, conf, cls, angle, ...)
        Rows with conf == 0 are padding.
    """
    pred = jnp.transpose(prediction, (0, 2, 1)).astype(jnp.float32)  # (B, A, 4+nc+ne)
    boxes_xywh = pred[..., :4]
    cls_scores = pred[..., 4 : 4 + nc]
    extras = pred[..., 4 + nc :]  # (B, A, ne) possibly ne == 0
    boxes = boxes_xywh if rotated else xywh2xyxy(boxes_xywh)  # (B, A, 4)

    b, a = boxes.shape[0], boxes.shape[1]
    max_wh = 7680.0  # class offset magnitude (reference ops.py:305)

    if multi_label and nc > 1:
        # Every (anchor, class) pair is a candidate.
        flat_scores = cls_scores.reshape(b, a * nc)
        k = min(max_nms, a * nc)
        top_scores, top_idx = jax.lax.top_k(flat_scores, k)  # (B, K)
        anchor_idx = top_idx // nc
        class_idx = (top_idx % nc).astype(jnp.float32)
        cand_boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)  # (B, K, 4)
        cand_scores = jnp.where(top_scores > conf_thres, top_scores, -1.0)
    else:
        conf = cls_scores.max(-1)
        cls_idx = cls_scores.argmax(-1).astype(jnp.float32)
        k = min(max_nms, a)
        top_scores, anchor_idx = jax.lax.top_k(conf, k)
        cand_boxes = jnp.take_along_axis(boxes, anchor_idx[..., None], axis=1)
        class_idx = jnp.take_along_axis(cls_idx, anchor_idx, axis=1)
        cand_scores = jnp.where(top_scores > conf_thres, top_scores, -1.0)

    cand_extra = jnp.take_along_axis(extras, anchor_idx[..., None], axis=1)  # (B, K, ne)
    offset = 0.0 if agnostic else max_wh
    if rotated:
        # class offset shifts only the rotated-box centers (reference ops.py:305)
        shift = (class_idx * offset)[..., None] * jnp.asarray([1.0, 1.0, 0.0, 0.0])
        offset_boxes = cand_boxes + shift
        single = _nms_single_rotated
    else:
        offset_boxes = cand_boxes + (class_idx * offset)[..., None]
        single = _nms_single

    return jax.vmap(lambda ob, s, c, rb, ex: single(ob, s, c, rb, ex, iou_thres, max_det))(
        offset_boxes, cand_scores, class_idx, cand_boxes, cand_extra
    )
