"""Box geometry ops — pure jnp, fixed-shape, broadcast-friendly.

Functional re-implementations of the reference box math
(/root/reference/ultralytics/utils/ops.py:412-620 and
/root/reference/ultralytics/utils/metrics.py:52-136), designed for XLA:
no in-place ops, no data-dependent shapes, fp32 islands where the
reference computes IoU in fp32 under autocast-off.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Last dim 4."""
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Last dim 4."""
    lt, rb = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(lt + rb) * 0.5, rb - lt], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> jnp.ndarray:
    """Normalized (cx, cy, w, h) -> pixel (x1, y1, x2, y2)."""
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x: jnp.ndarray, w: float, h: float, eps: float = 0.0) -> jnp.ndarray:
    """Pixel (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    out = xyxy2xywh(x)
    scale = jnp.asarray([w, h, w, h], dtype=out.dtype)
    return out / (scale + eps)


def clip_boxes(boxes: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, w),
            jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w),
            jnp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(
    img1_shape: tuple[int, int],
    boxes: jnp.ndarray,
    img0_shape: tuple[int, int],
    ratio_pad=None,
    padding: bool = True,
) -> jnp.ndarray:
    """Rescale xyxy boxes from letterboxed img1_shape back to img0_shape.

    Mirrors reference utils/ops.py:93 (gain = min ratio, centered pad).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    if padding:
        boxes = boxes - jnp.asarray([pad_w, pad_h, pad_w, pad_h], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, img0_shape)


def crop_mask(masks: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Zero mask pixels outside each box (reference utils/ops.py crop_mask).

    masks: (n, h, w); boxes: (n, 4) xyxy in mask coords."""
    n, h, w = masks.shape
    rows = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    cols = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    x1, y1, x2, y2 = boxes[:, 0:1, None], boxes[:, 1:2, None], boxes[:, 2:3, None], boxes[:, 3:4, None]
    keep = (cols >= x1) & (cols < x2) & (rows >= y1) & (rows < y2)
    return masks * keep


def process_mask(
    protos: jnp.ndarray,  # (h, w, nm)
    coeffs: jnp.ndarray,  # (n, nm)
    boxes: jnp.ndarray,  # (n, 4) xyxy in network-input pixels
    img_shape: tuple[int, int],  # network input (H, W)
) -> jnp.ndarray:
    """Prototype masks -> per-detection binary masks at proto resolution
    (reference utils/ops.py:680 process_mask)."""
    h, w, nm = protos.shape
    masks = jax.nn.sigmoid(coeffs @ protos.reshape(-1, nm).T).reshape(-1, h, w)
    scale = jnp.asarray([w / img_shape[1], h / img_shape[0], w / img_shape[1], h / img_shape[0]], boxes.dtype)
    return crop_mask(masks, boxes * scale)


def process_mask_native(
    protos: jnp.ndarray,  # (h, w, nm)
    coeffs: jnp.ndarray,  # (n, nm)
    boxes: jnp.ndarray,  # (n, 4) xyxy in ORIGINAL-image pixels
    img_shape: tuple[int, int],  # original image (H, W)
    input_shape: tuple[int, int] | None = None,  # network input (H, W); default 4x proto
) -> jnp.ndarray:
    """Native-resolution masks (reference utils/ops.py process_mask_native):
    mask logits at proto resolution are letterbox-unpadded, bilinearly
    upsampled to the original image shape, cropped to boxes, and
    thresholded at logit 0 (== sigmoid 0.5). Higher quality than
    `process_mask` (which crops at proto resolution); used by validators
    and Results when retina_masks is requested."""
    h, w, nm = protos.shape
    if input_shape is None:
        input_shape = (h * 4, w * 4)
    logits = (coeffs @ protos.reshape(-1, nm).T).reshape(-1, h, w)
    # undo the letterbox pad at proto resolution (reference scale_masks)
    gain = min(input_shape[0] / img_shape[0], input_shape[1] / img_shape[1])
    pad_h = (input_shape[0] - img_shape[0] * gain) / 2 * (h / input_shape[0])
    pad_w = (input_shape[1] - img_shape[1] * gain) / 2 * (w / input_shape[1])
    top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))
    bottom, right = h - int(round(pad_h + 0.1)), w - int(round(pad_w + 0.1))
    logits = logits[:, top:bottom, left:right]
    n = logits.shape[0]
    up = jax.image.resize(logits, (n, img_shape[0], img_shape[1]), method="bilinear")
    return crop_mask(up, boxes) > 0.0


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of two xyxy box sets: (N,4),(M,4) -> (N,M).

    Reference: utils/metrics.py:52.
    """
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:4], box2[..., None, :, 2:4])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
    area1 = jnp.prod(box1[..., 2:4] - box1[..., :2], axis=-1)
    area2 = jnp.prod(box2[..., 2:4] - box2[..., :2], axis=-1)
    return inter / (area1[..., :, None] + area2[..., None, :] - inter + eps)


def bbox_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    xywh: bool = True,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Elementwise (broadcasting) IoU / GIoU / DIoU / CIoU over last-dim-4 boxes.

    Numerics match reference utils/metrics.py:74-136 including its eps
    placement quirks (h1/h2 get +eps in the xyxy branch; w1/w2 do not).
    Returns shape broadcast(box1, box2) without the last axis, keepdims=1.
    """
    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                # alpha computed without gradient flow (reference uses no_grad)
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def xywh2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """center xywh -> top-left ltwh (reference ops.py:502)."""
    return jnp.concatenate([x[..., :2] - x[..., 2:4] / 2, x[..., 2:4]], -1)


def xyxy2ltwh(x: jnp.ndarray) -> jnp.ndarray:
    """xyxy -> top-left ltwh (reference ops.py:518)."""
    return jnp.concatenate([x[..., :2], x[..., 2:4] - x[..., :2]], -1)


def ltwh2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """top-left ltwh -> center xywh (reference ops.py:534)."""
    return jnp.concatenate([x[..., :2] + x[..., 2:4] / 2, x[..., 2:4]], -1)


def ltwh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """top-left ltwh -> xyxy (reference ops.py:604)."""
    return jnp.concatenate([x[..., :2], x[..., :2] + x[..., 2:4]], -1)


def clip_coords(coords: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip (..., 2+) point coords to image bounds (reference ops.py:357)."""
    x = jnp.clip(coords[..., 0], 0, shape[1])
    y = jnp.clip(coords[..., 1], 0, shape[0])
    return jnp.concatenate([jnp.stack([x, y], -1), coords[..., 2:]], -1) if coords.shape[-1] > 2 else jnp.stack([x, y], -1)


def scale_coords(img1_shape, coords: jnp.ndarray, img0_shape, ratio_pad=None, normalize: bool = False, padding: bool = True) -> jnp.ndarray:
    """Rescale (..., 2+) point coords from letterboxed img1 back to img0
    (reference ops.py:760 — keypoints path of scale_boxes)."""
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = (img1_shape[1] - img0_shape[1] * gain) / 2
        pad_h = (img1_shape[0] - img0_shape[0] * gain) / 2
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    xy = coords[..., :2]
    if padding:
        xy = xy - jnp.asarray([pad_w, pad_h], coords.dtype)
    xy = xy / gain
    out = jnp.concatenate([xy, coords[..., 2:]], -1) if coords.shape[-1] > 2 else xy
    out = clip_coords(out, img0_shape)
    if normalize:
        out = out.at[..., 0].set(out[..., 0] / img0_shape[1]).at[..., 1].set(out[..., 1] / img0_shape[0])
    return out
