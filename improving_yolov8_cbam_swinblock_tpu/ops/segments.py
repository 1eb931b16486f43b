"""Host-side polygon/mask utilities (reference utils/ops.py:66-858).

These run in the label pipeline and Results post-processing on the host
(numpy/cv2), never inside a jitted graph — dynamic polygon lengths would
defeat XLA's static shapes, and the reference runs them on CPU too.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np


def segment2box(segment: np.ndarray, width: int = 640, height: int = 640) -> np.ndarray:
    """One (n, 2) polygon -> xyxy box over its inside-image points
    (reference ops.py:66)."""
    x, y = segment.T
    keep = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[keep], y[keep]
    if not len(x):
        return np.zeros(4, segment.dtype)
    return np.array([x.min(), y.min(), x.max(), y.max()], segment.dtype)


def segments2boxes(segments: Sequence[np.ndarray]) -> np.ndarray:
    """Polygons -> (n, 4) center-xywh boxes (reference ops.py:620)."""
    boxes = []
    for s in segments:
        x, y = np.asarray(s, np.float32).T
        boxes.append([x.min(), y.min(), x.max(), y.max()] if len(x) else [0, 0, 0, 0])
    b = np.asarray(boxes, np.float32).reshape(-1, 4)
    return np.concatenate([(b[:, :2] + b[:, 2:]) / 2, b[:, 2:] - b[:, :2]], -1)


def resample_segments(segments: Sequence[np.ndarray], n: int = 1000) -> List[np.ndarray]:
    """Up/down-sample each closed polygon to exactly n points by linear
    interpolation along the closed contour (reference ops.py:637)."""
    out = []
    for s in segments:
        s = np.asarray(s, np.float32)
        if len(s) == 0:
            out.append(np.zeros((n, 2), np.float32))
            continue
        s = np.concatenate([s, s[0:1]], axis=0)  # close the ring
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.stack([np.interp(x, xp, s[:, i]) for i in range(2)], -1).astype(np.float32))
    return out


def masks2segments(masks: np.ndarray, strategy: str = "all") -> List[np.ndarray]:
    """(n, h, w) binary masks -> list of (k, 2) polygons (reference
    ops.py:814). strategy 'all' concatenates every contour, 'largest'
    keeps the biggest."""
    import cv2

    out = []
    for m in np.asarray(masks).astype(np.uint8):
        cnts = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)[0]
        if cnts:
            if strategy == "largest":
                c = np.array(max(cnts, key=cv2.contourArea)).reshape(-1, 2)
            else:  # 'all': concatenate
                c = np.concatenate([x.reshape(-1, 2) for x in cnts])
        else:
            c = np.zeros((0, 2))
        out.append(c.astype(np.float32))
    return out


def scale_image(masks: np.ndarray, im0_shape, ratio_pad=None) -> np.ndarray:
    """Un-letterbox an (h1, w1[, c]) image/mask back to im0 shape:
    crop the pad then resize (reference ops.py:377)."""
    import cv2

    im1_shape = masks.shape[:2]
    if tuple(im1_shape) == tuple(im0_shape[:2]):
        return masks
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = (im1_shape[1] - im0_shape[1] * gain) / 2, (im1_shape[0] - im0_shape[0] * gain) / 2
    else:
        pad = ratio_pad[1]
    top, left = int(round(pad[1] - 0.1)), int(round(pad[0] - 0.1))
    bottom, right = im1_shape[0] - int(round(pad[1] + 0.1)), im1_shape[1] - int(round(pad[0] + 0.1))
    cropped = masks[top:bottom, left:right]
    out = cv2.resize(cropped, (im0_shape[1], im0_shape[0]))
    return out[..., None] if masks.ndim == 3 and out.ndim == 2 else out


def scale_masks(masks: np.ndarray, shape, padding: bool = True) -> np.ndarray:
    """(n, h, w) masks at network resolution -> target shape, removing
    letterbox pad first when padding=True (reference ops.py:733)."""
    import cv2

    n, mh, mw = masks.shape
    gain = min(mh / shape[0], mw / shape[1])
    if padding:
        pad_w, pad_h = (mw - shape[1] * gain) / 2, (mh - shape[0] * gain) / 2
        top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))
        bottom, right = mh - int(round(pad_h + 0.1)), mw - int(round(pad_w + 0.1))
        masks = masks[:, top:bottom, left:right]
    return np.stack(
        [cv2.resize(m.astype(np.float32), (shape[1], shape[0]), interpolation=cv2.INTER_LINEAR) for m in masks]
    )


def empty_like(x):
    """Uninitialized float32 array with x's shape (reference ops.py
    empty_like — a fast-alloc helper; numpy here, jax arrays are
    converted since XLA buffers are never uninitialized)."""
    return np.empty_like(np.asarray(x), dtype=np.float32)


def convert_torch2numpy_batch(batch) -> np.ndarray:
    """Normalized (B, C, H, W) float batch -> (B, H, W, C) uint8 numpy
    (reference ops.py convert_torch2numpy_batch — name kept for
    migration; accepts torch tensors, jax arrays, or numpy)."""
    if hasattr(batch, "permute"):  # torch tensor
        batch = batch.permute(0, 2, 3, 1).contiguous().cpu().numpy()
    else:
        batch = np.transpose(np.asarray(batch), (0, 2, 3, 1))
    return np.clip(batch * 255, 0, 255).astype(np.uint8)


def clean_str(s: str) -> str:
    """Replace special characters with underscores (reference ops.py:858)."""
    return re.sub(r"[|@#!¡·$€%&()=?¿^*;:,¨´><+]", "_", str(s))
