"""Anchor-free grid math: anchor points, dist<->bbox transforms, DFL decode.

Functional equivalents of reference utils/tal.py:364-404 and the DFL
integral module (nn/modules/block.py:58-77). Anchors for static shapes
are computed once at trace time and constant-folded by XLA.
"""

from __future__ import annotations

import jax.nn
import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=jnp.float32):
    """Build concatenated anchor points and per-anchor strides.

    Args:
        feat_shapes: iterable of (h, w) per detection level.
        strides: iterable of int stride per level.

    Returns:
        anchor_points: (sum(h*w), 2) — (x, y) cell centers in grid units.
        stride_tensor: (sum(h*w), 1).

    Mirrors reference utils/tal.py:364 (meshgrid order: y rows, x cols;
    stacked (sx, sy)).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        sy, sx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack((sx, sy), -1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), stride, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """ltrb distances -> boxes (xywh or xyxy). Reference utils/tal.py:379."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate((c_xy, wh), axis=axis)
    return jnp.concatenate((x1y1, x2y2), axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float) -> jnp.ndarray:
    """xyxy boxes -> clamped ltrb distances. Reference utils/tal.py:391."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate((anchor_points - x1y1, x2y2 - anchor_points), axis=-1), 0, reg_max - 0.01
    )


def dfl_decode(pred_dist: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss integral decode.

    Args:
        pred_dist: (..., 4 * reg_max) raw logits with layout [4, reg_max]
            when reshaped (matching reference block.py:75 `view(b,4,c1,a)`
            on channel-major data == our (..., 4, reg_max) on channel-last).

    Returns:
        (..., 4) expected ltrb distances: softmax over reg_max bins dotted
        with arange(reg_max).
    """
    shape = pred_dist.shape[:-1]
    x = pred_dist.reshape(*shape, 4, reg_max)
    proj = jnp.arange(reg_max, dtype=x.dtype)
    return (jax.nn.softmax(x, axis=-1) * proj).sum(-1)
