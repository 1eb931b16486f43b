"""FastSAM: segment-anything via a YOLOv8-seg graph + prompt selection.

Re-design of reference models/fastsam/{model,predict,utils,val}.py:
the model IS a single-class YOLOv8-seg network (cfg/models/v8/FastSAM.yaml);
"segment anything" output is its everything-mode masks, and prompting is a
pure post-selection over Results:

  * box prompts  -> mask with max (area-in-box / union) per box
                    (reference predict.py:118-127);
  * point prompts-> masks containing foreground points, minus background
                    points (predict.py:128-144);
  * text prompts -> CLIP crop-vs-text similarity; requires real CLIP
                    embeddings (no egress here) via the utils/text_model
                    npz plug — a clear error otherwise (predict.py:145-158).

Deviation: the reference only accepts .pt weights (model.py:32); here a
YAML build is also allowed (no weight downloads exist in this
environment), with identical behavior once weights are loaded/trained.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..engine.model import YOLO
from ..engine.results import Masks, Results


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape, threshold: int = 20) -> np.ndarray:
    """Snap near-border boxes to the border (reference fastsam/utils.py:4-24)."""
    h, w = image_shape
    boxes = boxes.copy()
    boxes[boxes[:, 0] < threshold, 0] = 0
    boxes[boxes[:, 1] < threshold, 1] = 0
    boxes[boxes[:, 2] > w - threshold, 2] = w
    boxes[boxes[:, 3] > h - threshold, 3] = h
    return boxes


def _box_iou_1n(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:], boxes[:, 2:])
    inter = np.prod(np.clip(rb - lt, 0, None), axis=1)
    a1 = np.prod(box[2:] - box[:2])
    a2 = np.prod(boxes[:, 2:] - boxes[:, :2], axis=1)
    return inter / np.maximum(a1 + a2 - inter, 1e-9)


def prompt_select(
    results: List[Results],
    bboxes=None,
    points=None,
    labels=None,
    texts=None,
) -> List[Results]:
    """Filter everything-mode results by prompts (reference
    FastSAMPredictor.prompt, predict.py:79-150)."""
    if bboxes is None and points is None and texts is None:
        return results
    out = []
    for result in results:
        n = len(result)
        if n == 0 or result.masks is None:
            out.append(result)
            continue
        masks = np.asarray(result.masks).astype(bool)  # (n, H, W) original space
        idx = np.zeros(n, dtype=bool)
        if bboxes is not None:
            bb = np.atleast_2d(np.asarray(bboxes, np.int32))
            bbox_areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
            mask_areas = np.stack([masks[:, b[1]:b[3], b[0]:b[2]].sum(axis=(1, 2)) for b in bb])
            full = masks.sum(axis=(1, 2))
            union = bbox_areas[:, None] + full[None] - mask_areas
            idx[np.argmax(mask_areas / np.maximum(union, 1e-9), axis=1)] = True
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.int32))
            lbl = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
            assert len(lbl) == len(pts), f"labels size {len(lbl)} != points size {len(pts)}"
            point_idx = np.ones(n, bool) if lbl.sum() == 0 else np.zeros(n, bool)
            for p, l in zip(pts, lbl):
                hit = masks[:, p[1], p[0]]
                point_idx[hit] = bool(l)
            idx |= point_idx
        if texts is not None:
            raise ValueError(
                "FastSAM text prompts need real CLIP image/text embeddings; this "
                "environment has no egress for CLIP weights. Provide them via "
                "utils/text_model.encode_texts(npz_path=...) and a crop-embedding "
                "archive (reference predict.py:_clip_inference)."
            )
        out.append(_subset(result, idx))
    return out


def _subset(result: Results, idx: np.ndarray) -> Results:
    r = Results(result.orig_img, result.path, result.names, result.boxes.data[idx])
    if result.masks is not None:
        r.masks = Masks(np.asarray(result.masks)[idx], result.orig_shape)
    r.speed = result.speed
    return r


class FastSAM(YOLO):
    """FastSAM facade (reference models/fastsam/model.py): YOLOv8-seg
    nc=1 graph, prompt-filtered predictions."""

    def __init__(self, model: str = "FastSAM-s.yaml", verbose: bool = False):
        super().__init__(model, task="segment", verbose=verbose)
        if self.task != "segment":
            raise ValueError("FastSAM requires a segmentation graph")

    def predict(self, source, stream: bool = False, bboxes=None, points=None, labels=None,
                texts=None, **kwargs):
        kwargs.setdefault("conf", 0.4)
        results = super().predict(source, stream=stream, **kwargs)
        # everything mode: snap near-border boxes to the frame (reference
        # predict.py:66-76 full-box replacement)
        for r in results:
            if len(r):
                b = adjust_bboxes_to_image_border(r.boxes.data[:, :4], r.orig_shape)
                full = np.array([0, 0, r.orig_shape[1], r.orig_shape[0]], np.float32)
                iou = _box_iou_1n(full, b)
                b[iou > 0.9] = full
                r.boxes.data[:, :4] = b
        return prompt_select(results, bboxes=bboxes, points=points, labels=labels, texts=texts)
