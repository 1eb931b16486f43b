"""Auto-annotation: YOLO detections prompt SAM for segmentation labels.

Equivalent of reference data/annotator.py auto_annotate — detect with a
YOLO model, prompt a SAM model with the boxes, write YOLO-seg label txt
files (class + normalized polygon per instance). Model arguments accept
either names/paths or already-constructed facade instances (useful here
where pretrained weights can't be downloaded)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Union

import cv2
import numpy as np

IMG_SUFFIXES = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def _mask_to_polygon(mask: np.ndarray) -> Optional[np.ndarray]:
    """Largest-contour polygon of a boolean mask, (K, 2) pixel coords
    (reference sam_results[0].masks.xyn contract)."""
    contours, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    c = max(contours, key=cv2.contourArea).reshape(-1, 2)
    return c if len(c) >= 3 else None


def auto_annotate(
    data: Union[str, Path],
    det_model="yolov8n.yaml",
    sam_model="sam_b",
    conf: float = 0.25,
    iou: float = 0.45,
    imgsz: int = 640,
    max_det: int = 300,
    classes: Optional[List[int]] = None,
    output_dir: Optional[Union[str, Path]] = None,
) -> Path:
    """Annotate every image under `data`; returns the label directory."""
    if isinstance(det_model, (str, Path)):
        from ..engine.model import YOLO

        det_model = YOLO(str(det_model))
    if isinstance(sam_model, (str, Path)):
        from ..models.sam import SAM

        sam_model = SAM(str(sam_model))

    data = Path(data)
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    for img_path in sorted(p for p in data.iterdir() if p.suffix.lower() in IMG_SUFFIXES):
        results = det_model.predict(str(img_path), conf=conf, iou=iou, imgsz=imgsz, max_det=max_det)
        r = results[0]
        boxes = r.boxes.xyxy if len(r) else np.zeros((0, 4))
        cls_ids = r.boxes.cls.astype(int) if len(r) else np.zeros((0,), int)
        if classes is not None:
            keep = np.isin(cls_ids, classes)
            boxes, cls_ids = boxes[keep], cls_ids[keep]
        lines = []
        if len(boxes):
            sam_res = sam_model.predict(r.orig_img, bboxes=boxes)
            h, w = r.orig_img.shape[:2]
            for m, k in zip(sam_res[0].masks, cls_ids):
                poly = _mask_to_polygon(m)
                if poly is None:
                    continue
                norm = (poly / np.asarray([w, h], np.float32)).clip(0, 1).reshape(-1)
                lines.append(f"{int(k)} " + " ".join(f"{v:.6f}" for v in norm))
        (out / f"{img_path.stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
    return out
