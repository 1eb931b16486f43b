"""Dataset format converters (reference data/converter.py:19-648).

COCO json -> YOLO txt (boxes or segments, 91->80 class remap), DOTA
plaintext -> YOLO-OBB corner rows, and segmentation-mask folders ->
polygon labels. All pure host-side numpy/json work.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import List, Optional

import numpy as np


def coco91_to_coco80_class() -> List[Optional[int]]:
    """91-index (paper) -> 80-index (2014 dataset) map (reference :19)."""
    x = [None] * 91
    idx80 = 0
    missing = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}  # gaps in coco91
    for i in range(91):
        if (i + 1) in missing:
            continue
        if idx80 < 80:
            x[i] = idx80
            idx80 += 1
    return x


def coco80_to_coco91_class() -> List[int]:
    """80-index -> 91-index inverse map (reference :122)."""
    fwd = coco91_to_coco80_class()
    inv = [0] * 80
    for i91, i80 in enumerate(fwd):
        if i80 is not None:
            inv[i80] = i91 + 1
    return inv


def convert_coco(
    labels_dir: str,
    save_dir: str,
    use_segments: bool = False,
    cls91to80: bool = True,
) -> Path:
    """COCO instance json(s) -> YOLO txt labels (reference :222).

    Each `instances_*.json` under labels_dir becomes a directory of
    per-image txts under save_dir/labels/<split>/."""
    save = Path(save_dir)
    remap = coco91_to_coco80_class()
    for jf in sorted(Path(labels_dir).glob("*.json")):
        split = jf.stem.replace("instances_", "")
        out_dir = save / "labels" / split
        out_dir.mkdir(parents=True, exist_ok=True)
        data = json.loads(jf.read_text())
        images = {img["id"]: img for img in data["images"]}
        per_img = defaultdict(list)
        for ann in data["annotations"]:
            if ann.get("iscrowd"):
                continue
            per_img[ann["image_id"]].append(ann)
        for img_id, anns in per_img.items():
            img = images[img_id]
            w, h = img["width"], img["height"]
            lines = []
            for ann in anns:
                cat = ann["category_id"] - 1
                cls = remap[cat] if cls91to80 else cat
                if cls is None:
                    continue
                if use_segments and ann.get("segmentation"):
                    seg = ann["segmentation"]
                    if isinstance(seg, list) and seg:
                        pts = np.asarray(seg[0], np.float64).reshape(-1, 2)
                        pts[:, 0] /= w
                        pts[:, 1] /= h
                        lines.append(f"{cls} " + " ".join(f"{v:.6f}" for v in pts.reshape(-1)))
                        continue
                x, y, bw, bh = ann["bbox"]  # top-left xywh
                cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
            (out_dir / (Path(img["file_name"]).stem + ".txt")).write_text("\n".join(lines) + "\n")
    return save


# DOTA v1.0 class names -> indices (reference :426 class_mapping)
DOTA_CLASSES = {
    "plane": 0, "ship": 1, "storage-tank": 2, "baseball-diamond": 3, "tennis-court": 4,
    "basketball-court": 5, "ground-track-field": 6, "harbor": 7, "bridge": 8,
    "large-vehicle": 9, "small-vehicle": 10, "helicopter": 11, "roundabout": 12,
    "soccer-ball-field": 13, "swimming-pool": 14,
}


def convert_dota_to_yolo_obb(dota_root: str) -> Path:
    """DOTA 'x1 y1 ... y4 class difficulty' rows -> normalized YOLO-OBB
    corner rows (reference :426). Expects images/{train,val} +
    labels/{train,val}_original; writes labels/{train,val}."""
    from PIL import Image

    root = Path(dota_root)
    for split in ("train", "val"):
        orig = root / "labels" / f"{split}_original"
        if not orig.exists():
            continue
        out = root / "labels" / split
        out.mkdir(parents=True, exist_ok=True)
        for lf in sorted(orig.glob("*.txt")):
            img_path = None
            for ext in (".png", ".jpg", ".jpeg", ".bmp"):
                cand = root / "images" / split / (lf.stem + ext)
                if cand.exists():
                    img_path = cand
                    break
            if img_path is None:
                continue
            with Image.open(img_path) as im:
                w, h = im.size
            lines = []
            for row in lf.read_text().strip().splitlines():
                parts = row.split()
                if len(parts) < 9 or parts[8] not in DOTA_CLASSES:
                    continue
                cls = DOTA_CLASSES[parts[8]]
                pts = np.asarray([float(v) for v in parts[:8]], np.float64)
                pts[0::2] /= w
                pts[1::2] /= h
                lines.append(f"{cls} " + " ".join(f"{v:.6g}" for v in pts))
            (out / lf.name).write_text("\n".join(lines) + "\n")
    return root


def convert_segment_masks_to_yolo_seg(masks_dir: str, output_dir: str, classes: int) -> Path:
    """Per-pixel class-id mask images -> YOLO polygon labels
    (reference :350): each mask value v in [1, classes] becomes class
    v-1 polygons from its contours."""
    import cv2

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for mf in sorted(Path(masks_dir).glob("*.png")):
        mask = cv2.imread(str(mf), cv2.IMREAD_GRAYSCALE)
        h, w = mask.shape
        lines = []
        for v in np.unique(mask):
            if v == 0 or v > classes:
                continue
            contours, _ = cv2.findContours(
                (mask == v).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
            )
            for c in contours:
                if len(c) < 3:
                    continue
                pts = c.reshape(-1, 2).astype(np.float64)
                pts[:, 0] /= w
                pts[:, 1] /= h
                lines.append(f"{int(v) - 1} " + " ".join(f"{p:.6f}" for p in pts.reshape(-1)))
        (out / (mf.stem + ".txt")).write_text("\n".join(lines) + "\n")
    return out


def yolo_bbox2segment(im_dir: str, save_dir: Optional[str] = None, sam_model="sam_b") -> Path:
    """Convert a YOLO detection dataset to segmentation labels by running
    SAM on each box (reference converter.py:584 yolo_bbox2segment).

    Expects `im_dir/../labels/<stem>.txt` detection rows `cls cx cy w h`
    (normalized); writes polygon rows to `labels-segment` (or save_dir).
    `sam_model` may be a name or an already-built SAM facade instance.
    """
    import cv2

    if isinstance(sam_model, str):
        from ..models.sam import SAM

        sam_model = SAM(sam_model)
    im_dir = Path(im_dir)
    lbl_dir = im_dir.parent / "labels"
    out = Path(save_dir) if save_dir else im_dir.parent / "labels-segment"
    out.mkdir(parents=True, exist_ok=True)
    for img_path in sorted(p for p in im_dir.iterdir() if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp"}):
        lf = lbl_dir / (img_path.stem + ".txt")
        if not lf.exists():
            continue
        rows = [r.split() for r in lf.read_text().splitlines() if r.strip()]
        if rows and len(rows[0]) > 5:  # already segment labels
            (out / lf.name).write_text(lf.read_text())
            continue
        img = cv2.imread(str(img_path))
        h, w = img.shape[:2]
        lines = []
        if rows:
            cls = [int(float(r[0])) for r in rows]
            xywh = np.asarray([[float(v) for v in r[1:5]] for r in rows], np.float32)
            boxes = np.stack([
                (xywh[:, 0] - xywh[:, 2] / 2) * w, (xywh[:, 1] - xywh[:, 3] / 2) * h,
                (xywh[:, 0] + xywh[:, 2] / 2) * w, (xywh[:, 1] + xywh[:, 3] / 2) * h,
            ], 1)
            res = sam_model.predict(img, bboxes=boxes)
            for k, m in zip(cls, res[0].masks):
                contours, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
                if not contours:
                    continue
                c = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float64)
                if len(c) < 3:
                    continue
                c[:, 0] /= w
                c[:, 1] /= h
                lines.append(f"{k} " + " ".join(f"{p:.6f}" for p in np.clip(c, 0, 1).reshape(-1)))
        (out / lf.name).write_text("\n".join(lines) + ("\n" if lines else ""))
    return out
