"""DOTA sliding-window tiling (reference data/split_dota.py:17-280).

Large aerial scenes split into overlapping crops with label reassignment
by intersection-over-foreground; crops keeping >= iof_thr of an object
inherit it (coords shifted + renormalized)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np


def bbox_iof(polygon1: np.ndarray, bbox2: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """IoF between polygons (n, 8 corner coords) and window boxes (m, 4
    xyxy): intersection area approximated by the polygon's bbox clipped
    to the window, over the polygon bbox area (reference :17 semantics)."""
    pts = polygon1.reshape(-1, 4, 2)
    lt = pts.min(1)  # (n, 2)
    rb = pts.max(1)
    box1 = np.concatenate([lt, rb], 1)  # (n, 4)
    tl = np.maximum(box1[:, None, :2], bbox2[None, :, :2])
    br = np.minimum(box1[:, None, 2:], bbox2[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area1 = np.prod(rb - lt, axis=1)
    return inter / (area1[:, None] + eps)


def get_windows(
    im_size: Tuple[int, int],
    crop_sizes=(1024,),
    gaps=(200,),
    im_rate_thr: float = 0.6,
) -> np.ndarray:
    """Sliding windows (xyxy) covering (h, w) (reference :100): stride =
    crop - gap; windows keeping < im_rate_thr image content are dropped
    unless no window qualifies."""
    h, w = im_size
    windows = []
    for crop, gap in zip(crop_sizes, gaps):
        step = crop - gap
        xn = 1 if w <= crop else int(np.ceil((w - crop) / step + 1))
        xs = [min(step * i, max(w - crop, 0)) for i in range(xn)]
        yn = 1 if h <= crop else int(np.ceil((h - crop) / step + 1))
        ys = [min(step * i, max(h - crop, 0)) for i in range(yn)]
        for y0 in ys:
            for x0 in xs:
                windows.append([x0, y0, x0 + crop, y0 + crop])
    windows = np.asarray(windows, np.float64)
    clipped = windows.copy()
    clipped[:, 0::2] = clipped[:, 0::2].clip(0, w)
    clipped[:, 1::2] = clipped[:, 1::2].clip(0, h)
    areas = np.prod(clipped[:, 2:] - clipped[:, :2], 1)
    full = np.prod(windows[:, 2:] - windows[:, :2], 1)
    rates = areas / full
    if not (rates > im_rate_thr).any():
        rates[rates.argmax()] = 1.0
    return windows[rates > im_rate_thr]


def split_images_and_labels(
    data_root: str, save_dir: str, split: str = "train",
    crop_sizes=(1024,), gaps=(200,), iof_thr: float = 0.7,
) -> List[str]:
    """Tile every image+label of a DOTA-style split (YOLO-OBB corner
    labels) into crops under save_dir (reference :206)."""
    import cv2

    root, save = Path(data_root), Path(save_dir)
    im_out = save / "images" / split
    lb_out = save / "labels" / split
    im_out.mkdir(parents=True, exist_ok=True)
    lb_out.mkdir(parents=True, exist_ok=True)
    written = []
    for imf in sorted((root / "images" / split).iterdir()):
        if imf.suffix.lower() not in {".png", ".jpg", ".jpeg", ".bmp"}:
            continue
        img = cv2.imread(str(imf))
        h, w = img.shape[:2]
        lf = root / "labels" / split / (imf.stem + ".txt")
        rows = []
        if lf.exists():
            for line in lf.read_text().strip().splitlines():
                vals = line.split()
                cls = int(float(vals[0]))
                pts = np.asarray([float(v) for v in vals[1:9]], np.float64)
                pts[0::2] *= w
                pts[1::2] *= h
                rows.append((cls, pts))
        polys = np.stack([p for _, p in rows]) if rows else np.zeros((0, 8))
        windows = get_windows((h, w), crop_sizes, gaps)
        iof = bbox_iof(polys, windows) if len(rows) else np.zeros((0, len(windows)))
        for wi, win in enumerate(windows.astype(int)):
            x0, y0, x1, y1 = win
            crop = img[y0 : min(y1, h), x0 : min(x1, w)]
            ch, cw = crop.shape[:2]
            lines = []
            for ri, (cls, pts) in enumerate(rows):
                if iof[ri, wi] >= iof_thr:
                    q = pts.copy()
                    q[0::2] = (q[0::2] - x0) / cw
                    q[1::2] = (q[1::2] - y0) / ch
                    lines.append(f"{cls} " + " ".join(f"{v:.6g}" for v in q))
            if not lines:
                continue  # skip background crops (allow_background_images=False path)
            name = f"{imf.stem}__{x0}__{y0}"
            cv2.imwrite(str(im_out / f"{name}{imf.suffix}"), crop)
            (lb_out / f"{name}.txt").write_text("\n".join(lines) + "\n")
            written.append(name)
    return written


def split_trainval(data_root: str, save_dir: str, crop_size: int = 1024, gap: int = 200) -> None:
    """Tile both train and val splits (reference :243)."""
    for split in ("train", "val"):
        if (Path(data_root) / "images" / split).exists():
            split_images_and_labels(data_root, save_dir, split, (crop_size,), (gap,))
