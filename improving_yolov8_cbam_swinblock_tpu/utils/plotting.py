"""Plotting: annotator, train-batch mosaics, results curves.

Equivalents of reference utils/plotting.py:158-1005 (Annotator,
plot_images, plot_results) trimmed to detection needs; pure cv2/numpy
(matplotlib optional for curves)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

# Ultralytics-style color pose palette (reference plotting.py Colors)
_PALETTE = [
    (4, 42, 255), (11, 219, 235), (243, 243, 243), (0, 223, 183), (17, 31, 104),
    (255, 111, 221), (255, 68, 79), (204, 237, 0), (0, 243, 68), (189, 0, 255),
    (0, 180, 255), (221, 0, 186), (0, 192, 38), (255, 36, 125), (104, 0, 123),
    (108, 27, 255), (47, 109, 252), (104, 31, 17),
]


def color_for(idx: int):
    return _PALETTE[int(idx) % len(_PALETTE)]


class Annotator:
    """Draw boxes/labels/masks on an image (reference plotting.py:158)."""

    def __init__(self, img: np.ndarray, line_width: Optional[int] = None, names: Optional[Dict] = None):
        self.img = np.ascontiguousarray(img)
        self.lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        self.names = names or {}

    def box_label(self, box: Sequence[float], label: str = "", color=(128, 128, 128)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.img, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - h >= 3
            p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
            cv2.rectangle(self.img, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.img, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.lw / 3, (255, 255, 255), tf, cv2.LINE_AA,
            )

    def result(self) -> np.ndarray:
        return self.img


def plot_images(
    images: np.ndarray,  # (B, H, W, 3) uint8 RGB
    cls: np.ndarray,  # (B, G)
    bboxes: np.ndarray,  # (B, G, 4) normalized xywh
    mask: np.ndarray,  # (B, G)
    fname: str = "train_batch.jpg",
    names: Optional[Dict] = None,
    max_images: int = 16,
) -> str:
    """Training-batch mosaic grid (reference plotting.py:638)."""
    b = min(len(images), max_images)
    ns = int(np.ceil(b**0.5))
    h, w = images.shape[1:3]
    grid = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(b):
        r, c = divmod(i, ns)
        img = images[i][..., ::-1].copy()  # RGB->BGR for cv2 drawing
        ann = Annotator(img, names=names)
        for j in range(bboxes.shape[1]):
            if mask[i, j] > 0:
                cx, cy, bw, bh = bboxes[i, j]
                box = [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h]
                k = int(cls[i, j])
                ann.box_label(box, (names or {}).get(k, str(k)), color_for(k))
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = ann.result()
    cv2.imwrite(fname, grid)
    return fname


def plot_labels(
    cls: np.ndarray,  # (N,) class ids of every instance
    boxes: np.ndarray,  # (N, 4) normalized xywh
    names: Optional[Dict] = None,
    save_dir: str = ".",
) -> Optional[str]:
    """Dataset label statistics grid: class histogram, box-center heatmap,
    width/height scatter (reference plotting.py plot_labels)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    cls = np.asarray(cls).astype(int).reshape(-1)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    nc = int(cls.max()) + 1 if len(cls) else 1
    axes[0, 0].hist(cls, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_title("instances per class")
    if names:
        axes[0, 0].set_xticks(range(nc))
        axes[0, 0].set_xticklabels([str(names.get(i, i)) for i in range(nc)], rotation=90, fontsize=7)
    axes[0, 1].hist2d(boxes[:, 0], 1 - boxes[:, 1], bins=50, range=[[0, 1], [0, 1]], cmap="Blues")
    axes[0, 1].set_title("box centers (x, y)")
    axes[1, 0].hist2d(boxes[:, 2], boxes[:, 3], bins=50, range=[[0, 1], [0, 1]], cmap="Blues")
    axes[1, 0].set_title("box sizes (w, h)")
    axes[1, 1].scatter(boxes[:, 2], boxes[:, 3], s=2, alpha=0.3)
    axes[1, 1].set_title("w vs h")
    fig.tight_layout()
    out = str(Path(save_dir) / "labels.jpg")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def feature_visualization(features, module_name: str, save_dir: str = ".", n: int = 32) -> Optional[str]:
    """Per-channel feature-map grid for one layer's output (reference
    plotting.py:974 feature_visualization). `features` is a (B, H, W, C)
    NHWC array; the first batch element's first n channels are tiled."""
    f = np.asarray(features)
    if f.ndim != 4:
        return None
    f = f[0]  # (H, W, C)
    c = min(n, f.shape[-1])
    ns = int(np.ceil(c**0.5))
    h, w = f.shape[:2]
    grid = np.zeros((ns * h, ns * w), np.float32)
    for i in range(c):
        ch = f[..., i].astype(np.float32)
        lo, hi = float(ch.min()), float(ch.max())
        ch = (ch - lo) / (hi - lo + 1e-9)
        r, col = divmod(i, ns)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = ch
    out = str(Path(save_dir) / f"{module_name}_features.png")
    cv2.imwrite(out, (grid * 255).astype(np.uint8))
    return out


def plot_results(csv_path: str, out: Optional[str] = None) -> Optional[str]:
    """results.csv -> results.png curves (reference plotting.py plot_results)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import csv as _csv

    rows = list(_csv.DictReader(open(csv_path)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch", "time_s")]
    epochs = [int(float(r["epoch"])) for r in rows]
    n = len(keys)
    ncols = min(4, n)
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        vals = [float(r[k]) if r[k] else float("nan") for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    fig.tight_layout()
    out = out or str(Path(csv_path).with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
