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


class Colors:
    """Indexable color palette (reference plotting.py:20 Colors): call with
    a class index to get a stable (B, G, R) (or RGB with bgr=False) tuple;
    `pose_palette` holds the keypoint/limb colors."""

    def __init__(self):
        self.palette = [p[::-1] for p in _PALETTE]  # store RGB
        self.n = len(self.palette)
        self.pose_palette = np.array(
            [
                (255, 128, 0), (255, 153, 51), (255, 178, 102), (230, 230, 0), (255, 153, 255),
                (153, 204, 255), (255, 102, 255), (255, 51, 255), (102, 178, 255), (51, 153, 255),
                (255, 153, 153), (255, 102, 102), (255, 51, 51), (153, 255, 153), (102, 255, 102),
                (51, 255, 51), (0, 255, 0), (0, 0, 255), (255, 0, 0), (255, 255, 255),
            ],
            dtype=np.uint8,
        )

    def __call__(self, i: int, bgr: bool = False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()

# COCO-17 skeleton limb pairs (1-indexed, reference Annotator.__init__)
_SKELETON = [
    [16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12], [7, 13], [6, 7],
    [6, 8], [7, 9], [8, 10], [9, 11], [2, 3], [1, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 7],
]


def color_for(idx: int):
    return _PALETTE[int(idx) % len(_PALETTE)]


class Annotator:
    """Draw boxes/labels/masks/keypoints on an image (reference
    plotting.py:158). cv2-only — the reference's PIL branch (non-ASCII
    fonts) is a documented deviation; all drawing is in-place on `.img`
    (aliased as `.im` for reference-compatible call sites)."""

    def __init__(self, img: np.ndarray, line_width: Optional[int] = None, names: Optional[Dict] = None, **_):
        self.img = np.ascontiguousarray(img)
        self.lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        self.tf = max(self.lw - 1, 1)  # font thickness
        self.sf = self.lw / 3  # font scale
        self.names = names or {}
        self.skeleton = _SKELETON
        self.limb_color = colors.pose_palette[[9, 9, 9, 9, 7, 7, 7, 0, 0, 0, 0, 0, 16, 16, 16, 16, 16, 16, 16]]
        self.kpt_color = colors.pose_palette[[16, 16, 16, 16, 16, 0, 0, 0, 0, 0, 0, 9, 9, 9, 9, 9, 9]]

    @property
    def im(self):  # reference attribute name
        return self.img

    @staticmethod
    def get_txt_color(color=(128, 128, 128), txt_color=(255, 255, 255)):
        """White text on dark boxes, black on light ones (reference
        get_txt_color, plotting.py:252 — luma heuristic instead of its
        hard-coded color sets)."""
        luma = 0.299 * color[2] + 0.587 * color[1] + 0.114 * color[0]
        return (0, 0, 0) if luma > 160 else txt_color

    def box_label(self, box: Sequence[float], label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255), rotated: bool = False):
        txt_color = self.get_txt_color(color, txt_color)
        if rotated:
            pts = np.asarray(box, np.int32).reshape(-1, 1, 2)
            cv2.polylines(self.img, [pts], True, color, self.lw, cv2.LINE_AA)
            p1 = tuple(pts[0, 0])
        else:
            p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
            cv2.rectangle(self.img, p1, p2, color, self.lw, cv2.LINE_AA)
        if label:
            w, h = cv2.getTextSize(label, 0, self.sf, self.tf)[0]
            outside = p1[1] - h >= 3
            p2t = (p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3)
            cv2.rectangle(self.img, p1, p2t, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.img, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.sf, txt_color, self.tf, cv2.LINE_AA,
            )

    def masks(self, masks: np.ndarray, colors_: Sequence, alpha: float = 0.5):
        """Alpha-blend instance masks (reference Annotator.masks,
        plotting.py:340 — numpy blend instead of its CUDA tensor path).
        masks: (n, h, w) bool/0-1 at any resolution (resized to the image)."""
        h, w = self.img.shape[:2]
        for m, c in zip(np.asarray(masks), colors_):
            if m.shape != (h, w):
                m = cv2.resize(m.astype(np.uint8), (w, h), interpolation=cv2.INTER_NEAREST)
            sel = m.astype(bool)
            self.img[sel] = (self.img[sel] * (1 - alpha) + np.array(c, np.float32) * alpha).astype(self.img.dtype)

    def kpts(self, kpts: np.ndarray, shape=None, radius: Optional[int] = None, kpt_line: bool = True, conf_thres: float = 0.25):
        """Draw one instance's keypoints + COCO skeleton limbs (reference
        Annotator.kpts, plotting.py:376). kpts: (K, 2|3) pixel coords."""
        kpts = np.asarray(kpts, np.float32)
        radius = radius or max(self.lw, 2)
        nk = len(kpts)
        is_pose = nk == 17
        conf = kpts[:, 2] if kpts.shape[-1] == 3 else np.ones(nk, np.float32)
        for i, (pt, cf) in enumerate(zip(kpts, conf)):
            if cf < conf_thres:
                continue
            c = tuple(int(v) for v in self.kpt_color[i]) if is_pose else colors(i)
            cv2.circle(self.img, (int(pt[0]), int(pt[1])), radius, c, -1, cv2.LINE_AA)
        if kpt_line and is_pose:
            for j, (a, b) in enumerate(self.skeleton):
                if conf[a - 1] < conf_thres or conf[b - 1] < conf_thres:
                    continue
                p1 = (int(kpts[a - 1, 0]), int(kpts[a - 1, 1]))
                p2 = (int(kpts[b - 1, 0]), int(kpts[b - 1, 1]))
                cv2.line(self.img, p1, p2, tuple(int(v) for v in self.limb_color[j]), max(self.lw // 2, 1), cv2.LINE_AA)

    def rectangle(self, xy: Sequence[float], fill=None, outline=None, width: int = 1):
        """PIL-style rectangle (reference Annotator.rectangle)."""
        p1, p2 = (int(xy[0]), int(xy[1])), (int(xy[2]), int(xy[3]))
        if fill is not None:
            cv2.rectangle(self.img, p1, p2, fill, -1)
        if outline is not None or fill is None:
            cv2.rectangle(self.img, p1, p2, outline or (255, 255, 255), width)

    def text(self, xy: Sequence[float], text: str, txt_color=(255, 255, 255), box_style: bool = False):
        """Text at xy, optionally on a filled background box (reference
        Annotator.text, plotting.py:440)."""
        w, h = cv2.getTextSize(text, 0, self.sf, self.tf)[0]
        org = (int(xy[0]), int(xy[1]) + h)
        if box_style:
            cv2.rectangle(self.img, (org[0] - 2, org[1] - h - 3), (org[0] + w + 2, org[1] + 3), txt_color, -1)
            txt_color = self.get_txt_color(txt_color)
        cv2.putText(self.img, text, org, 0, self.sf, txt_color, self.tf, cv2.LINE_AA)

    def circle_label(self, box: Sequence[float], label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        """Label in a filled circle at the box center (reference
        Annotator.circle_label — used by solutions)."""
        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        w, h = cv2.getTextSize(str(label), 0, self.sf, self.tf)[0]
        r = max(w, h) // 2 + 6
        cv2.circle(self.img, (cx, cy), r, color, -1, cv2.LINE_AA)
        cv2.putText(self.img, str(label), (cx - w // 2, cy + h // 2), 0, self.sf,
                    self.get_txt_color(color, txt_color), self.tf, cv2.LINE_AA)

    def text_label(self, box: Sequence[float], label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        """Label in a filled rectangle at the box center (reference
        Annotator.text_label)."""
        cx, cy = int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2)
        w, h = cv2.getTextSize(str(label), 0, self.sf, self.tf)[0]
        cv2.rectangle(self.img, (cx - w // 2 - 4, cy - h // 2 - 4), (cx + w // 2 + 4, cy + h // 2 + 4), color, -1)
        cv2.putText(self.img, str(label), (cx - w // 2, cy + h // 2), 0, self.sf,
                    self.get_txt_color(color, txt_color), self.tf, cv2.LINE_AA)

    @staticmethod
    def get_bbox_dimension(bbox: Sequence[float]):
        """(width, height, area) of an xyxy box (reference
        get_bbox_dimension, plotting.py:504)."""
        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
        return w, h, w * h

    def result(self) -> np.ndarray:
        return self.img

    def show(self, title: Optional[str] = None):
        try:
            cv2.imshow(title or "image", self.img)
            cv2.waitKey(1)
        except Exception:
            pass

    def save(self, filename: str = "image.jpg"):
        cv2.imwrite(filename, self.img)
        return filename


def save_one_box(xyxy, im: np.ndarray, file: Optional[str] = None, gain: float = 1.02, pad: int = 10, square: bool = False, save: bool = True):
    """Crop a gain/pad-expanded box from an image, optionally saving it
    (reference save_one_box, plotting.py:593)."""
    b = np.asarray(xyxy, np.float32).reshape(-1, 4)[0]
    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
    w, h = (b[2] - b[0]) * gain + pad, (b[3] - b[1]) * gain + pad
    if square:
        w = h = max(w, h)
    x1, y1 = int(max(cx - w / 2, 0)), int(max(cy - h / 2, 0))
    x2, y2 = int(min(cx + w / 2, im.shape[1])), int(min(cy + h / 2, im.shape[0]))
    crop = im[y1:y2, x1:x2]
    if save and file is not None:
        Path(file).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(file), crop)
    return crop


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


def plot_tune_results(csv_path: str = "tune_results.csv") -> Optional[str]:
    """tune_results.csv -> scatter grid + fitness-vs-iteration curves.

    Reference plotting.py:897 plot_tune_results: one viridis scatter per
    hyperparameter (value vs fitness, best draw marked "+"), saved as
    tune_scatter_plots.png, plus tune_fitness.png with a smoothed trend.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    import csv as _csv

    csv_path = Path(csv_path)
    rows = list(_csv.DictReader(open(csv_path)))
    if not rows:
        return None
    keys = [k for k in rows[0] if k != "fitness"]
    fitness = np.array([float(r["fitness"] or 0.0) for r in rows])
    j = int(np.argmax(fitness))
    n = int(np.ceil(len(keys) ** 0.5))
    fig = plt.figure(figsize=(10, 10), tight_layout=True)
    for i, k in enumerate(keys):
        v = np.array([float(r[k]) if r[k] else np.nan for r in rows])
        ax = fig.add_subplot(n, n, i + 1)
        ax.scatter(v, fitness, c=fitness, cmap="viridis", alpha=0.8, edgecolors="none")
        ax.plot(v[j], fitness.max(), "k+", markersize=15)
        ax.set_title(f"{k} = {v[j]:.3g}", fontdict={"size": 9})
        ax.tick_params(axis="both", labelsize=8)
        if i % n != 0:
            ax.set_yticks([])
    scatter_out = str(csv_path.with_name("tune_scatter_plots.png"))
    fig.savefig(scatter_out, dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(10, 6), tight_layout=True)
    x = np.arange(1, len(fitness) + 1)
    ax.plot(x, fitness, marker="o", linestyle="none", label="fitness")
    if len(fitness) >= 3:  # reference smooths with gaussian_filter1d(sigma=3)
        from scipy.ndimage import gaussian_filter1d

        ax.plot(x, gaussian_filter1d(fitness, sigma=3), ":", linewidth=2, label="smoothed")
    ax.set_title("Fitness vs Iteration")
    ax.set_xlabel("Iteration")
    ax.set_ylabel("Fitness")
    ax.legend()
    fig.savefig(str(csv_path.with_name("tune_fitness.png")), dpi=120)
    plt.close(fig)
    return scatter_out


def output_to_target(output, max_det: int = 300):
    """NMS output (B, n, 6+) xyxy+conf+cls -> (batch_id, class_id,
    xywh boxes, conf) arrays for plot_images (reference plotting.py:952)."""
    bids, clss, boxes, confs = [], [], [], []
    for i, o in enumerate(np.asarray(output)):
        o = o[:max_det]
        o = o[o[:, 4] > 0]
        xyxy = o[:, :4]
        xywh = np.concatenate([(xyxy[:, :2] + xyxy[:, 2:4]) / 2, xyxy[:, 2:4] - xyxy[:, :2]], 1)
        bids.append(np.full(len(o), i))
        clss.append(o[:, 5])
        boxes.append(xywh)
        confs.append(o[:, 4])
    if not bids:
        return np.zeros(0), np.zeros(0), np.zeros((0, 4)), np.zeros(0)
    return (
        np.concatenate(bids), np.concatenate(clss),
        np.concatenate(boxes), np.concatenate(confs),
    )


def output_to_rotated_target(output, max_det: int = 300):
    """Rotated NMS output (B, n, 7) xywh+conf+cls+angle -> (batch_id,
    class_id, xywhr boxes, conf) (reference plotting.py:963)."""
    bids, clss, boxes, confs = [], [], [], []
    for i, o in enumerate(np.asarray(output)):
        o = o[:max_det]
        o = o[o[:, 4] > 0]
        bids.append(np.full(len(o), i))
        clss.append(o[:, 5])
        boxes.append(np.concatenate([o[:, :4], o[:, 6:7]], 1))  # x, y, w, h, angle
        confs.append(o[:, 4])
    if not bids:
        return np.zeros(0), np.zeros(0), np.zeros((0, 5)), np.zeros(0)
    return (
        np.concatenate(bids), np.concatenate(clss),
        np.concatenate(boxes), np.concatenate(confs),
    )


def plt_color_scatter(v, f, bins: int = 20, cmap: str = "viridis", alpha: float = 0.8,
                      edgecolors: str = "none"):
    """Scatter colored by 2d-histogram density (reference plotting.py:930;
    used by the tuner's evolution plots)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    v, f = np.asarray(v), np.asarray(f)
    hist, xe, ye = np.histogram2d(v, f, bins=bins)
    colors = [
        hist[
            min(np.digitize(vi, xe, right=True) - 1, hist.shape[0] - 1),
            min(np.digitize(fi, ye, right=True) - 1, hist.shape[1] - 1),
        ]
        for vi, fi in zip(v, f)
    ]
    plt.scatter(v, f, c=colors, cmap=cmap, alpha=alpha, edgecolors=edgecolors)
