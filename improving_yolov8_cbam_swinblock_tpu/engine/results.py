"""Inference result containers (reference engine/results.py:187-1258,
detection subset): numpy-backed, device-agnostic."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Boxes:
    """Detection boxes: (n, 6) [x1, y1, x2, y2, conf, cls] in original
    image coordinates (reference results.py:1041)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, dtype=np.float32).reshape(-1, 6)
        self.orig_shape = tuple(orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack(
            [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1
        )

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h], np.float32)

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h], np.float32)

    def __len__(self):
        return len(self.data)


class OBB:
    """Oriented boxes: (n, 7) [x, y, w, h, angle, conf, cls] in original
    image coordinates (reference results.py:1622)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, dtype=np.float32).reshape(-1, 7)
        self.orig_shape = tuple(orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """(n, 4, 2) corner points."""
        x, y, w, h, r = (self.data[:, i] for i in range(5))
        c, s = np.cos(r), np.sin(r)
        vx = np.stack([w / 2 * c, w / 2 * s], -1)
        vy = np.stack([-h / 2 * s, h / 2 * c], -1)
        ctr = self.data[:, :2]
        return np.stack([ctr + vx + vy, ctr + vx - vy, ctr - vx - vy, ctr - vx + vy], axis=1)

    @property
    def xyxy(self):
        """Axis-aligned enclosing boxes (n, 4)."""
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(1), pts.max(1)], axis=-1)

    def __len__(self):
        return len(self.data)


class Keypoints:
    """Pose keypoints: (n, K, 2|3) [x, y(, visibility)] in original image
    coordinates (reference results.py:1357)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data, dtype=np.float32)
        self.orig_shape = tuple(orig_shape)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.array([w, h], np.float32)

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None

    def __len__(self):
        return len(self.data)


class Results:
    """One image's predictions (reference results.py:187)."""

    def __init__(self, orig_img: np.ndarray, path: str, names: Dict[int, str], boxes: Optional[np.ndarray] = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes if boxes is not None else np.zeros((0, 6)), self.orig_shape)
        self.masks = None  # (n, H, W) bool when the model is a segmenter
        self.keypoints = None  # Keypoints when the model is a pose model
        self.obb = None  # OBB when the model is an obb model
        self.probs = None  # (nc,) class probabilities for classify models
        self.speed = {"preprocess": None, "inference": None, "postprocess": None}

    def __len__(self):
        return len(self.boxes)

    def summary(self):
        out = []
        for row in self.boxes.data:
            out.append(
                {
                    "name": self.names.get(int(row[5]), str(int(row[5]))),
                    "class": int(row[5]),
                    "confidence": round(float(row[4]), 5),
                    "box": {"x1": float(row[0]), "y1": float(row[1]), "x2": float(row[2]), "y2": float(row[3])},
                }
            )
        return out

    def to_json(self):
        import json

        return json.dumps(self.summary(), indent=2)

    def plot(self, line_width: Optional[int] = None):
        """Draw boxes on a copy of the original image (BGR)."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        for row in self.boxes.data:
            x1, y1, x2, y2, conf, cls = row
            color = tuple(int(c) for c in np.array([37, 255, 225]) * ((int(cls) % 5 + 1) / 5))
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
            label = f"{self.names.get(int(cls), int(cls))} {conf:.2f}"
            cv2.putText(img, label, (int(x1), max(int(y1) - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX, lw / 6, color, 1)
        return img

    def save(self, filename: str):
        import cv2

        cv2.imwrite(filename, self.plot())
        return filename

    def save_txt(self, txt_file: str, save_conf: bool = False):
        """YOLO-format label lines: cls xywhn (+conf) per detection, plus
        keypoints/obb rows where present (reference results.py save_txt)."""
        from pathlib import Path

        lines = []
        h, w = self.orig_shape
        if self.obb is not None and len(self.obb):
            for i in range(len(self.obb)):
                pts = self.obb.xyxyxyxy[i].reshape(-1) / np.array([w, h] * 4, np.float32)
                conf, cls = self.obb.conf[i], int(self.obb.cls[i])
                vals = [cls, *pts.tolist()] + ([float(conf)] if save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if not isinstance(v, int) else str(v) for v in vals))
        else:
            kpts = self.keypoints.data if self.keypoints is not None else None
            for i, row in enumerate(self.boxes.data):
                cls, conf = int(row[5]), float(row[4])
                xywhn = self.boxes.xywhn[i]
                vals = [cls, *xywhn.tolist()] + ([conf] if save_conf else [])
                if kpts is not None:
                    kn = kpts[i].copy()
                    kn[..., 0] /= w
                    kn[..., 1] /= h
                    vals += kn.reshape(-1).tolist()
                lines.append(" ".join(f"{v:.6g}" if not isinstance(v, int) else str(v) for v in vals))
        p = Path(txt_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("\n".join(lines) + ("\n" if lines else ""))
        return str(p)

    def save_crop(self, save_dir: str, file_name: str = "crop"):
        """Save each detection's crop to save_dir/<class-name>/
        (reference results.py save_crop)."""
        import cv2
        from pathlib import Path

        saved = []
        for i, row in enumerate(self.boxes.data):
            x1, y1, x2, y2, _, cls = row
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2, y2 = min(int(x2), self.orig_shape[1]), min(int(y2), self.orig_shape[0])
            if x2 <= x1 or y2 <= y1:
                continue
            d = Path(save_dir) / self.names.get(int(cls), str(int(cls)))
            d.mkdir(parents=True, exist_ok=True)
            out = d / f"{file_name}_{i}.jpg"
            cv2.imwrite(str(out), self.orig_img[y1:y2, x1:x2])
            saved.append(str(out))
        return saved
