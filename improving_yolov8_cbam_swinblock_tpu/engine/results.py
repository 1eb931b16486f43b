"""Inference result containers (reference engine/results.py:187-1258,
detection subset): numpy-backed, device-agnostic."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Boxes:
    """Detection boxes: (n, 6) [x1, y1, x2, y2, conf, cls] — or (n, 7) with
    a track id column [x1, y1, x2, y2, id, conf, cls] — in original image
    coordinates (reference results.py:1041-1258)."""

    def __init__(self, data: np.ndarray, orig_shape):
        data = np.asarray(data, dtype=np.float32)
        self.data = data.reshape(-1, data.shape[-1] if data.ndim > 1 and data.shape[-1] == 7 else 6)
        self.orig_shape = tuple(orig_shape)
        self.is_track = self.data.shape[-1] == 7

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        """Track ids when produced by model.track (reference Boxes.id,
        results.py:1165); None for plain detections."""
        return self.data[:, 4] if self.is_track else None

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
    """Oriented boxes: (n, 7) [x, y, w, h, angle, conf, cls] — or (n, 8)
    with a track id inserted before conf — in original image coordinates
    (reference results.py:1622, is_track :1686)."""

    def __init__(self, data: np.ndarray, orig_shape):
        data = np.asarray(data, dtype=np.float32)
        n = data.shape[-1] if data.size else 7
        self.data = data.reshape(-1, n)
        self.is_track = n == 8
        self.orig_shape = tuple(orig_shape)

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def id(self):
        return self.data[:, 5] if self.is_track else None

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

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


class Masks:
    """Instance masks: (n, H, W) bool at original-image resolution
    (reference results.py:1259). Array-like (iter/index/__array__) so code
    written against raw mask arrays keeps working."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = tuple(orig_shape)

    @property
    def xy(self):
        """Per-instance largest-contour polygon in pixel coords
        (reference Masks.xy, results.py:1332)."""
        import cv2

        out = []
        for m in self.data:
            cnts, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            if cnts:
                c = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                # masks may live at model resolution; scale to orig
                sy = self.orig_shape[0] / m.shape[0]
                sx = self.orig_shape[1] / m.shape[1]
                c *= np.array([sx, sy], np.float32)
            else:
                c = np.zeros((0, 2), np.float32)
            out.append(c)
        return out

    @property
    def xyn(self):
        """Normalized polygons (reference Masks.xyn, results.py:1307)."""
        h, w = self.orig_shape
        return [p / np.array([w, h], np.float32) for p in self.xy]

    @property
    def shape(self):
        return self.data.shape

    def __array__(self, dtype=None):
        return self.data.astype(dtype) if dtype is not None else self.data

    def __iter__(self):
        return iter(self.data)

    def __getitem__(self, idx):
        return self.data[idx]

    def __len__(self):
        return len(self.data)


class Probs:
    """Classification probabilities (reference results.py:1481)."""

    def __init__(self, data: np.ndarray, orig_shape=None):
        self.data = np.asarray(data, np.float32).reshape(-1)
        self.orig_shape = orig_shape

    @property
    def top1(self):
        return int(np.argmax(self.data))

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return float(self.data[self.top1])

    @property
    def top5conf(self):
        return self.data[self.top5]

    def __array__(self, dtype=None):
        return self.data.astype(dtype) if dtype is not None else self.data

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

    def __getitem__(self, idx):
        """Index/slice into the detections (reference Results.__getitem__,
        results.py:280): returns a new Results over the selected rows."""
        r = self.new()
        sel = np.atleast_2d(self.boxes.data[idx])
        r.boxes = Boxes(sel, self.orig_shape)
        if self.masks is not None:
            r.masks = Masks(np.atleast_3d(np.asarray(self.masks)[idx]), self.orig_shape)
        if self.keypoints is not None:
            r.keypoints = Keypoints(self.keypoints.data[idx].reshape((-1,) + self.keypoints.data.shape[1:]),
                                    self.orig_shape)
        if self.obb is not None:
            r.obb = OBB(np.atleast_2d(self.obb.data[idx]), self.orig_shape)
        return r

    def new(self):
        """Empty Results over the same image (reference Results.new)."""
        r = Results(self.orig_img, self.path, self.names)
        r.speed = dict(self.speed)
        return r

    def update(self, boxes=None, masks=None, probs=None, obb=None, keypoints=None):
        """Replace prediction tensors in place (reference Results.update,
        results.py:315)."""
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)
        if obb is not None:
            self.obb = OBB(obb, self.orig_shape)
        if keypoints is not None:
            self.keypoints = Keypoints(keypoints, self.orig_shape)
        return self

    def verbose(self) -> str:
        """Per-image log string (reference Results.verbose, results.py:642):
        '2 persons, 1 bus, ' or top-5 classes for classify."""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(i, i)} {self.probs.data[i]:.2f}" for i in self.probs.top5) + ", "
        src = self.obb if self.obb is not None else self.boxes
        if not len(src):
            return "(no detections), "
        cls = src.cls.astype(int)
        out = ""
        for c in np.unique(cls):
            n = int((cls == c).sum())
            name = self.names.get(int(c), str(int(c)))
            out += f"{n} {name}{'s' * (n > 1)}, "
        return out

    def summary(self):
        out = []
        b = self.boxes
        if self.probs is not None:
            i = self.probs.top1
            return [{"name": self.names.get(i, str(i)), "class": i, "confidence": round(self.probs.top1conf, 5)}]
        polys = self.masks.xyn if self.masks is not None and len(self.masks) == len(b) else None
        for i in range(len(b)):
            cls, conf = int(b.cls[i]), float(b.conf[i])
            x1, y1, x2, y2 = (float(v) for v in b.xyxy[i])
            row = {
                "name": self.names.get(cls, str(cls)),
                "class": cls,
                "confidence": round(conf, 5),
                "box": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
            }
            if b.id is not None:
                row["track_id"] = int(b.id[i])
            if polys is not None:
                row["segments"] = {"x": polys[i][:, 0].tolist(), "y": polys[i][:, 1].tolist()}
            if self.keypoints is not None and i < len(self.keypoints):
                row["keypoints"] = {
                    "x": self.keypoints.xy[i][:, 0].tolist(),
                    "y": self.keypoints.xy[i][:, 1].tolist(),
                }
            out.append(row)
        return out

    def cpu(self):
        """API-compat chainer (reference Results.cpu, results.py:373):
        all tensors here are already host numpy arrays."""
        return self

    def numpy(self):
        return self

    def to(self, *args, **kwargs):
        """Device-transfer no-op (reference Results.to) — fetch happens
        at predictor postprocess; arrays are host-resident numpy."""
        return self

    def to_json(self):
        import json

        return json.dumps(self.summary(), indent=2)

    def tojson(self):
        """Deprecated alias kept for reference-API compat
        (reference results.py:943)."""
        return self.to_json()

    def to_html(self, index: bool = False):
        """Detections as an HTML table (reference Results.to_html)."""
        return self.to_df().to_html(index=index)

    def to_df(self):
        """Detections as a pandas DataFrame (reference Results.to_df)."""
        import pandas as pd

        return pd.DataFrame(self.summary())

    def to_csv(self, **kwargs):
        return self.to_df().to_csv(**kwargs)

    def to_xml(self):
        import io

        df = self.to_df()
        buf = io.StringIO()
        df.to_xml(buf) if hasattr(df, "to_xml") else buf.write("<results/>")
        return buf.getvalue()

    def to_sql(self, table_name: str = "results", db_path: str = "results.db"):
        """Append detections to a sqlite table (reference Results.to_sql,
        results.py:982)."""
        import json
        import sqlite3

        con = sqlite3.connect(db_path)
        cur = con.cursor()
        cur.execute(
            f'CREATE TABLE IF NOT EXISTS "{table_name}" '
            "(id INTEGER PRIMARY KEY AUTOINCREMENT, class_name TEXT, confidence REAL, data TEXT)"
        )
        for row in self.summary():
            cur.execute(
                f'INSERT INTO "{table_name}" (class_name, confidence, data) VALUES (?, ?, ?)',
                (row["name"], row["confidence"], json.dumps(row)),
            )
        con.commit()
        con.close()
        return db_path

    def plot(self, line_width: Optional[int] = None):
        """Annotated copy of the original image (BGR): boxes (+track ids),
        mask overlays, keypoint dots, or top-5 text for classify."""
        import cv2

        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape[:2]) / 2 * 0.003), 2)
        if self.probs is not None:
            for j, i in enumerate(self.probs.top5):
                t = f"{self.names.get(i, i)} {self.probs.data[i]:.2f}"
                cv2.putText(img, t, (8, 28 + 24 * j), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2)
            return img
        palette = lambda c: tuple(int(v) for v in np.array([37, 255, 225]) * ((int(c) % 5 + 1) / 5))  # noqa: E731
        if self.masks is not None and len(self.masks):
            m = np.asarray(self.masks)
            if m.shape[1:] != img.shape[:2]:
                m = np.stack([cv2.resize(x.astype(np.uint8), (img.shape[1], img.shape[0])) for x in m]) > 0
            for i, mm in enumerate(m):
                cls = int(self.boxes.cls[i]) if i < len(self.boxes) else i
                img[mm] = (img[mm] * 0.6 + np.array(palette(cls)) * 0.4).astype(img.dtype)
        b = self.boxes
        for i in range(len(b)):
            x1, y1, x2, y2 = (int(v) for v in b.xyxy[i])
            cls, conf = int(b.cls[i]), float(b.conf[i])
            color = palette(cls)
            cv2.rectangle(img, (x1, y1), (x2, y2), color, lw)
            label = f"{self.names.get(cls, cls)} {conf:.2f}"
            if b.id is not None:
                label = f"id:{int(b.id[i])} " + label
            cv2.putText(img, label, (x1, max(y1 - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX, lw / 6, color, 1)
        if self.keypoints is not None:
            for k in self.keypoints.xy:
                for x, y in k:
                    cv2.circle(img, (int(x), int(y)), max(lw, 2), (0, 0, 255), -1)
        return img

    def show(self, *args, **kwargs):
        """Display the annotated image (reference Results.show); headless
        environments get the rendered array back instead."""
        img = self.plot()
        try:
            import cv2

            cv2.imshow(str(self.path), img)
            cv2.waitKey(1)
        except Exception:
            pass
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
            for i in range(len(self.boxes)):
                cls, conf = int(self.boxes.cls[i]), float(self.boxes.conf[i])
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
        for i in range(len(self.boxes)):
            (x1, y1, x2, y2), cls = self.boxes.xyxy[i], self.boxes.cls[i]
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
