"""Vectorized label containers (reference utils/instance.py:34/195).

`Bboxes` holds (N, 4) boxes in one of three formats; `Instances` bundles
boxes + per-instance polygons + keypoints and applies every geometric
label op (scale/normalize/flip/clip/concat) to all of them at once.

These are host-side numpy structures for the label pipeline and public
API compatibility; inside jitted graphs labels travel as fixed-shape
padded arrays instead (data/augment.py format_sample).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


def _xyxy2xywh(x):
    return np.concatenate([(x[..., :2] + x[..., 2:4]) / 2, x[..., 2:4] - x[..., :2]], -1)


def _xywh2xyxy(x):
    return np.concatenate([x[..., :2] - x[..., 2:4] / 2, x[..., :2] + x[..., 2:4] / 2], -1)


def _xyxy2ltwh(x):
    return np.concatenate([x[..., :2], x[..., 2:4] - x[..., :2]], -1)


def _ltwh2xyxy(x):
    return np.concatenate([x[..., :2], x[..., :2] + x[..., 2:4]], -1)


def _xywh2ltwh(x):
    return np.concatenate([x[..., :2] - x[..., 2:4] / 2, x[..., 2:4]], -1)


def _ltwh2xywh(x):
    return np.concatenate([x[..., :2] + x[..., 2:4] / 2, x[..., 2:4]], -1)


_CONVERT = {
    ("xyxy", "xywh"): _xyxy2xywh, ("xywh", "xyxy"): _xywh2xyxy,
    ("xyxy", "ltwh"): _xyxy2ltwh, ("ltwh", "xyxy"): _ltwh2xyxy,
    ("xywh", "ltwh"): _xywh2ltwh, ("ltwh", "xywh"): _ltwh2xywh,
}


class Bboxes:
    """(N, 4) boxes in 'xyxy' | 'xywh' | 'ltwh' (reference instance.py:34).
    Format conversion is in place via `convert`; `mul`/`add` scale/offset
    coordinates (per-axis when given a 4-tuple)."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = np.asarray(bboxes, np.float32)
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if format != self.format:
            self.bboxes = _CONVERT[(self.format, format)](self.bboxes)
            self.format = format

    def areas(self) -> np.ndarray:
        if self.format == "xyxy":
            return (self.bboxes[:, 2] - self.bboxes[:, 0]) * (self.bboxes[:, 3] - self.bboxes[:, 1])
        return self.bboxes[:, 2] * self.bboxes[:, 3]

    def mul(self, scale):
        s = np.asarray(scale if hasattr(scale, "__len__") else (scale,) * 4, np.float32)
        self.bboxes = self.bboxes * s

    def add(self, offset):
        o = np.asarray(offset if hasattr(offset, "__len__") else (offset,) * 4, np.float32)
        self.bboxes = self.bboxes + o

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, index) -> "Bboxes":
        b = self.bboxes[index]
        return Bboxes(b.reshape(-1, 4), self.format)

    @classmethod
    def concatenate(cls, boxes_list: List["Bboxes"], axis: int = 0) -> "Bboxes":
        assert boxes_list
        fmt = boxes_list[0].format
        assert all(b.format == fmt for b in boxes_list)
        return cls(np.concatenate([b.bboxes for b in boxes_list], axis=axis), fmt)


class Instances:
    """Boxes + segments + keypoints moved together (reference
    instance.py:195): every geometric op hits all three so labels can
    never drift apart. segments: (N, S, 2) resampled polygons;
    keypoints: (N, K, 2|3)."""

    def __init__(self, bboxes: np.ndarray, segments: Optional[np.ndarray] = None,
                 keypoints: Optional[np.ndarray] = None, bbox_format: str = "xywh",
                 normalized: bool = True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = (
            np.asarray(segments, np.float32) if segments is not None and len(segments)
            else np.zeros((len(self._bboxes), 0, 2), np.float32)
        )
        self.keypoints = np.asarray(keypoints, np.float32) if keypoints is not None else None
        self.normalized = normalized

    # -- bbox passthrough ------------------------------------------------
    @property
    def bboxes(self) -> np.ndarray:
        return self._bboxes.bboxes

    def convert_bbox(self, format: str):
        self._bboxes.convert(format)

    @property
    def bbox_areas(self) -> np.ndarray:
        return self._bboxes.areas()

    # -- geometry ---------------------------------------------------------
    def scale(self, scale_w: float, scale_h: float, bbox_only: bool = False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if bbox_only:
            return
        self.segments[..., 0] *= scale_w
        self.segments[..., 1] *= scale_h
        if self.keypoints is not None:
            self.keypoints[..., 0] *= scale_w
            self.keypoints[..., 1] *= scale_h

    def denormalize(self, w: int, h: int):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w: int, h: int):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw: float, padh: float):
        assert not self.normalized, "you should add padding with absolute coordinates."
        self._bboxes.add((padw, padh, padw, padh))
        self.segments[..., 0] += padw
        self.segments[..., 1] += padh
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h: float):
        if self._bboxes.format == "xyxy":
            y1 = self.bboxes[:, 1].copy()
            y2 = self.bboxes[:, 3].copy()
            self.bboxes[:, 1] = h - y2
            self.bboxes[:, 3] = h - y1
        else:
            self.bboxes[:, 1] = h - self.bboxes[:, 1]
        self.segments[..., 1] = h - self.segments[..., 1]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w: float):
        if self._bboxes.format == "xyxy":
            x1 = self.bboxes[:, 0].copy()
            x2 = self.bboxes[:, 2].copy()
            self.bboxes[:, 0] = w - x2
            self.bboxes[:, 2] = w - x1
        else:
            self.bboxes[:, 0] = w - self.bboxes[:, 0]
        self.segments[..., 0] = w - self.segments[..., 0]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w: int, h: int):
        fmt = self._bboxes.format
        self.convert_bbox("xyxy")
        self.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self.convert_bbox(fmt)
        self.segments[..., 0] = self.segments[..., 0].clip(0, w)
        self.segments[..., 1] = self.segments[..., 1].clip(0, h)
        if self.keypoints is not None:
            self.keypoints[..., 0] = self.keypoints[..., 0].clip(0, w)
            self.keypoints[..., 1] = self.keypoints[..., 1].clip(0, h)

    def remove_zero_area_boxes(self) -> np.ndarray:
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes.bboxes = self.bboxes[good]
            if len(self.segments):
                self.segments = self.segments[good]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def update(self, bboxes: np.ndarray, segments: Optional[np.ndarray] = None,
               keypoints: Optional[np.ndarray] = None):
        self._bboxes = Bboxes(bboxes, self._bboxes.format)
        if segments is not None:
            self.segments = segments
        if keypoints is not None:
            self.keypoints = keypoints

    def __getitem__(self, index) -> "Instances":
        segments = self.segments[index] if len(self.segments) else self.segments
        keypoints = self.keypoints[index] if self.keypoints is not None else None
        bboxes = self.bboxes[index]
        return Instances(
            bboxes.reshape(-1, 4),
            segments.reshape((-1,) + self.segments.shape[1:]) if len(self.segments) else segments,
            keypoints.reshape((-1,) + self.keypoints.shape[1:]) if keypoints is not None else None,
            bbox_format=self._bboxes.format,
            normalized=self.normalized,
        )

    def __len__(self):
        return len(self.bboxes)

    @classmethod
    def concatenate(cls, instances_list: List["Instances"], axis: int = 0) -> "Instances":
        assert instances_list
        i0 = instances_list[0]
        assert all(i.normalized == i0.normalized and i._bboxes.format == i0._bboxes.format for i in instances_list)
        kps = None
        if i0.keypoints is not None:
            kps = np.concatenate([i.keypoints for i in instances_list], axis=axis)
        seg_counts = {i.segments.shape[1] for i in instances_list}
        if len(seg_counts) > 1:  # mixed resample lengths: re-pad to max
            s_max = max(seg_counts)
            segs = []
            for i in instances_list:
                s = i.segments
                if s.shape[1] and s.shape[1] < s_max:
                    reps = int(np.ceil(s_max / s.shape[1]))
                    s = np.tile(s, (1, reps, 1))[:, :s_max]
                elif not s.shape[1]:
                    s = np.zeros((len(i), s_max, 2), np.float32)
                segs.append(s)
            seg = np.concatenate(segs, axis=axis)
        else:
            seg = np.concatenate([i.segments for i in instances_list], axis=axis)
        return cls(
            np.concatenate([i.bboxes for i in instances_list], axis=axis),
            seg, kps, bbox_format=i0._bboxes.format, normalized=i0.normalized,
        )
