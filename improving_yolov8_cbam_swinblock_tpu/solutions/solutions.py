"""Video-analytics solutions riding the detector + tracker.

Re-design of the reference solutions framework (reference
solutions/solutions.py:15-645 + per-app modules): BaseSolution wires
model.track() per frame; each app consumes tracked boxes. Apps included
here cover the common production set — counting (line/region), heatmap,
speed estimation, queue management, trackzone, distance — with the same
region/line semantics as the reference.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class BaseSolution:
    """Shared plumbing: model, tracker, per-frame update (reference
    solutions.py:15-200)."""

    def __init__(self, model: str = None, region: Optional[Sequence[Tuple[float, float]]] = None, classes=None, conf: float = 0.25, **kwargs):
        from ..engine.model import YOLO

        self.model = YOLO(model) if isinstance(model, str) else model
        self.region = [tuple(p) for p in region] if region else None
        self.classes = classes
        self.conf = conf
        self.frame_idx = 0

    def extract_tracks(self, frame: np.ndarray):
        self.frame_idx += 1
        res = self.model.track(frame, persist=True, conf=self.conf, classes=self.classes)[0]
        boxes = res.boxes.data
        ids = getattr(res, "track_ids", np.arange(len(boxes)))
        return boxes, ids

    @staticmethod
    def point_in_polygon(pt: Tuple[float, float], poly: Sequence[Tuple[float, float]]) -> bool:
        x, y = pt
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-12) + x1:
                inside = not inside
        return inside


class ObjectCounter(BaseSolution):
    """Count objects crossing a line or inside a region
    (reference solutions/object_counter.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: set = set()
        self.prev_pos: Dict[int, Tuple[float, float]] = {}

    def _side(self, pt):
        (x1, y1), (x2, y2) = self.region[0], self.region[1]
        return np.sign((x2 - x1) * (pt[1] - y1) - (y2 - y1) * (pt[0] - x1))

    def process(self, frame: np.ndarray) -> Dict:
        boxes, ids = self.extract_tracks(frame)
        for box, tid in zip(boxes, ids):
            tid = int(tid)
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if self.region and len(self.region) == 2:  # line crossing
                if tid in self.prev_pos and tid not in self.counted_ids:
                    if self._side(c) != self._side(self.prev_pos[tid]) and self._side(c) != 0:
                        if self._side(c) > 0:
                            self.in_count += 1
                        else:
                            self.out_count += 1
                        self.counted_ids.add(tid)
                self.prev_pos[tid] = c
            elif self.region:  # polygon region
                if tid not in self.counted_ids and self.point_in_polygon(c, self.region):
                    self.in_count += 1
                    self.counted_ids.add(tid)
        return {"in_count": self.in_count, "out_count": self.out_count, "total": len(boxes)}


class RegionCounter(BaseSolution):
    """Live per-region object counts (reference solutions/region_counter.py)."""

    def __init__(self, *args, regions: Optional[Dict[str, Sequence]] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.regions = regions or ({"region_1": self.region} if self.region else {})

    def process(self, frame: np.ndarray) -> Dict[str, int]:
        boxes, _ = self.extract_tracks(frame)
        counts = {name: 0 for name in self.regions}
        for box in boxes:
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            for name, poly in self.regions.items():
                if self.point_in_polygon(c, poly):
                    counts[name] += 1
        return counts


class Heatmap(BaseSolution):
    """Cumulative presence heatmap (reference solutions/heatmap.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.heatmap: Optional[np.ndarray] = None

    def process(self, frame: np.ndarray) -> np.ndarray:
        if self.heatmap is None:
            self.heatmap = np.zeros(frame.shape[:2], np.float32)
        boxes, _ = self.extract_tracks(frame)
        for box in boxes:
            x1, y1, x2, y2 = (int(v) for v in box[:4])
            x1, y1 = max(x1, 0), max(y1, 0)
            self.heatmap[y1:y2, x1:x2] += 1.0
        return self.heatmap


class SpeedEstimator(BaseSolution):
    """Pixel-displacement speed estimation per track
    (reference solutions/speed_estimation.py)."""

    def __init__(self, *args, fps: float = 30.0, meters_per_pixel: float = 0.05, **kwargs):
        super().__init__(*args, **kwargs)
        self.fps = fps
        self.mpp = meters_per_pixel
        self.prev: Dict[int, Tuple[int, Tuple[float, float]]] = {}
        self.speeds: Dict[int, float] = {}

    def process(self, frame: np.ndarray) -> Dict[int, float]:
        boxes, ids = self.extract_tracks(frame)
        for box, tid in zip(boxes, ids):
            tid = int(tid)
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if tid in self.prev:
                f0, c0 = self.prev[tid]
                dt = (self.frame_idx - f0) / self.fps
                if dt > 0:
                    dist_m = float(np.hypot(c[0] - c0[0], c[1] - c0[1])) * self.mpp
                    self.speeds[tid] = dist_m / dt * 3.6  # km/h
            self.prev[tid] = (self.frame_idx, c)
        return dict(self.speeds)


class QueueManager(BaseSolution):
    """Queue length inside a region (reference solutions/queue_management.py)."""

    def process(self, frame: np.ndarray) -> int:
        boxes, _ = self.extract_tracks(frame)
        n = 0
        for box in boxes:
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if self.region is None or self.point_in_polygon(c, self.region):
                n += 1
        self.queue_length = n
        return n


class TrackZone(BaseSolution):
    """Track only inside a zone (reference solutions/trackzone.py)."""

    def process(self, frame: np.ndarray):
        boxes, ids = self.extract_tracks(frame)
        keep = []
        for box, tid in zip(boxes, ids):
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if self.region is None or self.point_in_polygon(c, self.region):
                keep.append(np.r_[box, tid])
        return np.array(keep, np.float32).reshape(-1, 7)


class DistanceCalculation(BaseSolution):
    """Pairwise distance between two selected track ids
    (reference solutions/distance_calculation.py)."""

    def __init__(self, *args, meters_per_pixel: float = 0.05, **kwargs):
        super().__init__(*args, **kwargs)
        self.mpp = meters_per_pixel

    def process(self, frame: np.ndarray, id_a: int, id_b: int) -> Optional[float]:
        boxes, ids = self.extract_tracks(frame)
        centers = {}
        for box, tid in zip(boxes, ids):
            centers[int(tid)] = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
        if id_a in centers and id_b in centers:
            (xa, ya), (xb, yb) = centers[id_a], centers[id_b]
            return float(np.hypot(xa - xb, ya - yb)) * self.mpp
        return None


class AnalyticsTracker(BaseSolution):
    """Per-class detection counts over time (reference solutions/analytics.py)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.history: List[Dict[int, int]] = []

    def process(self, frame: np.ndarray) -> Dict[int, int]:
        boxes, _ = self.extract_tracks(frame)
        counts: Dict[int, int] = defaultdict(int)
        for box in boxes:
            counts[int(box[5])] += 1
        self.history.append(dict(counts))
        return dict(counts)
