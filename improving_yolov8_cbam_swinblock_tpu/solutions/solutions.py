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
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

# Default kwargs every app merges under its own (reference
# cfg/solutions/default.yaml consumed by solutions/config.py SolutionConfig)
SOLUTION_DEFAULTS: Dict = yaml.safe_load(
    (Path(__file__).resolve().parent.parent / "cfg" / "solutions" / "default.yaml").read_text()
)


class SolutionResults:
    """Per-frame output of every solution (reference solutions.py:645):
    a fixed attribute set with app-specific fields filled in, plus the
    annotated frame as `plot_im`. Dict-style access (`res["in_count"]`)
    is kept for convenience."""

    def __init__(self, **kwargs):
        self.plot_im: Optional[np.ndarray] = None
        self.in_count = 0
        self.out_count = 0
        self.classwise_count: Dict = {}
        self.queue_count = 0
        self.workout_count: List = []
        self.workout_angle: List = []
        self.workout_stage: List = []
        self.pixels_distance = 0.0
        self.available_slots = 0
        self.filled_slots = 0
        self.email_sent = False
        self.total_tracks = 0
        self.region_counts: Dict = {}
        self.speed_dict: Dict = {}
        self.total_crop_objects = 0
        self.__dict__.update(kwargs)

    def __getitem__(self, key):
        return self.__dict__[key]

    def get(self, key, default=None):
        return self.__dict__.get(key, default)

    def __repr__(self):
        shown = {k: v for k, v in self.__dict__.items() if k != "plot_im" and v not in (0, 0.0, None, {}, [], False)}
        return f"SolutionResults({', '.join(f'{k}={v}' for k, v in shown.items())})"


class BaseSolution:
    """Shared plumbing: model, tracker, per-frame update (reference
    solutions.py:15-200)."""

    def __init__(self, model: str = None, region: Optional[Sequence[Tuple[float, float]]] = None, classes=None, conf: Optional[float] = None, show: Optional[bool] = None, **kwargs):
        from ..engine.model import YOLO

        self.model = YOLO(model) if isinstance(model, str) else model
        self.region = [tuple(p) for p in region] if region else None
        self.classes = classes
        # unset args fall back to cfg/solutions/default.yaml
        self.conf = float(SOLUTION_DEFAULTS.get("conf") or 0.25) if conf is None else conf
        self.show = bool(SOLUTION_DEFAULTS.get("show", False)) if show is None else show
        # inference args forwarded to every track/predict call (reference
        # BaseSolution track_add_args, solutions.py:112)
        self.track_args = {k: kwargs[k] for k in ("imgsz", "iou", "half", "max_det", "device") if k in kwargs}
        self.frame_idx = 0
        self.plot_im: Optional[np.ndarray] = None  # last annotated frame

    # -- rendering ------------------------------------------------------
    def annotate(self, frame: np.ndarray, boxes=None, ids=None, labels=None,
                 banner: Optional[str] = None, regions=None) -> np.ndarray:
        """Annotated copy of the frame: tracked boxes + region/line
    overlays + a status banner — the visual product the reference apps
    return as SolutionResults.plot_im (reference solutions/solutions.py
    display_output + per-app annotators). Stored on self.plot_im."""
        import cv2

        from ..utils.plotting import Annotator, color_for

        ann = Annotator(frame.copy(), names=getattr(self.model, "names", {}))
        for poly in ([self.region] if self.region else []) + list(regions or []):
            pts = np.asarray(poly, np.int32).reshape(-1, 1, 2)
            cv2.polylines(ann.img, [pts], len(poly) > 2, (104, 0, 123), max(ann.lw, 2))
        if boxes is not None:
            for i, box in enumerate(boxes):
                tid = int(ids[i]) if ids is not None and i < len(ids) else i
                if labels is not None and i < len(labels):
                    lab = str(labels[i])
                else:
                    names = getattr(self.model, "names", {})
                    cls = int(box[5]) if len(box) > 5 else 0
                    lab = f"{names.get(cls, cls)} id:{tid}"
                ann.box_label(box[:4], lab, color_for(tid))
        if banner:
            tf = max(ann.lw - 1, 1)
            (w, h), _ = cv2.getTextSize(banner, 0, ann.lw / 3, tf)
            cv2.rectangle(ann.img, (8, 8), (16 + w, 20 + h), (104, 31, 17), -1)
            cv2.putText(ann.img, banner, (12, 14 + h), 0, ann.lw / 3, (255, 255, 255), tf, cv2.LINE_AA)
        self.plot_im = ann.result()
        return self.plot_im

    def extract_tracks(self, frame: np.ndarray):
        self.frame_idx += 1
        res = self.model.track(frame, persist=True, conf=self.conf, classes=self.classes, **self.track_args)[0]
        boxes = res.boxes.data
        ids = getattr(res, "track_ids", np.arange(len(boxes)))
        return boxes, ids

    def display_output(self, img: Optional[np.ndarray] = None):
        """Show the annotated frame when show=True (reference
        BaseSolution.display_output); headless environments no-op."""
        if not self.show:
            return
        try:
            import cv2

            cv2.imshow("solution", img if img is not None else self.plot_im)
            cv2.waitKey(1)
        except Exception:
            pass

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

    def process(self, frame: np.ndarray) -> "SolutionResults":
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
        self.annotate(frame, boxes, ids, banner=f"in: {self.in_count}  out: {self.out_count}")
        self.display_output()
        names = getattr(self.model, "names", {})
        cw: Dict[str, int] = defaultdict(int)
        for box in boxes:
            cw[str(names.get(int(box[5]) if len(box) > 5 else 0, "object"))] += 1
        return SolutionResults(
            plot_im=self.plot_im, in_count=self.in_count, out_count=self.out_count,
            total_tracks=len(boxes), classwise_count=dict(cw), total=len(boxes),
        )


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
        self.annotate(
            frame, boxes, regions=list(self.regions.values()),
            banner="  ".join(f"{n}: {c}" for n, c in counts.items()),
        )
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, region_counts=counts, total_tracks=len(boxes), **counts)


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
        # render: normalized JET colormap blended onto the frame
        # (reference solutions/heatmap.py generate_heatmap)
        import cv2

        norm = cv2.normalize(self.heatmap, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        overlay = cv2.applyColorMap(norm, cv2.COLORMAP_JET)
        self.plot_im = cv2.addWeighted(frame, 0.5, overlay, 0.5, 0)
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, total_tracks=len(boxes), heatmap=self.heatmap)


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
        self.annotate(
            frame, boxes, ids,
            labels=[f"{self.speeds[int(t)]:.1f} km/h" if int(t) in self.speeds else "-" for t in ids],
        )
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, speed_dict=dict(self.speeds), total_tracks=len(boxes))


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
        self.annotate(frame, boxes, banner=f"queue: {n}")
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, queue_count=n, total_tracks=len(boxes))


class TrackZone(BaseSolution):
    """Track only inside a zone (reference solutions/trackzone.py)."""

    def process(self, frame: np.ndarray):
        boxes, ids = self.extract_tracks(frame)
        keep = []
        for box, tid in zip(boxes, ids):
            c = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            if self.region is None or self.point_in_polygon(c, self.region):
                keep.append(np.r_[box, tid])
        kept = np.array(keep, np.float32).reshape(-1, 7)
        self.annotate(frame, kept[:, :6], kept[:, 6])
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, total_tracks=len(kept), tracks=kept)


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
        self.annotate(frame, boxes, ids)
        self.display_output()
        if id_a in centers and id_b in centers:
            (xa, ya), (xb, yb) = centers[id_a], centers[id_b]
            px = float(np.hypot(xa - xb, ya - yb))
            return SolutionResults(plot_im=self.plot_im, pixels_distance=px,
                                   distance=px * self.mpp, total_tracks=len(boxes))
        return SolutionResults(plot_im=self.plot_im, pixels_distance=0.0, distance=None, total_tracks=len(boxes))


class AnalyticsTracker(BaseSolution):
    """Per-class detection counts over time rendered as a live chart
    (reference solutions/analytics.py: line/bar/pie/area graphs updated
    per frame; plot_im is the chart image, not the annotated frame)."""

    def __init__(self, *args, analytics_type: str = "line", **kwargs):
        super().__init__(*args, **kwargs)
        if analytics_type not in ("line", "bar", "pie", "area"):
            raise ValueError(f"analytics_type {analytics_type!r} not in line|bar|pie|area")
        self.analytics_type = analytics_type
        self.history: List[Dict[int, int]] = []

    def _render_chart(self) -> np.ndarray:
        """Rasterize the running counts with matplotlib Agg (reference
        analytics.py update_graph canvas->buffer_rgba path)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        names = getattr(self.model, "names", {})
        classes = sorted({c for h in self.history for c in h})
        fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=100)
        x = np.arange(1, len(self.history) + 1)
        if self.analytics_type in ("line", "area"):
            for c in classes:
                y = np.array([h.get(c, 0) for h in self.history])
                if self.analytics_type == "area":
                    ax.fill_between(x, y, alpha=0.4, label=str(names.get(c, c)))
                ax.plot(x, y, marker="o", ms=2, label=str(names.get(c, c)))
            ax.set_xlabel("frame")
            ax.set_ylabel("count")
            ax.legend(loc="upper left", fontsize=7)
        else:
            totals = {c: sum(h.get(c, 0) for h in self.history) for c in classes}
            labels = [str(names.get(c, c)) for c in classes]
            if self.analytics_type == "bar":
                ax.bar(labels, list(totals.values()))
                ax.set_ylabel("total detections")
            else:  # pie
                vals = list(totals.values())
                if sum(vals):
                    ax.pie(vals, labels=labels, autopct="%1.0f%%")
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3][..., ::-1]  # RGBA -> BGR
        plt.close(fig)
        return np.ascontiguousarray(buf)

    def process(self, frame: np.ndarray) -> "SolutionResults":
        boxes, _ = self.extract_tracks(frame)
        counts: Dict[int, int] = defaultdict(int)
        for box in boxes:
            counts[int(box[5])] += 1
        self.history.append(dict(counts))
        self.plot_im = self._render_chart()
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, classwise_count=dict(counts), total_tracks=len(boxes))


class AIGym(BaseSolution):
    """Workout monitoring from pose keypoints (reference solutions/ai_gym.py):
    joint-angle thresholds drive per-track up/down stage + rep counting."""

    def __init__(self, *args, kpts: Optional[Sequence[int]] = None, up_angle: Optional[float] = None,
                 down_angle: Optional[float] = None, **kwargs):
        super().__init__(*args, **kwargs)
        # (shoulder, elbow, wrist)-style triple; defaults from cfg/solutions/default.yaml
        self.kpts = tuple(kpts if kpts is not None else SOLUTION_DEFAULTS.get("kpts", (6, 8, 10)))
        self.up_angle = float(up_angle if up_angle is not None else SOLUTION_DEFAULTS.get("up_angle", 145.0))
        self.down_angle = float(down_angle if down_angle is not None else SOLUTION_DEFAULTS.get("down_angle", 90.0))
        self.count: Dict[int, int] = defaultdict(int)
        self.stage: Dict[int, str] = {}

    @staticmethod
    def joint_angle(a, b, c) -> float:
        """Angle ABC in degrees (reference ai_gym estimate_pose_angle)."""
        a, b, c = (np.asarray(p, np.float64) for p in (a, b, c))
        rad = np.arctan2(c[1] - b[1], c[0] - b[0]) - np.arctan2(a[1] - b[1], a[0] - b[0])
        ang = abs(rad * 180.0 / np.pi)
        return 360.0 - ang if ang > 180.0 else ang

    def process(self, frame: np.ndarray) -> Dict[int, Dict]:
        res = self.model.predict(frame, conf=self.conf, **self.track_args)[0]
        angles: List[float] = []
        stages: List[str] = []
        counts: List[int] = []
        if res.keypoints is not None:
            k = res.keypoints.xy
            for i in range(len(k)):
                pts = [k[i, j] for j in self.kpts]
                ang = self.joint_angle(*pts)
                tid = i  # predict path: index-stable within frame
                if ang > self.up_angle:
                    if self.stage.get(tid) == "down":
                        self.count[tid] += 1
                    self.stage[tid] = "up"
                elif ang < self.down_angle:
                    self.stage[tid] = "down"
                angles.append(float(ang))
                stages.append(self.stage.get(tid, "-"))
                counts.append(self.count[tid])
        self.plot_im = res.plot()
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, workout_count=counts,
                               workout_angle=angles, workout_stage=stages, total_tracks=len(angles))


class InstanceSegmentation(BaseSolution):
    """Draw instance masks (reference solutions/instance_segmentation.py)."""

    def process(self, frame: np.ndarray):
        res = self.model.predict(frame, conf=self.conf)[0]
        img = frame.copy()
        n = 0
        if res.masks is not None:
            for i, m in enumerate(res.masks):
                color = np.array([(37 * (i + 1)) % 255, (97 * (i + 1)) % 255, (173 * (i + 1)) % 255], np.uint8)
                img[m] = (0.5 * img[m] + 0.5 * color).astype(np.uint8)
                n += 1
        self.plot_im = img
        self.display_output()
        return SolutionResults(plot_im=img, total_tracks=n, image=img, instances=n)


class ObjectBlurrer(BaseSolution):
    """Gaussian-blur detected regions (reference solutions/object_blurrer.py)."""

    def __init__(self, *args, blur_ratio: float = 0.5, **kwargs):
        super().__init__(*args, **kwargs)
        self.k = max(3, int(blur_ratio * 50) | 1)  # odd kernel

    def process(self, frame: np.ndarray):
        import cv2

        res = self.model.predict(frame, conf=self.conf)[0]
        img = frame.copy()
        for row in res.boxes.data:
            x1, y1, x2, y2 = (max(int(v), 0) for v in row[:4])
            if x2 > x1 and y2 > y1:
                img[y1:y2, x1:x2] = cv2.GaussianBlur(img[y1:y2, x1:x2], (self.k, self.k), 0)
        self.plot_im = img
        self.display_output()
        return SolutionResults(plot_im=img, total_tracks=len(res.boxes), image=img, blurred=len(res.boxes))


class ObjectCropper(BaseSolution):
    """Save detection crops to disk (reference solutions/object_cropper.py)."""

    def __init__(self, *args, crop_dir: str = "crops", **kwargs):
        super().__init__(*args, **kwargs)
        self.crop_dir = crop_dir

    def process(self, frame: np.ndarray):
        res = self.model.predict(frame, conf=self.conf)[0]
        saved = res.save_crop(self.crop_dir, file_name=f"frame{self.frame_idx}")
        self.frame_idx += 1
        return SolutionResults(total_crop_objects=len(saved), crops=saved, total=len(saved))


class ParkingManagement(BaseSolution):
    """Slot occupancy from polygon definitions
    (reference solutions/parking_management.py; slots come from the same
    JSON layout its annotator tool writes: [{"points": [[x,y], ...]}])."""

    def __init__(self, *args, json_file: Optional[str] = None, slots: Optional[List] = None, **kwargs):
        super().__init__(*args, **kwargs)
        if json_file:
            import json

            slots = [s["points"] for s in json.load(open(json_file))]
        self.slots = [np.asarray(s, np.float32) for s in (slots or [])]

    def process(self, frame: np.ndarray) -> Dict[str, int]:
        boxes, _ = self.extract_tracks(frame)
        centers = [((b[0] + b[2]) / 2, (b[1] + b[3]) / 2) for b in boxes]
        occupied = 0
        for poly in self.slots:
            if any(self.point_in_polygon(c, poly) for c in centers):
                occupied += 1
        self.annotate(
            frame, boxes, regions=[p.tolist() for p in self.slots],
            banner=f"occupied: {occupied}/{len(self.slots)}",
        )
        self.display_output()
        return SolutionResults(
            plot_im=self.plot_im, filled_slots=occupied, available_slots=len(self.slots) - occupied,
            total_tracks=len(boxes), occupied=occupied, available=len(self.slots) - occupied, total=len(self.slots),
        )


class SecurityAlarm(BaseSolution):
    """Trigger when detections exceed a threshold
    (reference solutions/security_alarm.py — its email hook becomes a
    user-supplied callback; no network egress here)."""

    def __init__(self, *args, records: int = 5, on_alarm=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.records = records
        self.on_alarm = on_alarm
        self.events: List[Dict] = []
        self.alarm_sent = False

    def process(self, frame: np.ndarray) -> Dict:
        boxes, _ = self.extract_tracks(frame)
        n = len(boxes)
        triggered = n >= self.records
        if triggered and not self.alarm_sent:
            event = {"frame": self.frame_idx, "detections": int(n)}
            self.events.append(event)
            if self.on_alarm:
                self.on_alarm(event)
            self.alarm_sent = True
        self.annotate(frame, boxes, banner=f"detections: {int(n)}" + ("  ALARM" if triggered else ""))
        self.display_output()
        return SolutionResults(plot_im=self.plot_im, total_tracks=int(n), email_sent=self.alarm_sent,
                               detections=int(n), alarm=triggered)


class VisionEye(BaseSolution):
    """Vision-eye point-to-object mapping (reference solutions/vision_eye.py):
    draws sight lines from a fixed vantage point to every tracked center."""

    def __init__(self, *args, vision_point: Tuple[int, int] = (20, 20), **kwargs):
        super().__init__(*args, **kwargs)
        self.vision_point = tuple(int(v) for v in vision_point)

    def process(self, frame: np.ndarray):
        import cv2

        boxes, ids = self.extract_tracks(frame)
        img = frame.copy()
        centers = []
        for box in boxes:
            c = (int((box[0] + box[2]) / 2), int((box[1] + box[3]) / 2))
            centers.append(c)
            cv2.circle(img, c, 4, (0, 255, 0), -1)
            cv2.line(img, self.vision_point, c, (0, 200, 255), 1)
        self.plot_im = img
        self.display_output()
        return SolutionResults(plot_im=img, total_tracks=len(boxes), image=img, centers=centers)


class StreamlitInference(BaseSolution):
    """Browser UI for live inference (reference solutions/streamlit_inference.py).
    Requires the optional `streamlit` package; construction without it
    raises with install guidance (matching the reference's lazy check)."""

    def __init__(self, *args, **kwargs):
        try:
            import streamlit  # noqa: F401
        except ImportError as e:  # pragma: no cover - env without streamlit
            raise ImportError(
                "StreamlitInference needs the optional 'streamlit' package "
                "(pip install streamlit); all other solutions are dependency-free"
            ) from e
        super().__init__(*args, **kwargs)

    def run(self):  # pragma: no cover - interactive app
        import streamlit as st

        st.title("improving_yolov8_cbam_swinblock_tpu inference")
        src = st.text_input("source", "0")
        if st.button("run"):
            for r in self.model.predict(src, stream=True, conf=self.conf):
                st.image(r.plot()[..., ::-1])
