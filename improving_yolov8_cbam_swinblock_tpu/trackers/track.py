"""Tracker <-> predictor callback integration (reference
trackers/track.py:1-92): `register_tracker(model)` hooks a tracker into
the predict() callback bus so plain `model.predict(...)` streams carry
track ids — the reference's mechanism behind Model.track. This
framework's `YOLO.track()` also wires the same machinery inline
(engine/model.py:325); register_tracker is the callback-level entry for
users who attach trackers to custom predictors.
"""

from __future__ import annotations

import numpy as np

from . import build_tracker


def on_predict_start(predictor, persist: bool = False) -> None:
    """Build one tracker per stream source (reference track.py:15)."""
    if persist and getattr(predictor, "trackers", None):
        return
    tracker_cfg = getattr(getattr(predictor, "args", None), "tracker", None) or "botsort.yaml"
    # Non-stream modes share ONE tracker across all frames (reference
    # track.py:38 uses trackers[0] there) — sequential video frames within a
    # batch must feed the same instance or track continuity fragments.
    bs = int(getattr(predictor, "bs", 1) or 1) if _is_stream(predictor) else 1
    predictor.trackers = [build_tracker(tracker_cfg) for _ in range(bs)]
    predictor.vid_path = [None] * bs


def on_predict_postprocess_end(predictor, persist: bool = False) -> None:
    """Associate the batch's detections and rewrite each Results' boxes
    with track ids (reference track.py:44)."""
    results = getattr(predictor, "results", None)
    if not results:
        return
    trackers = getattr(predictor, "trackers", None)
    if not trackers:
        on_predict_start(predictor, persist)
        trackers = predictor.trackers
    for i, r in enumerate(results):
        trk = trackers[min(i, len(trackers) - 1)] if _is_stream(predictor) else trackers[0]
        det = np.asarray(r.boxes.data, np.float32)
        if len(det):
            tracks = trk.update(det[:, :4], det[:, 4], det[:, 5])
        else:
            tracks = trk.update(
                np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32)
            )
        if len(tracks):
            r.boxes.data = np.concatenate(
                [tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7]], axis=1
            ).astype(np.float32)
            r.track_ids = tracks[:, 4].astype(int)
        else:
            r.track_ids = np.zeros((0,), int)


def _is_stream(predictor) -> bool:
    return bool(getattr(getattr(predictor, "source_type", None), "stream", False))


def register_tracker(model, persist: bool = False) -> None:
    """Attach the two tracking callbacks to a model/predictor's callback
    bus (reference track.py:86-92)."""
    model.add_callback("on_predict_start", lambda p: on_predict_start(p, persist))
    model.add_callback("on_predict_postprocess_end", lambda p: on_predict_postprocess_end(p, persist))
