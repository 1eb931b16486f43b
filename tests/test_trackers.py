"""Tracker tests: identity maintenance on synthetic moving boxes
(functional equivalent of the reference's video-based tracker e2e)."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.trackers import BOTSORT, BYTETracker


def make_frames(n_frames=20, n_obj=3, seed=0):
    """Objects moving on linear trajectories; per-frame (boxes, scores, cls)."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(100, 400, (n_obj, 2))
    vel = rng.uniform(-5, 5, (n_obj, 2))
    size = rng.uniform(40, 80, (n_obj, 2))
    frames = []
    for _ in range(n_frames):
        boxes = np.concatenate([pos - size / 2, pos + size / 2], axis=1).astype(np.float32)
        scores = np.full(n_obj, 0.9, np.float32)
        cls = np.arange(n_obj, dtype=np.float32) % 2
        frames.append((boxes, scores, cls))
        pos = pos + vel
    return frames


@pytest.mark.parametrize("tracker_cls", [BYTETracker, BOTSORT])
def test_stable_ids_on_linear_motion(tracker_cls):
    tr = tracker_cls() if tracker_cls is BYTETracker else tracker_cls(gmc_method="none")
    frames = make_frames()
    ids_per_frame = []
    for boxes, scores, cls in frames:
        out = tr.update(boxes, scores, cls)
        ids_per_frame.append(set(out[:, 4].astype(int).tolist()))
    # after warmup every frame tracks 3 objects with the same identities
    assert all(len(s) == 3 for s in ids_per_frame[2:])
    assert ids_per_frame[2] == ids_per_frame[-1]


def test_low_score_rescue():
    """A detection dipping below high_thresh (but above low) keeps its id."""
    tr = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1, new_track_thresh=0.6)
    box = np.array([[100, 100, 160, 160]], np.float32)
    ids = []
    for f in range(6):
        score = np.array([0.3 if f == 3 else 0.9], np.float32)
        out = tr.update(box + f * 2, score, np.zeros(1, np.float32))
        if len(out):
            ids.append(int(out[0, 4]))
    assert len(set(ids)) == 1  # identity survived the low-score frame


def test_track_lost_and_removed():
    tr = BYTETracker(track_buffer=2)
    box = np.array([[50, 50, 100, 100]], np.float32)
    sc = np.array([0.9], np.float32)
    c = np.zeros(1, np.float32)
    tr.update(box, sc, c)
    tr.update(box, sc, c)
    # object disappears
    for _ in range(5):
        out = tr.update(np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32))
    assert len(out) == 0
    assert len(tr.lost_stracks) == 0  # expired after buffer


def test_new_object_gets_new_id():
    tr = BYTETracker()
    b1 = np.array([[50, 50, 100, 100]], np.float32)
    b2 = np.array([[50, 50, 100, 100], [300, 300, 360, 360]], np.float32)
    tr.update(b1, np.array([0.9], np.float32), np.zeros(1, np.float32))
    tr.update(b2, np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
    # new tracks born after frame 1 are unconfirmed for one frame
    # (reference byte_tracker activate(): is_activated only at frame 1)
    out = tr.update(b2, np.array([0.9, 0.9], np.float32), np.zeros(2, np.float32))
    assert len(out) == 2
    assert len(set(out[:, 4].astype(int))) == 2
