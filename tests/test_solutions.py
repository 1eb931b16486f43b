"""Solutions logic tests with a scripted fake detector (deterministic,
no model inference — the logic under test is counting/geometry)."""

import numpy as np

from improving_yolov8_cbam_swinblock_tpu.solutions import (
    Heatmap,
    ObjectCounter,
    QueueManager,
    RegionCounter,
    SpeedEstimator,
)


class FakeModel:
    """Scripted .track(): one object moving left->right across x=100."""

    def __init__(self, trajectory):
        self.trajectory = trajectory  # list of (n, 6) arrays
        self.i = 0

    def track(self, frame, persist=True, **kw):
        class R:
            pass

        class B:
            pass

        det = self.trajectory[min(self.i, len(self.trajectory) - 1)]
        self.i += 1
        r = R()
        r.boxes = B()
        r.boxes.data = det
        r.track_ids = np.arange(len(det)) + 1
        return [r]


def moving_box(xs, y=100, size=20):
    return [np.array([[x - size / 2, y - size / 2, x + size / 2, y + size / 2, 0.9, 0]], np.float32) for x in xs]


def test_object_counter_line_crossing():
    traj = moving_box([80, 90, 110, 130])
    oc = ObjectCounter(model=FakeModel(traj), region=[(100, 0), (100, 200)])
    frame = np.zeros((200, 200, 3), np.uint8)
    for _ in traj:
        out = oc.process(frame)
    assert out["in_count"] + out["out_count"] == 1


def test_region_counter():
    traj = moving_box([50, 150])
    rc = RegionCounter(model=FakeModel(traj), regions={"left": [(0, 0), (100, 0), (100, 200), (0, 200)]})
    frame = np.zeros((200, 200, 3), np.uint8)
    c1 = rc.process(frame)
    c2 = rc.process(frame)
    assert c1["left"] == 1 and c2["left"] == 0


def test_heatmap_accumulates():
    traj = moving_box([100, 100, 100])
    hm = Heatmap(model=FakeModel(traj))
    frame = np.zeros((200, 200, 3), np.uint8)
    for _ in traj:
        h = hm.process(frame)
    assert h.max() == 3.0
    assert h.sum() > 0


def test_speed_estimator_positive_speed():
    traj = moving_box([100, 130, 160])
    se = SpeedEstimator(model=FakeModel(traj), fps=30, meters_per_pixel=0.1)
    frame = np.zeros((200, 200, 3), np.uint8)
    for _ in traj:
        speeds = se.process(frame)
    assert speeds[1] > 0  # 30 px/frame * 0.1 m/px * 30 fps * 3.6 = 324 km/h


def test_queue_manager_region():
    traj = [np.concatenate(moving_box([50])[0:1] + moving_box([150])[0:1])]
    qm = QueueManager(model=FakeModel(traj), region=[(0, 0), (100, 0), (100, 200), (0, 200)])
    frame = np.zeros((200, 200, 3), np.uint8)
    assert qm.process(frame) == 1
