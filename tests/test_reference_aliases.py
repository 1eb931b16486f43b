"""Reference entry-point names resolve to this framework's analogs
(reference class/function names users import directly: AutoBackend,
BasePredictor, BaseTrainer, BaseDataset, InfiniteDataLoader,
register_tracker, export_formats, BaseTrack, ...)."""

import numpy as np
import pytest


def test_engine_aliases():
    from improving_yolov8_cbam_swinblock_tpu.engine.predictor import BasePredictor, DetectionPredictor
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import BaseTrainer, DetectionTrainer

    assert BasePredictor is DetectionPredictor
    assert BaseTrainer is DetectionTrainer


def test_backend_aliases_and_names():
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import (
        AutoBackend,
        Backend,
        check_class_names,
        default_class_names,
    )

    assert AutoBackend is Backend
    names = check_class_names({0: "a", 1: "b"})
    assert names == {0: "a", 1: "b"}
    assert check_class_names(["x", "y"]) == {0: "x", 1: "y"}
    with pytest.raises(KeyError):
        check_class_names({5: "e"}, nc=2)
    d = default_class_names()
    assert d[0] == "person" and len(d) == 80
    assert default_class_names(data=None)[0] == "person"


def test_data_aliases():
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import (
        BaseDataset,
        DataLoader,
        InfiniteDataLoader,
        YOLODataset,
    )
    from improving_yolov8_cbam_swinblock_tpu.data.build import seed_worker

    assert BaseDataset is YOLODataset
    assert InfiniteDataLoader is DataLoader
    seed_worker(3)  # deterministic reseed, no raise


def test_loss_reexports():
    from improving_yolov8_cbam_swinblock_tpu.utils.loss import (
        TaskAlignedAssigner,
        v8ClassificationLoss,
        v8DetectionLoss,
        v8OBBLoss,
        v8PoseLoss,
        v8SegmentationLoss,
    )
    from improving_yolov8_cbam_swinblock_tpu.utils import loss_api

    assert v8DetectionLoss is loss_api.v8DetectionLoss
    assert TaskAlignedAssigner is loss_api.TaskAlignedAssigner


def test_tracker_basetrack_and_embedding_distance():
    from improving_yolov8_cbam_swinblock_tpu.trackers.byte_tracker import BaseTrack, STrack
    from improving_yolov8_cbam_swinblock_tpu.trackers.bot_sort import embedding_distance

    BaseTrack.reset_id()
    a, b = BaseTrack.next_id(), BaseTrack.next_id()
    assert (a, b) == (1, 2)
    assert issubclass(STrack, BaseTrack)

    class T:
        def __init__(self, f):
            self.feat = np.asarray(f, np.float32)

    tracks = [T([1, 0]), T([0, 1])]
    dets = [T([1, 0]), T([1, 1])]
    d = embedding_distance(tracks, dets)
    assert d.shape == (2, 2)
    assert d[0, 0] == pytest.approx(0.0, abs=1e-6)       # identical feature
    assert d[0, 1] == pytest.approx(1 - 1 / np.sqrt(2), rel=1e-5)


def test_export_formats_table():
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import export_formats

    fmts = export_formats()
    assert "Format" in fmts and "Argument" in fmts
    assert "stablehlo" in fmts["Argument"]
    assert len(fmts["Argument"]) == len(fmts["Format"]) >= 5


def test_register_tracker_callbacks(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from synth_data import make_synth_dataset  # noqa: F401  (env parity with other tests)

    from improving_yolov8_cbam_swinblock_tpu import YOLO
    from improving_yolov8_cbam_swinblock_tpu.trackers.track import register_tracker

    m = YOLO("yolov8n.yaml")
    register_tracker(m, persist=True)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), dtype=np.uint8)
    res = m.predict([img, img], imgsz=96, conf=0.001, verbose=False)
    # the postprocess callback attaches track ids to every Results
    assert all(hasattr(r, "track_ids") for r in res)


def test_tracker_single_instance_for_non_stream():
    """Non-stream batches must all feed ONE tracker (reference track.py:38
    uses trackers[0]); bs>1 previously fanned frames across instances,
    fragmenting track continuity (r4 advisor)."""
    from types import SimpleNamespace

    from improving_yolov8_cbam_swinblock_tpu.trackers.track import (
        on_predict_postprocess_end, on_predict_start)

    class FakeBoxes:
        def __init__(self, data):
            self.data = data

    pred = SimpleNamespace(
        args=SimpleNamespace(tracker="bytetrack.yaml"), bs=4,
        source_type=SimpleNamespace(stream=False), results=None)
    on_predict_start(pred)
    assert len(pred.trackers) == 1  # non-stream → one shared tracker
    det = np.array([[10.0, 10.0, 50.0, 50.0, 0.9, 0.0]], np.float32)
    pred.results = [SimpleNamespace(boxes=FakeBoxes(det.copy())) for _ in range(4)]
    on_predict_postprocess_end(pred)  # must not IndexError with bs>1
    ids = [r.track_ids for r in pred.results if len(r.track_ids)]
    # same object across the sequential frames keeps one id on the shared tracker
    assert ids and all((i == ids[0]).all() for i in ids)
