"""Console observability: validator metrics table + predictor per-image
lines (reference detect/val.py print_results, predictor.py:327 logging)."""

import logging

import numpy as np
import pytest

from tests.synth_data import make_synth_dataset


@pytest.fixture()
def yolo_log():
    """Capture the package logger directly (it has propagate=False, so
    pytest's root-logger caplog never sees it)."""
    records = []

    class _Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("yolo")
    h = _Cap(level=logging.INFO)
    old_level = logger.level
    logger.addHandler(h)
    logger.setLevel(logging.INFO)
    try:
        yield records
    finally:
        logger.removeHandler(h)
        logger.setLevel(old_level)


def test_val_prints_metrics_table(tmp_path, yolo_log):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    data = make_synth_dataset(str(tmp_path), n_train=4, n_val=4, imgsz=64)
    m = YOLO("yolov8n.yaml")
    m.val(data=data, imgsz=64, batch=2, workers=1, project=str(tmp_path))
    text = "\n".join(yolo_log)
    assert "Class" in text and "Instances" in text and "mAP50-95)" in text
    assert any(line.split()[:1] == ["all"] for line in yolo_log)


def test_predict_logs_per_image(yolo_log):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.zeros((48, 64, 3), np.uint8)
    m.predict([img, img], imgsz=64)
    lines = [msg for msg in yolo_log if msg.startswith("image ")]
    assert len(lines) == 2
    assert "48x64" in lines[0] and lines[0].rstrip().endswith("ms")


def test_verbose_false_is_silent(yolo_log):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.zeros((48, 64, 3), np.uint8)
    m.predict([img], imgsz=64, verbose=False)
    assert not [msg for msg in yolo_log if msg.startswith("image ")]
