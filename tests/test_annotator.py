"""auto_annotate: YOLO boxes -> SAM masks -> YOLO-seg label files
(reference data/annotator.py). The detector is stubbed with fixed boxes
(random-init YOLO yields no detections at conf 0.25); SAM runs for real
at a small image size."""

from pathlib import Path

import cv2
import numpy as np

from improving_yolov8_cbam_swinblock_tpu.data.annotator import auto_annotate
from improving_yolov8_cbam_swinblock_tpu.engine.results import Results


class _StubDet:
    """Fixed-box detector standing in for a trained YOLO facade."""

    def predict(self, source, **kw):
        img = cv2.imread(str(source))
        det = np.array([[20.0, 25.0, 70.0, 75.0, 0.9, 0.0]], np.float32)
        return [Results(img, str(source), {0: "square"}, det)]


def test_auto_annotate_writes_seg_labels(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 30, (96, 96, 3)).astype(np.uint8)
        img[25:75, 20:70] = 210
        cv2.imwrite(str(imgs / f"{i}.jpg"), img)

    from improving_yolov8_cbam_swinblock_tpu.models.sam import SAM

    out = auto_annotate(imgs, det_model=_StubDet(), sam_model=SAM("sam_b", img_size=128))
    labels = sorted(out.glob("*.txt"))
    assert len(labels) == 2
    for lf in labels:
        lines = [l for l in lf.read_text().splitlines() if l]
        assert lines, lf
        vals = lines[0].split()
        assert vals[0] == "0" and len(vals) >= 7 and (len(vals) - 1) % 2 == 0
        coords = np.asarray(vals[1:], np.float32)
        assert (coords >= 0).all() and (coords <= 1).all()
