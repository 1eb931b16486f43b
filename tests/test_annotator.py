"""auto_annotate: YOLO boxes -> SAM masks -> YOLO-seg label files
(reference data/annotator.py). The detector is stubbed with fixed boxes
(random-init YOLO yields no detections at conf 0.25); SAM runs for real
at a small image size."""

from pathlib import Path

import cv2
import numpy as np
import pytest

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


def test_output_to_target_and_scatter(tmp_path):
    """plotting tail: output_to_target / rotated / plt_color_scatter
    (reference plotting.py:930-975)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.utils.plotting import (
        output_to_rotated_target,
        output_to_target,
        plt_color_scatter,
    )

    out = np.zeros((2, 5, 6))
    out[0, 0] = [10, 10, 30, 40, 0.9, 1]
    out[1, 2] = [0, 0, 20, 20, 0.5, 0]
    b, c, xywh, conf = output_to_target(out)
    assert b.tolist() == [0, 1] and c.tolist() == [1, 0]
    assert xywh[0].tolist() == [20, 25, 20, 30]
    assert conf.tolist() == [0.9, 0.5]

    r = np.zeros((1, 3, 7))
    r[0, 0] = [10, 10, 5, 8, 0.7, 2, 0.3]
    b, c, xywhr, conf = output_to_rotated_target(r)
    assert xywhr[0].tolist() == [10, 10, 5, 8, pytest.approx(0.3)]

    bt, ct, boxt, conft = output_to_target(np.zeros((0, 5, 6)))
    assert len(bt) == 0 and boxt.shape == (0, 4)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt_color_scatter(np.random.rand(40), np.random.rand(40))
    plt.savefig(tmp_path / "scatter.png")
    plt.close("all")
    assert (tmp_path / "scatter.png").exists()
