"""Classification task e2e: imagefolder -> train -> top1/top5."""

from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def cls_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsdata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 16), ("val", 8)):
        for ci, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
            d = root / split / f"class{ci}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = np.clip(
                    np.full((64, 64, 3), color, np.int32) + rng.integers(-40, 40, (64, 64, 3)), 0, 255
                ).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img)
    return root


def test_classify_train_and_val(cls_data, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n-cls.yaml")
    # BN running stats (momentum .97) need ~100 updates before eval-mode
    # inference stabilizes — same warmup the reference's tiny e2e runs rely on
    r = m.train(
        data=str(cls_data), epochs=100, imgsz=64, batch=16, nbs=16, workers=2,
        project=str(tmp_path / "runs"), amp=False, warmup_epochs=2.0, lr0=0.05, patience=200, val=True, optimizer="SGD",
    )
    assert set(r) == {"top1", "top5", "fitness"}
    # 3 solid-color classes: must be learnable to high accuracy
    assert r["top1"] >= 0.8, r
    assert r["top5"] == 1.0


def test_classification_dataset_layout(cls_data):
    from improving_yolov8_cbam_swinblock_tpu.data.classify import ClassificationDataset

    ds = ClassificationDataset(cls_data / "train", imgsz=64)
    assert ds.nc == 3 and len(ds) == 48
    s = ds.load(0, train=True, rng=np.random.default_rng(0))
    assert s["img"].shape == (64, 64, 3)
    assert 0 <= int(s["label"]) < 3
