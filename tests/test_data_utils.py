"""Data layer periphery: label cache, verification, converters, DOTA
splitter (reference data/{utils,converter,split_dota}.py)."""

import json
import time
from pathlib import Path

import cv2
import numpy as np
import pytest


def _mini_split(root, n=3, s=64, bad_label=False):
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(n):
        img = np.full((s, s, 3), 100, np.uint8)
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        cls = 99 if (bad_label and i == 0) else 0
        (root / "labels/train" / f"{i}.txt").write_text(f"{cls} 0.5 0.5 0.25 0.25\n")
    return root / "images/train"


def test_label_cache_roundtrip(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.utils import load_or_build_cache

    split = _mini_split(tmp_path)
    files = sorted(str(p) for p in split.iterdir())
    labels, stats = load_or_build_cache(files, num_cls=3)
    assert stats["nf"] == 3 and stats["ncorrupt"] == 0
    cache = tmp_path / "labels" / "train.cache"
    assert cache.exists()
    # second load hits the cache (same results, no re-parse errors)
    labels2, stats2 = load_or_build_cache(files, num_cls=3)
    assert stats2 == stats
    np.testing.assert_array_equal(labels[0]["xywhn"], labels2[0]["xywhn"])
    # touching a label invalidates the hash -> rebuild picks up the edit
    lf = tmp_path / "labels/train/0.txt"
    lf.write_text("1 0.5 0.5 0.5 0.5\n2 0.2 0.2 0.1 0.1\n")
    labels3, _ = load_or_build_cache(files, num_cls=3)
    assert len(labels3[0]["cls"]) == 2


def test_verification_rejects_bad_class(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import YOLODataset

    split = _mini_split(tmp_path, bad_label=True)
    with pytest.raises(ValueError, match="corrupt"):
        YOLODataset(str(split), imgsz=64, nc=3)


def test_coco_class_maps():
    from improving_yolov8_cbam_swinblock_tpu.data.converter import (
        coco80_to_coco91_class,
        coco91_to_coco80_class,
    )

    fwd = coco91_to_coco80_class()
    inv = coco80_to_coco91_class()
    assert sum(v is not None for v in fwd) == 80
    for i80 in range(80):
        assert fwd[inv[i80] - 1] == i80  # roundtrip


def test_convert_coco(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.converter import convert_coco

    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 50}],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0},
            {"image_id": 1, "category_id": 3, "bbox": [50, 20, 30, 10], "iscrowd": 0},
        ],
        "categories": [],
    }
    (tmp_path / "ann").mkdir()
    (tmp_path / "ann" / "instances_val.json").write_text(json.dumps(coco))
    out = convert_coco(str(tmp_path / "ann"), str(tmp_path / "yolo"))
    txt = (out / "labels" / "val" / "a.txt").read_text().strip().splitlines()
    assert len(txt) == 2
    cls, cx, cy, w, h = map(float, txt[0].split())
    assert (cls, cx, cy, w, h) == (0.0, 0.2, 0.4, 0.2, 0.4)


def test_dota_convert_and_split(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.converter import convert_dota_to_yolo_obb
    from improving_yolov8_cbam_swinblock_tpu.data.split_dota import split_trainval

    root = tmp_path / "dota"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train_original").mkdir(parents=True)
    img = np.zeros((300, 400, 3), np.uint8)
    rect = cv2.boxPoints(((120, 100), (60, 30), 20.0))
    cv2.fillPoly(img, [rect.astype(np.int32)], (0, 200, 255))
    cv2.imwrite(str(root / "images/train/scene.png"), img)
    row = " ".join(f"{v:.1f}" for v in rect.reshape(-1)) + " plane 0"
    (root / "labels/train_original/scene.txt").write_text(row + "\n")

    convert_dota_to_yolo_obb(str(root))
    lab = (root / "labels/train/scene.txt").read_text().split()
    assert lab[0] == "0" and len(lab) == 9
    pts = np.array(list(map(float, lab[1:]))).reshape(4, 2)
    assert (pts[:, 0] <= 1.01).all() and (pts[:, 1] <= 1.01).all()

    out = tmp_path / "tiled"
    split_trainval(str(root), str(out), crop_size=256, gap=64)
    crops = list((out / "images/train").glob("*.png"))
    labels = list((out / "labels/train").glob("*.txt"))
    assert crops and len(crops) == len(labels)
    # every kept crop's label stays normalized
    for lf in labels:
        vals = np.array(lf.read_text().split()[1:], np.float64)
        assert (vals >= -0.01).all() and (vals <= 1.01).all()


def test_hub_dataset_stats(tmp_path):
    """HUBDatasetStats JSON + compressed previews (reference
    data/utils.py:470)."""
    from tests.synth_data import make_synth_dataset

    from improving_yolov8_cbam_swinblock_tpu.data.utils import HUBDatasetStats

    y = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=2)
    h = HUBDatasetStats(str(y))
    st = h.get_json(save=True)
    assert st["nc"] == 3 and len(st["names"]) == 3
    assert st["train"]["image_stats"]["total"] == 4
    assert st["val"]["instance_stats"]["total"] > 0
    assert sum(st["train"]["instance_stats"]["per_class"]) == st["train"]["instance_stats"]["total"]
    # every image contributes a labels entry of [cls, x, y, w, h] rows
    lab = next(iter(st["train"]["labels"][0].values()))
    assert all(len(row) == 5 for row in lab)
    assert (h.hub_dir / "stats.json").exists()
    out = h.process_images()
    assert len(out) == 6 and all(p.exists() for p in out)
