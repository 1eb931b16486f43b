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


def test_polygon_mask_rasterizers(tmp_path):
    """polygon2mask family (reference data/utils.py:214-275): full-res
    fill before downsample; overlap mask gives smaller instances higher
    index (stamping equals the reference's add-then-clip)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.data.utils import (
        polygon2mask, polygons2masks, polygons2masks_overlap,
    )

    big = np.array([8, 8, 56, 8, 56, 56, 8, 56], np.float32)
    small = np.array([20, 20, 40, 20, 40, 40, 20, 40], np.float32)
    m = polygon2mask((64, 64), [big], color=1)
    assert m.dtype == np.uint8 and m[30, 30] == 1 and m[0, 0] == 0
    assert polygon2mask((64, 64), [big], downsample_ratio=4).shape == (16, 16)
    ms = polygons2masks((64, 64), [big, small], color=1)
    assert ms.shape == (2, 64, 64)
    overlap, order = polygons2masks_overlap((64, 64), [small, big])
    assert list(order) == [1, 0]  # big first (descending area)
    assert overlap[30, 30] == 2 and overlap[10, 10] == 1  # small wins overlap


def test_autosplit_and_cls_dataset(tmp_path):
    """autosplit writes weighted txt splits; check_cls_dataset resolves
    folder structure to nc/names (reference data/utils.py:660, :390)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.data.utils import autosplit, check_cls_dataset
    from improving_yolov8_cbam_swinblock_tpu.utils.patches import imwrite

    imgs = tmp_path / "ds" / "images"
    imgs.mkdir(parents=True)
    arr = np.zeros((8, 8, 3), np.uint8)
    for i in range(20):
        imwrite(str(imgs / f"{i:02d}.jpg"), arr)
    txts = autosplit(imgs, weights=(0.5, 0.5, 0.0))
    lines = sum(len(t.read_text().splitlines()) for t in txts if t.exists())
    assert lines == 20

    croot = tmp_path / "cls"
    for split in ("train", "val"):
        for cls in ("cat", "dog"):
            d = croot / split / cls
            d.mkdir(parents=True)
            imwrite(str(d / "a.jpg"), arr)
    info = check_cls_dataset(croot)
    assert info["nc"] == 2 and info["names"] == {0: "cat", 1: "dog"} and info["val"] is not None


def test_exif_size_and_visualize(tmp_path):
    """exif_size swaps w/h for rotated EXIF; visualize_image_annotations
    renders YOLO txt boxes (reference data/utils.py:58, :170)."""
    import numpy as np
    from PIL import Image

    from improving_yolov8_cbam_swinblock_tpu.data.utils import exif_size, visualize_image_annotations
    from improving_yolov8_cbam_swinblock_tpu.utils.patches import imwrite

    im = Image.new("RGB", (40, 20))
    assert exif_size(im) == (40, 20)
    ex = im.getexif()
    ex[274] = 6
    im2 = Image.new("RGB", (40, 20))
    im2.getexif().update(ex)  # PIL keeps exif on the instance
    assert exif_size(im2) in ((20, 40), (40, 20))  # swapped when tag sticks

    p = tmp_path / "im.jpg"
    imwrite(str(p), np.zeros((64, 64, 3), np.uint8))
    t = tmp_path / "im.txt"
    t.write_text("0 0.5 0.5 0.5 0.5\n")
    out = visualize_image_annotations(p, t, {0: "thing"}, save_path=tmp_path / "vis.jpg")
    assert out.shape == (64, 64, 3) and out.any() and (tmp_path / "vis.jpg").exists()


def test_check_source_flags():
    """check_source sniffing (reference data/build.py:196)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.data.build import check_source

    _, st = check_source("rtsp://cam/1")
    assert st.stream and not st.from_img
    _, st = check_source(0)
    assert st.stream
    _, st = check_source("screen 0")
    assert st.screenshot
    _, st = check_source(np.zeros((4, 4, 3), np.uint8))
    assert st.from_img
    _, st = check_source("folder/img.jpg")
    assert not (st.stream or st.screenshot or st.from_img or st.tensor)
