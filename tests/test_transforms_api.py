"""Class-based transform API (reference augment.py transform objects —
Compose/Mosaic/MixUp/RandomPerspective/LetterBox/Format/... — layered
over this framework's functional kernels, data/transforms.py)."""

from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from synth_data import make_synth_dataset

    from improving_yolov8_cbam_swinblock_tpu.data.dataset import YOLODataset, check_det_dataset

    root = tmp_path_factory.mktemp("tf")
    yml = make_synth_dataset(root, n_train=8, n_val=2, imgsz=96, nc=2)
    info = check_det_dataset(str(yml))
    return YOLODataset(info["train"], imgsz=96, nc=int(info["nc"]))


def _sample(dataset, i=0):
    return dataset.load_sample(i)


def test_compose_container():
    from improving_yolov8_cbam_swinblock_tpu.data.transforms import Compose

    double = lambda x: x * 2  # noqa: E731
    inc = lambda x: x + 1  # noqa: E731
    c = Compose([double, inc])
    assert c(3) == 7
    c.append(double)
    assert c(3) == 14
    c.insert(0, inc)
    assert c(2) == 14
    assert c[[0, 1]](2) == 6  # sub-compose
    assert len(c.tolist()) == 4
    assert "Compose" in repr(c)


def test_mosaic_mixup_classes(dataset):
    import random

    from improving_yolov8_cbam_swinblock_tpu.data.transforms import MixUp, Mosaic

    random.seed(0)
    s = _sample(dataset)
    for n in (4, 9, 3):
        out = Mosaic(dataset, imgsz=96, p=1.0, n=n)(dict(s))
        assert out["img"].shape[2] == 3 and len(out["bboxes"]) == len(out["cls"])
    assert Mosaic(dataset, imgsz=96, p=0.0)(s) is s  # p=0 passthrough
    out = MixUp(dataset, p=1.0)(dict(s))
    assert out["img"].shape == s["img"].shape


def test_geometry_and_color_classes(dataset):
    import random

    from improving_yolov8_cbam_swinblock_tpu.data.transforms import (
        Albumentations,
        LetterBox,
        RandomFlip,
        RandomHSV,
        RandomPerspective,
    )

    random.seed(0)
    s = _sample(dataset)
    out = RandomPerspective(degrees=5, translate=0.1, scale=0.3)(dict(s))
    assert out["img"].shape == s["img"].shape
    out = RandomHSV(0.015, 0.7, 0.4)(dict(s))
    assert out["img"].dtype == np.uint8
    flipped = RandomFlip(p=1.0, direction="horizontal")(dict(s))
    w = s["img"].shape[1]
    if len(s["bboxes"]):
        np.testing.assert_allclose(flipped["bboxes"][:, 0], w - s["bboxes"][:, 2], atol=1e-5)
    out = Albumentations(p=1.0)(dict(s))
    assert out["img"].shape == s["img"].shape

    lb = LetterBox((128, 128))
    out = lb(dict(s))
    assert out["img"].shape[:2] == (128, 128) and "ratio_pad" in out
    img_only = lb(image=s["img"])
    assert img_only.shape[:2] == (128, 128)
    # auto mode returns a stride-multiple minimal rectangle
    rect = LetterBox((128, 128), auto=True, stride=32)(image=np.zeros((60, 120, 3), np.uint8))
    assert rect.shape[0] % 32 == 0 and rect.shape[1] % 32 == 0 and rect.shape[0] <= 128


def test_format_class(dataset):
    from improving_yolov8_cbam_swinblock_tpu.data.transforms import Format, LetterBox

    s = LetterBox((96, 96))(dict(_sample(dataset)))
    out = Format(max_gt=20)(s)
    assert out["img"].shape == (96, 96, 3)
    assert out["bboxes"].shape == (20, 4) and out["cls"].shape == (20,)
    assert out["mask"].sum() == min(len(s["bboxes"]), 20)
    xy = Format(max_gt=20, bbox_format="xyxy")(s)["bboxes"]
    assert (xy[:, 2:] >= xy[:, :2] - 1e-6).all()


def test_classify_transforms():
    from improving_yolov8_cbam_swinblock_tpu.data.transforms import (
        CenterCrop,
        ClassifyLetterBox,
        ToTensor,
        classify_augmentations,
        classify_transforms,
    )

    im = np.random.default_rng(0).integers(0, 255, (100, 160, 3), dtype=np.uint8)
    assert ClassifyLetterBox(64)(im).shape == (64, 64, 3)
    assert CenterCrop(64)(im).shape == (64, 64, 3)
    t = ToTensor()(CenterCrop(64)(im))
    assert t.shape == (3, 64, 64) and t.dtype == np.float32 and t.max() <= 1.0
    out = classify_augmentations(size=64, hflip=1.0, erasing=0.5)(im)
    assert out.shape == (3, 64, 64)
    out = classify_transforms(size=64)(im)
    assert out.shape == (3, 64, 64)


def test_random_load_text():
    import random

    from improving_yolov8_cbam_swinblock_tpu.data.transforms import RandomLoadText

    random.seed(0)
    labels = {
        "texts": [[f"class {i}"] for i in range(10)],
        "cls": np.array([2.0, 7.0]),
    }
    out = RandomLoadText(neg_samples=(3, 3), max_samples=8)(labels)
    # positives keep their (remapped) slots and prompts
    assert out["texts"][int(out["cls"][0])] == "class 2"
    assert out["texts"][int(out["cls"][1])] == "class 7"
    assert len(out["texts"]) <= 8
    padded = RandomLoadText(neg_samples=(1, 1), max_samples=6, padding=True)(dict(labels, cls=np.array([0.0])))
    assert len(padded["texts"]) == 6


def test_v8_transforms_pipeline(dataset):
    import random

    from improving_yolov8_cbam_swinblock_tpu.data.transforms import Compose, v8_transforms

    random.seed(0)
    hyp = {"mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0, "degrees": 0.0,
           "translate": 0.1, "scale": 0.5, "shear": 0.0, "perspective": 0.0,
           "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "flipud": 0.0, "fliplr": 0.5}
    pipe = v8_transforms(dataset, imgsz=96, hyp=hyp)
    assert isinstance(pipe, Compose)
    out = pipe(_sample(dataset))
    assert out["img"].ndim == 3 and "bboxes" in out and "cls" in out


def test_v8_transforms_explicit_zeros_disable_augs(dataset):
    """Explicit 0.0 hyp values must NOT fall back to defaults (r4 advisor):
    hyp={'mosaic':0.0,'fliplr':0.0,...} must yield p=0 / gain=0, not the
    reference defaults (Mosaic p=1.0, fliplr 0.5, translate 0.1, scale 0.5)."""
    from improving_yolov8_cbam_swinblock_tpu.data.transforms import v8_transforms

    hyp = {"mosaic": 0.0, "fliplr": 0.0, "translate": 0.0, "scale": 0.0}
    pipe = v8_transforms(dataset, imgsz=96, hyp=hyp)
    pre = pipe.transforms[0]
    mosaic, rp = pre.transforms[0], pre.transforms[2]
    assert mosaic.p == 0.0
    assert rp.translate == 0.0 and rp.scale == 0.0
    fliplr = pipe.transforms[-1]
    assert fliplr.p == 0.0
    # and missing keys still get the reference defaults
    dflt = v8_transforms(dataset, imgsz=96, hyp={})
    assert dflt.transforms[0].transforms[0].p == 1.0
    assert dflt.transforms[-1].p == 0.5
