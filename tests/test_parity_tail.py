"""Round-3 parity-tail coverage: mosaic9, screenshots loader, weight
ensembles, classification random erasing, rect through YOLO.val()
(VERDICT r2 'What's missing' #7 / 'Next round' #8)."""

from pathlib import Path

import numpy as np
import pytest

from tests.synth_data import make_synth_dataset


# ---------------------------------------------------------------------------
# mosaic9
# ---------------------------------------------------------------------------


def _sample(rng, h, w, n_box=2):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    boxes = []
    for _ in range(n_box):
        x1, y1 = rng.uniform(0, w * 0.6), rng.uniform(0, h * 0.6)
        boxes.append([x1, y1, x1 + rng.uniform(5, w * 0.3), y1 + rng.uniform(5, h * 0.3)])
    return {
        "img": img,
        "bboxes": np.asarray(boxes, np.float32),
        "cls": rng.integers(0, 3, n_box).astype(np.float32),
    }


def test_mosaic9_geometry():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import mosaic9

    rng = np.random.default_rng(0)
    s = 64
    samples = [_sample(rng, int(rng.integers(32, s + 1)), int(rng.integers(32, s + 1))) for _ in range(9)]
    out = mosaic9(samples, s, rng)
    # same output contract as mosaic4: 2s x 2s canvas + affine border
    assert out["img"].shape == (2 * s, 2 * s, 3)
    assert out["mosaic_border"] == (-s // 2, -s // 2)
    assert out["bboxes"].shape[1] == 4 and len(out["bboxes"]) == len(out["cls"])
    assert out["bboxes"].min() >= 0 and out["bboxes"].max() <= 2 * s
    # center image content lands at canvas offset (s - s//2) = s//2
    h0, w0 = samples[0]["img"].shape[:2]
    y0, x0 = s - s // 2, s - s // 2
    np.testing.assert_array_equal(
        out["img"][y0 : y0 + h0, x0 : x0 + w0], samples[0]["img"]
    )


def test_mosaic9_in_train_transform():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import train_transform

    rng = np.random.default_rng(1)
    samples = [_sample(rng, 96, 96) for _ in range(9)]
    hyp = {"mosaic": 1.0, "mosaic9": 1.0, "mixup": 0.0, "fliplr": 0.0}
    out = train_transform(samples, 96, 32, rng, hyp)
    assert out["img"].shape == (96, 96, 3)
    assert out["bboxes"].shape == (32, 4)


def test_mosaic3_geometry():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import mosaic3

    rng = np.random.default_rng(2)
    s = 64
    samples = [_sample(rng, int(rng.integers(32, s + 1)), int(rng.integers(32, s + 1))) for _ in range(3)]
    out = mosaic3(samples, s, rng)
    assert out["img"].shape == (2 * s, 2 * s, 3)
    assert out["mosaic_border"] == (-s // 2, -s // 2)
    assert out["bboxes"].shape[1] == 4 and len(out["bboxes"]) == len(out["cls"])
    assert out["bboxes"].min() >= 0 and out["bboxes"].max() <= 2 * s
    # center image content lands at crop offset s//2 (canvas s minus border)
    h0, w0 = samples[0]["img"].shape[:2]
    y0 = x0 = s - s // 2
    np.testing.assert_array_equal(out["img"][y0 : y0 + h0, x0 : x0 + w0], samples[0]["img"])
    # right donor starts at the center image's right edge, same row
    # (only the part inside the 2s crop survives)
    h1, w1 = samples[1]["img"].shape[:2]
    vis = min(w1, 2 * s - (x0 + w0))
    assert vis > 0
    np.testing.assert_array_equal(
        out["img"][y0 : y0 + h1, x0 + w0 : x0 + w0 + vis], samples[1]["img"][:, :vis]
    )


def test_mosaic3_in_train_transform():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import train_transform

    rng = np.random.default_rng(3)
    samples = [_sample(rng, 96, 96) for _ in range(4)]
    hyp = {"mosaic": 1.0, "mosaic3": 1.0, "mixup": 0.0, "fliplr": 0.0}
    out = train_transform(samples, 96, 32, rng, hyp)
    assert out["img"].shape == (96, 96, 3)
    assert out["bboxes"].shape == (32, 4)


# ---------------------------------------------------------------------------
# screenshots loader
# ---------------------------------------------------------------------------


class _FakeSct:
    """mss.mss() stand-in: one 200x300 virtual monitor."""

    monitors = [{"left": 0, "top": 0, "width": 300, "height": 200}] * 2

    def grab(self, monitor):
        h, w = monitor["height"], monitor["width"]
        frame = np.zeros((h, w, 4), np.uint8)
        frame[..., 2] = 255  # BGRA red
        return frame


def test_screenshots_loader_region_parsing():
    from improving_yolov8_cbam_swinblock_tpu.data.loaders import LoadScreenshots

    ld = LoadScreenshots("screen 0 10 20 64 48", sct=_FakeSct())
    assert (ld.left, ld.top, ld.width, ld.height) == (10, 20, 64, 48)
    frames, tags = next(ld)
    assert frames[0].shape == (48, 64, 3) and tags[0].startswith("screen0#")
    # full-screen default
    ld2 = LoadScreenshots("screen", sct=_FakeSct())
    frames2, _ = next(ld2)
    assert frames2[0].shape == (200, 300, 3)
    with pytest.raises(ValueError):
        LoadScreenshots("screen 1 2", sct=_FakeSct())


def test_predict_stream_screen_source(tmp_path, monkeypatch):
    """predict(source='screen ...', stream=True) runs the capture loop."""
    import improving_yolov8_cbam_swinblock_tpu.data.loaders as loaders_mod
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    real = loaders_mod.LoadScreenshots
    monkeypatch.setattr(
        loaders_mod, "LoadScreenshots", lambda src: real(src, sct=_FakeSct())
    )
    m = YOLO("yolov8n.yaml")
    gen = m.predict("screen 0 0 0 64 64", stream=True, imgsz=64, conf=0.9)
    r = next(gen)
    assert r.orig_shape == (64, 64)
    gen.close()


# ---------------------------------------------------------------------------
# weight-ensemble loading
# ---------------------------------------------------------------------------


def test_ensemble_load_and_predict(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    p1, p2 = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    for p, seed in ((p1, 0), (p2, 1)):
        m = YOLO("yolov8n.yaml")
        m._ensure_variables(64)
        m.save(p)
    ens = YOLO([p1, p2])
    assert type(ens.model).__name__ == "EnsembleModel"
    img = np.zeros((64, 64, 3), np.uint8)
    res = ens.predict(img, imgsz=64, conf=0.9)
    assert len(res) == 1  # runs end-to-end through shared NMS
    # member anchor counts concatenate
    import jax.numpy as jnp

    pred, _ = ens.model.apply(ens.variables, jnp.zeros((1, 64, 64, 3)))
    single = YOLO(p1)
    sp, _ = single.model.apply(single.variables, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape[-1] == 2 * sp.shape[-1]
    with pytest.raises(NotImplementedError):
        ens.train(data="unused")


# ---------------------------------------------------------------------------
# classification erasing
# ---------------------------------------------------------------------------


def test_classify_erasing(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.classify import ClassificationDataset

    root = tmp_path / "clf" / "train"
    for c in ("cat", "dog"):
        d = root / c
        d.mkdir(parents=True)
        import cv2

        cv2.imwrite(str(d / "x.jpg"), np.full((64, 64, 3), 200, np.uint8))
    ds = ClassificationDataset(root, imgsz=64, erasing=1.0)
    rng = np.random.default_rng(0)
    out = ds.load(0, train=True, rng=rng)["img"]
    zero_frac = (out.sum(-1) == 0).mean()
    assert 0.02 <= zero_frac <= 0.40  # an erased rectangle appeared
    ds0 = ClassificationDataset(root, imgsz=64, erasing=0.0)
    out0 = ds0.load(0, train=True, rng=np.random.default_rng(0))["img"]
    assert (out0.sum(-1) == 0).mean() == 0.0


# ---------------------------------------------------------------------------
# rect through YOLO.val()
# ---------------------------------------------------------------------------


def test_val_rect_plumbed(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    # wide synthetic images -> rect shape must be non-square
    data = make_synth_dataset(tmp_path / "ds", n_train=2, n_val=2, imgsz=64)
    # stretch val images to 2:1 aspect
    import cv2

    for f in (tmp_path / "ds" / "images" / "val").iterdir():
        img = cv2.imread(str(f))
        cv2.imwrite(str(f), cv2.resize(img, (128, 64)))
    m = YOLO("yolov8n.yaml")
    metrics = m.val(data=str(data), imgsz=64, batch=2, rect=True, conf=0.9)
    assert "metrics/mAP50-95(B)" in metrics or any("mAP" in k for k in metrics)


def test_classify_randaugment(tmp_path):
    """auto_augment='randaugment' perturbs train images deterministically
    per rng; val/load without it is untouched."""
    import cv2

    from improving_yolov8_cbam_swinblock_tpu.data.classify import ClassificationDataset

    root = tmp_path / "clf" / "train"
    for c in ("a", "b"):
        d = root / c
        d.mkdir(parents=True)
        img = np.zeros((64, 64, 3), np.uint8)
        cv2.rectangle(img, (16, 16), (48, 48), (200, 120, 60), -1)
        cv2.imwrite(str(d / "x.jpg"), img)
    ds = ClassificationDataset(root, imgsz=64, auto_augment="randaugment")
    rng = np.random.default_rng(3)
    base = ClassificationDataset(root, imgsz=64).load(0, train=False, rng=np.random.default_rng(3))["img"]
    out = ds.load(0, train=True, rng=rng)["img"]
    assert out.shape == base.shape and out.dtype == np.uint8
    # train=False path ignores augment
    same = ds.load(0, train=False, rng=np.random.default_rng(3))["img"]
    np.testing.assert_array_equal(same, base)
    with pytest.raises(ValueError):
        ClassificationDataset(root, imgsz=64, auto_augment="augmix")
