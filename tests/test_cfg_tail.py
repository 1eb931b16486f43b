"""Config-surface tail: full key parity with the reference default.yaml
plus behavior for the keys added in round 3 — cache, time, dropout,
copy_paste_mode, mask_ratio, overlap_mask, retina_masks, save_frames,
show, stream_buffer, tracker, cfg layering, exporter compat flags
(reference cfg/default.yaml)."""

from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml

from improving_yolov8_cbam_swinblock_tpu.cfg import DEFAULT_CFG_PATH, get_cfg

REF_DEFAULT = Path("/root/reference/ultralytics/cfg/default.yaml")


# ---------------------------------------------------------------- key parity
def test_default_yaml_covers_every_reference_key():
    ours = set(yaml.safe_load(DEFAULT_CFG_PATH.read_text()))
    ref = set(yaml.safe_load(REF_DEFAULT.read_text()))
    assert ref - ours == set(), f"reference config keys missing: {sorted(ref - ours)}"


def test_cfg_file_layering(tmp_path):
    user = tmp_path / "user.yaml"
    user.write_text("imgsz: 320\nlr0: 0.02\n")
    # cfg=<path> layered between defaults and explicit overrides
    a = get_cfg(overrides={"cfg": str(user), "lr0": 0.05})
    assert a.imgsz == 320  # from the user yaml
    assert a.lr0 == 0.05  # explicit override beats the user yaml
    assert a.cfg == str(user)
    with pytest.raises(KeyError):
        bad = tmp_path / "bad.yaml"
        bad.write_text("no_such_key: 1\n")
        get_cfg(overrides={"cfg": str(bad)})


def test_new_keys_validated():
    assert get_cfg().tracker == "botsort.yaml"
    with pytest.raises(TypeError):
        get_cfg(overrides={"show": "yes"})
    with pytest.raises(ValueError):
        get_cfg(overrides={"copy_paste_mode": "paste"})
    with pytest.raises(ValueError):
        get_cfg(overrides={"cache": "gpu"})
    assert get_cfg(overrides={"cache": "disk"}).cache == "disk"


# ---------------------------------------------------------------- copy_paste
def _poly_sample(rng, s=96, n=2):
    img = rng.integers(0, 60, (s, s, 3), dtype=np.uint8)
    boxes, polys, cls = [], [], []
    for k in range(n):
        r = 10.0
        cx, cy = 16.0 + 20 * k, 16.0 + 20 * k
        cv2.circle(img, (int(cx), int(cy)), int(r), (0, 255, 0), -1)
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        polys.append(np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1).astype(np.float32))
        boxes.append([cx - r, cy - r, cx + r, cy + r])
        cls.append(0.0)
    return {
        "img": img,
        "bboxes": np.asarray(boxes, np.float32),
        "cls": np.asarray(cls, np.float32),
        "segments": polys,
        "kpts": [None] * n,
    }


def test_copy_paste_flip_pastes_mirrored_instances():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import copy_paste_inst

    rng = np.random.default_rng(0)
    s = _poly_sample(rng)
    inst = {
        "img": s["img"],
        "bboxes": s["bboxes"],
        "cls": s["cls"],
        "polys": s["segments"],
        "kpts": s["kpts"],
    }
    out = copy_paste_inst(inst, rng, p=1.0)
    assert len(out["cls"]) > len(inst["cls"])  # mirrored copies appended
    w = inst["img"].shape[1]
    # pasted boxes are the lr mirror of the originals
    for nb in out["bboxes"][len(inst["cls"]):]:
        assert any(
            np.allclose(nb, [w - ob[2], ob[1], w - ob[0], ob[3]], atol=1e-4)
            for ob in inst["bboxes"]
        )


def test_copy_paste_mixup_mode_uses_donor():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import geometric_train_transform

    rng = np.random.default_rng(1)
    samples = [_poly_sample(rng) for _ in range(8)]
    hyp = {
        "mosaic": 1.0, "copy_paste": 1.0, "copy_paste_mode": "mixup",
        "mixup": 0.0, "fliplr": 0.0, "flipud": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "pixel_augment": 0.0,
        "degrees": 0.0, "translate": 0.0, "scale": 0.0,
    }
    out = geometric_train_transform(samples, 96, rng, hyp)
    base = geometric_train_transform(
        samples, 96, np.random.default_rng(1), {**hyp, "copy_paste": 0.0}
    )
    assert len(out["cls"]) >= len(base["cls"])  # donor instances appended


def test_copy_paste_mixup_loader_supplies_donors(tiny_dataset):
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(str(Path(tiny_dataset).parent / "images" / "train"), imgsz=64, max_gt=16, nc=3)
    loader = DataLoader(
        ds, 2, train=True, workers=1, task="segment",
        hyp={"mosaic": 1.0, "copy_paste": 1.0, "copy_paste_mode": "mixup"},
    )
    group = loader._load_group(np.random.default_rng(0), 0)
    assert len(group) == 8  # 1 main + 3 mosaic + 4 copy-paste donors


# ------------------------------------------------- mask_ratio / overlap_mask
def _seg_samples(rng, n=4, s=96):
    return [_poly_sample(rng, s) for _ in range(n)]


def test_mask_ratio_changes_target_resolution():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import segment_transform

    rng = np.random.default_rng(2)
    out = segment_transform(_seg_samples(rng), 96, 8, True, rng, {"mosaic": 0.0, "mask_ratio": 8})
    assert out["seg_map"].shape == (12, 12)
    out4 = segment_transform(_seg_samples(rng), 96, 8, True, rng, {"mosaic": 0.0})
    assert out4["seg_map"].shape == (24, 24)


def test_overlap_mask_false_bitplanes():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import segment_transform

    rng = np.random.default_rng(3)
    out = segment_transform(
        _seg_samples(rng), 96, 40, True, rng,
        {"mosaic": 0.0, "overlap_mask": False, "fliplr": 0.0, "pixel_augment": 0.0,
         "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "translate": 0.0, "scale": 0.0},
    )
    seg = out["seg_map"]
    assert seg.shape == ((40 + 31) // 32, 24, 24) and seg.dtype == np.int32
    n = int(out["mask"].sum())
    # each real instance owns its bit and has a non-empty mask
    for j in range(n):
        assert ((seg[j // 32] >> (j % 32)) & 1).sum() > 0


def test_seg_loss_bitplane_matches_overlap_when_disjoint():
    """For non-overlapping instances the two GT encodings are identical,
    so the loss must agree exactly."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.utils.seg_loss import segmentation_loss

    rng = np.random.default_rng(4)
    B, G, nc, nm, reg_max = 2, 6, 3, 8, 16
    imgsz = 64
    shapes = [(8, 8), (4, 4), (2, 2)]
    feats = [jnp.asarray(rng.normal(size=(B, h, w, 4 * reg_max + nc)), jnp.float32) for h, w in shapes]
    A = sum(h * w for h, w in shapes)
    coeffs = jnp.asarray(rng.normal(size=(B, A, nm)), jnp.float32)
    protos = jnp.asarray(rng.normal(size=(B, 16, 16, nm)), jnp.float32)
    cls = jnp.asarray(rng.integers(0, nc, (B, G)), jnp.float32)
    mask = jnp.ones((B, G), jnp.float32)
    # disjoint axis-aligned boxes as instances
    xy = (np.arange(G) % 3) / 3 + 1 / 6
    boxes = np.stack(
        [np.broadcast_to(xy, (B, G)), np.broadcast_to((np.arange(G) // 3) / 2 + 0.25, (B, G)),
         np.full((B, G), 0.25), np.full((B, G), 0.3)], -1
    ).astype(np.float32)
    ms = 16
    overlap = np.zeros((B, ms, ms), np.int32)
    planes = np.zeros((B, (G + 31) // 32, ms, ms), np.int32)
    for b in range(B):
        for j in range(G):
            cx, cy, w, h = boxes[b, j]
            x1, y1 = int((cx - w / 2) * ms), int((cy - h / 2) * ms)
            x2, y2 = int((cx + w / 2) * ms), int((cy + h / 2) * ms)
            overlap[b, y1:y2, x1:x2] = j + 1
            planes[b, j // 32, y1:y2, x1:x2] |= 1 << (j % 32)
    args = (feats, coeffs, protos, cls, jnp.asarray(boxes), mask)
    kw = dict(nc=nc, nm=nm, strides=(8, 16, 32))
    t1, m1, s1 = segmentation_loss(*args, jnp.asarray(overlap), **kw)
    t2, m2, s2 = segmentation_loss(*args, jnp.asarray(planes), **kw)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


# ---------------------------------------------------------------- image cache
def test_image_cache_ram_and_disk(tiny_dataset):
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import YOLODataset

    img_dir = str(Path(tiny_dataset).parent / "images" / "train")
    plain = YOLODataset(img_dir, imgsz=64, max_gt=8, nc=3)
    ram = YOLODataset(img_dir, imgsz=64, max_gt=8, nc=3, cache=True)
    disk = YOLODataset(img_dir, imgsz=64, max_gt=8, nc=3, cache="disk")
    try:
        a = plain.load_sample(0)["img"]
        np.testing.assert_array_equal(ram.load_sample(0)["img"], a)
        np.testing.assert_array_equal(ram.load_sample(0)["img"], a)  # cache hit
        assert 0 in ram._ram
        np.testing.assert_array_equal(disk.load_sample(0)["img"], a)
        npy = Path(disk.img_files[0]).with_suffix(".npy")
        assert npy.exists()
        np.testing.assert_array_equal(disk.load_sample(0)["img"], a)  # .npy hit
        # mutating the returned ram frame must not poison the cache
        f = ram.load_sample(0)["img"]
        f[:] = 0
        np.testing.assert_array_equal(ram.load_sample(0)["img"], a)
    finally:
        for f in Path(img_dir).glob("*.npy"):
            f.unlink()
    with pytest.raises(ValueError):
        YOLODataset(img_dir, imgsz=64, max_gt=8, nc=3, cache="gpu")


# ---------------------------------------------------------------- time budget
def test_time_budget_stops_training(tiny_dataset, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    # a microscopic budget stops after the first epoch despite epochs=50
    metrics = m.train(
        data=str(tiny_dataset), epochs=50, time=1e-6, imgsz=64, batch=4,
        project=str(tmp_path), name="tb", val=False, plots=False, workers=2,
        device_augment=False,
    )
    import csv

    rows = list(csv.DictReader(open(tmp_path / "tb" / "results.csv")))
    assert len(rows) == 1, f"time budget ignored: {len(rows)} epochs ran"
    assert metrics is not None


# ---------------------------------------------------------------- dropout
def test_classify_dropout_active_in_train():
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.heads import Classify

    head = Classify(nc=5, c_=32, dropout=0.5)
    x = jnp.ones((2, 8, 8, 16))
    v = head.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    # no dropout params; eval path deterministic
    y1 = head.apply(v, x, train=False)
    y2 = head.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # train path needs the rng and varies with it
    t1, _ = head.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    t2, _ = head.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


# ---------------------------------------------------------------- retina masks
@pytest.mark.slow_ok
def test_retina_masks_predict(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    p = tmp_path / "im.jpg"
    cv2.imwrite(str(p), img)
    m = YOLO("yolov8n-seg.yaml")
    r0 = m.predict(str(p), imgsz=64, conf=1e-6)[0]
    r1 = m.predict(str(p), imgsz=64, conf=1e-6, retina_masks=True)[0]
    assert len(r1.boxes) == len(r0.boxes)
    if r1.masks is not None:
        assert r1.masks.data.shape[-2:] == img.shape[:2]
        # retina masks are confined to their (native-space) boxes
        for k in range(min(3, len(r1.boxes))):
            x1, y1, x2, y2 = r1.boxes.data[k, :4]
            outside = r1.masks.data[k].copy()
            outside[max(int(y1), 0):int(np.ceil(y2)), max(int(x1), 0):int(np.ceil(x2))] = False
            assert outside.sum() == 0


# ------------------------------------------------------------- save_frames
@pytest.mark.slow_ok
def test_save_frames_video_outputs(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    rng = np.random.default_rng(1)
    vid = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 64))
    assert w.isOpened()
    for _ in range(4):
        w.write(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    w.release()
    m = YOLO("yolov8n.yaml")
    m.predict(
        str(vid), imgsz=64, conf=1e-6, save=True, save_frames=True,
        project=str(tmp_path), name="out",
    )
    out = tmp_path / "out"
    assert (out / "clip.mp4").exists()  # annotated video muxed
    frames = list((out / "clip_frames").glob("*.jpg"))
    assert len(frames) == 4  # one jpg per frame


def test_show_headless_warns_not_crashes(monkeypatch, caplog):
    from improving_yolov8_cbam_swinblock_tpu.engine.model import YOLO

    monkeypatch.delenv("DISPLAY", raising=False)
    m = YOLO("yolov8n.yaml")
    m._show_results([])  # no GUI -> warn, no raise
