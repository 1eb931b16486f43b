"""On-device augmentation vs the host (cv2/numpy) pipeline.

Equivalence is tested deterministically: the device functions take
explicit parameters (gains, centers, scale, translation), so the same
parameters drive both implementations and outputs must agree within
interpolation/rounding tolerance (VERDICT.md 'Next round' #4).
"""

import cv2
import numpy as np


class _FixedRng:
    """Stub for np.random.Generator feeding mosaic4 fixed placements."""

    def __init__(self, vals):
        self.vals = list(vals)

    def uniform(self, lo, hi, size=None):
        v = self.vals.pop(0)
        return np.full(size, v) if size is not None else v


def test_hsv_device_matches_cv2_lut():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.augment_device import hsv_device

    rng = np.random.default_rng(0)
    img_rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    for gains in ([1.015, 1.4, 0.8], [0.985, 0.6, 1.3], [1.0, 1.0, 1.0]):
        r = np.asarray(gains, np.float64)
        # host: the reference's LUT path (augment.py:1373-1383) on BGR
        hue, sat, val = cv2.split(cv2.cvtColor(img_rgb[..., ::-1], cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(np.uint8)
        lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
        lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
        host_bgr = cv2.cvtColor(
            cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))),
            cv2.COLOR_HSV2BGR,
        )
        host = host_bgr[..., ::-1].astype(np.int32)
        dev = np.asarray(
            hsv_device(jnp.asarray(img_rgb)[None], jnp.asarray([gains], jnp.float32))
        )[0].astype(np.int32)
        diff = np.abs(host - dev)
        # cv2 quantizes H to uint8 before the LUT; the device path keeps H
        # float. Allow small rounding skew, no gross disagreement.
        assert np.mean(diff) < 3.0, (gains, np.mean(diff))
        assert np.mean(diff > 24) < 0.02, (gains, np.mean(diff > 24))


def test_mosaic_placement_matches_host():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.data.augment import mosaic4
    from improving_yolov8_cbam_swinblock_tpu.ops.augment_device import _mosaic_one

    rng = np.random.default_rng(1)
    s = 64
    samples, boxes, cls = [], [], []
    for i in range(4):
        img = rng.integers(0, 255, (s, s, 3), dtype=np.uint8)
        b = np.array([[10.0, 12.0, 40.0, 44.0]], np.float32) + i
        samples.append({"img": img, "bboxes": b, "cls": np.array([float(i)], np.float32)})
        boxes.append(b)
        cls.append([float(i)])
    yc, xc = 70, 58  # fixed center inside [s/2, 3s/2]
    host = mosaic4(samples, s, _FixedRng([yc, xc]))

    dev_canvas, dev_boxes, dev_cls, dev_mask = (
        np.asarray(t)
        for t in _mosaic_one(
            jnp.asarray(np.stack([sm["img"] for sm in samples])),
            jnp.asarray(np.stack(boxes)),
            jnp.asarray(np.asarray(cls, np.float32)),
            jnp.ones((4, 1), np.float32),
            jnp.asarray([xc, yc], jnp.float32),
        )
    )
    assert dev_canvas.shape == host["img"].shape == (2 * s, 2 * s, 3)
    # integer placement -> canvases agree exactly
    np.testing.assert_array_equal(dev_canvas, host["img"])
    np.testing.assert_allclose(np.sort(dev_boxes, 0), np.sort(host["bboxes"], 0), atol=1e-4)


def test_affine_crop_matches_warpaffine():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.augment_device import _affine_crop

    rng = np.random.default_rng(2)
    s = 64
    canvas = rng.integers(0, 255, (2 * s, 2 * s, 3), dtype=np.uint8)
    k, tx, ty = 0.8, 36.0, 28.0
    M = np.array([[k, 0, tx - k * s], [0, k, ty - k * s]], np.float64)
    host = cv2.warpAffine(canvas, M, dsize=(s, s), borderValue=(114, 114, 114)).astype(np.int32)
    boxes = np.array([[20.0, 30.0, 90.0, 100.0]], np.float32)
    dev_img, dev_boxes, cand = (
        np.asarray(t)
        for t in _affine_crop(
            jnp.asarray(canvas), jnp.asarray(boxes), jnp.float32(k), jnp.asarray([tx, ty], jnp.float32), s
        )
    )
    diff = np.abs(host - dev_img.astype(np.int32))
    assert np.mean(diff) < 4.0, np.mean(diff)
    want = boxes[0] * k + np.array([tx - k * s, ty - k * s, tx - k * s, ty - k * s])
    np.testing.assert_allclose(dev_boxes[0], np.clip(want, 0, s), atol=0.5)
    assert bool(cand[0])


def test_device_augment_identity_path():
    """mosaic=0, scale=0, translate=0, hsv gains 0, flip 0 -> exact identity."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.augment_device import device_augment

    rng = np.random.default_rng(3)
    b, s, g = 2, 64, 3
    img = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    boxes = np.zeros((b, g, 4), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.3]
    mask = np.zeros((b, g), np.float32)
    mask[:, 0] = 1.0
    hyp = {k: jnp.float32(0.0) for k in ("mosaic", "scale", "translate", "fliplr", "hsv_h", "hsv_s", "hsv_v")}
    out = device_augment(
        jax.random.PRNGKey(0), jnp.asarray(img), jnp.asarray(boxes),
        jnp.asarray(np.zeros((b, g), np.float32)), jnp.asarray(mask), hyp,
    )
    np.testing.assert_array_equal(np.asarray(out.img), img)
    got = np.asarray(out.bboxes)
    np.testing.assert_allclose(got[:, 0], boxes[:, 0], atol=2.5 / s)
    np.testing.assert_array_equal(np.asarray(out.mask)[:, 0], 1.0)
    assert np.asarray(out.mask)[:, 1:4].sum() == 0  # invalid rows stay masked


def test_device_augment_mosaic_shapes_and_validity():
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.augment_device import device_augment

    rng = np.random.default_rng(4)
    b, s, g = 4, 64, 5
    img = rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)
    boxes = rng.uniform(0.3, 0.6, (b, g, 4)).astype(np.float32)
    mask = (rng.random((b, g)) < 0.7).astype(np.float32)
    cls = rng.integers(0, 3, (b, g)).astype(np.float32)
    hyp = {
        "mosaic": jnp.float32(1.0), "scale": jnp.float32(0.5), "translate": jnp.float32(0.1),
        "fliplr": jnp.float32(0.5), "hsv_h": jnp.float32(0.015), "hsv_s": jnp.float32(0.7),
        "hsv_v": jnp.float32(0.4),
    }
    out = jax.jit(device_augment)(
        jax.random.PRNGKey(1), jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(mask), hyp
    )
    assert out.img.shape == (b, s, s, 3) and out.img.dtype == jnp.uint8
    assert out.bboxes.shape == (b, 4 * g, 4)
    bb = np.asarray(out.bboxes)
    mm = np.asarray(out.mask)
    assert mm.sum() > 0  # mosaic keeps some boxes
    assert ((bb >= 0) & (bb <= 1)).all()
    # masked rows are zeroed
    assert np.abs(bb[mm == 0]).sum() == 0


def test_train_step_consumes_raw_batches(tiny_dataset, tmp_path):
    """device_augment=True: loader ships letterboxed-only batches + traced
    aug params; the jitted step does mosaic/HSV/flip and still learns."""
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(tiny_dataset), "model": "yolov8n.yaml", "epochs": 30, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": "SGD",
            "lr0": 0.02, "device_augment": True, "mosaic": 1.0, "scale": 0.5,
            "translate": 0.1, "fliplr": 0.5,
        }
    )
    tr.setup()
    assert tr.train_loader.device_augment
    batch = next(iter(tr.train_loader))
    assert "aug" in batch and batch["aug"].shape == (7,)
    assert batch["aug"][0] == 1.0  # mosaic on
    s = tr.state
    losses = []
    for epoch in range(30):
        tr.train_loader.set_epoch(epoch)
        for b in tr.train_loader:
            s, m = tr.train_step(s, {k: jnp.asarray(v) for k, v in b.items()})
        losses.append(float(np.asarray(m).sum()))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.8 * np.mean(losses[:3]), losses
    # close_mosaic flows through as a value change (no recompile)
    tr.train_loader.close_mosaic()
    b2 = next(iter(tr.train_loader))
    assert b2["aug"][0] == 0.0
    s, m = tr.train_step(s, {k: jnp.asarray(v) for k, v in b2.items()})
    assert np.isfinite(np.asarray(m)).all()
