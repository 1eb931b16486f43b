"""OBB task: rotated-box labels -> probiou loss decreases."""

from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def obb_data(tmp_path_factory):
    """Rotated bright rectangles; DOTA-style 4-corner labels."""
    import yaml

    root = tmp_path_factory.mktemp("obbdata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            s = 128
            img = rng.integers(0, 40, (s, s, 3), dtype=np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 3))):
                cx, cy = rng.uniform(35, s - 35, 2)
                w, h = rng.uniform(20, 40), rng.uniform(10, 20)
                ang = rng.uniform(0, 180)
                rect = cv2.boxPoints(((cx, cy), (w, h), ang))
                cv2.fillPoly(img, [rect.astype(np.int32)], (0, 200, 255))
                rect = np.clip(rect / s, 0, 1)
                lines.append("0 " + " ".join(f"{v:.5f}" for v in rect.reshape(-1)))
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text("\n".join(lines) + "\n")
    dy = root / "data.yaml"
    dy.write_text(yaml.safe_dump({"path": str(root), "train": "images/train", "val": "images/val", "nc": 1, "names": {0: "box"}}))
    return dy


def test_probiou_identity_and_rotation():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.rotated import probiou

    a = jnp.asarray([50.0, 50.0, 20.0, 10.0, 0.3])
    assert float(probiou(a, a)) == pytest.approx(1.0, abs=1e-3)
    b = a.at[4].add(np.pi / 2)  # rotate 90 deg -> partial overlap
    v = float(probiou(a, b))
    assert 0.0 < v < 0.9
    far = jnp.asarray([150.0, 150.0, 20.0, 10.0, 0.3])
    assert float(probiou(a, far)) < 0.05


def test_obb_train_loss_decreases(obb_data, tmp_path):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(obb_data), "model": "yolov8n-obb.yaml", "epochs": 100, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 4, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": "SGD", "single_cls": True,
            "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mosaic": 0.0, "scale": 0.0, "translate": 0.0, "fliplr": 0.0,
        }
    )
    tr.setup()
    batch = next(iter(tr.train_loader))
    assert batch["bboxes"].shape == (4, 4, 5)  # xywhr
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = tr.state
    first = None
    for i in range(60):
        s, m = tr.train_step(s, jb)
        if i == 0:
            first = np.asarray(m)
    last = np.asarray(m)
    assert np.isfinite(last).all()
    assert last.sum() < 0.8 * first.sum(), (first, last)


def test_obb_inference_decode_matches_train_decode():
    """The head's inference box decode must be dist2rbox with the angle
    branch (not axis-aligned dist2bbox) — ADVICE round-1 high finding."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.ops.anchors import dfl_decode, make_anchors
    from improving_yolov8_cbam_swinblock_tpu.ops.rotated import dist2rbox

    m = DetectionModel("yolov8n-obb.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    (y, (feats, angle)) = m.apply(v, x, train=False)
    # recompute the rotated decode from the raw maps and compare
    reg_max, nc = 16, 1
    b = 1
    no = 4 * reg_max + nc
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
    anchors, strides = make_anchors(shapes, (8, 16, 32), 0.5)
    dist = dfl_decode(flat[..., : 4 * reg_max].astype(jnp.float32), reg_max)
    want = dist2rbox(dist, angle.astype(jnp.float32), anchors[None]) * strides[None]
    got = y[:, :4, :].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    # angle rides along as the last row
    np.testing.assert_allclose(np.asarray(y[:, -1, :]), np.asarray(angle[..., 0]), rtol=1e-5, atol=1e-5)


def test_rotated_nms_suppresses_by_probiou():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.nms import non_max_suppression

    # two near-identical rotated boxes (should merge) + one distinct
    rows = np.array(
        [
            # x, y, w, h, score, angle
            [50, 50, 30, 10, 0.9, 0.5],
            [51, 50, 30, 10, 0.8, 0.52],
            [120, 120, 20, 20, 0.7, 0.0],
        ],
        np.float32,
    )
    a = rows.shape[0]
    pred = np.zeros((1, 6, a), np.float32)  # 4 box + 1 cls + 1 angle
    pred[0, :4, :] = rows[:, :4].T
    pred[0, 4, :] = rows[:, 4]
    pred[0, 5, :] = rows[:, 5]
    out = np.asarray(
        non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=10, nc=1, rotated=True)
    )[0]
    kept = out[out[:, 4] > 0]
    assert len(kept) == 2, kept
    np.testing.assert_allclose(kept[0, :4], rows[0, :4], atol=1e-4)  # xywh preserved (not xyxy)
    assert kept[0, 6] == pytest.approx(0.5, abs=1e-5)  # angle carried through
