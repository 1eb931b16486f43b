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
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "single_cls": True,
            "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
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
