"""Segmentation task: polygon labels -> overlap-map targets -> mask loss."""

from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    """Circles on noise; YOLO segmentation label format (cls + polygon)."""
    import yaml

    root = tmp_path_factory.mktemp("segdata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(n):
            s = 128
            img = rng.integers(0, 50, (s, s, 3), dtype=np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, 3))):
                r = float(rng.uniform(12, 24))
                cx = float(rng.uniform(r, s - r))
                cy = float(rng.uniform(r, s - r))
                cv2.circle(img, (int(cx), int(cy)), int(r), (0, 255, 0), -1)
                ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
                poly = np.stack([(cx + r * np.cos(ang)) / s, (cy + r * np.sin(ang)) / s], 1)
                lines.append("0 " + " ".join(f"{v:.5f}" for v in poly.reshape(-1)))
            cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
            (lbl_dir / f"{i}.txt").write_text("\n".join(lines) + "\n")
    dy = root / "data.yaml"
    dy.write_text(yaml.safe_dump({"path": str(root), "train": "images/train", "val": "images/val", "nc": 1, "names": {0: "circle"}}))
    return dy


def test_segment_loader_targets(seg_data):
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import DataLoader, YOLODataset

    ds = YOLODataset(str(Path(seg_data).parent / "images" / "train"), imgsz=96, max_gt=8, nc=1)
    loader = DataLoader(ds, 4, train=True, workers=2, task="segment")
    batch = next(iter(loader))
    assert batch["seg_map"].shape == (4, 24, 24)
    assert batch["seg_map"].max() >= 1  # at least one instance rendered
    # instance ids in the map must correspond to valid GT rows
    for i in range(4):
        ids = np.unique(batch["seg_map"][i])
        n_valid = int(batch["mask"][i].sum())
        assert ids.max() <= n_valid


def test_segment_train_loss_decreases(seg_data, tmp_path):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(seg_data), "model": "yolov8n-seg.yaml", "epochs": 100, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
            "warmup_epochs": 0.0, "optimizer": "SGD",
        }
    )
    tr.setup()
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = tr.state
    first = None
    for i in range(60):
        s, m = tr.train_step(s, jb)
        if i == 0:
            first = np.asarray(m)
    last = np.asarray(m)
    assert np.isfinite(last).all()
    assert last.sum() < 0.75 * first.sum(), (first, last)


def test_segment_predict_masks(seg_data):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n-seg.yaml")
    img = cv2.imread(str(sorted((Path(seg_data).parent / "images" / "val").glob("*.jpg"))[0]))
    res = m.predict(img, imgsz=96, conf=0.0001)[0]
    if len(res):
        assert res.masks is not None
        assert res.masks.shape[1:] == img.shape[:2]
