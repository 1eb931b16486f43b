"""Pose task: kpt labels -> OKS loss decreases on synthetic data."""

from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pose_data(tmp_path_factory):
    """Stick figures: 4 keypoints (head, mid, left, right), kpt_shape (4,3)."""
    import yaml

    root = tmp_path_factory.mktemp("posedata")
    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        for i in range(n):
            s = 128
            img = rng.integers(0, 40, (s, s, 3), dtype=np.uint8)
            cx = float(rng.uniform(30, s - 30))
            cy = float(rng.uniform(40, s - 40))
            pts = np.array([[cx, cy - 20], [cx, cy], [cx - 15, cy + 20], [cx + 15, cy + 20]])
            for a, b in [(0, 1), (1, 2), (1, 3)]:
                cv2.line(img, tuple(pts[a].astype(int)), tuple(pts[b].astype(int)), (255, 255, 255), 3)
            x1, y1 = pts.min(0) - 5
            x2, y2 = pts.max(0) + 5
            box = [(x1 + x2) / 2 / s, (y1 + y2) / 2 / s, (x2 - x1) / s, (y2 - y1) / s]
            kstr = " ".join(f"{p[0] / s:.5f} {p[1] / s:.5f} 2" for p in pts)
            cv2.imwrite(str(root / "images" / split / f"{i}.jpg"), img)
            (root / "labels" / split / f"{i}.txt").write_text(
                "0 " + " ".join(f"{v:.5f}" for v in box) + " " + kstr + "\n"
            )
    dy = root / "data.yaml"
    dy.write_text(
        yaml.safe_dump(
            {"path": str(root), "train": "images/train", "val": "images/val", "nc": 1,
             "names": {0: "person"}, "kpt_shape": [4, 3]}
        )
    )
    return dy


def test_pose_train_loss_decreases(pose_data, tmp_path):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    # model yaml with kpt_shape (4,3)
    import yaml as _yaml

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import CFG_DIR

    base = _yaml.safe_load((CFG_DIR / "models" / "v8" / "yolov8-pose.yaml").read_text())
    base["kpt_shape"] = [4, 3]
    for row in base["head"]:
        if row[2] == "Pose":
            row[3] = ["nc", [4, 3]]
    mp = tmp_path / "pose4.yaml"
    mp.write_text(_yaml.safe_dump(base))

    tr = DetectionTrainer(
        overrides={
            "data": str(pose_data), "model": str(mp), "epochs": 100, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 4, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": "SGD",
            "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mosaic": 0.0, "scale": 0.0, "translate": 0.0, "fliplr": 0.0,
        }
    )
    tr.setup()
    batch = next(iter(tr.train_loader))
    assert batch["kpts"].shape == (4, 4, 4, 3)
    assert batch["kpts"][:, :, :, 2].max() == 2.0  # visibilities loaded
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
