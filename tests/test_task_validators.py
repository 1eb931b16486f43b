"""Task validators e2e: overfit tiny synthetic seg/pose/obb sets, then the
task-specific metric (mask mAP / OKS mAP / rotated mAP) must clear a
threshold — the round-1 gap where trainer.validate silently used box-only
metrics for every task (VERDICT.md 'Next round' #2).
"""

from pathlib import Path

import cv2
import numpy as np
import pytest
import yaml


def _write_yaml(root, names):
    dy = root / "data.yaml"
    dy.write_text(
        yaml.safe_dump(
            {"path": str(root), "train": "images/train", "val": "images/train", "nc": 1, "names": names}
        )
    )
    return dy


@pytest.fixture(scope="module")
def seg_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("valseg")
    rng = np.random.default_rng(3)
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(8):
        s = 128
        img = rng.integers(0, 40, (s, s, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            r = float(rng.uniform(16, 28))
            cx, cy = float(rng.uniform(r, s - r)), float(rng.uniform(r, s - r))
            cv2.circle(img, (int(cx), int(cy)), int(r), (0, 255, 0), -1)
            ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
            poly = np.stack([(cx + r * np.cos(ang)) / s, (cy + r * np.sin(ang)) / s], 1).clip(0, 1)
            lines.append("0 " + " ".join(f"{v:.5f}" for v in poly.reshape(-1)))
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        (root / "labels/train" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return _write_yaml(root, {0: "circle"})


@pytest.fixture(scope="module")
def pose_data(tmp_path_factory):
    """Bright squares with 4 corner keypoints. ONE fixed-size object per
    image: the multi-object variable-size version needed a 200-epoch
    trajectory-chaotic overfit (the r4 suite's 25-minute long pole); a
    trivially learnable layout saturates the metrics quickly and
    REPRODUCIBLY, which the fixed-value goldens below require."""
    root = tmp_path_factory.mktemp("valpose")
    rng = np.random.default_rng(4)
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(8):
        s = 128
        img = rng.integers(0, 40, (s, s, 3), dtype=np.uint8)
        w = 40.0
        x1, y1 = float(rng.uniform(4, s - w - 4)), float(rng.uniform(4, s - w - 4))
        cv2.rectangle(img, (int(x1), int(y1)), (int(x1 + w), int(y1 + w)), (255, 80, 0), -1)
        cx, cy = (x1 + w / 2) / s, (y1 + w / 2) / s
        kp = [(x1, y1), (x1 + w, y1), (x1 + w, y1 + w), (x1, y1 + w)]
        kstr = " ".join(f"{x / s:.5f} {y / s:.5f} 2" for x, y in kp)
        line = f"0 {cx:.5f} {cy:.5f} {w / s:.5f} {w / s:.5f} {kstr}"
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        (root / "labels/train" / f"{i}.txt").write_text(line + "\n")
    return _write_yaml(root, {0: "square"})


@pytest.fixture(scope="module")
def obb_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("valobb")
    rng = np.random.default_rng(5)
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    for i in range(8):
        s = 128
        img = rng.integers(0, 40, (s, s, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            cx, cy = rng.uniform(40, s - 40, 2)
            w, h = rng.uniform(30, 50), rng.uniform(14, 24)
            ang = rng.uniform(0, 180)
            rect = cv2.boxPoints(((cx, cy), (w, h), ang))
            cv2.fillPoly(img, [rect.astype(np.int32)], (0, 200, 255))
            rect = np.clip(rect / s, 0, 1)
            lines.append("0 " + " ".join(f"{v:.5f}" for v in rect.reshape(-1)))
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        (root / "labels/train" / f"{i}.txt").write_text("\n".join(lines) + "\n")
    return _write_yaml(root, {0: "box"})


def _overfit(data_yaml, model_yaml, tmp_path, epochs, extra=None):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    overrides = {
        "data": str(data_yaml), "model": model_yaml, "epochs": epochs, "imgsz": 96,
        "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": False, "amp": False,
        "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": "SGD", "single_cls": True,
        "mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
        "scale": 0.0, "translate": 0.0, "lr0": 0.02,
    }
    overrides.update(extra or {})
    tr = DetectionTrainer(overrides=overrides)
    tr.setup()
    s = tr.state
    for epoch in range(epochs):
        tr.train_loader.set_epoch(epoch)
        for batch in tr.train_loader:
            s, m = tr.train_step(s, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(np.asarray(m)).all()
    tr.state = s
    return tr


def _assert_golden(out, expected, tol=2e-3):
    """Fixed-seed golden metric values (VERDICT r4 #7): the loose floors
    below survive as sanity backstops, but protocol regressions in the
    seg/pose/obb matching are caught by the exact stored values, captured
    once in the conftest environment (8-virtual-device CPU backend).
    Regenerate with tools/exp_taskval_fast.py after intentional changes."""
    for k, v in expected.items():
        assert out[k] == pytest.approx(v, abs=tol), (k, out[k], expected)


def test_segment_validator_mask_map(seg_data, tmp_path):
    tr = _overfit(seg_data, "yolov8n-seg.yaml", tmp_path, epochs=60)
    tr.args.val = True
    tr.data["val"] = tr.data["train"]
    tr._build_datasets()
    out = tr.validate()
    assert "mAP50(M)" in out and "mAP50(B)" in out
    assert out["mAP50(B)"] > 0.3, out
    assert out["mAP50(M)"] > 0.15, out
    _assert_golden(out, {"mAP50(B)": 0.995, "mAP50(M)": 0.995})


def _pose4_yaml(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import CFG_DIR

    base = yaml.safe_load((CFG_DIR / "models" / "v8" / "yolov8-pose.yaml").read_text())
    base["kpt_shape"] = [4, 3]
    for row in base["head"]:
        if row[2] == "Pose":
            row[3] = ["nc", [4, 3]]
    mp = tmp_path / "yolov8n-pose4.yaml"
    mp.write_text(yaml.safe_dump(base))
    return str(mp)


def test_pose_validator_oks_map(pose_data, tmp_path):
    # SGD needed 200 trajectory-chaotic epochs to converge (~25 min, the
    # r4 suite's long pole). AdamW on the simplified one-object fixture
    # saturates both metrics at the 0.995 cap in a fraction of the steps —
    # a stable endpoint instead of a mid-climb value.
    tr = _overfit(pose_data, _pose4_yaml(tmp_path), tmp_path, epochs=100,
                  extra={"batch": 4, "nbs": 4, "optimizer": "AdamW", "lr0": 0.005,
                         "lrf": 1.0, "imgsz": 64})
    tr.args.val = True
    tr.data["val"] = tr.data["train"]
    tr._build_datasets()
    out = tr.validate()
    assert "mAP50(P)" in out and "mAP50(B)" in out
    assert out["mAP50(B)"] > 0.25, out
    assert out["mAP50(P)"] > 0.25, out
    _assert_golden(out, {"mAP50(B)": 0.995, "mAP50(P)": 0.995})


def test_obb_validator_rotated_map(obb_data, tmp_path):
    tr = _overfit(obb_data, "yolov8n-obb.yaml", tmp_path, epochs=60)
    tr.args.val = True
    tr.data["val"] = tr.data["train"]
    tr._build_datasets()
    out = tr.validate()
    assert "mAP50" in out
    assert out["mAP50"] > 0.2, out
    _assert_golden(out, {"mAP50": 0.995, "mAP50-95": 0.83246}, tol=5e-3)
