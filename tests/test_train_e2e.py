"""End-to-end training tests on the synthetic tiny dataset (the
reference's coco8-style e2e philosophy, SURVEY.md §4, without egress)."""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from synth_data import make_synth_dataset

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    root = tmp_path_factory.mktemp("e2e")
    data_yaml = make_synth_dataset(root, n_train=8, n_val=4, imgsz=128, nc=3, seed=0)
    tr = DetectionTrainer(
        overrides={
            "data": str(data_yaml),
            "model": "yolov8n.yaml",
            "epochs": 100,
            "imgsz": 96,
            "batch": 4,
            "nbs": 4,
            "workers": 2,
            "max_gt": 32,
            "val": False,
            "amp": False,
            "project": str(root / "runs"),
            "mosaic": 0.0,
            "optimizer": "SGD",
            "fliplr": 0.0,
            "scale": 0.0,
            "translate": 0.0,
            "hsv_h": 0.0,
            "hsv_s": 0.0,
            "hsv_v": 0.0,
        }
    )
    tr.setup()
    return tr


def test_overfit_single_batch_loss_decreases(trainer):
    batch = next(iter(trainer.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = trainer.state
    first = None
    for i in range(40):
        s, m = trainer.train_step(s, jb)
        if i == 0:
            first = np.asarray(m)
    last = np.asarray(m)
    assert np.isfinite(last).all()
    # total weighted loss should drop substantially when overfitting
    assert last.sum() < 0.7 * first.sum(), (first, last)
    trainer.state = s  # reuse for subsequent tests


def test_ema_differs_from_params_after_updates(trainer):
    import jax

    p = jax.tree.leaves(trainer.state.params)[0]
    e = jax.tree.leaves(trainer.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))


def test_validator_runs_and_metrics_keys(trainer):
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import DataLoader, YOLODataset
    from improving_yolov8_cbam_swinblock_tpu.engine.validator import DetectionValidator

    ds = YOLODataset(trainer.data["train"], imgsz=96, max_gt=32, nc=3)
    loader = DataLoader(ds, 4, train=False, workers=2)
    v = DetectionValidator(trainer.model, loader, trainer.args)
    m = v({"params": trainer.state.params, "batch_stats": trainer.state.batch_stats})
    assert set(m) == {"precision", "recall", "mAP50", "mAP50-95", "fitness"}
    assert all(np.isfinite(x) for x in m.values())


def test_checkpoint_roundtrip(trainer, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    ckpt = tmp_path / "model.ckpt"
    trainer.save_checkpoint(ckpt)
    m = YOLO(str(ckpt))
    assert m.model.nc == 3
    info = m.info()
    assert info["params"] > 0
    # loaded EMA weights match the trainer's
    import jax

    a = jax.tree.leaves(m.variables["params"])[0]
    b = jax.tree.leaves(trainer.state.ema_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_predict_api_on_images(trainer, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    ckpt = tmp_path / "model.ckpt"
    trainer.save_checkpoint(ckpt)
    m = YOLO(str(ckpt))
    img_dir = Path(trainer.data["train"])
    results = m.predict(str(img_dir), imgsz=96, conf=0.01)
    assert len(results) == 8
    r = results[0]
    assert r.boxes.data.shape[1] == 6
    assert r.speed["inference"] is not None
    # numpy array source
    import cv2

    img = cv2.imread(str(sorted(img_dir.rglob("*.jpg"))[0]))
    res2 = m.predict(img, imgsz=96, conf=0.01)
    assert len(res2) == 1


def test_freeze_multiscale_fraction_rect(tiny_dataset, tmp_path):
    """Previously-dead config keys behave (VERDICT round-1 weak #3)."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(
        overrides={
            "data": str(tiny_dataset), "model": "yolov8n.yaml", "epochs": 3, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": True, "amp": False,
            "project": str(tmp_path / "runs"), "optimizer": "SGD", "device_augment": False,
            "freeze": 3, "multi_scale": True, "fraction": 0.5, "rect": True,
            "mosaic": 0.0, "warmup_epochs": 0.0,
        }
    )
    tr.setup()
    # fraction: half of the 16 train images
    assert len(tr.train_loader.ds) == 8
    # rect: val loader letterboxes to a single stride-multiple shape
    assert tr.val_loader.rect_shape is not None
    vb = next(iter(tr.val_loader))
    assert vb["img"].shape[1:3] == tr.val_loader.rect_shape

    frozen_before = jax.tree.map(lambda p: np.asarray(p).copy(), tr.state.params["model_0"])
    live_before = np.asarray(tr.state.params["model_5"]["conv"]["kernel"]).copy()
    s = tr.state
    batch = next(iter(tr.train_loader))
    for _ in range(5):
        s, m = tr.train_step(s, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(np.asarray(m)).all()
    # frozen layers unchanged; live layers moved
    for a, b in zip(jax.tree.leaves(frozen_before), jax.tree.leaves(s.params["model_0"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert not np.allclose(live_before, np.asarray(s.params["model_5"]["conv"]["kernel"]))
    # rect val end-to-end
    tr.state = s
    out = tr.validate()
    assert np.isfinite(out["fitness"])
