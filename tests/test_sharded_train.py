"""Product-path data parallelism + warm start (VERDICT r2 missing #1/#2).

The reference ships multi-GPU training via `model.train(device=[0,1])`
(reference engine/trainer.py:176-232 subprocess DDP + data/build.py:149-181
DistributedSampler) and fine-tuning via `YOLO('x.pt').train()`
(engine/model.py:265, nn/tasks.py:1303). Here the analogs are a jit-sharded
train step over a Mesh built inside DetectionTrainer, and checkpoint
warm-start through the facade — both exercised on the 8-virtual-device CPU
backend from conftest.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def _overrides(data_yaml, root, **kw):
    d = {
        "data": str(data_yaml), "model": "yolov8n.yaml", "epochs": 2, "imgsz": 64,
        "batch": 8, "nbs": 8, "workers": 2, "max_gt": 8, "val": False, "amp": False,
        "project": str(root / "runs"), "optimizer": "SGD", "device_augment": False,
        "mosaic": 0.0, "fliplr": 0.0, "scale": 0.0, "translate": 0.0, "pixel_augment": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "warmup_epochs": 0.0, "plots": False,
    }
    d.update(kw)
    return d


@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("shard")
    return make_synth_dataset(root, n_train=16, n_val=8, imgsz=96, nc=3, seed=0)


def test_facade_train_shards_over_all_devices(data_yaml, tmp_path):
    """YOLO.train() on an 8-device backend must visibly shard: the mesh
    spans all devices, params replicate onto all of them, and the loss
    trajectory matches a single-device run at the same global batch."""
    import jax

    from improving_yolov8_cbam_swinblock_tpu import YOLO

    assert jax.device_count() == 8, "conftest should provide 8 virtual CPU devices"

    m8 = YOLO("yolov8n.yaml")
    m8.train(**_overrides(data_yaml, tmp_path, name="dp8"))
    tr8 = m8.trainer
    assert tr8.mesh.devices.size == 8, tr8.mesh
    leaf = jax.tree.leaves(tr8.state.params)[0]
    assert len(leaf.sharding.device_set) == 8  # replicated across the mesh

    m1 = YOLO("yolov8n.yaml")
    m1.train(**_overrides(data_yaml, tmp_path, name="dp1", device="0"))
    tr1 = m1.trainer
    assert tr1.mesh.devices.size == 1

    # same data order, same global batch, same seed -> same trajectory
    # (tolerance: cross-device reduction order differs)
    l8 = [[r["train/box_loss"], r["train/cls_loss"], r["train/dfl_loss"]] for r in tr8.metrics_rows]
    l1 = [[r["train/box_loss"], r["train/cls_loss"], r["train/dfl_loss"]] for r in tr1.metrics_rows]
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), rtol=2e-2, atol=2e-3)


def test_batch_lands_sharded(data_yaml, tmp_path):
    """_put_batch places the image batch split over the 'data' axis."""
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="put"))
    tr.setup()
    batch = next(iter(tr.train_loader))
    dev_batch = tr._put_batch(batch)
    img = dev_batch["img"]
    assert len(img.sharding.device_set) == 8
    # each device holds a 1/8 slice of the batch dim
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(1, *img.shape[1:])}


def test_warm_start_from_facade_checkpoint(data_yaml, tmp_path):
    """YOLO('last.ckpt').train() must fine-tune, not reinit: weights
    transfer (reference attempt_load_one_weight) and the first fine-tune
    epoch starts far below the from-scratch first epoch."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    import jax
    from synth_data import make_synth_dataset

    # single repeated batch + default warmup: the proven overfit recipe
    # (test_train_e2e shows <0.7x loss after 40 steps); without warmup
    # this tiny-set config diverges, which would mask the transfer signal
    root = tmp_path / "ws"
    data8 = make_synth_dataset(root, n_train=8, n_val=4, imgsz=96, nc=3, seed=0)
    ov = dict(_overrides(data8, tmp_path, name="scratch", epochs=40))
    ov.pop("warmup_epochs")
    m = YOLO("yolov8n.yaml")
    m.train(**ov)
    rows = m.trainer.metrics_rows
    tot = lambda r: r["train/box_loss"] + r["train/cls_loss"] + r["train/dfl_loss"]  # noqa: E731
    # NOTE: under TAL the loss at random init is NOT an upper bound (few
    # anchors are assigned until cls scores grow), so the transfer signal
    # is continuation: fine-tune starts near the scratch run's FINAL loss,
    # far below its mid-training peak — a fresh init would replay the peak.
    scratch_final = tot(rows[-1])
    scratch_peak = max(tot(r) for r in rows)
    assert scratch_peak > 1.5 * scratch_final, "scratch run shows no overfit trajectory"
    last = Path(m.trainer.wdir) / "last.ckpt"
    assert last.exists()

    ft = YOLO(str(last))
    ft_ov = dict(ov, name="finetune", epochs=1)
    ft.train(**ft_ov)
    stats = ft.trainer.transfer_stats
    assert stats["matched"] > 100 and stats["skipped"] == 0, stats
    ft_first = tot(ft.trainer.metrics_rows[0])
    assert ft_first < 1.3 * scratch_final, (ft_first, scratch_final)
    assert ft_first < 0.6 * scratch_peak, (ft_first, scratch_peak)

    # the transferred init must EQUAL the checkpoint's EMA weights exactly
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="exact", epochs=1, pretrained=str(last)))
    tr.setup()
    a = np.asarray(jax.tree.leaves(tr.state.params)[0])
    b = np.asarray(jax.tree.leaves(YOLO(str(last)).variables["params"])[0])
    np.testing.assert_array_equal(a, b)

    # pretrained=False must disable the warm start (reference semantics)
    cold = YOLO(str(last))
    cold.train(**_overrides(data_yaml, tmp_path, name="cold", epochs=1, pretrained=False))
    assert not hasattr(cold.trainer, "transfer_stats")


def test_warm_start_nc_mismatch_reinits_head(data_yaml, tmp_path_factory, tmp_path):
    """pretrained=<path> onto a different-nc dataset: backbone transfers,
    shape-mismatched Detect class convs keep the fresh init (the
    reference's transfer-learning head reinit)."""
    from synth_data import make_synth_dataset

    from improving_yolov8_cbam_swinblock_tpu import YOLO
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    m = YOLO("yolov8n.yaml")
    m.train(**_overrides(data_yaml, tmp_path, name="src", epochs=1))
    ckpt = Path(m.trainer.wdir) / "last.ckpt"

    root5 = tmp_path_factory.mktemp("nc5")
    data5 = make_synth_dataset(root5, n_train=8, n_val=4, imgsz=96, nc=5, seed=1)
    tr = DetectionTrainer(
        overrides=_overrides(data5, tmp_path, name="nc5", epochs=1, pretrained=str(ckpt))
    )
    tr.setup()
    stats = tr.transfer_stats
    assert stats["matched"] > 100 and stats["skipped"] > 0, stats
    out = tr.train()
    assert all(np.isfinite(v) for v in out.values()) or out == {}


def test_console_and_plot_artifacts(data_yaml, tmp_path, capsys):
    """plots=True writes labels.jpg + train_batch0.jpg and training prints
    per-epoch tables (VERDICT r2 missing #4/#6)."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    m.train(**_overrides(data_yaml, tmp_path, name="plots", epochs=1, plots=True, val=True))
    out = capsys.readouterr().out
    assert "Starting training for 1 epochs" in out
    assert "box_loss" in out  # header row
    sd = Path(m.trainer.save_dir)
    assert (sd / "labels.jpg").exists()
    assert (sd / "train_batch0.jpg").exists()
    assert (sd / "results.csv").exists()


def test_val_batch_events_fire(data_yaml, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tr = DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="valcb", epochs=1, val=True))
    tr.setup()
    counts = {"start": 0, "end": 0}
    tr.callbacks["on_val_batch_start"].append(lambda t: counts.__setitem__("start", counts["start"] + 1))
    tr.callbacks["on_val_batch_end"].append(lambda t: counts.__setitem__("end", counts["end"] + 1))
    tr.validate()
    assert counts["start"] == len(tr.val_loader) and counts["end"] == len(tr.val_loader), counts
