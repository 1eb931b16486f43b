"""Integration loggers: live backends attach, absent packages skip
(reference utils/callbacks conditional loading; tests/test_integrations.py)."""

import json
from collections import defaultdict
from pathlib import Path

import numpy as np


class FakeTrainer:
    def __init__(self, tmp):
        from types import SimpleNamespace

        self.callbacks = defaultdict(list)
        self.save_dir = Path(tmp)
        self.wdir = self.save_dir / "weights"
        self.args = SimpleNamespace(project=str(tmp), name="t")
        self.metrics_rows = [{"epoch": 0, "train/box_loss": 1.5, "metrics/mAP50": 0.2}]


def test_jsonl_logger(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.integrations import add_jsonl

    tr = FakeTrainer(tmp_path)
    assert add_jsonl(tr.callbacks, str(tmp_path / "m.jsonl"))
    for fn in tr.callbacks["on_fit_epoch_end"]:
        fn(tr)
    rows = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert rows[0]["train/box_loss"] == 1.5


def test_tensorboard_logger(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.integrations import add_tensorboard

    tr = FakeTrainer(tmp_path)
    assert add_tensorboard(tr.callbacks, str(tmp_path / "tb"))
    for fn in tr.callbacks["on_fit_epoch_end"]:
        fn(tr)
    assert list((tmp_path / "tb").glob("events.out.tfevents.*"))


def test_absent_backends_skip(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils import integrations as I

    tr = FakeTrainer(tmp_path)
    # none of the hosted backends exist in this image -> all return False
    assert not I.add_wandb(tr.callbacks, "p", "n")
    assert not I.add_comet(tr.callbacks, "p")
    assert not I.add_clearml(tr.callbacks, "p", "n")
    assert not I.add_dvc(tr.callbacks)
    assert not I.add_neptune(tr.callbacks, "p", "n")
    assert not tr.callbacks["on_train_end"]


def test_attach_all(tmp_path, monkeypatch):
    from improving_yolov8_cbam_swinblock_tpu.utils.integrations import add_integration_callbacks

    tr = FakeTrainer(tmp_path)
    add_integration_callbacks(tr)
    # tb + jsonl live in this image
    assert len(tr.callbacks["on_fit_epoch_end"]) >= 2
