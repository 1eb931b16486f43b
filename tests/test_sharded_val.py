"""Multi-device product-path validation: YOLO.val(device="all") shards
the eval batch over the mesh (the inference-side counterpart of the
sharded trainer, reference DDP val is rank-0-only — here every chip
contributes) and must reproduce single-device metrics exactly."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tiny_dataset_module):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    # no training needed: random weights give deterministic (if poor)
    # predictions — metric equality is what's under test
    return m, str(tiny_dataset_module)


@pytest.fixture(scope="module")
def tiny_dataset_module(tmp_path_factory):
    from tests.synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("shardval")
    return make_synth_dataset(root, n_train=8, n_val=8, imgsz=96, nc=2, seed=3)


def test_val_device_all_shards_and_matches(trained):
    model, data = trained
    assert jax.device_count() >= 8  # conftest virtual CPU mesh
    r1 = model.val(data=data, imgsz=96, batch=8, conf=0.01, device=None)
    r8 = model.val(data=data, imgsz=96, batch=8, conf=0.01, device="all")
    for k in ("metrics/mAP50(B)", "metrics/mAP50-95(B)"):
        assert np.isclose(r1[k], r8[k], atol=1e-6), (k, r1[k], r8[k])


def test_val_device_all_indivisible_falls_back(trained):
    model, data = trained
    # batch=5 does not divide the 8-device mesh: must still run (single chip)
    r = model.val(data=data, imgsz=96, batch=5, conf=0.01, device="all")
    assert "metrics/mAP50(B)" in r
