"""Multi-host bring-up (VERDICT r4 'Next round' #2): the trainer must
initialize jax.distributed from the environment / device='pod', shard the
loader by (process_index, process_count), and gate checkpoints to process
0 — the TPU-native replacement for the reference's subprocess DDP launch
(reference engine/trainer.py:176-232, utils/dist.py:28-98).

Single-process environment, so `jax.distributed.initialize` and the
process-topology probes are monkeypatched; the assertions are about WHAT
the product path calls and HOW it wires the results through."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


# ---------------------------------------------------------------------------
# env detection: must fire BEFORE initialization (the r4 bug probed
# jax.process_count(), which only reports >1 after initialize has run)
# ---------------------------------------------------------------------------
def test_multihost_env_detected():
    from improving_yolov8_cbam_swinblock_tpu.parallel.distributed import multihost_env_detected

    assert not multihost_env_detected(environ={})
    assert not multihost_env_detected(environ={"PATH": "/bin"})
    triple = {"COORDINATOR_ADDRESS": "h0:1234", "NUM_PROCESSES": "4", "PROCESS_ID": "2"}
    assert multihost_env_detected(environ=triple)
    assert not multihost_env_detected(environ={**triple, "NUM_PROCESSES": "1"})
    # TPU pod metadata: >1 worker hostname marks a pod; a single-host TPU VM
    # (e.g. this test environment) also exports the key with ONE hostname
    assert multihost_env_detected(environ={"TPU_WORKER_HOSTNAMES": "h0,h1"})
    assert not multihost_env_detected(environ={"TPU_WORKER_HOSTNAMES": "h0"})
    assert multihost_env_detected(environ={"MEGASCALE_COORDINATOR_ADDRESS": "h0"})


def test_init_distributed_env_triple(monkeypatch):
    """COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID env triple drives
    jax.distributed.initialize with the right rendezvous arguments."""
    import jax

    from improving_yolov8_cbam_swinblock_tpu.parallel import distributed as D

    calls = []
    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: calls.append(kw),
    )
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host0:8476")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "1")
    assert D.init_distributed() is True
    assert calls == [{"coordinator_address": "host0:8476", "num_processes": 2, "process_id": 1}]


def test_init_distributed_pod_autodetect(monkeypatch):
    """TPU pod metadata env triggers the argless self-configuring
    initialize()."""
    import jax

    from improving_yolov8_cbam_swinblock_tpu.parallel import distributed as D

    state = {"init": False}

    def fake_initialize(**kw):
        assert kw == {} or all(v is None for v in kw.values())
        state["init"] = True

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: state["init"])
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_count", lambda: 4 if state["init"] else 1)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1,h2,h3")
    assert D.init_distributed() is True
    assert state["init"]
    # idempotent: second call sees is_initialized and does not re-init
    state["reinit_guard"] = True
    assert D.init_distributed() is True


def test_init_distributed_single_host_noop(monkeypatch):
    import jax

    from improving_yolov8_cbam_swinblock_tpu.parallel import distributed as D

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: False)
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: pytest.fail("initialize must not be called on a single host"),
    )
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
              "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(k, raising=False)
    assert D.init_distributed() is False


# ---------------------------------------------------------------------------
# trainer wiring
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def data_yaml(tmp_path_factory):
    from synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("dist")
    return make_synth_dataset(root, n_train=8, n_val=4, imgsz=96, nc=3, seed=0)


def _overrides(data_yaml, root, **kw):
    d = {
        "data": str(data_yaml), "model": "yolov8n.yaml", "epochs": 1, "imgsz": 64,
        "batch": 4, "nbs": 4, "workers": 0, "max_gt": 8, "val": False, "amp": False,
        "project": str(root / "runs"), "optimizer": "SGD", "device_augment": False,
        "mosaic": 0.0, "fliplr": 0.0, "scale": 0.0, "translate": 0.0, "pixel_augment": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "warmup_epochs": 0.0, "plots": False,
    }
    d.update(kw)
    return d


def test_trainer_pod_bringup_and_loader_sharding(data_yaml, tmp_path, monkeypatch):
    """device='pod' (or detected env) calls init_distributed BEFORE dataset
    build, and the loader is sharded by (process_index, process_count)."""
    import improving_yolov8_cbam_swinblock_tpu.engine.trainer as T
    from improving_yolov8_cbam_swinblock_tpu.parallel import distributed as D

    called = []
    monkeypatch.setattr(D, "init_distributed", lambda *a, **k: (called.append(True), True)[1])
    # after bring-up this process is rank 1 of 2
    monkeypatch.setattr(T, "local_shard_info", lambda: (1, 2))

    tr = T.DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="pod", device="pod"))
    tr.setup()
    assert called, "init_distributed was not invoked by trainer.setup()"
    assert tr._num_shards == 2 and tr._shard_index == 1
    assert tr._local_batch == 2  # global batch 4 over 2 hosts
    # loader carries the shard info (the DistributedSampler analog)
    assert (tr.train_loader.shard_index, tr.train_loader.num_shards) == (1, 2)


def test_trainer_env_detection_triggers_bringup(data_yaml, tmp_path, monkeypatch):
    """No device= hint: the env triple alone must trigger bring-up."""
    import improving_yolov8_cbam_swinblock_tpu.engine.trainer as T
    from improving_yolov8_cbam_swinblock_tpu.parallel import distributed as D

    called = []
    monkeypatch.setenv("COORDINATOR_ADDRESS", "host0:8476")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "0")
    monkeypatch.setattr(D, "init_distributed", lambda *a, **k: (called.append(True), True)[1])

    tr = T.DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="envdet"))
    tr.setup()
    assert called, "env triple did not trigger init_distributed"


def test_non_main_process_writes_no_checkpoints(data_yaml, tmp_path, monkeypatch):
    """Rank-0 gating (reference trainer.py:292-302 RANK checks): a non-main
    process trains but writes no ckpt/CSV artifacts."""
    import improving_yolov8_cbam_swinblock_tpu.engine.trainer as T

    monkeypatch.setattr(T, "is_main_process", lambda: False)
    tr = T.DetectionTrainer(overrides=_overrides(data_yaml, tmp_path, name="rank1"))
    tr.train()
    assert not list(tr.wdir.glob("*.ckpt")), "non-main process wrote checkpoints"
    assert not (tr.save_dir / "results.csv").exists()
