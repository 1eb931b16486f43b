"""Experiment: find fast-converging overfit settings for the task
validator tests (VERDICT r5 #3: the 200-epoch SGD pose overfit is a
25-minute suite long pole; #7: replace loose floors with fixed-seed
goldens). Runs seg/pose/obb overfits at candidate (optimizer, lr, epochs)
and prints the metric trajectory so the test can pin short deterministic
settings + golden values.

Usage: JAX_PLATFORMS=cpu python tools/exp_taskval_fast.py pose adamw 60
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(task: str, opt: str, epochs: int, lr: float, checkpoints):
    import tempfile

    import jax.numpy as jnp

    # reuse the EXACT fixtures the test builds
    import test_task_validators as T
    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    tmp = Path(tempfile.mkdtemp())

    class FakeFactory:
        def mktemp(self, name):
            d = tmp / name
            d.mkdir(parents=True, exist_ok=True)
            return d

    fac = FakeFactory()
    if task == "seg":
        data = T.seg_data.__wrapped__(fac)
        model = "yolov8n-seg.yaml"
        extra = {}
    elif task == "pose":
        data = T.pose_data.__wrapped__(fac)
        model = T._pose4_yaml(tmp)
        extra = {"batch": 8, "nbs": 8}
    else:
        data = T.obb_data.__wrapped__(fac)
        model = "yolov8n-obb.yaml"
        extra = {}

    overrides = {
        "data": str(data), "model": model, "epochs": epochs, "imgsz": 96,
        "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": False, "amp": False,
        "project": str(tmp / "runs"), "warmup_epochs": 0.0, "optimizer": opt,
        "single_cls": True,
        "mosaic": 0.0, "fliplr": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
        "scale": 0.0, "translate": 0.0, "lr0": lr,
    }
    overrides.update(extra)
    tr = DetectionTrainer(overrides=overrides)
    tr.setup()
    s = tr.state
    for epoch in range(epochs):
        tr.train_loader.set_epoch(epoch)
        for batch in tr.train_loader:
            s, m = tr.train_step(s, {k: jnp.asarray(v) for k, v in batch.items()})
        if (epoch + 1) in checkpoints:
            tr.state = s
            tr.args.val = True
            tr.data["val"] = tr.data["train"]
            tr._build_datasets()
            out = tr.validate()
            keys = [k for k in out if "mAP50" in k and "95" not in k]
            print(f"ep {epoch + 1:3d}: loss={np.asarray(m).round(3)} "
                  + " ".join(f"{k}={out[k]:.4f}" for k in sorted(keys)), flush=True)
    tr.state = s


if __name__ == "__main__":
    task = sys.argv[1] if len(sys.argv) > 1 else "pose"
    opt = sys.argv[2] if len(sys.argv) > 2 else "AdamW"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 2e-3
    cps = sorted({epochs // 4, epochs // 2, 3 * epochs // 4, epochs} - {0})
    main(task, opt, epochs, lr, cps)
