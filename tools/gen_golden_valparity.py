"""End-to-end val-parity golden: run the REFERENCE's full validation
pipeline (`Model.val()` -> DetectionValidator.__call__, reference
engine/validator.py:132-298 + models/yolo/detect/val.py:66-220) on a
deterministic synthetic dataset with a fixed-seed custom model, and
capture per-image NMS outputs + final mAPs to a fixture.

tests/test_val_parity_golden.py then runs THIS framework's `YOLO.val()`
with the same imported weights on the same images and asserts the
composed pipeline (preprocess -> forward -> NMS conf .001 / iou .7
multi-label -> matching -> ap_per_class) agrees — converting the
individually-goldened components into one product-level parity proof
(VERDICT r4 'Next round' #1).

Cases: the fork's two active custom graphs —
  v8: yolov8.yaml scale s, nc=1  (the fork's single-class tumor setup)
  11: yolo11.yaml scale m, nc=3  (multi-class: exercises multi_label NMS
                                  + per-class AP composition)

Usage:
  python tools/gen_golden_valparity.py fixture          # write tests/golden/valparity_{v8,11}.npz
  python tools/gen_golden_valparity.py weights v8 out.pt  # deterministic ref .pt (used by the test)
"""

import contextlib
import io
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (torchvision shim)

sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)

# case -> (reference yaml, scale, nc, dataset seed)
CASES = {
    "v8": ("/root/reference/ultralytics/cfg/models/v8/yolov8.yaml", "s", 1, 11),
    "11": ("/root/reference/ultralytics/cfg/models/11/yolo11.yaml", "m", 3, 13),
}
IMGSZ = 160
# The reference FORCES rect batching in val (build_yolo_dataset rect=mode==
# 'val'): load_image scales max-side to imgsz (no-op on our 160px squares),
# then LetterBox(scaleup=False) pads to batch shape ceil(ar*imgsz/stride +
# 0.5)*stride = 192 (base.py:341/363). The framework's rect val reproduces
# this exact geometry (dataset.rect_shape + val_transform two-stage), so the
# parity test runs both sides at imgsz=160 with rect on.
N_IMAGES = 16
TORCH_SEED = 7  # same seed recipe as tools/gen_golden_model.py


def build_ref_pt(case: str, out_pt: str):
    """Deterministically build the reference custom model and save a
    trainer-style .pt (lazy CBAM MLPs materialized by a dummy forward,
    reference cbam.py:29-33)."""
    from ultralytics.nn.tasks import DetectionModel, yaml_model_load

    yaml_path, scale, nc, _ = CASES[case]
    torch.manual_seed(TORCH_SEED)
    d = yaml_model_load(yaml_path)
    d["scale"] = scale
    with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
        m = DetectionModel(d, ch=3, nc=nc, verbose=False)
    m.eval()
    with torch.no_grad():
        m(torch.zeros(1, 3, 128, 128))
        # De-degenerate the random-init head: bias_init's prior (~sigmoid
        # 0.003) leaves ~nothing above conf 0.001 (vacuous matching/AP), and
        # a flat bias would make every conf ~0.5 (NMS tie-order chaos).
        # Scaling the final convs spreads confidences decisively over (0,1)
        # and diversifies the box geometry — trained-model-like statistics
        # with fully deterministic weights.
        for conv_seq in m.model[-1].cv3:  # cls branch
            conv_seq[-1].weight.mul_(1000.0)  # features are tiny; measured to
            conv_seq[-1].bias.fill_(-1.0)     # give conf quantiles ~0.01..0.99
        for conv_seq in m.model[-1].cv2:  # box branch (DFL logits)
            conv_seq[-1].weight.mul_(3.0)
    torch.save({"model": m, "ema": None, "epoch": 0}, out_pt)
    return out_pt


def run_reference_val(case: str, pt_path: str, data_yaml: str):
    """Full reference val through the product path; capture per-image NMS
    outputs (input-space, pre-scale_boxes) keyed by filename."""
    from ultralytics import YOLO
    from ultralytics.models.yolo.detect.val import DetectionValidator as DV

    captured = {}  # im_file stem -> (n, 6) ndarray
    orig_update = DV.update_metrics

    def update_metrics(self, preds, batch):
        for si, pred in enumerate(preds):
            stem = Path(batch["im_file"][si]).stem
            captured[stem] = pred.detach().cpu().numpy().astype(np.float32)
        return orig_update(self, preds, batch)

    DV.update_metrics = update_metrics
    try:
        model = YOLO(pt_path)
        res = model.val(
            data=data_yaml, imgsz=IMGSZ, batch=4, device="cpu", workers=0,
            plots=False, save_json=False, verbose=False,
        )
    finally:
        DV.update_metrics = orig_update
    metrics = np.array(
        [res.box.map50, res.box.map, res.box.mp, res.box.mr], np.float64
    )
    return captured, metrics


def gen_fixture(case: str):
    from synth_data import make_valparity_dataset

    _, _, nc, ds_seed = CASES[case]
    tmp = Path(tempfile.mkdtemp(prefix=f"valparity_{case}_"))
    data_yaml = make_valparity_dataset(tmp / "ds", nc=nc, n=N_IMAGES, imgsz=IMGSZ, seed=ds_seed)
    pt = build_ref_pt(case, str(tmp / "ref.pt"))
    captured, metrics = run_reference_val(case, pt, str(data_yaml))
    assert len(captured) == N_IMAGES, f"captured {len(captured)} images, expected {N_IMAGES}"
    arrays = {f"pred_{stem}": v for stem, v in captured.items()}
    np.savez_compressed(OUT / f"valparity_{case}.npz", __metrics__=metrics, **arrays)
    n_det = sum(len(v) for v in captured.values())
    print(
        f"valparity_{case}.npz: {len(captured)} images, {n_det} dets, "
        f"mAP50={metrics[0]:.6f} mAP50-95={metrics[1]:.6f} P={metrics[2]:.4f} R={metrics[3]:.4f}"
    )


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "fixture"
    if cmd == "weights":
        build_ref_pt(sys.argv[2], sys.argv[3])
        print(f"wrote {sys.argv[3]}")
    elif cmd == "fixture":
        for case in (sys.argv[2:] or sorted(CASES)):
            gen_fixture(case)
    else:
        raise SystemExit(f"unknown command {cmd}")
