"""Golden full-model fixture: reference custom model state_dict + forward
outputs on a fixed input, for end-to-end numeric parity of the whole graph
(every Conv/BN/C2f/SPPF/CBAM/SwinBlock/Detect in one assertion).

Usage: python tools/gen_golden_model.py
Writes tests/golden/model_v8s_cbam_swin.npz
"""

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)


def _gen(yaml_path: str, scale: str, out_name: str, seed: int):
    from ultralytics.nn.tasks import DetectionModel, yaml_model_load

    torch.manual_seed(7)
    d = yaml_model_load(yaml_path)
    d["scale"] = scale
    with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
        model = DetectionModel(d, ch=3, nc=1, verbose=False)
    model.eval()

    rng = np.random.default_rng(seed)
    x = rng.random((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        y, feats = model(torch.tensor(x))

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(
        OUT / out_name,
        __input__=x,
        __output__=y.numpy(),
        **{f"feat{i}": f.numpy() for i, f in enumerate(feats)},
        **state,
    )
    print(f"{out_name}: {len(state)} tensors; y: {tuple(y.shape)}; feats: {[tuple(f.shape) for f in feats]}")


def main(which: str = "all"):
    # the fork's two ACTIVE custom graphs (SURVEY.md §2.1): v8 at scale s,
    # v11 at scale m — the only scales where the reference's hard-coded
    # SwinBlock dims match the width-scaled channels
    if which in ("all", "v8"):
        _gen("/root/reference/ultralytics/cfg/models/v8/yolov8.yaml", "s", "model_v8s_cbam_swin.npz", 3)
    if which in ("all", "11"):
        _gen("/root/reference/ultralytics/cfg/models/11/yolo11.yaml", "m", "model_y11m_cbam_swin.npz", 5)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
