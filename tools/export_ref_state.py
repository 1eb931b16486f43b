"""Export a reference torch checkpoint / model to the npz form that
utils/torch_import.import_torch_state consumes ({name: np.ndarray}).

The round-1 importer promised this companion (utils/torch_import.py:17)
but it never existed (VERDICT round-1 'Next round' #10). Handles:

  * .pt checkpoints written by the reference trainer (ckpt["ema"] or
    ckpt["model"] carries the pickled nn.Module — reference
    nn/tasks.py:1303 attempt_load_one_weight), unpickled against the
    read-only reference package with torchvision stubbed;
  * plain state_dict .pt files;
  * a model YAML (builds the reference model fresh; useful to generate
    parity fixtures without a trained checkpoint).

Usage:
  python tools/export_ref_state.py best.pt out.npz
  python tools/export_ref_state.py /root/reference/.../yolov8.yaml out.npz --scale s --nc 1
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (torchvision stub so the reference imports)

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def state_dict_from_pt(path: str):
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt.get("model")
        if model is not None and hasattr(model, "state_dict"):
            return model.float().state_dict()
        if all(hasattr(v, "numpy") for v in ckpt.values()):
            return ckpt  # plain state_dict
        raise ValueError(f"unrecognized checkpoint structure: keys={list(ckpt)[:8]}")
    if hasattr(ckpt, "state_dict"):
        return ckpt.float().state_dict()
    raise ValueError(f"cannot extract a state_dict from {path}")


def state_dict_from_yaml(path: str, scale: str = "s", nc: int = 1, seed: int = 0):
    from ultralytics.nn.tasks import DetectionModel, yaml_model_load

    torch.manual_seed(seed)
    d = yaml_model_load(path)
    if scale:
        d["scale"] = scale
    with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
        model = DetectionModel(d, ch=3, nc=nc, verbose=False)
    model.eval()
    return model.state_dict()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help=".pt checkpoint or model yaml")
    ap.add_argument("out", help="output .npz")
    ap.add_argument("--scale", default="s")
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.src.endswith((".yaml", ".yml")):
        sd = state_dict_from_yaml(args.src, args.scale, args.nc, args.seed)
    else:
        sd = state_dict_from_pt(args.src)
    arrays = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    np.savez_compressed(args.out, **arrays)
    print(f"wrote {len(arrays)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
