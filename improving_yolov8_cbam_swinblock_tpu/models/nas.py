"""YOLO-NAS facade (reference models/nas/{model,predict,val}.py).

The reference wraps pre-trained super-gradients checkpoints (downloaded
.pt; model.py:63-83 rebuilds forward/fuse shims) — there is no YAML
architecture to build from. The TPU-native equivalent mirrors that
contract: NAS() accepts only a trained checkpoint of this framework's
format and serves predict/val through the standard detect engine (the
reference's NASPredictor/NASValidator are thin NMS wrappers around the
same postprocess this engine already applies).
"""

from __future__ import annotations

from pathlib import Path

from ..engine.model import YOLO


class NAS(YOLO):
    """Predict/val-only detection facade over a trained checkpoint."""

    def __init__(self, model: str = "yolo_nas_s.ckpt", verbose: bool = False):
        if Path(str(model)).suffix in {".yaml", ".yml"}:
            # reference models/nas/model.py:58 carries the same assertion
            raise ValueError("YOLO-NAS models only support pre-trained models (.ckpt), not YAML configs")
        super().__init__(model, task="detect", verbose=verbose)

    def train(self, *args, **kwargs):
        raise NotImplementedError(
            "NAS is predict/val-only (reference task_map registers no trainer, models/nas/model.py:96-101)"
        )
