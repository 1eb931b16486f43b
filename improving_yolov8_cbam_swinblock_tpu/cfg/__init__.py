"""Config layer: layered dict merge + validation.

Equivalent of reference cfg/__init__.py:279 get_cfg — default.yaml
merged with overrides, rightmost wins, returned as a SimpleNamespace.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Dict, Optional

import yaml

CFG_DIR = Path(__file__).resolve().parent
DEFAULT_CFG_PATH = CFG_DIR / "default.yaml"

_BOOL_KEYS = {
    "save", "exist_ok", "pretrained", "deterministic", "single_cls", "rect", "device_augment",
    "cos_lr", "amp", "multi_scale", "val", "save_json", "half",
    "plots", "visualize", "augment", "agnostic_nms", "keras", "int8",
    "dynamic", "nms",
}
_FLOAT01_KEYS = {"fraction", "hsv_h", "hsv_s", "hsv_v", "translate", "flipud", "fliplr", "bgr", "mosaic", "mixup", "copy_paste"}


def default_cfg_dict() -> Dict:
    return yaml.safe_load(DEFAULT_CFG_PATH.read_text())


def get_cfg(cfg: Optional[Dict] = None, overrides: Optional[Dict] = None) -> SimpleNamespace:
    d = default_cfg_dict()
    if cfg:
        d.update(cfg if isinstance(cfg, dict) else yaml.safe_load(Path(cfg).read_text()))
    if overrides:
        d.update({k: v for k, v in overrides.items() if v is not None or k in d})
    check_cfg(d)
    return SimpleNamespace(**d)


def check_cfg(d: Dict) -> None:
    """Light type/range validation (reference cfg/__init__.py:327)."""
    for k in _FLOAT01_KEYS:
        if k in d and d[k] is not None and not (0.0 <= float(d[k]) <= 1.0):
            raise ValueError(f"cfg '{k}'={d[k]} must be in [0, 1]")
    for k in _BOOL_KEYS:
        if k in d and d[k] is not None and not isinstance(d[k], bool):
            raise TypeError(f"cfg '{k}'={d[k]!r} must be bool")
    if d.get("epochs") is not None and int(d["epochs"]) <= 0:
        raise ValueError("epochs must be positive")
