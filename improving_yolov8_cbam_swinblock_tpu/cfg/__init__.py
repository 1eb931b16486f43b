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
    "dynamic", "nms", "verbose", "profile", "overlap_mask", "retina_masks",
    "show", "save_frames", "stream_buffer", "dnn", "optimize", "simplify",
}
_FLOAT01_KEYS = {"fraction", "hsv_h", "hsv_s", "hsv_v", "translate", "flipud", "fliplr", "bgr", "mosaic", "mosaic9", "mosaic3", "mixup", "copy_paste"}


def default_cfg_dict() -> Dict:
    return yaml.safe_load(DEFAULT_CFG_PATH.read_text())


# reference cfg/__init__.py:421 deprecation shims (old key -> new key)
DEPRECATED = {
    "boxes": "show_boxes",
    "hide_labels": "show_labels",
    "hide_conf": "show_conf",
    "line_thickness": "line_width",
    "label_smoothing": None,  # dropped upstream
}


def check_dict_alignment(base: Dict, custom: Dict) -> None:
    """Unknown-key validation with did-you-mean suggestions
    (reference cfg/__init__.py:462)."""
    import difflib

    unknown = [k for k in custom if k not in base]
    if unknown:
        msgs = []
        for k in unknown:
            near = difflib.get_close_matches(k, base.keys(), n=3, cutoff=0.6)
            sim = f" — did you mean {', '.join(repr(n) for n in near)}?" if near else ""
            msgs.append(f"{k!r} is not a valid config key{sim}")
        raise KeyError("; ".join(msgs))


def get_cfg(cfg: Optional[Dict] = None, overrides: Optional[Dict] = None) -> SimpleNamespace:
    d = default_cfg_dict()
    if cfg:
        d.update(cfg if isinstance(cfg, dict) else yaml.safe_load(Path(cfg).read_text()))
    if overrides:
        overrides = dict(overrides)
        # cfg=<path>: a user yaml layered between defaults and the explicit
        # k=v overrides (reference default.yaml:123 + cfg/__init__.py:279)
        layer = overrides.pop("cfg", None)
        if layer:
            user = yaml.safe_load(Path(layer).read_text()) or {}
            check_dict_alignment(d, user)
            d.update(user)
            d["cfg"] = str(layer)
        for old, new in DEPRECATED.items():
            if old in overrides:
                v = overrides.pop(old)
                if new:
                    overrides.setdefault(new, v)
        check_dict_alignment(d, overrides)
        d.update({k: v for k, v in overrides.items() if v is not None or k in d})
    check_cfg(d)
    return SimpleNamespace(**d)


def check_cfg(d: Dict) -> None:
    """Light type/range validation (reference cfg/__init__.py:327)."""
    for k in _FLOAT01_KEYS:
        if k in d and d[k] is not None and not (0.0 <= float(d[k]) <= 1.0):
            raise ValueError(f"cfg '{k}'={d[k]} must be in [0, 1]")
    for k in _BOOL_KEYS:
        if k == "pretrained" and isinstance(d.get(k), str):
            continue  # reference allows pretrained=<weights path> (cfg/default.yaml:8)
        if k in d and d[k] is not None and not isinstance(d[k], bool):
            raise TypeError(f"cfg '{k}'={d[k]!r} must be bool")
    if d.get("epochs") is not None and int(d["epochs"]) <= 0:
        raise ValueError("epochs must be positive")
    if d.get("copy_paste_mode") not in (None, "flip", "mixup"):
        raise ValueError(f"copy_paste_mode={d['copy_paste_mode']!r} must be 'flip' or 'mixup'")
    if d.get("cache") not in (None, False, True, "ram", "disk"):
        raise ValueError(f"cache={d['cache']!r} must be True/'ram', 'disk' or False")
