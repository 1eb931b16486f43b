"""Persistent user settings (reference utils/__init__.py:1193-1343
SettingsManager): a versioned JSON at ~/.config/<pkg>/settings.json with
dict access, update(), and reset(). `yolo settings` is the CLI verb."""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict

SETTINGS_VERSION = "0.1.0"


def _config_dir() -> Path:
    base = os.environ.get("XDG_CONFIG_HOME") or str(Path.home() / ".config")
    return Path(base) / "improving_yolov8_cbam_swinblock_tpu"


class SettingsManager(dict):
    """JSON-backed settings dict; unknown/missing keys reset to defaults."""

    def __init__(self, file: Path | None = None):
        self.file = Path(file) if file else _config_dir() / "settings.json"
        root = Path.cwd()
        self.defaults: Dict[str, Any] = {
            "settings_version": SETTINGS_VERSION,
            "datasets_dir": str(root / "datasets"),
            "weights_dir": str(root / "weights"),
            "runs_dir": str(root / "runs"),
            "sync": False,  # no telemetry in this stack (reference Sentry analog, off)
            "api_key": "",  # HUB API key persisted by hub.login (reference SETTINGS["api_key"])
            "hub_api_url": "",  # HUB endpoint root; empty = offline session recording
            "tensorboard": True,
            "profile": False,
            # path to a CLIP text-tower npz (tools/export_clip_npz.py);
            # when set, World/YOLOE set_classes uses the real encoder
            "clip_npz": "",
        }
        super().__init__(self.defaults)
        try:
            if self.file.exists():
                loaded = json.loads(self.file.read_text())
                if set(loaded) == set(self.defaults) and loaded.get("settings_version") == SETTINGS_VERSION:
                    self.update(loaded)
                else:  # schema drift: keep known keys, restore the rest
                    self.update({k: v for k, v in loaded.items() if k in self.defaults})
                    self["settings_version"] = SETTINGS_VERSION
                    self.save()
            else:
                self.save()
        except Exception:
            pass  # unreadable settings never break the library

    def save(self):
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)
        return self

    def reset(self):
        self.clear()
        super().update(self.defaults)
        self.save()
        return self


SETTINGS = SettingsManager()
