"""HUB integration stubs.

The reference ships a cloud training/metrics service client
(reference hub/session.py:19 HUBTrainingSession: heartbeats, metric and
checkpoint upload). This environment has no network egress, so the
session here is an offline recorder with the same event surface —
integrations that expect the hooks keep working, and a real transport
can be dropped into `_send` later.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional


class HUBTrainingSession:
    """Offline stand-in: records what would be uploaded."""

    def __init__(self, identifier: str = "offline", save_dir: Optional[str] = None):
        self.identifier = identifier
        self.alive = True
        self.metrics_queue: Dict[int, str] = {}
        self.log_path = Path(save_dir or "runs") / "hub_session.jsonl"
        self.log_path.parent.mkdir(parents=True, exist_ok=True)

    def _send(self, kind: str, payload: Dict) -> None:
        with open(self.log_path, "a") as fh:
            fh.write(json.dumps({"t": time.time(), "kind": kind, **payload}) + "\n")

    def upload_metrics(self, epoch: int, metrics: Dict) -> None:
        self.metrics_queue[epoch] = json.dumps(metrics)
        self._send("metrics", {"epoch": epoch, "metrics": metrics})

    def upload_model(self, epoch: int, weights_path: str, is_best: bool = False, final: bool = False) -> None:
        self._send("model", {"epoch": epoch, "weights": str(weights_path), "best": is_best, "final": final})

    def heartbeat(self) -> None:
        self._send("heartbeat", {})

    def attach(self, trainer) -> None:
        """Register on the trainer's callback bus (reference
        add_integration_callbacks wiring)."""
        from ..utils.callbacks import add_callback

        def on_fit_epoch_end(tr):
            row = tr.metrics_rows[-1] if tr.metrics_rows else {}
            self.upload_metrics(int(row.get("epoch", 0)), row)

        def on_model_save(tr):
            self.upload_model(tr._epoch, tr.wdir / "last.ckpt")

        def on_train_end(tr):
            self.upload_model(tr._epoch, tr.wdir / "best.ckpt", is_best=True, final=True)

        add_callback(trainer.callbacks, "on_fit_epoch_end", on_fit_epoch_end)
        add_callback(trainer.callbacks, "on_model_save", on_model_save)
        add_callback(trainer.callbacks, "on_train_end", on_train_end)
