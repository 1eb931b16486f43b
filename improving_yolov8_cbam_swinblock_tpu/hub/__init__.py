"""HUB training-session client.

Equivalent of reference hub/session.py:19 HUBTrainingSession: per-epoch
metrics queue, rate-limited uploads (metrics 3 s / checkpoint 900 s /
heartbeat 300 s — session.py:59), retry-with-backoff request queue and a
failed-metrics re-queue (session.py:246-331), checkpoint upload with
is_best/final flags (session.py:376), and trainer attachment over the
callback event bus.

Transport is the stdlib (urllib): pass `api_url` to speak HTTP to any
HUB-compatible endpoint (POST {api_url}/models/{id}/metrics, /upload,
/heartbeat as JSON / multipart) — tested against an in-process fake
server in tests/test_hub.py. Without `api_url` (the default in this
zero-egress environment) every event is recorded to a local JSONL with
identical semantics, so integrations exercise the full code path.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
import uuid
from pathlib import Path
from typing import Dict, Optional

RATE_LIMITS = {"metrics": 3.0, "ckpt": 900.0, "heartbeat": 300.0}  # session.py:59
RETRY_CODES = {408, 429, 500, 502, 503, 504}  # session.py:329 _should_retry


class HUBTrainingSession:
    """Training-session uploader (reference HUBTrainingSession contract)."""

    def __init__(self, identifier: str = "offline", save_dir: Optional[str] = None,
                 api_url: Optional[str] = None, retries: int = 2, timeout: float = 10.0):
        self.model_id, self.api_key = self._parse_identifier(identifier)
        self.identifier = identifier
        self.api_url = api_url.rstrip("/") if api_url else None
        self.retries = retries
        self.timeout = timeout
        self.alive = True
        self.metrics_queue: Dict[int, Dict] = {}
        self.metrics_upload_failed_queue: Dict[int, Dict] = {}
        self._last_sent = {k: -float("inf") for k in RATE_LIMITS}
        self.log_path = Path(save_dir or "runs") / "hub_session.jsonl"
        self.log_path.parent.mkdir(parents=True, exist_ok=True)

    # -- identifier (session.py:184 _parse_identifier) --------------------
    @staticmethod
    def _parse_identifier(identifier: str):
        """'<url>/models/<id>', '<api_key>_<model_id>' (42-char key) or a
        bare model id / name."""
        s = str(identifier)
        if "/models/" in s:
            return s.rsplit("/models/", 1)[1], None
        if "_" in s and len(s.split("_", 1)[0]) == 42:
            key, mid = s.split("_", 1)
            return mid, key
        return s or uuid.uuid4().hex[:20], None

    def load_model(self) -> Dict:
        """Fetch the model record from the HUB (reference session.py
        load_model); raises HUBModelError when the model id cannot be
        retrieved (reference errors.py HUBModelError usage)."""
        from ..utils.errors import HUBModelError

        if self.api_url is None:
            raise HUBModelError(f"Model '{self.model_id}' not found: session is offline (no api_url)")
        url = f"{self.api_url}/models/{self.model_id}"
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        try:
            req = urllib.request.Request(url, headers=headers)
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                if 200 <= r.status < 300:
                    return json.loads(r.read().decode() or "{}")
                raise HUBModelError(f"Model '{self.model_id}' not found (HTTP {r.status})")
        except urllib.error.HTTPError as e:
            raise HUBModelError(f"Model '{self.model_id}' not found (HTTP {e.code})") from e
        except (urllib.error.URLError, OSError) as e:
            raise HUBModelError(f"Model '{self.model_id}' not reachable: {e}") from e

    # -- transport --------------------------------------------------------
    def _record(self, kind: str, payload: Dict) -> None:
        with open(self.log_path, "a") as fh:
            fh.write(json.dumps({"t": time.time(), "kind": kind, **payload}) + "\n")

    def _post(self, route: str, payload: Dict, data: Optional[bytes] = None) -> bool:
        """POST with retry/backoff (session.py:246 request_queue). JSON
        body by default; `data` switches to an octet-stream upload with
        metadata in headers."""
        url = f"{self.api_url}/models/{self.model_id}/{route}"
        body = data if data is not None else json.dumps(payload).encode()
        headers = {"Content-Type": "application/octet-stream" if data is not None else "application/json"}
        if data is not None:
            headers["X-Hub-Meta"] = json.dumps(payload)
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        for attempt in range(self.retries + 1):
            try:
                req = urllib.request.Request(url, data=body, headers=headers)
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    if 200 <= r.status < 300:
                        return True
                    code = r.status
            except urllib.error.HTTPError as e:
                code = e.code
            except (urllib.error.URLError, OSError):
                code = None
            if code is not None and code not in RETRY_CODES:
                return False  # non-retryable (session.py:329)
            if attempt < self.retries:
                time.sleep(2**attempt)  # exponential backoff (session.py:281)
        return False

    def _send(self, kind: str, payload: Dict, data: Optional[bytes] = None) -> bool:
        self._record(kind, payload)
        if self.api_url is None:
            return True
        return self._post(kind, payload, data)

    def _rate_ok(self, kind: str) -> bool:
        now = time.monotonic()
        if now - self._last_sent[kind] < RATE_LIMITS[kind]:
            return False
        self._last_sent[kind] = now
        return True

    # -- public surface (session.py:372-440) ------------------------------
    def upload_metrics(self, epoch: int, metrics: Dict) -> None:
        """Queue this epoch's metrics; flush the queue (incl. previously
        failed epochs) at most once per rate window."""
        self.metrics_queue[int(epoch)] = metrics
        if not self._rate_ok("metrics"):
            return
        self.flush_metrics()

    def flush_metrics(self) -> None:
        """Send everything queued (+ previously failed epochs) now,
        ignoring the rate window — called on train end so the final
        epochs inside the last window are never lost."""
        if not (self.metrics_queue or self.metrics_upload_failed_queue):
            return
        batch = {**self.metrics_upload_failed_queue, **self.metrics_queue}
        ok = self._send("metrics", {"metrics": {str(k): v for k, v in batch.items()}})
        if ok:
            self.metrics_upload_failed_queue.clear()
            self.metrics_queue.clear()
        else:  # re-queue for the next flush (session.py:315-317)
            self.metrics_upload_failed_queue.update(batch)
            self.metrics_queue.clear()

    def upload_model(self, epoch: int, weights_path, is_best: bool = False, final: bool = False) -> bool:
        """Upload a checkpoint; `final` bypasses the ckpt rate limit (but
        still stamps the window — one ckpt per 900 s overall)."""
        if not self._rate_ok("ckpt") and not final:
            return False
        self._last_sent["ckpt"] = time.monotonic()
        p = Path(weights_path)
        blob = p.read_bytes() if (self.api_url and p.is_file()) else None
        return self._send(
            "upload",
            {"epoch": int(epoch), "weights": str(weights_path), "best": bool(is_best), "final": bool(final)},
            data=blob,
        )

    def heartbeat(self) -> bool:
        if not self._rate_ok("heartbeat"):
            return False
        return self._send("heartbeat", {"alive": self.alive})

    # -- trainer wiring ----------------------------------------------------
    def attach(self, trainer) -> None:
        """Register on the trainer's callback bus (reference
        add_integration_callbacks wiring)."""
        from ..utils.callbacks import add_callback

        def on_fit_epoch_end(tr):
            row = tr.metrics_rows[-1] if tr.metrics_rows else {}
            self.upload_metrics(int(row.get("epoch", 0)), row)
            self.heartbeat()

        def on_model_save(tr):
            self.upload_model(tr._epoch, tr.wdir / "last.ckpt")

        def on_train_end(tr):
            self.flush_metrics()
            self.upload_model(tr._epoch, tr.wdir / "best.ckpt", is_best=True, final=True)

        add_callback(trainer.callbacks, "on_fit_epoch_end", on_fit_epoch_end)
        add_callback(trainer.callbacks, "on_model_save", on_model_save)
        add_callback(trainer.callbacks, "on_train_end", on_train_end)


# ---------------------------------------------------------------------------
# Module-level HUB API (reference hub/__init__.py:26-185 + hub/auth.py:11).
# Transport is stdlib urllib against any HUB-compatible endpoint; the
# endpoint root comes from the explicit `api_url` argument or the
# persistent `hub_api_url` setting. Every call is POST (matching the
# session transport) so one fake server covers the whole surface in tests.
# ---------------------------------------------------------------------------


def _hub_url(api_url: Optional[str] = None) -> Optional[str]:
    from ..utils.settings import SETTINGS

    url = api_url or SETTINGS.get("hub_api_url") or None
    return url.rstrip("/") if url else None


def _hub_post(url: str, payload: Dict, api_key: str = "", timeout: float = 10.0) -> Dict:
    """POST JSON, return the decoded JSON body ({} when empty). Raises
    HUBModelError on HTTP/transport failure."""
    from ..utils.errors import HUBModelError

    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["x-api-key"] = api_key
    try:
        req = urllib.request.Request(url, data=json.dumps(payload).encode(), headers=headers)
        with urllib.request.urlopen(req, timeout=timeout) as r:
            if 200 <= r.status < 300:
                return json.loads(r.read().decode() or "{}")
            raise HUBModelError(f"HUB request failed (HTTP {r.status}): {url}")
    except urllib.error.HTTPError as e:
        raise HUBModelError(f"HUB request failed (HTTP {e.code}): {url}") from e
    except (urllib.error.URLError, OSError) as e:
        raise HUBModelError(f"HUB unreachable: {url} ({e})") from e


class Auth:
    """API-key resolution + authentication (reference hub/auth.py:11 Auth).

    Key sources in priority order: explicit argument, the persistent
    `api_key` setting, the HUB_API_KEY environment variable. The
    reference's interactive `request_api_key` prompt and browser-cookie
    flow (auth.py:73,104) need a terminal/Colab and are N/A here —
    `authenticate()` validates against the endpoint when one is
    configured, else accepts any non-empty key (offline)."""

    def __init__(self, api_key: str = "", verbose: bool = False, api_url: Optional[str] = None):
        import os

        from ..utils.settings import SETTINGS

        self.api_key = (api_key or SETTINGS.get("api_key") or os.environ.get("HUB_API_KEY") or "").split("_", 1)[0]
        self.api_url = _hub_url(api_url)
        self.verbose = verbose

    def authenticate(self) -> bool:
        """True when the key is accepted (reference auth.py:85). Offline
        (no endpoint): any non-empty key authenticates."""
        from ..utils.errors import HUBModelError

        if not self.api_key:
            return False
        if self.api_url is None:
            return True
        try:
            _hub_post(f"{self.api_url}/auth", {"apiKey": self.api_key}, api_key=self.api_key)
            return True
        except HUBModelError:
            return False

    def get_auth_header(self) -> Optional[Dict[str, str]]:
        """Auth header for API requests (reference auth.py:126)."""
        return {"x-api-key": self.api_key} if self.api_key else None


def login(api_key: Optional[str] = None, save: bool = True, api_url: Optional[str] = None) -> bool:
    """Authenticate and optionally persist the key to settings
    (reference hub/__init__.py:26 login)."""
    from ..utils.settings import SETTINGS

    auth = Auth(api_key or "", api_url=api_url)
    if not auth.authenticate():
        print("HUB login failed: set a key via `yolo login <api_key>` or the HUB_API_KEY env var")
        return False
    if save and auth.api_key != SETTINGS.get("api_key"):
        SETTINGS.update({"api_key": auth.api_key})
        SETTINGS.save()
    return True


def logout() -> None:
    """Drop the persisted API key (reference hub/__init__.py:71 logout)."""
    from ..utils.settings import SETTINGS

    SETTINGS.update({"api_key": ""})
    SETTINGS.save()


def reset_model(model_id: str = "", api_url: Optional[str] = None) -> bool:
    """Reset a trained HUB model to the untrained state (reference
    hub/__init__.py:83 reset_model). Requires a configured endpoint."""
    from ..utils.errors import HUBModelError

    url = _hub_url(api_url)
    if url is None:
        raise HUBModelError("reset_model requires a HUB endpoint (api_url= or the hub_api_url setting)")
    _hub_post(f"{url}/model-reset", {"modelId": model_id}, api_key=Auth().api_key)
    return True


def export_fmts_hub() -> list:
    """Export formats a HUB endpoint may be asked for (reference
    hub/__init__.py:92 export_fmts_hub — the torch table there; here the
    exporter's own format set)."""
    from ..engine.exporter import _ALIASES, _FORMAT_OPTS

    return sorted(_FORMAT_OPTS) + sorted(_ALIASES)


def export_model(model_id: str = "", format: str = "stablehlo", api_url: Optional[str] = None) -> None:
    """Ask the HUB to export a model (reference hub/__init__.py:99)."""
    if format not in export_fmts_hub():
        raise ValueError(f"unsupported export format {format!r}, valid formats are {export_fmts_hub()}")
    from ..utils.errors import HUBModelError

    url = _hub_url(api_url)
    if url is None:
        raise HUBModelError("export_model requires a HUB endpoint (api_url= or the hub_api_url setting)")
    _hub_post(f"{url}/models/{model_id}/export", {"format": format}, api_key=Auth().api_key)


def get_export(model_id: str = "", format: str = "stablehlo", api_url: Optional[str] = None) -> Dict:
    """Fetch an exported model record (reference hub/__init__.py:122)."""
    if format not in export_fmts_hub():
        raise ValueError(f"unsupported export format {format!r}, valid formats are {export_fmts_hub()}")
    from ..utils.errors import HUBModelError

    url = _hub_url(api_url)
    if url is None:
        raise HUBModelError("get_export requires a HUB endpoint (api_url= or the hub_api_url setting)")
    return _hub_post(f"{url}/get-export", {"apiKey": Auth().api_key, "modelId": model_id, "format": format},
                     api_key=Auth().api_key)


def check_dataset(path: str, task: str = "detect") -> Dict:
    """Validate a dataset for HUB upload by building its stats JSON
    (reference hub/__init__.py:147 check_dataset -> HUBDatasetStats)."""
    from ..data.utils import HUBDatasetStats

    stats = HUBDatasetStats(path, task=task).get_json()
    print(f"Checks completed for task={task}: nc={stats['nc']}")
    return stats
