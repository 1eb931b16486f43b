"""HUB session client vs an in-process fake HUB server: rate-limited
metric flushes, failed-metrics re-queue, checkpoint upload, heartbeat,
identifier parsing (reference hub/session.py:19-440)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from improving_yolov8_cbam_swinblock_tpu.hub import RATE_LIMITS, HUBTrainingSession


@pytest.fixture()
def hub_server():
    calls = []
    fail_next = {"n": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            meta = self.headers.get("X-Hub-Meta")
            calls.append(
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "json": json.loads(meta) if meta else json.loads(body or b"{}"),
                    "blob_len": len(body) if meta else 0,
                }
            )
            if fail_next["n"] > 0:
                fail_next["n"] -= 1
                self.send_response(503)
            else:
                self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", calls, fail_next
    srv.shutdown()


def test_identifier_parsing():
    s = HUBTrainingSession("https://hub.example.com/models/abc123")
    assert s.model_id == "abc123" and s.api_key is None
    s = HUBTrainingSession("k" * 42 + "_mymodel")
    assert s.model_id == "mymodel" and s.api_key == "k" * 42


def test_metrics_flush_and_requeue(hub_server, tmp_path):
    url, calls, fail_next = hub_server
    s = HUBTrainingSession("k" * 42 + "_m1", save_dir=str(tmp_path), api_url=url, retries=0)
    s.upload_metrics(0, {"loss": 1.0})
    assert calls and calls[-1]["path"] == "/models/m1/metrics"
    assert calls[-1]["json"]["metrics"]["0"] == {"loss": 1.0}
    assert calls[-1]["auth"] == "Bearer " + "k" * 42
    # within the rate window: queued, not sent
    n = len(calls)
    s.upload_metrics(1, {"loss": 0.9})
    assert len(calls) == n and 1 in s.metrics_queue
    # force past the window; server fails -> epochs land in the retry queue
    s._last_sent["metrics"] = -1e9
    fail_next["n"] = 1
    s.upload_metrics(2, {"loss": 0.8})
    assert set(s.metrics_upload_failed_queue) == {1, 2}
    # next flush resends the failed epochs together
    s._last_sent["metrics"] = -1e9
    s.upload_metrics(3, {"loss": 0.7})
    assert not s.metrics_upload_failed_queue and not s.metrics_queue
    assert set(calls[-1]["json"]["metrics"]) == {"1", "2", "3"}


def test_ckpt_upload_and_heartbeat(hub_server, tmp_path):
    url, calls, _ = hub_server
    s = HUBTrainingSession("m2", save_dir=str(tmp_path), api_url=url, retries=0)
    w = tmp_path / "best.ckpt"
    w.write_bytes(b"x" * 1234)
    assert s.upload_model(5, w, is_best=True, final=True)
    assert calls[-1]["path"] == "/models/m2/upload"
    assert calls[-1]["json"]["best"] is True and calls[-1]["blob_len"] == 1234
    # non-final uploads respect the 900 s ckpt rate limit
    assert not s.upload_model(6, w)
    assert s.heartbeat()
    assert calls[-1]["path"] == "/models/m2/heartbeat"
    assert not s.heartbeat()  # rate-limited
    assert RATE_LIMITS["ckpt"] == 900.0


def test_offline_recorder(tmp_path):
    s = HUBTrainingSession("offline", save_dir=str(tmp_path))
    s.upload_metrics(0, {"loss": 1.0})
    s.heartbeat()
    rows = [json.loads(l) for l in (tmp_path / "hub_session.jsonl").read_text().splitlines()]
    assert [r["kind"] for r in rows] == ["metrics", "heartbeat"]


def test_module_hub_api(hub_server, monkeypatch, tmp_path):
    """Module-level HUB API (reference hub/__init__.py:26-185): login
    persists the key, export_model/get_export/reset_model POST to the
    endpoint, offline calls raise HUBModelError."""
    from improving_yolov8_cbam_swinblock_tpu import hub
    from improving_yolov8_cbam_swinblock_tpu.utils.errors import HUBModelError
    from improving_yolov8_cbam_swinblock_tpu.utils.settings import SettingsManager

    url, calls, _ = hub_server
    s = SettingsManager(tmp_path / "settings.json")
    monkeypatch.setattr("improving_yolov8_cbam_swinblock_tpu.utils.settings.SETTINGS", s)

    assert not hub.login(api_key=None, api_url=url)  # no key anywhere
    assert hub.login("k" * 42, api_url=url)  # server accepts -> persisted
    assert s["api_key"] == "k" * 42
    assert calls[-1]["path"] == "/auth"

    hub.export_model("m1", "stablehlo", api_url=url)
    assert calls[-1]["path"] == "/models/m1/export" and calls[-1]["json"]["format"] == "stablehlo"
    with pytest.raises(ValueError):
        hub.export_model("m1", "torchscript", api_url=url)
    assert hub.get_export("m1", "tflite", api_url=url) == {}  # fake server sends empty body
    assert hub.reset_model("m1", api_url=url)
    assert calls[-1]["path"] == "/model-reset"

    with pytest.raises(HUBModelError):  # offline: no endpoint configured
        hub.reset_model("m1")
    hub.logout()
    assert s["api_key"] == ""

    a = hub.Auth("abc", api_url=None)
    assert a.authenticate() and a.get_auth_header() == {"x-api-key": "abc"}
    assert not hub.Auth("", api_url=None).authenticate()
