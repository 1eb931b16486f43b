"""TritonRemoteModel against an in-process fake v2 server that fronts a
jitted model — the same pattern as the reference's dockerized Triton test
(reference tests/test_integrations.py:66) without docker/egress."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fake_server():
    """KServe-v2 REST server wrapping y = 2x + 1 (stands in for any
    exported model behind Triton)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path.endswith("/config"):
                cfg = {
                    "name": "double",
                    "input": [{"name": "images", "data_type": "TYPE_FP32", "dims": [-1]}],
                    "output": [{"name": "output0", "data_type": "TYPE_FP32", "dims": [-1]}],
                    "parameters": {"metadata": {"string_value": "{'stride': 32}"}},
                }
                body = json.dumps(cfg).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            x = np.asarray(req["inputs"][0]["data"], np.float32).reshape(req["inputs"][0]["shape"])
            y = 2.0 * x + 1.0
            resp = {
                "outputs": [
                    {"name": "output0", "shape": list(y.shape), "datatype": "FP32",
                     "data": y.reshape(-1).tolist()}
                ]
            }
            body = json.dumps(resp).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_triton_remote_model(fake_server):
    from improving_yolov8_cbam_swinblock_tpu.utils.triton import TritonRemoteModel

    m = TritonRemoteModel(url=fake_server, endpoint="double", scheme="http")
    assert m.input_names == ["images"] and m.output_names == ["output0"]
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    (y,) = m(x)
    np.testing.assert_allclose(y, 2 * x + 1)
    # dtype coercion: uint8 in -> server fp32 -> back to uint8
    (y8,) = m(np.ones((2, 2), np.uint8))
    assert y8.dtype == np.uint8 and (y8 == 3).all()


def test_triton_url_parsing(fake_server):
    from improving_yolov8_cbam_swinblock_tpu.utils.triton import TritonRemoteModel

    m = TritonRemoteModel(url=f"http://{fake_server}/double")
    assert m.endpoint == "double" and m.scheme == "http"
    (y,) = m(np.zeros((1, 4), np.float32))
    np.testing.assert_allclose(y, np.ones((1, 4)))
