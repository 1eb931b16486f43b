"""Remote inference client speaking the KServe/Triton v2 REST protocol.

Equivalent of reference utils/triton.py:9-116 (TritonRemoteModel). The
reference depends on the `tritonclient` package; this implementation
talks the open KServe-v2 HTTP protocol directly with the stdlib
(GET /v2/models/{name}/config, POST /v2/models/{name}/infer), so any
Triton server — or this framework's own exported SavedModel behind one —
works without extra dependencies. gRPC scheme maps to the same REST
calls (documented deviation: no grpc stack in this environment; the
protocol payloads are identical).

Tensors ride the JSON body (KServe v2 `data` arrays). That is the
interoperable baseline; the binary extension is a transport optimization
the protocol negotiates independently.
"""

from __future__ import annotations

import json
import urllib.request
from typing import List
from urllib.parse import urlsplit

import numpy as np

_TYPE_MAP = {
    "TYPE_FP32": np.float32, "TYPE_FP16": np.float16, "TYPE_UINT8": np.uint8,
    "TYPE_INT32": np.int32, "TYPE_INT64": np.int64,
    # KServe v2 short names
    "FP32": np.float32, "FP16": np.float16, "UINT8": np.uint8,
    "INT32": np.int32, "INT64": np.int64,
}
_V2_NAME = {np.dtype(np.float32): "FP32", np.dtype(np.float16): "FP16",
            np.dtype(np.uint8): "UINT8", np.dtype(np.int32): "INT32",
            np.dtype(np.int64): "INT64"}


class TritonRemoteModel:
    """Uniform `outputs = model(*inputs)` facade over a remote v2 server
    (reference TritonRemoteModel contract)."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:  # <scheme>://<netloc>/<endpoint>
            parts = urlsplit(url)
            endpoint = parts.path.strip("/").split("/")[0]
            scheme = parts.scheme
            url = parts.netloc
        self.endpoint = endpoint
        self.url = url
        self.scheme = scheme or "http"
        self._base = f"http://{self.url}/v2/models/{self.endpoint}"

        config = self._get(f"{self._base}/config")
        config["output"] = sorted(config["output"], key=lambda x: x.get("name"))
        self.input_formats = [x["data_type"] for x in config["input"]]
        self.np_input_formats = [_TYPE_MAP[x] for x in self.input_formats]
        self.input_names = [x["name"] for x in config["input"]]
        self.output_names = [x["name"] for x in config["output"]]
        meta = config.get("parameters", {}).get("metadata", {})
        self.metadata = meta.get("string_value") if isinstance(meta, dict) else None

    @staticmethod
    def _get(url):
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.loads(r.read())

    @staticmethod
    def _post(url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        in_dtype = inputs[0].dtype
        body = {"inputs": [], "outputs": [{"name": n} for n in self.output_names]}
        for i, x in enumerate(inputs):
            x = np.asarray(x)
            if x.dtype != self.np_input_formats[i]:
                x = x.astype(self.np_input_formats[i])
            body["inputs"].append(
                {
                    "name": self.input_names[i],
                    "shape": list(x.shape),
                    "datatype": _V2_NAME[x.dtype],
                    "data": x.reshape(-1).tolist(),
                }
            )
        resp = self._post(f"{self._base}/infer", body)
        outs = {o["name"]: o for o in resp["outputs"]}
        result = []
        for name in self.output_names:
            o = outs[name]
            arr = np.asarray(o["data"], dtype=_TYPE_MAP[o["datatype"]]).reshape(o["shape"])
            result.append(arr.astype(in_dtype))
        return result
