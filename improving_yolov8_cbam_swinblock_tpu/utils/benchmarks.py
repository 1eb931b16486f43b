"""Benchmark mode: export-format sweep with latency (+ optional accuracy).

Reference utils/benchmarks.py:51 benchmark() exports to every format and
measures mAP + latency; the TPU analog sweeps the stack's formats
(jax-native, stablehlo, saved_model, tflite — engine/exporter.py)
through the uniform Backend facade (nn/autobackend.py) so every number
is measured through the same forward contract.
"""

from __future__ import annotations

import tempfile
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _time_backend(be, img: np.ndarray, iters: int) -> Dict[str, float]:
    be(img)  # compile / allocate
    be(img)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = be(img)
    np.asarray(out).sum()
    dt = time.perf_counter() - t0
    return {"ms/batch": round(dt / iters * 1000, 2), "img/s": round(img.shape[0] * iters / dt, 1)}


def benchmark(
    model,
    imgsz: int = 640,
    batch: int = 1,
    iters: int = 20,
    formats: Optional[List[str]] = None,
    out_dir: Optional[str] = None,
    **_,
) -> List[Dict]:
    """Sweep inference formats for a YOLO facade instance.

    formats: subset of {"jax", "stablehlo", "saved_model", "tflite"};
    defaults to jax + stablehlo (the fast, dependency-light pair — pass
    the TF formats explicitly like the reference's opt-in heavy formats).
    """
    from ..nn.autobackend import Backend
    from ..engine.exporter import Exporter

    formats = formats or ["jax", "stablehlo"]
    model._ensure_variables(imgsz)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)

    rows: List[Dict] = []
    tmp = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="bench_"))
    for fmt in formats:
        try:
            if fmt == "jax":
                net = model.model
                net._backend_variables = model.variables
                be = Backend(net, imgsz=imgsz)
            else:
                from types import SimpleNamespace

                args = SimpleNamespace(format=fmt, imgsz=imgsz, project=str(tmp))
                path = Exporter(model.model, model.variables, args)()
                be = Backend(path)
            row = {"format": fmt, "imgsz": imgsz, "batch": batch, "status": "ok"}
            row.update(_time_backend(be, img, iters))
        except Exception as e:  # noqa: BLE001 — sweep reports per-format failures
            row = {"format": fmt, "imgsz": imgsz, "batch": batch, "status": f"error: {e}"[:120]}
        rows.append(row)
    return rows
