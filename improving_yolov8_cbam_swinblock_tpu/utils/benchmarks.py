"""Benchmark mode: latency/throughput sweep for a loaded model
(reference utils/benchmarks.py:51 benchmark() analog — formats scoped to
what the TPU stack exports)."""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def benchmark(model, imgsz: int = 640, batch: int = 1, iters: int = 20, **_) -> List[Dict]:
    """Measure native-JAX inference latency/throughput at the given size."""
    model._ensure_variables(imgsz)
    net = model.model

    @jax.jit
    def forward(variables, img):
        x = img.astype(net.dtype) / 255.0
        pred, _ = net.net.apply(variables, x, train=False)
        return pred.sum()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8))
    float(forward(model.variables, img))  # compile
    t0 = time.perf_counter()
    vals = [forward(model.variables, img) for _ in range(iters)]
    _ = sum(float(v) for v in vals)
    dt = time.perf_counter() - t0
    ms = dt / iters * 1000
    return [
        {
            "format": "jax-native",
            "imgsz": imgsz,
            "batch": batch,
            "ms/batch": round(ms, 2),
            "img/s": round(batch * iters / dt, 1),
        }
    ]
