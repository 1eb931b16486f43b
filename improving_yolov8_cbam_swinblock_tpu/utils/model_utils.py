"""Model introspection + profiling utilities.

Equivalents of reference utils/torch_utils.py model_info/get_flops
(thop) and utils/ops.Profile — on XLA, FLOPs come from the compiler's
own cost analysis instead of operator hooks, and profiling uses
jax.profiler traces.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def get_flops(model, variables, imgsz: int = 640) -> float:
    """Forward GFLOPs at the given size via XLA cost analysis
    (replaces thop, reference torch_utils.py:406-460)."""

    def fwd(v, x):
        out = model.net.apply(v, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    x = jnp.zeros((1, imgsz, imgsz, 3), model.dtype)
    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0)) / 1e9


def model_info(model, variables, imgsz: int = 640, verbose: bool = True) -> Dict:
    """Layer/param/FLOPs summary (reference torch_utils.py:305-340)."""
    n_p = model.param_count(variables)
    n_l = len(model.specs)
    try:
        gflops = get_flops(model, variables, imgsz)
    except Exception:
        gflops = 0.0
    info = {"layers": n_l, "parameters": n_p, "GFLOPs": round(gflops, 2)}
    if verbose:
        print(f"model summary: {n_l} layers, {n_p:,} parameters, {gflops:.1f} GFLOPs @ {imgsz}px")
    return info


class Profile:
    """Context timer (reference utils/ops.py:17-64); on accelerators the
    wrapped computation must block for honest numbers."""

    def __init__(self):
        self.t = 0.0
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt

    def __str__(self):
        return f"{self.t:.4f}s"


def autobatch(model, imgsz: int = 640, fraction: float = 0.60, max_batch: int = 256) -> int:
    """Pick the largest power-of-2 batch whose activation footprint fits in
    `fraction` of device memory (reference utils/autobatch.py — replaces
    profiled CUDA allocations with XLA's static memory analysis)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        limit = stats.get("bytes_limit", 16 << 30)
    except Exception:
        limit = 16 << 30
    budget = limit * fraction
    variables = model.shape_init(imgsz)

    def fwd(v, x):
        out = model.net.apply(v, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    best = 1
    b = 2
    while b <= max_batch:
        try:
            x = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), model.dtype)
            compiled = jax.jit(fwd).lower(variables, x).compile()
            mem = compiled.memory_analysis()
            total = (
                getattr(mem, "temp_size_in_bytes", 0)
                + getattr(mem, "argument_size_in_bytes", 0)
                + getattr(mem, "output_size_in_bytes", 0)
            )
            if total > budget:
                break
            best = b
        except Exception:
            break
        b *= 2
    return best
