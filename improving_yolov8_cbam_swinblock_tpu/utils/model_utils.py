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


def get_latest_run(search_dir: str = "runs") -> str:
    """Most recent last.ckpt under search_dir (reference utils/files.py
    get_latest_run) — backs `resume=True` without an explicit path."""
    from pathlib import Path

    ckpts = list(Path(search_dir).rglob("last.ckpt"))
    return str(max(ckpts, key=lambda p: p.stat().st_mtime)) if ckpts else ""


def profile_layers(model, variables, imgsz: int = 640, iters: int = 3, verbose: bool = True):
    """Per-layer timing + output shapes by walking the compiled graph
    eagerly (reference BaseModel._profile_one_layer, nn/tasks.py:189-208:
    thop GFLOPs + timed reruns per module; here wall time per jitted
    layer with a completion fence)."""
    import time

    import jax
    import jax.numpy as jnp

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    x = jnp.zeros((1, imgsz, imgsz, 3), model.dtype)
    y = {}
    out = x
    rows = []
    for spec in model.specs:
        if spec.f != -1:
            out = y[spec.f] if isinstance(spec.f, int) else [out if j == -1 else y[j] for j in spec.f]
        name = f"model_{spec.i}"
        mod = spec.build(model.dtype) if spec.n == 1 else None
        v = {"params": params.get(name, {})}
        if name in stats:
            v["batch_stats"] = stats[name]

        def run(inp):
            if spec.n > 1:
                cur = inp
                for j in range(spec.n):
                    m_j = spec.build(model.dtype, rep=j)
                    nm = f"{name}_{j}"
                    vj = {"params": params.get(nm, {})}
                    if nm in stats:
                        vj["batch_stats"] = stats[nm]
                    cur = m_j.apply(vj, cur, train=False)
                return cur
            return mod.apply(v, inp, train=False)

        t0 = time.perf_counter()
        for _ in range(iters):
            res = run(out)
        jax.tree.map(lambda t: t.block_until_ready() if hasattr(t, "block_until_ready") else t,
                     jax.tree.leaves(res)[-1] if jax.tree.leaves(res) else res)
        dt = (time.perf_counter() - t0) / iters * 1000
        n_params = sum(int(p.size) for p in jax.tree.leaves(params.get(name, {})))
        if spec.n > 1:
            n_params = sum(
                int(p.size)
                for j in range(spec.n)
                for p in jax.tree.leaves(params.get(f"{name}_{j}", {}))
            )
        shape = jax.tree.leaves(res)[0].shape if jax.tree.leaves(res) else None
        rows.append({"i": spec.i, "module": spec.name, "ms": round(dt, 3), "params": n_params, "out": shape})
        out = res
        if spec.i in model.save:
            y[spec.i] = out
        if verbose:
            print(f"{spec.i:>3} {spec.name:<16} {dt:8.3f} ms {n_params:>10,} {shape}")
    return rows


def check_train_batch_size(model, imgsz: int = 640, amp: bool = True, batch: float = -1,
                           max_num_obj: int = 1) -> int:
    """Reference utils/autobatch.py:14 entry name: fit the batch size to
    device memory via profiled forwards (delegates to autobatch)."""
    return autobatch(model, imgsz=imgsz)
