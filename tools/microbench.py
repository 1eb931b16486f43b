"""Honest on-chip microbenchmarking over the axon tunnel.

The tunnel adds a ~34 ms FIXED dispatch+fetch overhead per timed run
(measured r3), so "time one run of n chained iterations / n" inflates
per-op cost by ~34ms/n — at n=20 that is +1.7 ms/op, which is larger
than most ops being measured. The r2 ledger's CBAM (1.5 ms) and SPPF
(2.1 ms) attributions were exactly this artifact.

Method here: run the op chained through a fori_loop carry at TWO
iteration counts n1 < n2 and report (t2 - t1) / (n2 - n1). The fixed
overhead cancels; only marginal per-iteration cost remains. A scalar
reduction of the carry is fetched to host so timing covers completion,
not enqueue (the tunnel acks block_until_ready at enqueue).

Usage:
    from tools.microbench import chain_time
    ms = chain_time(lambda x: my_op(x), x0)        # ms per op
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _runner(fn, n):
    @jax.jit
    def run(x):
        def body(_, c):
            y = fn(c)
            # keep the carry shape stable; fall back to input if fn changes it
            return y if y.shape == c.shape and y.dtype == c.dtype else c * 0 + jnp.mean(y).astype(c.dtype)

        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(out.astype(jnp.float32))

    return run


def chain_time(fn, x0, n1: int = 10, n2: int = 60, reps: int = 3) -> float:
    """Marginal ms per op, fixed dispatch overhead cancelled."""
    times = {}
    for n in (n1, n2):
        run = _runner(fn, n)
        float(run(x0))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t)
        times[n] = best
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3


def fixed_overhead(fn, x0, n1: int = 10, n2: int = 60) -> float:
    """Estimated fixed ms per dispatched run (tunnel RTT + host work)."""
    per = chain_time(fn, x0, n1, n2)
    run = _runner(fn, n1)
    float(run(x0))
    t = time.perf_counter()
    float(run(x0))
    total = (time.perf_counter() - t) * 1e3
    return total - per * n1


if __name__ == "__main__":
    x = jnp.ones((128, 20, 20, 512), jnp.bfloat16)
    op = lambda t: t * 1.0001  # noqa: E731
    print(f"copy-ish op: {chain_time(op, x):.4f} ms/op, fixed {fixed_overhead(op, x):.1f} ms")
