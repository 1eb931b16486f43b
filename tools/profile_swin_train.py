"""Swin kernel train-path attribution on the real chip.

Measures, at the flagship shape (bs128, 42x42 padded, C=256, 2 heads),
the marginal per-op cost of:

  fwd_fast    fused_swin_block(fast=True)        (inference kernel)
  fwd_exact   fused_swin_block(fast=False)       (train fwd, what _fused_ad_fwd runs)
  fwd_xla     swin_block_reference               (XLA oracle)
  ad_fwdbwd   value_and_grad(sum(fused_swin_block_ad))  (train fwd + Pallas bwd)
  xla_fwdbwd  value_and_grad(sum(swin_block_reference)) (XLA fwd+bwd)

Method: tools/microbench.chain_time (two-point chained fori_loop — the
~34 ms fixed tunnel overhead cancels).

Usage: python tools/profile_swin_train.py [batch=N]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tools.microbench import chain_time

BATCH = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("batch=")), 128)
HP = WP = 42  # 40x40 P4 map padded to ws=7 multiple
C = 256
HEADS = 2
WS = 7


def main():
    from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
        fused_swin_block,
        fused_swin_block_ad,
        swin_block_reference,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, HP, WP, C)).astype(np.float32), jnp.bfloat16)
    p = {
        "ln1_scale": jnp.ones((C,), jnp.float32),
        "ln1_bias": jnp.zeros((C,), jnp.float32),
        "wqkv": jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * 0.02),
        "bqkv": jnp.zeros((3 * C,), jnp.float32),
        "wout": jnp.asarray(rng.standard_normal((C, C)).astype(np.float32) * 0.02),
        "bout": jnp.zeros((C,), jnp.float32),
        "ln2_scale": jnp.ones((C,), jnp.float32),
        "ln2_bias": jnp.zeros((C,), jnp.float32),
        "w1": jnp.asarray(rng.standard_normal((C, 4 * C)).astype(np.float32) * 0.02),
        "b1": jnp.zeros((4 * C,), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((4 * C, C)).astype(np.float32) * 0.02),
        "b2": jnp.zeros((C,), jnp.float32),
    }

    variants = {
        "fwd_fast": lambda t: fused_swin_block(t, p, HEADS, WS, fast=True),
        "fwd_exact": lambda t: fused_swin_block(t, p, HEADS, WS, fast=False),
        "fwd_xla": lambda t: swin_block_reference(t, p, HEADS, WS),
    }

    def ad_fwdbwd(t):
        def f(z):
            return jnp.sum(fused_swin_block_ad(z, p, HEADS, WS).astype(jnp.float32))

        l, g = jax.value_and_grad(f)(t)
        return g + l.astype(t.dtype) * 1e-30

    def xla_fwdbwd(t):
        def f(z):
            return jnp.sum(swin_block_reference(z, p, HEADS, WS).astype(jnp.float32))

        l, g = jax.value_and_grad(f)(t)
        return g + l.astype(t.dtype) * 1e-30

    variants["ad_fwdbwd"] = ad_fwdbwd
    variants["xla_fwdbwd"] = xla_fwdbwd

    names = [a for a in sys.argv[1:] if a in variants] or list(variants)
    for name in names:
        t0 = time.perf_counter()
        ms = chain_time(variants[name], x)
        print(f"{name:>11}: {ms:7.2f} ms/op   (wall {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
