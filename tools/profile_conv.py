"""Per-layer conv-chain attribution on the real chip.

Measures the production per-layer inference chains at the v8s backbone's
representative shapes (bs128) and compares against the v5e rooflines
(197 TFLOP/s bf16 MXU, 394 TOP/s int8, ~819 GB/s HBM):

  bf16   conv(bf16) + folded-BN bias + SiLU          (utils/fuse.py path)
  int8   q8(x) -> conv(int8->int32) -> dequant*scale + bias -> SiLU
         (nn/modules.py Conv int8 branch, ops/quant.py scales)

The gap between measured and roofline bounds what a fused Pallas conv
kernel (int8 in -> int8 out epilogue, no int32/bf16 HBM round-trips)
could recover.

Usage: python tools/profile_conv.py [p2 p3 p4 p5] [k=3] [batch=N]
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

SHAPES = {"p2": (160, 64), "p3": (80, 128), "p4": (40, 256), "p5": (20, 512)}
ARGS = sys.argv[1:]
WHICH = [a for a in ARGS if a in SHAPES] or list(SHAPES)
K = next((int(a.split("=")[1]) for a in ARGS if a.startswith("k=")), 3)
BATCH = next((int(a.split("=")[1]) for a in ARGS if a.startswith("batch=")), 128)

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM_BPS = 819e9


def silu(x):
    return x * jax.nn.sigmoid(x)


def main():
    rng = np.random.default_rng(0)
    for name in WHICH:
        hw, c = SHAPES[name]
        pad = K // 2
        x0 = jnp.asarray(rng.normal(0, 1, (BATCH, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (K, K, c, c)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
        ws = jnp.abs(w).max(axis=(0, 1, 2)) / 127.0
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        wb = w.astype(jnp.bfloat16)
        xs = jnp.float32(3.0 / 127.0)

        def bf16_chain(x):
            y = jax.lax.conv_general_dilated(
                x, wb, (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return silu(y + bias).astype(jnp.bfloat16)

        def int8_chain(x):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (xs * ws) + bias
            return silu(y).astype(jnp.bfloat16)

        flops = 2 * BATCH * hw * hw * c * c * K * K
        act_bytes = BATCH * hw * hw * c  # one tensor's element count
        # minimal traffic: read input + write output in the stored dtype
        t_bf = chain_time(bf16_chain, x0)
        t_i8 = chain_time(int8_chain, x0)
        roof_bf = max(flops / PEAK_BF16, 2 * 2 * act_bytes / HBM_BPS) * 1e3
        roof_i8 = max(flops / PEAK_INT8, 2 * 2 * act_bytes / HBM_BPS) * 1e3
        # fused ideal: int8 in, int8 out
        roof_i8_fused = max(flops / PEAK_INT8, 2 * 1 * act_bytes / HBM_BPS) * 1e3
        print(
            f"{name} {hw}x{hw}x{c} k{K}: bf16 {t_bf:6.2f} ms (roof {roof_bf:5.2f}, "
            f"{100 * roof_bf / max(t_bf, 1e-9):3.0f}%) | int8 {t_i8:6.2f} ms "
            f"(roof {roof_i8:5.2f}, {100 * roof_i8 / max(t_i8, 1e-9):3.0f}%; "
            f"fused-ideal {roof_i8_fused:5.2f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
