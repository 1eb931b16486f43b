"""Swin kernel experiments for VERDICT r5 item #4: attack the non-matmul
floor of the fused int8 SwinBlock kernel (r3 stage split: I/O+LN 0.8 ms,
attention 1.4 ms, MLP 1.4 ms, qkv/wout 0.8 ms; whole kernel 4.34 ms at
bs128 640px dim256).

Variants (self-contained copies — winners get merged into
ops/pallas/swin_kernel.py):

  base        current fused_swin_block_int8
  io8         int8-staged HBM input AND output (halves the grid DMA bytes;
              dequant/requant on the VMEM slab, per-tensor scales)
  io8in       int8 input only (output stays bf16)
  sm16        softmax exp/normalize in bf16 (fp32 max-subtract)

Usage: python tools/bench_swin_variants.py [batch=N] [variants...]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
    _QKEYS,
    _ln,
    fused_swin_block_int8,
)

BATCH = next((int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("batch=")), 128)
ARGS = [a for a in sys.argv[1:] if "=" not in a]
H = W = 40  # P4 level at 640px
C = 256
WS = 7
HEADS = 2


# ---------------------------------------------------------------------------
# experimental kernel: int8-staged I/O (+ optional bf16 softmax)
# ---------------------------------------------------------------------------
def _swin_int8_io_kernel(
    x_ref, ln1s_ref, ln1b_ref, bqkv_ref, bout_ref, ln2s_ref, ln2b_ref, b1_ref, b2_ref,
    wqkv_q_ref, wout_q_ref, w1_q_ref, w2_q_ref,
    wqkv_s_ref, wout_s_ref, w1_s_ref, w2_s_ref, xs_ref, o_ref,
    *, ws: int, wp: int, num_heads: int, in8: bool, out8: bool, sm16: bool,
):
    x = x_ref[0]
    t_tok, c = x.shape
    hd = c // num_heads
    f32 = jnp.float32
    xs = [xs_ref[i] for i in range(4)]
    x_in_scale, y_out_scale = xs_ref[4], xs_ref[5]

    def q8(t32, scale):
        return jnp.clip(jnp.round(t32 / scale), -127, 127).astype(jnp.int8)

    def gemm_i8(xq, w_ref, x_scale, ws_ref, b_ref):
        acc = jax.lax.dot_general(
            xq, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.astype(f32) * (x_scale * ws_ref[:]) + b_ref[:]

    x32 = (x.astype(f32) * x_in_scale) if in8 else x.astype(f32)
    cdt = jnp.bfloat16
    mean = x32.mean(-1, keepdims=True)
    rstd = jax.lax.rsqrt(((x32 - mean) ** 2).mean(-1, keepdims=True) + 1e-5)
    xn = ((x32 - mean) * rstd).astype(cdt) * ln1s_ref[:].astype(cdt) + ln1b_ref[:].astype(cdt)
    xn32 = xn.astype(f32)

    qkv = gemm_i8(q8(xn32, xs[0]), wqkv_q_ref, xs[0], wqkv_s_ref, bqkv_ref).astype(cdt)

    ii = jax.lax.broadcasted_iota(jnp.int32, (t_tok, t_tok), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (t_tok, t_tok), 1)
    same_win = ((ii % wp) // ws) == ((jj % wp) // ws)
    scale = 1.0 / (hd**0.5)
    outs = []
    for head in range(num_heads):
        q = qkv[:, head * hd:(head + 1) * hd]
        k = qkv[:, c + head * hd:c + (head + 1) * hd]
        v = qkv[:, 2 * c + head * hd:2 * c + (head + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * scale
        s = jnp.where(same_win, s, -1e30)
        if sm16:
            sb = (s - s.max(-1, keepdims=True)).astype(cdt)
            e = jnp.exp(sb)
            a = (e / e.sum(-1, keepdims=True).astype(cdt)).astype(cdt)
        else:
            a = jax.nn.softmax(s, axis=-1).astype(cdt)
        outs.append(jnp.dot(a, v, preferred_element_type=f32).astype(f32))
    o_tok32 = outs[0] if num_heads == 1 else jnp.concatenate(outs, axis=1)
    out32 = gemm_i8(q8(o_tok32, xs[1]), wout_q_ref, xs[1], wout_s_ref, bout_ref)

    y1 = xn32 + out32
    y1n32 = _ln(y1, ln2s_ref[:], ln2b_ref[:])
    pre = gemm_i8(q8(y1n32, xs[2]), w1_q_ref, xs[2], w1_s_ref, b1_ref)
    pb = pre.astype(cdt)
    h = 0.5 * pb * (1.0 + jnp.tanh(0.7978845608 * (pb + 0.044715 * pb * pb * pb)))
    y = y1 + gemm_i8(q8(h.astype(f32), xs[3]), w2_q_ref, xs[3], w2_s_ref, b2_ref)
    if out8:
        o_ref[0] = q8(y, y_out_scale)
    else:
        o_ref[0] = y.astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("num_heads", "window_size", "in8", "out8", "sm16"))
def swin_int8_io(x, p, q, num_heads=2, window_size=7, in8=False, out8=False, sm16=False):
    b, hp, wp, c = x.shape
    ws = window_size
    biases = [
        p["ln1_scale"].astype(jnp.float32), p["ln1_bias"].astype(jnp.float32),
        p["bqkv"].astype(jnp.float32), p["bout"].astype(jnp.float32),
        p["ln2_scale"].astype(jnp.float32), p["ln2_bias"].astype(jnp.float32),
        p["b1"].astype(jnp.float32), p["b2"].astype(jnp.float32),
    ]
    wqs = [jnp.asarray(q[f"{k}_w_int8"], jnp.int8) for k in _QKEYS]
    wss = [jnp.asarray(q[f"{k}_w_scale"], jnp.float32) for k in _QKEYS]
    xs = jnp.stack(
        [jnp.asarray(q[f"{k}_x_scale"], jnp.float32).reshape(()) for k in _QKEYS]
        + [jnp.asarray(q.get("x_in_scale", 1.0), jnp.float32).reshape(()),
           jnp.asarray(q.get("y_out_scale", 1.0), jnp.float32).reshape(())]
    )
    g = b * (hp // ws)
    t_tok = ws * wp
    xf = x.reshape(g, t_tok, c)
    operands = [*biases, *wqs, *wss, xs]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in operands[:-1]] + [
        pl.BlockSpec(memory_space=pltpu.SMEM)
    ]
    kernel = partial(_swin_int8_io_kernel, ws=ws, wp=wp, num_heads=num_heads,
                     in8=in8, out8=out8, sm16=sm16)
    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xf.shape, jnp.int8 if out8 else jnp.bfloat16),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, t_tok, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, t_tok, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(xf, *operands)
    return y.reshape(b, hp, wp, c)


def chain_time_dyn(fn, x0, n1=5, n2=25, reps=3):
    @jax.jit
    def run(n, x):
        def body(_, c):
            y = fn(c)
            return y

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    float(run(2, x0))
    times = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            float(run(n, x0))
            best = min(best, time.perf_counter() - t)
        times[n] = best
    return (times[n2] - times[n1]) / (n2 - n1) * 1e3


def main():
    rng = np.random.default_rng(0)
    hp = wp = ((H + WS - 1) // WS) * WS  # 42
    x = jnp.asarray(rng.normal(0, 1, (BATCH, hp, wp, C)).astype(np.float32)).astype(jnp.bfloat16)
    p = {
        "ln1_scale": jnp.ones(C), "ln1_bias": jnp.zeros(C),
        "bqkv": jnp.asarray(rng.normal(0, 0.02, 3 * C), jnp.float32),
        "bout": jnp.asarray(rng.normal(0, 0.02, C), jnp.float32),
        "ln2_scale": jnp.ones(C), "ln2_bias": jnp.zeros(C),
        "b1": jnp.asarray(rng.normal(0, 0.02, 4 * C), jnp.float32),
        "b2": jnp.asarray(rng.normal(0, 0.02, C), jnp.float32),
    }
    q = {}
    for k, (ci, co) in zip(_QKEYS, [(C, 3 * C), (C, C), (C, 4 * C), (4 * C, C)]):
        q[f"{k}_w_int8"] = jnp.asarray(rng.integers(-127, 128, (ci, co)), jnp.int8)
        q[f"{k}_w_scale"] = jnp.full((co,), 2e-3, jnp.float32)
        q[f"{k}_x_scale"] = jnp.float32(0.05)
    q["x_in_scale"] = jnp.float32(0.03)
    q["y_out_scale"] = jnp.float32(0.05)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / q["x_in_scale"]), -127, 127).astype(jnp.int8)

    variants = {
        "base": lambda c: fused_swin_block_int8(
            x.at[0, 0, 0, 0].add(c.astype(x.dtype)), p, q, HEADS, WS
        )[0, 0, 0, :1].astype(jnp.float32).reshape(()),
        "io8": lambda c: swin_int8_io(
            x8.at[0, 0, 0, 0].add(c.astype(jnp.int8)), p, q, HEADS, WS, in8=True, out8=True
        )[0, 0, 0, :1].astype(jnp.float32).reshape(()),
        "io8in": lambda c: swin_int8_io(
            x8.at[0, 0, 0, 0].add(c.astype(jnp.int8)), p, q, HEADS, WS, in8=True, out8=False
        )[0, 0, 0, :1].astype(jnp.float32).reshape(()),
        "sm16": lambda c: swin_int8_io(
            x.at[0, 0, 0, 0].add(c.astype(x.dtype)), p, q, HEADS, WS, sm16=True
        )[0, 0, 0, :1].astype(jnp.float32).reshape(()),
        "io8sm16": lambda c: swin_int8_io(
            x8.at[0, 0, 0, 0].add(c.astype(jnp.int8)), p, q, HEADS, WS, in8=True, out8=True, sm16=True
        )[0, 0, 0, :1].astype(jnp.float32).reshape(()),
    }
    sel = ARGS or list(variants)
    for name in sel:
        fn = variants[name]
        try:
            ms = chain_time_dyn(fn, jnp.float32(0.0))
            print(f"{name:>8}: {ms:7.3f} ms/block (bs{BATCH})", flush=True)
        except Exception as e:
            print(f"{name:>8}: ERROR {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
