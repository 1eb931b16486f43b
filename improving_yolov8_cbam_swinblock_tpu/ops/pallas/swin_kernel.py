"""Fused SwinBlock Pallas kernel.

The XLA lowering of the SwinBlock (window partition -> LN -> MHSA ->
residual -> LN -> MLP -> residual -> window reverse) spends ~23% of the
whole detector's step time in layout copies: the 6-D partition/reverse
transposes each round-trip the full (B, H, W, C) activation through HBM,
and the fp32 LayerNorms add more full-tensor traffic (measured with
jax.profiler on v5e, see commit history).

This kernel performs the ENTIRE block in VMEM per (batch row-band):
one HBM read of the input slab and one write of the output — the
partition/reverse become register reshapes, the LNs never touch HBM,
and the MLP matmuls run back-to-back on the MXU.

Grid: (B, Hp // ws). Each program handles a (ws, Wp, C) band = one row
of windows. All weights live in VMEM (constant index_map — Mosaic skips
re-fetch across sequential grid steps).

Numerics: LN statistics and attention softmax in fp32; matmuls bf16
with fp32 accumulation (preferred_element_type) — same islands as the
XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf for Mosaic (no erf primitive): Abramowitz-Stegun 7.1.26
    polynomial, |err| <= 1.5e-7 — far below bf16 resolution."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x32, scale, bias, eps=1e-5):
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _swin_band_kernel(
    x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, ws: int, num_heads: int,
):
    x = x_ref[0]  # (ws, Wp, C)
    wp, c = x.shape[1], x.shape[2]
    nw = wp // ws
    hd = c // num_heads
    n_tok = nw * ws * ws

    # window partition: (ws, nw, ws, C) -> (nw, ws, ws, C) -> (nw*ws*ws, C)
    xw = x.reshape(ws, nw, ws, c).transpose(1, 0, 2, 3).reshape(n_tok, c)

    # pre-LN (fp32) — residuals branch from the NORMED tokens, faithfully
    # reproducing the reference quirk (swin_block.py:51-53)
    xn32 = _ln(xw.astype(jnp.float32), ln1s_ref[:], ln1b_ref[:])
    xn = xn32.astype(x.dtype)

    qkv = (
        jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    )  # (n_tok, 3C) fp32
    l = ws * ws
    # merge (window, head) into ONE batch dim — Mosaic tpu.matmul supports
    # a single batch dimension
    qkv = qkv.astype(x.dtype).reshape(nw, l, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3).reshape(nw * num_heads, l, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3).reshape(nw * num_heads, l, hd)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3).reshape(nw * num_heads, l, hd)

    scale = 1.0 / (hd**0.5)
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (nw*nh, L, L)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jax.lax.dot_general(
        attn, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (nw*nh, L, hd)
    out = out.astype(x.dtype).reshape(nw, num_heads, l, hd).transpose(0, 2, 1, 3).reshape(n_tok, c)
    out = jnp.dot(out, wout_ref[:], preferred_element_type=jnp.float32) + bout_ref[:]

    y1 = xn32 + out  # fp32 residual stream
    y1n = _ln(y1, ln2s_ref[:], ln2b_ref[:]).astype(x.dtype)
    pre = jnp.dot(y1n, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = 0.5 * pre * (1.0 + _erf(pre * (2.0**-0.5)))  # exact GELU, fp32
    h = h.astype(x.dtype)
    y = y1 + jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]

    # window reverse
    yb = y.astype(x.dtype).reshape(nw, ws, ws, c).transpose(1, 0, 2, 3).reshape(ws, wp, c)
    o_ref[0] = yb


@partial(jax.jit, static_argnames=("num_heads", "window_size"))
def fused_swin_block(x: jnp.ndarray, p: dict, num_heads: int = 2, window_size: int = 7) -> jnp.ndarray:
    """Apply the full SwinBlock to pre-padded x (B, Hp, Wp, C);
    Hp, Wp must be multiples of window_size.

    p: dict with ln1_scale, ln1_bias, wqkv (C,3C), bqkv, wout (C,C), bout,
       ln2_scale, ln2_bias, w1 (C,4C), b1, w2 (4C,C), b2.
    """
    b, hp, wp, c = x.shape
    ws = window_size
    assert hp % ws == 0 and wp % ws == 0

    dtype = x.dtype
    weights = [
        p["ln1_scale"].astype(jnp.float32),
        p["ln1_bias"].astype(jnp.float32),
        p["wqkv"].astype(dtype),
        p["bqkv"].astype(jnp.float32),
        p["wout"].astype(dtype),
        p["bout"].astype(jnp.float32),
        p["ln2_scale"].astype(jnp.float32),
        p["ln2_bias"].astype(jnp.float32),
        p["w1"].astype(dtype),
        p["b1"].astype(jnp.float32),
        p["w2"].astype(dtype),
        p["b2"].astype(jnp.float32),
    ]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    kernel = partial(_swin_band_kernel, ws=ws, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        grid=(b, hp // ws),
        in_specs=[
            pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, ws, wp, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )(x, *weights)


def swin_block_reference(x: jnp.ndarray, p: dict, num_heads: int = 2, window_size: int = 7) -> jnp.ndarray:
    """Pure-jnp mirror of the kernel math (XLA path / parity oracle)."""
    b, hp, wp, c = x.shape
    ws = window_size
    nwh, nww = hp // ws, wp // ws
    hd = c // num_heads
    xw = (
        x.reshape(b, nwh, ws, nww, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    )
    xn32 = _ln(xw.astype(jnp.float32), p["ln1_scale"].astype(jnp.float32), p["ln1_bias"].astype(jnp.float32))
    xn = xn32.astype(x.dtype)
    n, l, _ = xn.shape
    qkv = jnp.einsum("nlc,cd->nld", xn, p["wqkv"].astype(x.dtype), preferred_element_type=jnp.float32) + p[
        "bqkv"
    ].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(n, l, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    attn = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) / (hd**0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhlm,nhmd->nhld", attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(n, l, c)
    out = jnp.einsum("nlc,cd->nld", out, p["wout"].astype(x.dtype), preferred_element_type=jnp.float32) + p[
        "bout"
    ].astype(jnp.float32)
    y1 = xn32 + out
    y1n = _ln(y1, p["ln2_scale"].astype(jnp.float32), p["ln2_bias"].astype(jnp.float32)).astype(x.dtype)
    h = jnp.einsum("nlc,cd->nld", y1n, p["w1"].astype(x.dtype), preferred_element_type=jnp.float32) + p[
        "b1"
    ].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=False).astype(x.dtype)
    y = y1 + (
        jnp.einsum("nld,dc->nlc", h, p["w2"].astype(x.dtype), preferred_element_type=jnp.float32)
        + p["b2"].astype(jnp.float32)
    )
    y = y.astype(x.dtype).reshape(b, nwh, nww, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return y
