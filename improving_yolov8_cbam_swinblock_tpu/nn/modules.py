"""TPU-native NN building blocks (flax.linen, NHWC).

Re-designed equivalents of the reference torch modules
(/root/reference/ultralytics/nn/modules/{conv,block,head,cbam,swin_block}.py):
same math, same parameter structure where it matters for weight porting,
but channel-last layout throughout (TPU-native), shape-inferred input
channels (which makes the reference's "lazy" CBAM channels trivial), and
a functional Detect decode that XLA constant-folds anchors for.

Conventions:
  * activations NHWC, conv kernels HWIO;
  * every block takes (x, train=False); `train` only gates BatchNorm;
  * `dtype` is the compute dtype (bf16 for TPU speed), params stay fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.anchors import dfl_decode, dist2bbox, make_anchors

# torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform with
# variance (1/3)/fan_in. Matching the scale keeps from-scratch training
# dynamics comparable to the reference.
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def autopad(k, p=None, d: int = 1):
    """'same'-shape padding; k may be int or (kh, kw) (reference conv.py:28)."""
    if isinstance(k, (tuple, list)):
        return tuple(autopad(x, p, d) for x in k)
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def silu(x):
    return x * jax.nn.sigmoid(x)


class Conv(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU (reference conv.py:37-93).

    BN uses the reference's tuned eps=1e-3 / torch-momentum=0.03
    (reference torch_utils.py:468-470).
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k if isinstance(self.k, (tuple, list)) else (self.k, self.k)
        pad = autopad(k, self.p, self.d)
        # int8 PTQ calibration pass: record the input absmax
        # (ops/quant.py drives apply(..., mutable=["calib"]))
        if self.is_mutable_collection("calib") and not self.is_initializing():
            amax = self.variable("calib", "x_amax", lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(amax.value, jnp.abs(x.astype(jnp.float32)).max())
        if self.g == 1 and not train and self.has_variable("quant", "x_scale"):
            # int8 inference: per-tensor activation scale (calibrated) +
            # per-output-channel weight scales; the MXU runs int8 x int8 ->
            # int32 at 2x the bf16 rate on v5e (ops/quant.py builds these)
            xs = self.get_variable("quant", "x_scale")
            ws = self.get_variable("quant", "w_scale")
            wq = self.get_variable("quant", "w_int8")
            # NOTE (r4): a fused Pallas quantize+GEMM+SiLU kernel beats this
            # XLA chain 1.3-1.8x in per-layer microbenches on the C2f cv2
            # merge shapes, but loses ~5-20% WHOLE-MODEL when wired in: the
            # pallas_call boundary forces the producer concat to materialize
            # bf16 and breaks XLA's concat->quantize fusion. XLA's int8
            # convs are at their practical roofline — see the CLAUDE.md
            # perf ledger (r4) and tools/profile_conv.py before retrying.
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, wq, (self.s, self.s), [(pad[0], pad[0]), (pad[1], pad[1])],
                rhs_dilation=(self.d, self.d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            x = y.astype(jnp.float32) * (xs * ws)
        else:
            x = nn.Conv(
                features=self.c2,
                kernel_size=tuple(k),
                strides=(self.s, self.s),
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=False,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        if not train and self.has_variable("fused", "bias"):
            # BN folded into the kernel (utils/fuse.py fuse_variables —
            # reference fuse_conv_and_bn, torch_utils.py:467): just add
            # the folded bias in the compute dtype so XLA folds it into
            # the conv epilogue (an f32 upcast here doubles HBM traffic)
            x = x + self.get_variable("fused", "bias").astype(x.dtype)
        else:
            # f32 BN affine: measured perf-neutral vs bf16 compute dtype
            # (364 vs 368 img/s train — XLA fuses the affine either way),
            # so keep the extra precision
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="bn",
            )(x)
        x = x.astype(self.dtype)
        if self.act is True:
            return silu(x)
        if self.act == "relu":
            return jax.nn.relu(x)
        return x


class DWConv(nn.Module):
    """Depth-wise Conv: groups = gcd(c1, c2) (reference conv.py:240)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Union[bool, str] = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, d=self.d, act=self.act, dtype=self.dtype, name="dw")(x, train)


class Concat(nn.Module):
    """Concatenate a list of NHWC tensors along channels (reference conv.py:655)."""

    dtype: Any = jnp.float32

    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        return jnp.concatenate(list(xs), axis=-1)


class Upsample(nn.Module):
    """Nearest-neighbor integer upsample (torch nn.Upsample equivalent)."""

    scale: int = 2
    dtype: Any = jnp.float32

    def __call__(self, x, train: bool = False):
        s = self.scale
        return jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)


class Bottleneck(nn.Module):
    """Two convs + optional residual (reference block.py:475-488)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f(nn.Module):
    """CSP bottleneck, v8 workhorse (reference block.py:279-311)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(ys[-1], train)
            )
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py:314-339)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[int, int] = ((1, 1), (3, 3))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, k=self.k, e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class C3k(nn.Module):
    """C3 with custom kernel size (reference block.py:1110-1130)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    kk: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return C3(
            self.c2, self.n, self.shortcut, self.g, self.e, k=((self.kk, self.kk), (self.kk, self.kk)),
            dtype=self.dtype, name="c3",
        )(x, train)


class C3k2(nn.Module):
    """YOLO11 CSP block: C2f whose inner blocks are C3k or Bottleneck
    (reference block.py:1088-1108)."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m_{i}")
            else:
                m = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, dtype=self.dtype, name=f"m_{i}")
            ys.append(m(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


def _maxpool_same(x, k: int):
    """k x k stride-1 max pool with 'same' padding (torch MaxPool2d(k,1,k//2)).

    SEPARABLE: max is associative, so k x 1 then 1 x k equals the k x k
    window exactly (parity 0.0 verified) while touching 2k values per
    output instead of k². Measured neutral at SPPF's 20x20 maps on v5e
    (the block is conv-bound there) but scales better with window area
    for large feature maps / imgsz."""
    pad = k // 2
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    x = jax.lax.reduce_window(
        x, init, jax.lax.max, (1, k, 1, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (0, 0), (0, 0)],
    )
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, 1, k, 1), (1, 1, 1, 1),
        [(0, 0), (0, 0), (pad, pad), (0, 0)],
    )


class SPPF(nn.Module):
    """Spatial pyramid pooling - fast (reference block.py:201-227).

    Three chained k-pools == SPP(k, 2k-1, 3k-2) but cheaper; on TPU the
    chain also keeps the working set in VMEM.
    """

    c2: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for _ in range(3):
            ys.append(_maxpool_same(ys[-1], self.k))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling (reference block.py:229+)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y] + [_maxpool_same(y, k) for k in self.k]
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


# ---------------------------------------------------------------------------
# Fork custom modules: CBAM + SwinBlock
# ---------------------------------------------------------------------------


class ChannelAttention(nn.Module):
    """avg+max pool -> shared 1x1 MLP -> sum -> sigmoid gate.

    Matches the fork's lazy-channel version (reference cbam.py:5-38):
    flax shape inference gives us the "lazy" MLP creation for free — the
    MLP width derives from the runtime channel count at init.
    """

    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        reduced = max(1, c // self.ratio)
        avg = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        mx = x.max(axis=(1, 2), keepdims=True)
        fc1 = nn.Conv(reduced, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="fc2")
        out = fc2(jax.nn.relu(fc1(avg))) + fc2(jax.nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)


class SpatialAttention(nn.Module):
    """channel mean&max -> concat -> kxk conv -> sigmoid gate
    (reference cbam.py:40-53)."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size in (3, 7)
        pad = 3 if self.kernel_size == 7 else 1
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = nn.Conv(
            1,
            (self.kernel_size, self.kernel_size),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(y)
        return jax.nn.sigmoid(y)


class CBAM(nn.Module):
    """x = x * CA(x); x = x * SA(x) (reference cbam.py:55-71).

    The fork's YAML instantiates `CBAM, []` (channels=None) so the ratio
    heuristic always resolves to 16 (cbam.py:59: `channels and
    channels < 128` is falsy for None).
    """

    channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ratio = 8 if (self.channels is not None and self.channels < 128) else 16
        x = x * ChannelAttention(ratio=ratio, dtype=self.dtype, name="ca")(x, train)
        x = x * SpatialAttention(kernel_size=7, dtype=self.dtype, name="sa")(x, train)
        return x


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nW, ws*ws, C) (reference swin_block.py:8-13)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B * nW, ws*ws, C) -> (B, H, W, C) (reference swin_block.py:15-20)."""
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowMHSA(nn.Module):
    """Multi-head self-attention over windows, matching torch
    nn.MultiheadAttention semantics (packed qkv in-projection + out
    projection, both biased) so reference weights port 1:1."""

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (N, L, C)
        c = x.shape[-1]
        hd = c // self.num_heads
        # packed in-projection, torch layout: weight (3C, C) -> ours (C, 3C)
        qkv = nn.Dense(
            3 * c,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name="in_proj",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            n, l, _ = t.shape
            return t.reshape(n, l, self.num_heads, hd).transpose(0, 2, 1, 3)  # (N, h, L, hd)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhlm,nhmd->nhld", attn, v)
        n, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(n, l, c)
        return nn.Dense(c, kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype, name="out_proj")(out)


class _LNParams(nn.Module):
    """Param-only LayerNorm shell (names match nn.LayerNorm)."""

    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,))
        return s, b


class _DenseParams(nn.Module):
    """Param-only Dense shell (names match nn.Dense)."""

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_dim: int):
        k = self.param("kernel", self.kernel_init, (in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _AttnParams(nn.Module):
    """Param shell matching WindowMHSA's tree (attn/in_proj, attn/out_proj)."""

    @nn.compact
    def __call__(self, dim: int):
        wqkv, bqkv = _DenseParams(3 * dim, nn.initializers.xavier_uniform(), name="in_proj")(dim)
        wout, bout = _DenseParams(dim, nn.initializers.xavier_uniform(), name="out_proj")(dim)
        return wqkv, bqkv, wout, bout


class SwinBlock(nn.Module):
    """Window MHSA + MLP block (reference swin_block.py:23-60).

    Faithfully reproduces the fork's quirks: plain (non-shifted) windows,
    no relative position bias, LN eps 1e-5 (torch default), and the
    residual taken from the *normed* windows (swin_block.py:51-53).
    `dim` from YAML is advisory — the true dim is the runtime channel
    count (shape inference), which makes all width scales work where the
    reference only worked when YAML dim matched the scaled channels.

    Execution: on TPU the whole block runs as one fused Pallas kernel
    (ops/pallas/swin_kernel.py) — partition/reverse become in-VMEM
    reshapes instead of HBM layout copies (~23% of step time in the XLA
    lowering). Training uses the differentiable wrapper
    (fused_swin_block_ad: custom_vjp with a fused backward band kernel);
    non-TPU backends use the identical pure-jnp math.
    """

    dim: Optional[int] = None
    num_heads: int = 2
    window_size: int = 7
    use_pallas: Optional[bool] = None  # None = auto (TPU & inference)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, H, W, C) NHWC
        from ..ops.pallas.swin_kernel import (
            fused_swin_block,
            fused_swin_block_ad,
            fused_swin_block_int8,
            swin_block_reference,
            swin_gemm_absmax,
        )

        b, h, w, c = x.shape
        ws = self.window_size
        ln1s, ln1b = _LNParams(name="norm1")(c)
        wqkv, bqkv, wout, bout = _AttnParams(name="attn")(c)
        ln2s, ln2b = _LNParams(name="norm2")(c)
        w1, b1 = _DenseParams(4 * c, name="mlp_fc1")(c)
        w2, b2 = _DenseParams(c, name="mlp_fc2")(4 * c)
        p = {
            "ln1_scale": ln1s, "ln1_bias": ln1b,
            "wqkv": wqkv, "bqkv": bqkv, "wout": wout, "bout": bout,
            "ln2_scale": ln2s, "ln2_bias": ln2b,
            "w1": w1, "b1": b1, "w2": w2, "b2": b2,
        }

        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))

        x = x.astype(self.dtype)
        use_pallas = self.use_pallas
        if use_pallas is None:
            # head_dim must be a lane multiple (128): Mosaic rejects the
            # kernel's head-split reshape below that ("unsupported shape
            # cast", verified on v5e at hd=64) — n-scale 128-ch Swin falls
            # back to the XLA path
            use_pallas = (
                jax.default_backend() == "tpu"
                and c % self.num_heads == 0
                and (c // self.num_heads) % 128 == 0
            )
        # int8 PTQ calibration: record the four GEMM inputs' absmax
        # (ops/quant.py drives apply(..., mutable=["calib"]) — same
        # scheme as Conv above; quantities computed by the jnp mirror)
        calibrating = self.is_mutable_collection("calib") and not self.is_initializing()
        if calibrating:
            am = swin_gemm_absmax(x, p, num_heads=self.num_heads, window_size=ws)
            # block input absmax too: enables int8-staged kernel I/O
            am["xin"] = jnp.abs(x.astype(jnp.float32)).max()
            for key, val in am.items():
                var = self.variable("calib", f"{key}_amax", lambda: jnp.zeros((), jnp.float32))
                var.value = jnp.maximum(var.value, val)
        if (
            use_pallas and not train
            and self.has_variable("quant", "qkv_w_int8")
        ):
            # calibrated int8 GEMM path: 2x MXU rate on the block's four
            # matmuls (ops/quant.py builds the quant entries)
            q = {k: self.get_variable("quant", k) for k in self._qnames()}
            if self.has_variable("quant", "x_in_scale") and self.has_variable("quant", "y_out_scale"):
                # int8-staged HBM I/O: quantize fuses into the pad above
                # (producer side) and the dequant into the crop/consumer —
                # the kernel's DMA slab halves (r5: 4.76 -> 4.17 ms/block)
                s_in = self.get_variable("quant", "x_in_scale")
                s_out = self.get_variable("quant", "y_out_scale")
                q = {**q, "x_in_scale": s_in, "y_out_scale": s_out}
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127).astype(jnp.int8)
                y8 = fused_swin_block_int8(xq, p, q, num_heads=self.num_heads, window_size=ws,
                                           in8=True, out8=True)
                y = y8.astype(self.dtype) * s_out.astype(self.dtype)
            else:
                y = fused_swin_block_int8(x, p, q, num_heads=self.num_heads, window_size=ws)
        elif use_pallas and train:
            y = fused_swin_block_ad(x, p, self.num_heads, ws)
        elif use_pallas:
            y = fused_swin_block(x, p, num_heads=self.num_heads, window_size=ws)
        else:
            y = swin_block_reference(x, p, num_heads=self.num_heads, window_size=ws)
        if calibrating:
            # block output absmax (int8-staged kernel output scale)
            var = self.variable("calib", "yout_amax", lambda: jnp.zeros((), jnp.float32))
            var.value = jnp.maximum(var.value, jnp.abs(y.astype(jnp.float32)).max())
        return y[:, :h, :w, :]

    @staticmethod
    def _qnames():
        return [
            f"{k}_{suffix}"
            for k in ("qkv", "out", "fc1", "fc2")
            for suffix in ("w_int8", "w_scale", "x_scale")
        ]


# ---------------------------------------------------------------------------
# YOLO11 attention blocks
# ---------------------------------------------------------------------------


class Attention(nn.Module):
    """Position-sensitive attention (reference block.py:1278-1339)."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # NHWC
        b, h, w, c = x.shape
        n = h * w
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        scale = key_dim**-0.5
        nh_kd = key_dim * self.num_heads
        hh = self.dim + nh_kd * 2
        qkv = Conv(hh, 1, act=False, dtype=self.dtype, name="qkv")(x, train)  # (B,H,W,hh)
        # torch view(B, nh, kd*2+hd, N): channel-major per head -> NHWC equiv:
        qkv = qkv.reshape(b, n, self.num_heads, key_dim * 2 + head_dim)
        q = qkv[..., :key_dim]  # (B,N,nh,kd)
        k = qkv[..., key_dim : 2 * key_dim]
        v = qkv[..., 2 * key_dim :]  # (B,N,nh,hd)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h, w, self.dim)
        pe = Conv(self.dim, 3, 1, g=self.dim, act=False, dtype=self.dtype, name="pe")(
            v.reshape(b, h, w, self.dim), train
        )
        out = out + pe
        return Conv(self.dim, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class PSABlock(nn.Module):
    """Attention + FFN with shortcuts (reference block.py:1341-1392)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Attention(self.c, self.num_heads, self.attn_ratio, dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn_0")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """Position-sensitive attention CSP wrapper (reference block.py:1394-1450)."""

    c2: int
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = b + Attention(c, num_heads=c // 64, attn_ratio=0.5, dtype=self.dtype, name="attn")(b, train)
        f = Conv(c * 2, 1, dtype=self.dtype, name="ffn_0")(b, train)
        f = Conv(c, 1, act=False, dtype=self.dtype, name="ffn_1")(f, train)
        b = b + f
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2PSA(nn.Module):
    """Stacked PSABlocks in a CSP wrapper (reference block.py:1452-1513)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, attn_ratio=0.5, num_heads=max(1, c // 64), dtype=self.dtype, name=f"m_{i}")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C2fPSA(nn.Module):
    """C2f-structured stack of PSABlocks (reference block.py:1510-1548:
    chunk-2 then append n PSABlock outputs, concat (2+n)·c into cv2;
    requires c1 == c2 like the reference assert)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(PSABlock(c, attn_ratio=0.5, num_heads=max(1, c // 64), dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


# ---------------------------------------------------------------------------
# Detect head
# ---------------------------------------------------------------------------


class Detect(nn.Module):
    """YOLO anchor-free detect head (reference head.py:23-183).

    Training: returns the list of per-level raw maps (B, H, W, 4*reg_max+nc).
    Inference: returns (B, 4+nc, A) decoded boxes (xywh in input pixels)
    concat class sigmoids — the reference's output contract — plus the raw
    maps. Anchors are recomputed per trace; with static shapes XLA folds
    them into constants, replacing the reference's shape-keyed cache
    (head.py:116-118).
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = True
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False, angle=None):
        nl = len(self.ch)
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))

        def box_bias_init(key, shape, dtype=jnp.float32):
            return jnp.ones(shape, dtype)  # reference head.py:150

        feats = []
        for i, x in enumerate(xs):
            # box branch
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(
                4 * self.reg_max, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                bias_init=box_bias_init, dtype=self.dtype, name=f"cv2_{i}_2",
            )(b)
            # cls branch
            s = float(self.strides[i])
            cls_prior = math.log(5 / self.nc / (640 / s) ** 2)  # reference head.py:151

            def cls_bias_init(key, shape, dtype=jnp.float32, prior=cls_prior):
                return jnp.full(shape, prior, dtype)

            if self.legacy:
                c = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
                c = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            else:
                c = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(c, train)
                c = DWConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(c, train)
                c = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(c, train)
            c = nn.Conv(
                self.nc, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                bias_init=cls_bias_init, dtype=self.dtype, name=f"cv3_{i}_2",
            )(c)
            feats.append(jnp.concatenate([b, c], axis=-1))  # (B,H,W,no)

        if train:
            return feats
        return self._inference(feats, angle), feats

    def _inference(self, feats, angle=None):
        """Decode: DFL integral -> dist2bbox * stride, concat cls sigmoid.

        With `angle` (B, A, 1) the box decode is rotated — dist2rbox with
        the OBB head's angle branch, matching the training-time decode
        (reference OBB head overrides decode_bboxes to dist2rbox,
        head.py OBB.forward + tal.py:397)."""
        b = feats[0].shape[0]
        no = 4 * self.reg_max + self.nc
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        x_cat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)  # (B, A, no)
        box, cls = x_cat[..., : 4 * self.reg_max], x_cat[..., 4 * self.reg_max :]
        anchors, strides = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        dist = dfl_decode(box.astype(jnp.float32), self.reg_max)  # (B, A, 4)
        if angle is not None:
            from ..ops.rotated import dist2rbox

            dbox = dist2rbox(dist, angle.astype(jnp.float32), anchors[None]) * strides[None]
        else:
            dbox = dist2bbox(dist, anchors[None], xywh=True, axis=-1) * strides[None]
        out = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)  # (B, A, 4+nc)
        return out.transpose(0, 2, 1)  # (B, 4+nc, A) — reference contract
