"""Extended block library: v3/v5/v6/v9/v10-era modules.

Counterparts of reference nn/modules/{conv,block}.py beyond the v8/v11
core set (SURVEY.md §2.2): Focus, Ghost convs, RepConv (train-time
multi-branch; structural reparam happens at weight-fusion time), CSP
variants (C1/C2/C3x/C3Ghost/BottleneckCSP/RepC3), v9 ELAN/ADown/AConv/
SPPELAN/RepNCSPELAN4, v10 SCDown/CIB/C2fCIB/RepVGGDW.

All NHWC flax, same conventions as modules.py.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Bottleneck, C3, Conv, DWConv, _maxpool_same, autopad, conv_kernel_init


class Conv2(nn.Module):
    """Parallel 3x3 + 1x1 conv sharing one BN (reference conv.py:94-131).

    Fused at export by adding the padded 1x1 kernel into the 3x3.
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k)
        a = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s), [(pad, pad)] * 2,
                    feature_group_count=self.g, use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        b = nn.Conv(self.c2, (1, 1), (self.s, self.s), "VALID", feature_group_count=self.g,
                    use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="cv2")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="bn")(a + b).astype(self.dtype)
        return y * jax.nn.sigmoid(y)


class LightConv(nn.Module):
    """1x1 conv -> DW conv (reference conv.py:133-160)."""

    c2: int
    k: int = 1
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=self.act, dtype=self.dtype, name="conv2")(y, train)


class ConvTranspose(nn.Module):
    """ConvTranspose2d + BN + SiLU (reference conv.py:243-280)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    bn: bool = True
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.ConvTranspose(
            self.c2, (self.k, self.k), (self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)] if self.p else "VALID",
            use_bias=not self.bn, kernel_init=conv_kernel_init, dtype=self.dtype, name="conv_transpose",
        )(x)
        if self.bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=jnp.float32, name="bn")(y).astype(self.dtype)
        return y * jax.nn.sigmoid(y) if self.act else y


class DWConvTranspose2d(nn.Module):
    """Depth-wise transposed conv, groups=gcd(c1,c2), no BN/act
    (reference conv.py:212-227).

    flax has no grouped ConvTranspose, so this lowers to the equivalent
    lhs-dilated conv_general_dilated: input dilated by the stride, kernel
    spatially flipped, padding (k-1-p1, k-1-p1+p2) — giving the torch
    output size (in-1)*s - 2*p1 + k + p2.
    """

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0
    p2: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        g = math.gcd(c1, self.c2)
        w = self.param(
            "kernel", conv_kernel_init, (self.k, self.k, c1 // g, self.c2), jnp.float32
        ).astype(x.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32).astype(x.dtype)
        pad = (self.k - 1 - self.p1, self.k - 1 - self.p1 + self.p2)
        y = jax.lax.conv_general_dilated(
            x, w[::-1, ::-1], window_strides=(1, 1), padding=[pad, pad],
            lhs_dilation=(self.s, self.s), feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b


class AGLU(nn.Module):
    """Adaptive Gated Linear Unit activation with learnable lambda/kappa
    (reference activation.py:8-53): exp((1/lam) * softplus_{beta=-1}(kappa*x
    - log lam)), lam clamped to >= 1e-4."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        lambd = self.param("lambd", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        kappa = self.param("kappa", nn.initializers.uniform(scale=1.0), (1,), jnp.float32)
        lam = jnp.clip(lambd, 1e-4, None).astype(x.dtype)
        # softplus with beta=-1: -log(1 + exp(-t))
        t = kappa.astype(x.dtype) * x - jnp.log(lam)
        return jnp.exp((1.0 / lam) * (-jnp.log1p(jnp.exp(-t))))


class Focus(nn.Module):
    """Space-to-depth then conv (reference conv.py:283-318)."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return Conv(self.c2, self.k, self.s, dtype=self.dtype, name="conv")(y, train)


class GhostConv(nn.Module):
    """Half primary conv + cheap DW ghost features (reference conv.py:321-360)."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, g=c_, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference block.py GhostBottleneck)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dwmid")(y, train)
        y = GhostConv(self.c2, 1, 1, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(x, train)
        return y + sc


class RepConv(nn.Module):
    """Train-time multi-branch 3x3 + 1x1 (+identity BN) conv
    (reference conv.py:363-540). Deploy-time fusion folds branches."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: bool = True
    use_bn_identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k)
        a = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s), [(pad, pad)] * 2,
                    feature_group_count=self.g, use_bias=False, kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="conv1_conv")(x)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="conv1_bn")(a)
        b = nn.Conv(self.c2, (1, 1), (self.s, self.s), "VALID", feature_group_count=self.g,
                    use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="conv2_conv")(x)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="conv2_bn")(b)
        y = (a + b).astype(self.dtype)
        if self.use_bn_identity and x.shape[-1] == self.c2 and self.s == 1:
            idn = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                               dtype=jnp.float32, name="bn_id")(x)
            y = y + idn.astype(self.dtype)
        return y * jax.nn.sigmoid(y) if self.act else y


class C1(nn.Module):
    """CSP bottleneck with 1 conv (reference block.py C1)."""

    c2: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        z = y
        for i in range(self.n):
            z = Conv(self.c2, 3, dtype=self.dtype, name=f"m_{i}")(z, train)
        return z + y


class C2(nn.Module):
    """CSP bottleneck with 2 convs (reference block.py C2)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], axis=-1), train)


class C3x(nn.Module):
    """C3 with cross (1,3)/(3,1) kernels (reference block.py:341-360)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return C3(self.c2, self.n, self.shortcut, self.g, self.e,
                  k=((1, 3), (3, 1)), dtype=self.dtype, name="c3")(x, train)


class C3Ghost(nn.Module):
    """C3 with GhostBottlenecks (reference block.py C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, 3, 1, dtype=self.dtype, name=f"m_{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (reference block.py:475+)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m_{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn")(y)
        y = y.astype(self.dtype)
        y = jnp.where(y > 0, y, 0.1 * y)  # LeakyReLU(0.1) per reference
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class RepC3(nn.Module):
    """RT-DETR RepC3 (reference block.py RepC3)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = RepConv(c_, 3, dtype=self.dtype, name=f"m_{i}")(a, train)
        y = a + b
        if c_ != self.c2:
            y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv3")(y, train)
        return y


# ---------------------------------------------------------------------------
# YOLOv9 blocks
# ---------------------------------------------------------------------------


class ELAN1(nn.Module):
    """ELAN block (reference block.py ELAN1)."""

    c2: int
    c3_: int
    c4: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3_ // 2
        y = Conv(self.c3_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2")(ys[-1], train))
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3")(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, axis=-1), train)


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN with RepNCSP inner blocks (reference block.py RepNCSPELAN4).

    Inner RepNCSP approximated faithfully: C3-style with RepConv bottlenecks.
    """

    c2: int
    c3_: int
    c4: int
    n: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3_ // 2
        y = Conv(self.c3_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        b1 = _RepNCSP(self.c4, self.n, dtype=self.dtype, name="cv2_csp")(ys[-1], train)
        b1 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2_conv")(b1, train)
        ys.append(b1)
        b2 = _RepNCSP(self.c4, self.n, dtype=self.dtype, name="cv3_csp")(ys[-1], train)
        b2 = Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3_conv")(b2, train)
        ys.append(b2)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, axis=-1), train)


class _RepNCSP(nn.Module):
    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            r = RepConv(c_, 3, dtype=self.dtype, name=f"m_{i}_cv1")(a, train)
            r = Conv(c_, 3, 1, dtype=self.dtype, name=f"m_{i}_cv2")(r, train)
            a = a + r
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], axis=-1), train)


class ADown(nn.Module):
    """v9 downsample: avgpool+conv / maxpool+conv split (reference block.py ADown)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        xa = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "SAME") / 4.0
        x1, x2 = jnp.split(xa, 2, axis=-1)
        x1 = Conv(c, 3, 2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = _maxpool_same(x2, 3)[:, ::2, ::2]
        x2 = Conv(c, 1, 1, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], axis=-1)


class AConv(nn.Module):
    """v9 avgpool downsample conv (reference block.py AConv)."""

    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xa = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "SAME") / 4.0
        return Conv(self.c2, 3, 2, dtype=self.dtype, name="cv1")(xa, train)


class SPPELAN(nn.Module):
    """v9 SPP-ELAN (reference block.py SPPELAN)."""

    c2: int
    c3_: int
    k: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = [Conv(self.c3_, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            y.append(_maxpool_same(y[-1], self.k))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(y, axis=-1), train)


# ---------------------------------------------------------------------------
# YOLOv10 blocks
# ---------------------------------------------------------------------------


class SCDown(nn.Module):
    """Separable conv downsample (reference block.py SCDown)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(self.c2, self.k, self.s, g=self.c2, act=False, dtype=self.dtype, name="cv2")(y, train)


class RepVGGDW(nn.Module):
    """Depthwise RepVGG block (reference block.py:1132-1190)."""

    ed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = Conv(self.ed, 7, 1, p=3, g=self.ed, act=False, dtype=self.dtype, name="conv")(x, train)
        b = Conv(self.ed, 3, 1, p=1, g=self.ed, act=False, dtype=self.dtype, name="conv1")(x, train)
        y = a + b
        return y * jax.nn.sigmoid(y)


class CIB(nn.Module):
    """Compact inverted block (reference block.py CIB)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB blocks (reference block.py C2fCIB)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(CIB(c, self.shortcut, e=1.0, lk=self.lk, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, axis=-1), train)


class Identity(nn.Module):
    """No-op layer (torch nn.Identity; used by yolov9e.yaml row 0 to pin
    the raw image as a routable graph output for the dual-branch PGI
    backbone)."""

    dtype: Any = jnp.float32

    def __call__(self, x, train: bool = False):
        return x


class Index(nn.Module):
    """Select one output from a list (reference conv.py:697-714)."""

    c2: int = 0
    index: int = 0
    dtype: Any = jnp.float32

    def __call__(self, xs, train: bool = False):
        return xs[self.index]


# ---------------------------------------------------------------------------
# PPHGNetV2 / ResNet backbones (reference block.py:103-199, 522-578)
# ---------------------------------------------------------------------------


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 ReLU convs + stride-1 maxpool with asymmetric pads
    (reference block.py:103-138)."""

    cm: int
    c2: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.cm, 3, 2, act="relu", dtype=self.dtype, name="stem1")(x, train)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # F.pad [0,1,0,1]
        x2 = Conv(self.cm // 2, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2a")(xp, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2b")(x2, train)
        # maxpool k=2 s=1 ceil_mode on the padded tensor == VALID pool
        x1 = nn.max_pool(xp, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = Conv(self.cm, 3, 2, act="relu", dtype=self.dtype, name="stem3")(x, train)
        return Conv(self.c2, 1, 1, act="relu", dtype=self.dtype, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block: n (Light)Convs + squeeze/excite 1x1s
    (reference block.py:141-176)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, k=self.k, act=self.act, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
            else:
                ys.append(Conv(self.cm, self.k, act=self.act, dtype=self.dtype, name=f"m_{i}")(ys[-1], train))
        y = Conv(self.c2 // 2, 1, 1, act=self.act, dtype=self.dtype, name="sc")(jnp.concatenate(ys, -1), train)
        y = Conv(self.c2, 1, 1, act=self.act, dtype=self.dtype, name="ec")(y, train)
        return y + x if self.shortcut and c1 == self.c2 else y


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block (reference block.py:522-545)."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1, c3 = x.shape[-1], self.e * self.c2
        y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, self.s, p=1, dtype=self.dtype, name="cv2")(y, train)
        y = Conv(c3, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        sc = (
            Conv(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, train)
            if self.s != 1 or c1 != c3
            else x
        )
        return jax.nn.relu((y + sc).astype(jnp.float32)).astype(y.dtype)


class ResNetLayer(nn.Module):
    """Stack of ResNet blocks / the 7x7 stem (reference block.py:547-578)."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = Conv(self.c2, 7, 2, p=3, dtype=self.dtype, name="layer_0")(x, train)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ResNetBlock(self.c2, self.s, e=self.e, dtype=self.dtype, name="layer_0")(x, train)
        for i in range(1, self.n):
            x = ResNetBlock(self.c2, 1, e=self.e, dtype=self.dtype, name=f"layer_{i}")(x, train)
        return x


# ---------------------------------------------------------------------------
# v9-e cross-branch fusion (reference block.py:1007-1057)
# ---------------------------------------------------------------------------


class CBLinear(nn.Module):
    """1x1 conv whose output splits into a tuple of channel groups."""

    c2s: Tuple[int, ...] = ()
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .modules import autopad, conv_kernel_init

        pad = autopad(self.k, None)
        y = nn.Conv(
            sum(self.c2s), (self.k, self.k), (self.s, self.s),
            padding=[(pad, pad), (pad, pad)], use_bias=True,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="conv",
        )(x)
        splits = []
        o = 0
        for c in self.c2s:
            splits.append(y[..., o : o + c])
            o += c
        return tuple(splits)


class CBFuse(nn.Module):
    """Sum selected CBLinear outputs, nearest-resized to the last input's
    spatial size (reference block.py:1031-1057)."""

    idx: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    def __call__(self, xs, train: bool = False):
        target = xs[-1]
        h, w = target.shape[1], target.shape[2]
        out = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]] if isinstance(x, (tuple, list)) else x
            if sel.shape[1] != h or sel.shape[2] != w:
                sel = jax.image.resize(sel, (sel.shape[0], h, w, sel.shape[3]), method="nearest")
            out = out + sel
        return out


# ---------------------------------------------------------------------------
# ViT-style transformer (reference transformer.py:208-285) + C3TR
# ---------------------------------------------------------------------------


class TransformerLayer(nn.Module):
    """Self-attention layer, LayerNorms removed (reference transformer.py:208)."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, N, C)
        c, nh = self.c, self.num_heads
        hd = c // nh
        dense = lambda name, bias=False: nn.Dense(c, use_bias=bias, dtype=self.dtype, name=name)  # noqa: E731
        q = dense("q")(x)
        k = dense("k")(x)
        v = dense("v")(x)
        # torch nn.MultiheadAttention applies its own in_proj on q/k/v
        wq = nn.Dense(c, use_bias=True, dtype=self.dtype, name="ma_q")(q)
        wk = nn.Dense(c, use_bias=True, dtype=self.dtype, name="ma_k")(k)
        wv = nn.Dense(c, use_bias=True, dtype=self.dtype, name="ma_v")(v)
        b, n, _ = x.shape

        def heads(t):
            return t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhnd,bhmd->bhnm", heads(wq), heads(wk), preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att / (hd**0.5), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", att, heads(wv), preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, c)
        o = nn.Dense(c, use_bias=True, dtype=self.dtype, name="ma_out")(o)
        x = o + x
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y) + x


class TransformerBlock(nn.Module):
    """ViT block over the flattened feature map (reference transformer.py:241)."""

    c2: int
    num_heads: int = 4
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # NHWC
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(c, use_bias=True, dtype=self.dtype, name="linear")(p)  # learned pos-emb
        for i in range(self.num_layers):
            p = TransformerLayer(c, self.num_heads, dtype=self.dtype, name=f"tr_{i}")(p, train)
        return p.reshape(b, h, w, c)


class C3TR(nn.Module):
    """C3 with a TransformerBlock inner (reference block.py:386-404)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        a = TransformerBlock(c_, 4, self.n, dtype=self.dtype, name="m")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


# ---------------------------------------------------------------------------
# YOLO12 area attention (reference block.py:1664-1892)
# ---------------------------------------------------------------------------


class AAttn(nn.Module):
    """Area attention: windowless position attention over `area` chunks
    of the flattened map, plus a depthwise positional conv on V."""

    dim: int
    num_heads: int
    area: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # NHWC
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        n = h * w
        qkv = Conv(3 * c, 1, act=False, dtype=self.dtype, name="qkv")(x, train).reshape(b, n, 3 * c)
        area = self.area if self.area and self.area > 1 else 1
        if area > 1:
            qkv = qkv.reshape(b * area, n // area, 3 * c)
        bb, nn_, _ = qkv.shape
        qkv = qkv.reshape(bb, nn_, nh, 3 * hd)
        q, k, v = qkv[..., :hd], qkv[..., hd : 2 * hd], qkv[..., 2 * hd :]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32) * (hd**-0.5)
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", att, v, preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.reshape(bb, nn_, c).reshape(b, h, w, c)
        vmap_ = v.reshape(bb, nn_, c).reshape(b, h, w, c)
        pe = Conv(c, 7, 1, p=3, g=c, act=False, dtype=self.dtype, name="pe")(vmap_, train)
        return Conv(c, 1, act=False, dtype=self.dtype, name="proj")(o + pe, train)


class ABlock(nn.Module):
    """Area-attention block: AAttn + conv MLP, both residual
    (reference block.py:1750-1816)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, dtype=self.dtype, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = Conv(hidden, 1, dtype=self.dtype, name="mlp_0")(x, train)
        y = Conv(self.dim, 1, act=False, dtype=self.dtype, name="mlp_1")(y, train)
        return x + y


class A2C2f(nn.Module):
    """Area-attention C2f (reference block.py:1818-1892): n stages of
    2x ABlock (a2) or C3k, concatenated then fused; optional learnable
    gamma residual."""

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .modules import C3k

        c_ = int(self.c2 * self.e)
        ys = [Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for i in range(self.n):
            y = ys[-1]
            if self.a2:
                nh = max(1, c_ // 32)
                y = ABlock(c_, nh, self.mlp_ratio, self.area, dtype=self.dtype, name=f"m_{i}_0")(y, train)
                y = ABlock(c_, nh, self.mlp_ratio, self.area, dtype=self.dtype, name=f"m_{i}_1")(y, train)
            else:
                y = C3k(c_, 2, self.shortcut, dtype=self.dtype, name=f"m_{i}")(y, train)
            ys.append(y)
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", lambda k, s: jnp.full(s, 0.01, jnp.float32), (self.c2,))
            return x + gamma * out
        return out


class MaxPool2d(nn.Module):
    """torch nn.MaxPool2d analog for YAML rows (yolov3-tiny)."""

    k: int = 2
    s: int = 2
    p: int = 0
    dtype: Any = jnp.float32

    def __call__(self, x, train: bool = False):
        if self.p:
            x = jnp.pad(
                x, ((0, 0), (self.p, self.p), (self.p, self.p), (0, 0)), constant_values=-jnp.inf
            )
        return nn.max_pool(x, (self.k, self.k), strides=(self.s, self.s), padding="VALID")


class ZeroPad2d(nn.Module):
    """torch nn.ZeroPad2d analog (padding [left, right, top, bottom])."""

    padding: Tuple[int, int, int, int] = (0, 0, 0, 0)
    dtype: Any = jnp.float32

    def __call__(self, x, train: bool = False):
        l, r, t, b = self.padding
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))
