"""YOLO-World open-vocabulary modules (NHWC flax).

TPU-native re-designs of the reference's vision-language blocks
(reference nn/modules/block.py:579-836 MaxSigmoidAttnBlock / C2fAttn /
ImagePoolingAttn / ContrastiveHead / BNContrastiveHead and
nn/modules/head.py:318-346 WorldDetect).

Text guidance threads through the graph as a second routed value
(nn/tasks.py GraphNet): C2fAttn consumes it, ImagePoolingAttn refines it
from image features, WorldDetect scores regions against the ORIGINAL
text features (reference WorldModel.predict, nn/tasks.py:767-772).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Bottleneck, Conv, DWConv, conv_kernel_init


class MaxSigmoidAttnBlock(nn.Module):
    """Max-sigmoid gated attention over text guides (reference
    block.py:579-630): per-head embed·guide dot, max over guides, sigmoid
    gate on the projected features."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        b, h, w, c1 = x.shape
        hc = self.c2 // self.nh
        # the reference reshapes embed/guide with hc = c2//nh, which only
        # works because every in-tree config has ec == hidden == c2
        # (block.py:617-619 would crash otherwise); we key the attention
        # reshape on ec//nh so odd configs still run, and keep the
        # reference's sqrt(c2//nh) temperature
        hc_e = self.ec // self.nh
        g = nn.Dense(self.ec, dtype=self.dtype, name="gl")(guide)  # (B, K, ec)
        g = g.reshape(b, -1, self.nh, hc_e)
        embed = Conv(self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, train) if c1 != self.ec else x
        embed = embed.reshape(b, h, w, self.nh, hc_e)
        aw = jnp.einsum("bhwmc,bnmc->bhwmn", embed.astype(jnp.float32), g.astype(jnp.float32))
        aw = aw.max(axis=-1) / math.sqrt(hc)  # (B, H, W, nh)
        aw = aw + self.param("bias", nn.initializers.zeros, (self.nh,), jnp.float32)
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            aw = aw * self.param("scale_p", nn.initializers.ones, (1, self.nh, 1, 1), jnp.float32).reshape(1, 1, 1, self.nh)
        y = Conv(self.c2, 3, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(b, h, w, self.nh, hc) * aw[..., None].astype(y.dtype)
        return y.reshape(b, h, w, self.c2)


class C2fAttn(nn.Module):
    """C2f with an extra text-guided attention branch (reference
    block.py:633-689): concat(2 + n + 1) chunks -> 1x1."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    e: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, shortcut=self.shortcut, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m_{i}")(
                    ys[-1], train
                )
            )
        ys.append(
            MaxSigmoidAttnBlock(c, nh=self.nh, ec=self.ec, gc=self.gc, dtype=self.dtype, name="attn")(
                ys[-1], guide, train
            )
        )
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


def _adaptive_max_pool(x, k: int):
    """torch AdaptiveMaxPool2d((k,k)) on NHWC with static shapes: window
    [floor(i*H/k), ceil((i+1)*H/k)) per output cell."""
    b, h, w, c = x.shape
    rows = []
    for i in range(k):
        r0, r1 = (i * h) // k, -(-((i + 1) * h) // k)
        cols = []
        for j in range(k):
            c0, c1 = (j * w) // k, -(-((j + 1) * w) // k)
            cols.append(x[:, r0:r1, c0:c1].max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Enhance text embeddings with pooled image features (reference
    block.py:691-755): text queries attend over k*k pooled patches of
    each level."""

    ec: int = 256
    ch: Tuple[int, ...] = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    use_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], text, train: bool = False):
        bs = xs[0].shape[0]
        hc = self.ec // self.nh
        patches = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"projections_{i}")(x)
            patches.append(_adaptive_max_pool(p, self.k).reshape(bs, self.k * self.k, self.ec))
        px = jnp.concatenate(patches, axis=1)  # (B, nf*k^2, ec)

        def ln_dense(t, feats, name):
            t = nn.LayerNorm(dtype=jnp.float32, name=f"{name}_ln")(t).astype(self.dtype)
            return nn.Dense(feats, dtype=self.dtype, name=f"{name}_fc")(t)

        q = ln_dense(text, self.ec, "query").reshape(bs, -1, self.nh, hc)
        k_ = ln_dense(px, self.ec, "key").reshape(bs, -1, self.nh, hc)
        v = ln_dense(px, self.ec, "value").reshape(bs, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q.astype(jnp.float32), k_.astype(jnp.float32)) / math.sqrt(hc)
        aw = jax.nn.softmax(aw, axis=-1)
        out = jnp.einsum("bmnk,bkmc->bnmc", aw, v.astype(jnp.float32)).reshape(bs, -1, self.ec)
        out = nn.Dense(self.ct, dtype=self.dtype, name="proj")(out.astype(self.dtype))
        scale = self.param("scale_p", nn.initializers.zeros, (1,), jnp.float32)[0] if self.use_scale else 1.0
        return out * scale + text


class ContrastiveHead(nn.Module):
    """Region-text cosine similarity with learned temperature (reference
    block.py:756-781). x (B,H,W,ec), w (B,K,ec) -> (B,H,W,K) logits.
    `bias_init_val` is -10 by default; YOLOEDetect re-initializes it to
    the per-level class prior (reference head.py:536-543)."""

    bias_init_val: float = -10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(self.bias_init_val), (1,), jnp.float32)
        ls = self.param("logit_scale", nn.initializers.constant(math.log(1 / 0.07)), (), jnp.float32)
        x = x.astype(jnp.float32)
        w = w.astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        return jnp.einsum("bhwc,bkc->bhwk", x, w) * jnp.exp(ls) + bias


class BNContrastiveHead(nn.Module):
    """BatchNorm variant of the contrastive head (reference
    block.py:783-836), used by worldv2 / YOLOE."""

    embed: int
    bias_init_val: float = -10.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w, train: bool = False):
        bias = self.param("bias", nn.initializers.constant(self.bias_init_val), (1,), jnp.float32)
        ls = self.param("logit_scale", nn.initializers.constant(-1.0), (), jnp.float32)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        w = w.astype(jnp.float32)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        return jnp.einsum("bhwc,bkc->bhwk", x, w) * jnp.exp(ls) + bias


class WorldDetect(nn.Module):
    """Open-vocabulary Detect head (reference head.py:318-346): the usual
    box branch plus an embed branch scored against text features by a
    contrastive head. Output layout matches Detect with nc = #texts, so
    the v8 loss / NMS / validator pipeline is reused unchanged."""

    nc: int = 80
    embed: int = 512
    with_bn: bool = False
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = False
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], text, train: bool = False):
        from .modules import Detect

        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        bias_init=nn.initializers.ones, dtype=self.dtype, name=f"cv2_{i}_2")(b)
            e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, train)
            e = nn.Conv(self.embed, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv3_{i}_2")(e)
            head = (
                BNContrastiveHead(self.embed, dtype=self.dtype, name=f"cv4_{i}")
                if self.with_bn
                else ContrastiveHead(dtype=self.dtype, name=f"cv4_{i}")
            )
            cls = head(e, text, train)  # (B, H, W, K)
            feats.append(jnp.concatenate([b, cls.astype(b.dtype)], axis=-1))
        if train:
            return feats
        # decode identically to Detect._inference (anchors from shapes)
        dec = Detect(nc=text.shape[1], ch=tuple(self.ch), strides=self.strides,
                     reg_max=self.reg_max, dtype=self.dtype, parent=None)
        return dec._inference([f.astype(jnp.float32) for f in feats]), feats
