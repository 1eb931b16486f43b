"""TinyViT image encoder for MobileSAM (NHWC flax).

Compact re-design of reference models/sam/modules/tiny_encoder.py:24-1003:
conv stem (/4) -> MBConv stage -> three window-attention stages with
learned attention-bias tables -> 256-ch SAM neck at /16. Stochastic
depth / classification head / layer-lr-decay are training-only details
of the upstream TinyViT repo and are omitted (the reference also ships
them inert for SAM inference).
"""

from __future__ import annotations

import itertools
import math
from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm2d


class Conv2dBN(nn.Module):
    """Conv (no bias) + BN (reference tiny_encoder.py:24-60; torch BN
    defaults eps 1e-5)."""

    c2: int
    k: int = 1
    s: int = 1
    p: int = 0
    g: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s), padding=self.p,
                    feature_group_count=self.g, use_bias=False, dtype=self.dtype, name="c")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return x.astype(self.dtype)


class MBConv(nn.Module):
    """Inverted bottleneck with GELU (reference tiny_encoder.py:104-163)."""

    c2: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = int(x.shape[-1] * self.expand)
        y = jax.nn.gelu(Conv2dBN(hid, 1, dtype=self.dtype, name="conv1")(x, train), approximate=False)
        y = jax.nn.gelu(Conv2dBN(hid, 3, 1, 1, g=hid, dtype=self.dtype, name="conv2")(y, train), approximate=False)
        y = Conv2dBN(self.c2, 1, dtype=self.dtype, name="conv3")(y, train)
        return jax.nn.gelu(x + y, approximate=False)


class PatchMerging(nn.Module):
    """1x1 -> DW 3x3 (stride 2 unless out_dim in {320,448,576}) -> 1x1
    (reference tiny_encoder.py:165-221)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = 1 if self.out_dim in {320, 448, 576} else 2
        y = jax.nn.gelu(Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv1")(x, train), approximate=False)
        y = jax.nn.gelu(Conv2dBN(self.out_dim, 3, s, 1, g=self.out_dim, dtype=self.dtype, name="conv2")(y, train),
                        approximate=False)
        return Conv2dBN(self.out_dim, 1, dtype=self.dtype, name="conv3")(y, train)


def _bias_idxs(ws: int) -> np.ndarray:
    """Static (N, N) index map into the unique-|offset| bias table
    (reference tiny_encoder.py:443-456)."""
    points = list(itertools.product(range(ws), range(ws)))
    offsets, idxs = {}, []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class TinyAttention(nn.Module):
    """Pre-norm MHA with learned spatial attention biases (reference
    tiny_encoder.py:363-487; attn_ratio=1 so q/k/v dims are equal)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, C), N = ws*ws
        idxs, n_off = _bias_idxs(self.window_size)
        key_dim = self.dim // self.num_heads
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, n_off), jnp.float32)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        b, n, _ = x.shape
        q, k, v = jnp.split(qkv.reshape(b, n, self.num_heads, 3 * key_dim), 3, axis=-1)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("bhld,bhmd->bhlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(key_dim)
        attn = attn + biases[:, jnp.asarray(idxs)][None]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhlm,bhmd->bhld", attn, v).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + DW local conv + pre-norm MLP (reference
    tiny_encoder.py:489-646)."""

    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.window_size
        res = x
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        y = y.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        y = TinyAttention(c, self.num_heads, ws, dtype=self.dtype, name="attn")(y)
        y = y.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        x = res + y[:, :h, :w]
        x = Conv2dBN(c, 3, 1, 1, g=c, dtype=self.dtype, name="local_conv")(x, train)
        y = nn.LayerNorm(dtype=jnp.float32, name="mlp_norm")(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(jax.nn.gelu(y, approximate=False))
        return x + y


class TinyViT(nn.Module):
    """MobileSAM trunk (reference tiny_encoder.py:762-1003 + SAM neck):
    embed_dims (64,128,160,320), depths (2,2,6,2)."""

    embed_dims: Tuple[int, ...] = (64, 128, 160, 320)
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (2, 4, 5, 10)
    window_sizes: Tuple[int, ...] = (7, 7, 14, 7)
    out_chans: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, S, S, 3) normalized
        d0 = self.embed_dims[0]
        x = jax.nn.gelu(Conv2dBN(d0 // 2, 3, 2, 1, dtype=self.dtype, name="patch_embed_0")(x, train),
                        approximate=False)
        x = Conv2dBN(d0, 3, 2, 1, dtype=self.dtype, name="patch_embed_1")(x, train)  # /4
        # stage 0: MBConvs
        for j in range(self.depths[0]):
            x = MBConv(d0, dtype=self.dtype, name=f"layers_0_blocks_{j}")(x, train)
        x = PatchMerging(self.embed_dims[1], dtype=self.dtype, name="layers_0_downsample")(x, train)
        # stages 1..3: window-attention blocks
        for i in (1, 2, 3):
            for j in range(self.depths[i]):
                x = TinyViTBlock(self.num_heads[i], self.window_sizes[i],
                                 dtype=self.dtype, name=f"layers_{i}_blocks_{j}")(x, train)
            if i < 3:
                x = PatchMerging(self.embed_dims[i + 1], dtype=self.dtype, name=f"layers_{i}_downsample")(x, train)
        # SAM neck (tiny_encoder.py:904-921)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)
