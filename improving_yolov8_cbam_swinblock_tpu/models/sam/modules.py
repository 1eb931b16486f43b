"""SAM (Segment Anything) core modules — flax/NHWC.

TPU-native re-designs of reference models/sam/modules/encoders.py:23-355
(ImageEncoderViT, PromptEncoder), blocks.py (ViT Block + decomposed
relative-position attention), transformer.py:12-351 (TwoWayTransformer)
and decoders.py:11-174 (MaskDecoder). Everything is fixed-shape and
jittable: window partition is a reshape, rel-pos lookups are static
gathers, prompt slots are padded to a static count with a validity label.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def layernorm2d(x, name_scope, scale, bias, eps=1e-6):
    u = x.mean(axis=-1, keepdims=True)
    s = ((x - u) ** 2).mean(axis=-1, keepdims=True)
    return (x - u) / jnp.sqrt(s + eps) * scale + bias


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC (reference transformer.py:362-403
    operates on NCHW channel axis; same math)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return layernorm2d(x.astype(jnp.float32), None, scale, bias, self.eps).astype(x.dtype)


def _rel_pos_embed(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Select decomposed relative position embeddings (reference
    blocks.py get_rel_pos): returns (q_size, k_size, C)."""
    # q/k same size in SAM; relative coords q_i - k_j + (k_size - 1)
    qi = jnp.arange(q_size)[:, None]
    kj = jnp.arange(k_size)[None, :]
    idx = (qi - kj + (k_size - 1)).astype(jnp.int32)
    return rel_pos[idx]


class SAMAttention(nn.Module):
    """Multi-head attention with decomposed relative positions
    (reference blocks.py Attention/add_decomposed_rel_pos)."""

    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x.reshape(b, h * w, c))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bnld,bnmd->bnlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd), jnp.float32)
            Rh = _rel_pos_embed(h, h, rel_h)  # (h, h, hd)
            Rw = _rel_pos_embed(w, w, rel_w)
            qf = q.reshape(b, self.num_heads, h, w, hd).astype(jnp.float32)
            eh = jnp.einsum("bnhwc,hkc->bnhwk", qf, Rh)
            ew = jnp.einsum("bnhwc,wkc->bnhwk", qf, Rw)
            attn = attn.reshape(b, self.num_heads, h, w, h, w) + eh[..., :, None] + ew[..., None, :]
            attn = attn.reshape(b, self.num_heads, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """SAM ViT block: pre-LN attention (windowed or global) + MLP
    (reference blocks.py Block)."""

    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        ws = self.window_size
        if ws > 0:
            ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
        asize = (ws, ws) if ws > 0 else self.input_size
        x = SAMAttention(self.num_heads, input_size=asize, dtype=self.dtype, name="attn")(x)
        if ws > 0:
            x = x.reshape(b, hp // ws, wp // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
            x = x[:, :h, :w]
        x = shortcut + x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_lin1")(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_lin2")(jax.nn.gelu(y, approximate=False))
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder (reference encoders.py:23-157): 16x16 patch embed,
    abs pos embed, windowed/global ViT blocks, 256-ch neck -> (B,64,64,256)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    img_size: int = 1024
    patch_size: int = 16
    out_chans: int = 256
    window_size: int = 14
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, img, img, 3) normalized
        g = self.img_size // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2, (self.patch_size,) * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, self.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(self.num_heads, window_size=ws, input_size=(g, g),
                         dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_0")(x)
        x = LayerNorm2d(name="neck_1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_2")(x)
        return LayerNorm2d(name="neck_3")(x)  # (B, 64, 64, 256)


class PositionEmbeddingRandom(nn.Module):
    """Random Fourier positional encoding (reference blocks.py
    PositionEmbeddingRandom). The Gaussian matrix is a BUFFER like the
    reference's register_buffer — loadable from checkpoints but not a
    trainable parameter."""

    num_feats: int = 128

    @nn.compact
    def __call__(self, coords):  # (..., 2) in [0, 1]
        g = self.variable(
            "buffers", "gaussian",
            lambda: jax.random.normal(jax.random.PRNGKey(93), (2, self.num_feats), jnp.float32),
        ).value
        c = (2.0 * coords.astype(jnp.float32) - 1.0) @ g * (2.0 * math.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)  # (..., 2*num_feats)


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask) prompt embeddings (reference
    encoders.py:158-355). Points arrive PADDED to a static count with
    labels: 1 fg, 0 bg, -1 pad/not-a-point, 2/3 box corners."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2, name="pe_layer")
        # 0: negative point, 1: positive point, 2: box tl, 3: box br
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim), jnp.float32
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,), jnp.float32
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,), jnp.float32
        )
        # mask-prompt downscaling (reference encoders.py mask_downscaling)
        self.mask_down_0 = nn.Conv(4, (2, 2), (2, 2), dtype=self.dtype, name="mask_down_0")
        self.mask_down_1 = LayerNorm2d(name="mask_down_1")
        self.mask_down_3 = nn.Conv(16, (2, 2), (2, 2), dtype=self.dtype, name="mask_down_3")
        self.mask_down_4 = LayerNorm2d(name="mask_down_4")
        self.mask_down_6 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="mask_down_6")

    def image_pe(self):
        """Dense positional grid for the image embedding (reference
        PromptEncoder.get_dense_pe)."""
        hh, ww = self.image_embedding_size
        gy = (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh
        gx = (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)[..., [0, 1]]
        return self.pe_layer(grid)  # (H, W, 256)

    def _mask_downscale(self, m):
        """Low-res mask prompt -> dense embedding (reference
        encoders.py mask_downscaling): 2x(conv s2 + LN2d + GELU) + 1x1."""
        m = jax.nn.gelu(self.mask_down_1(self.mask_down_0(m)), approximate=False)
        m = jax.nn.gelu(self.mask_down_4(self.mask_down_3(m)), approximate=False)
        return self.mask_down_6(m)

    def __call__(self, points, labels, masks=None):
        """points (B, N, 2) pixel coords in the 1024 frame; labels (B, N)
        int; masks optional (B, 4H, 4W, 1) low-res mask prompt. Returns
        sparse embeddings (B, N, 256) and the dense embedding."""
        shifted = (points + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32
        )
        pe = self.pe_layer(shifted)  # (B, N, 256)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed, 0.0)
        pe = jnp.where(lab == -1, 0.0, pe)
        for t in range(4):
            emb = emb + jnp.where(lab == t, self.point_embeddings[t], 0.0)
        sparse = (pe + emb).astype(self.dtype)
        if masks is not None:
            dense = self._mask_downscale(masks.astype(self.dtype))[0]
        else:
            if self.is_initializing():  # materialize the mask branch params
                hh, ww = self.image_embedding_size
                self._mask_downscale(jnp.zeros((1, 4 * hh, 4 * ww, 1), self.dtype))
            dense = jnp.broadcast_to(
                self.no_mask_embed, self.image_embedding_size + (self.embed_dim,)
            ).astype(self.dtype)
        return sparse, dense


class _DownAttention(nn.Module):
    """Attention with internal downsampling (reference transformer.py:244-351)."""

    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        c = q.shape[-1]
        ci = c // self.downsample_rate
        hd = ci // self.num_heads
        q = nn.Dense(ci, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(ci, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(ci, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bnld,bnmd->bnlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
        b, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, ci)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Query self-attn, query->image cross-attn, MLP, image->query
    cross-attn (reference transformer.py:128-242)."""

    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = _DownAttention(self.num_heads, dtype=self.dtype, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + _DownAttention(self.num_heads, dtype=self.dtype, name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm1")(queries).astype(self.dtype)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _DownAttention(self.num_heads, 2, dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm2")(queries).astype(self.dtype)

        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_lin1")(queries)
        h = nn.Dense(queries.shape[-1], dtype=self.dtype, name="mlp_lin2")(jax.nn.relu(h))
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm3")(queries + h).astype(self.dtype)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _DownAttention(self.num_heads, 2, dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(dtype=jnp.float32, name="norm4")(keys).astype(self.dtype)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Two-layer two-way transformer (reference transformer.py:12-126)."""

    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        # image_embedding/pe: (B, H, W, C) -> (B, HW, C)
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c).astype(self.dtype)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.num_heads, self.mlp_dim, skip_first_layer_pe=i == 0,
                dtype=self.dtype, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + _DownAttention(self.num_heads, 2, dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm_final_attn")(queries).astype(self.dtype)
        return queries, keys


class _HyperMLP(nn.Module):
    out: int
    hidden: int = 256
    layers: int = 3
    sigmoid: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            last = i == self.layers - 1
            x = nn.Dense(self.out if last else self.hidden, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


class MaskDecoder(nn.Module):
    """SAM mask decoder (reference decoders.py:11-174): IoU token + 4 mask
    tokens through the two-way transformer, hypernetwork heads over 4x
    upscaled embeddings."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        nm = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, self.transformer_dim), jnp.float32)

        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None], (b, 1 + nm, self.transformer_dim)
        ).astype(self.dtype)
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt[None]
        hs, src = TwoWayTransformer(dtype=self.dtype, name="transformer")(src, image_pe[None], tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + nm]  # (B, nm, C)

        h = w = int(math.sqrt(src.shape[1]))
        srcm = src.reshape(b, h, w, self.transformer_dim)
        u = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), (2, 2), dtype=self.dtype, name="upscale_0")(srcm)
        u = LayerNorm2d(name="upscale_1")(u)
        u = jax.nn.gelu(u, approximate=False)
        u = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), (2, 2), dtype=self.dtype, name="upscale_2")(u)
        u = jax.nn.gelu(u, approximate=False)  # (B, 4h, 4w, C/8)

        hyper = jnp.stack(
            [
                _HyperMLP(self.transformer_dim // 8, self.transformer_dim, dtype=self.dtype,
                          name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
                for i in range(nm)
            ],
            axis=1,
        )  # (B, nm, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper.astype(jnp.float32), u.astype(jnp.float32))
        iou_pred = _HyperMLP(nm, self.iou_head_hidden, dtype=self.dtype, name="iou_prediction_head")(iou_out)
        return masks, iou_pred.astype(jnp.float32)  # (B, nm, 4h, 4w), (B, nm)
