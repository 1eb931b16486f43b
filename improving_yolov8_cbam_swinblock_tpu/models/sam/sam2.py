"""SAM2 — Segment Anything 2, TPU-native (flax / NHWC / fixed shapes).

Re-design of the reference SAM2 stack:
  * Hiera hierarchical trunk + FPN neck + sine positional encodings
    (reference models/sam/modules/encoders.py:442-855, blocks.py:488-811);
  * SAM2 mask decoder with object-score token, high-res skip features and
    stability-based dynamic multimask (reference modules/decoders.py:175-515);
  * memory attention with rotary (RoPE) self/cross attention
    (reference modules/memory_attention.py, blocks.py:405-485, utils.py:90-226);
  * memory encoder (mask downsampler + ConvNeXt fuser, reference
    modules/encoders.py:357-439, blocks.py:54-261);
  * SAM2Model orchestration (reference modules/sam.py:105-1004).

TPU-first deviations (documented):
  * the video memory bank is FIXED-SHAPE: `num_maskmem` spatial-memory
    slots and `max_obj_ptrs` pointer slots with validity masks; invalid
    slots are masked out of the cross-attention softmax with a -inf bias.
    This replaces the reference's variable-length python list concat
    (sam.py:641-755) with a single static graph — numerically identical
    (masked softmax == excluding the token) and jittable;
  * RoPE tables are precomputed numpy constants at trace time (static
    H, W) instead of cached torch tensors (blocks.py:441-461);
  * positional-embedding interpolation uses jax.image.resize bicubic
    (half-pixel centers, matching torch align_corners=False up to the
    cubic kernel constant);
  * supports the base SAM2 configs (build.py:216-300 with the sam2.1
    flags off): no_obj_embed_spatial / proj_tpos_enc_in_obj_ptrs /
    use_signed_tpos_enc_to_obj_ptrs are not reproduced.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import LayerNorm2d, PromptEncoder, TwoWayTransformer, _HyperMLP

# ---------------------------------------------------------------------------
# Hiera trunk (reference encoders.py:660-855, blocks.py:488-695)
# ---------------------------------------------------------------------------


def _window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero padding (reference
    utils.py:229-258). Static-shape reshape, no dynamic control flow."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def _window_unpartition(win, ws, pad_hw, hw):
    """Inverse of _window_partition (reference utils.py:261-296)."""
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _do_pool(x):
    """2x2 max-pool in NHWC (reference blocks.py:488-500 do_pool)."""
    return nn.max_pool(x, (2, 2), (2, 2))


class MultiScaleAttention(nn.Module):
    """Windowless multi-head attention with optional 2x q-pooling
    (reference blocks.py:503-580)."""

    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, _ = x.shape
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, -1)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = _do_pool(q.reshape(b, h, w, -1))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.num_heads, -1)
        hd = self.dim_out // self.num_heads
        attn = jnp.einsum("blnd,bmnd->bnlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnlm,bmnd->blnd", attn, v).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional stage-boundary q-pool /
    dim doubling + MLP (reference blocks.py:583-695)."""

    dim: int
    dim_out: int
    num_heads: int
    q_stride: bool = False
    window_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        if self.dim != self.dim_out:
            # projection applied to the NORMED input (blocks.py:668-669)
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            if self.q_stride:
                shortcut = _do_pool(shortcut)

        ws = self.window_size
        h, w = x.shape[1:3]
        if ws > 0:
            x, pad_hw = _window_partition(x, ws)
        x = MultiScaleAttention(self.dim_out, self.num_heads, q_pool=self.q_stride,
                                dtype=self.dtype, name="attn")(x)
        if self.q_stride:
            # q-pooled: window size and spatial dims halve (blocks.py:679-686)
            ws = ws // 2
            h, w = shortcut.shape[1:3]
            pad_hw = (h + (ws - h % ws) % ws, w + (ws - w % ws) % ws) if ws > 0 else None
        if self.window_size > 0:
            x = _window_unpartition(x, ws, pad_hw, (h, w))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype, name="mlp_0")(y)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp_1")(jax.nn.gelu(y, approximate=False))
        return x + y


class Hiera(nn.Module):
    """Hierarchical trunk: 7x7/s4 patch embed, windowed-pos-embed, 4 stages
    with dim/head doubling and q-pooling at boundaries; returns the 4
    stage-end feature maps high-res first (reference encoders.py:660-855)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    q_pool: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, S, S, 3) normalized
        depth = sum(self.stages)
        stage_ends = [sum(self.stages[:i]) - 1 for i in range(1, len(self.stages) + 1)]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]

        x = nn.Conv(self.embed_dim, (7, 7), (4, 4), padding=3, dtype=self.dtype, name="patch_embed")(x)
        b, h, w, c = x.shape
        # windowed positional embedding (encoders.py:769-772, :812-819)
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1,) + tuple(self.window_pos_embed_bkg_spatial_size) + (self.embed_dim,), jnp.float32)
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0], self.embed_dim), jnp.float32)
        pos = jax.image.resize(bkg, (1, h, w, self.embed_dim), method="bicubic")
        pos = pos + jnp.tile(win, (1, h // self.window_spec[0], w // self.window_spec[0], 1))
        x = x + pos.astype(x.dtype)

        outputs = []
        dim, heads, cur_stage = self.embed_dim, self.num_heads, 1
        for i in range(depth):
            window_size = self.window_spec[cur_stage - 1]  # lags one block at boundaries
            if i in self.global_att_blocks:
                window_size = 0
            dim_out = dim
            if i - 1 in stage_ends:
                dim_out, heads, cur_stage = dim * 2, heads * 2, cur_stage + 1
            x = MultiScaleBlock(dim, dim_out, heads, q_stride=i in q_pool_blocks,
                                window_size=window_size, dtype=self.dtype, name=f"blocks_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs  # high-res first: strides 4, 8, 16, 32


def sine_pos_embed(h: int, w: int, num_pos_feats: int = 256) -> np.ndarray:
    """2D sine positional encoding, (h, w, num_pos_feats) numpy constant
    (reference blocks.py:698-810 PositionEmbeddingSine, normalize=True)."""
    half = num_pos_feats // 2
    scale = 2 * math.pi
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None] / (h + 1e-6) * scale)
    x = (np.arange(1, w + 1, dtype=np.float32)[None, :] / (w + 1e-6) * scale)
    dim_t = 10000.0 ** (2 * (np.arange(half, dtype=np.float32) // 2) / half)
    px = np.broadcast_to(x[..., None], (h, w, half)) / dim_t
    py = np.broadcast_to(y[..., None], (h, w, half)) / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], axis=-1).reshape(h, w, half)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], axis=-1).reshape(h, w, half)
    return np.concatenate([py, px], axis=-1)  # (h, w, C)


class FpnNeck(nn.Module):
    """FPN neck over the 4 trunk levels; lateral 1x1 convs + nearest
    top-down on levels in `fpn_top_down_levels` (reference
    encoders.py:516-657)."""

    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)  # low-res first
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):  # high-res-first list from Hiera
        n = len(self.backbone_channel_list) - 1
        out = [None] * (n + 1)
        prev = None
        for i in range(n, -1, -1):
            lateral = nn.Conv(self.d_model, (1, 1), dtype=self.dtype, name=f"convs_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                b, h, w, c = prev.shape
                top_down = jax.image.resize(prev.astype(jnp.float32), (b, 2 * h, 2 * w, c),
                                            method="nearest").astype(lateral.dtype)
                prev = lateral + top_down
            else:
                prev = lateral
            out[i] = prev
        return out


# ---------------------------------------------------------------------------
# Rotary position encoding (reference utils.py:90-226, blocks.py:405-485)
# ---------------------------------------------------------------------------


def axial_rope_tables(end_x: int, end_y: int, dim: int, theta: float = 10000.0):
    """cos/sin tables for axial RoPE over an (end_y, end_x) grid, each
    (end_x*end_y, dim//2) — pair j < dim//4 rotates with x-frequencies,
    the rest with y-frequencies (reference compute_axial_cis)."""
    quarter = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float32)[:quarter] / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx, ty = t % end_x, np.floor(t / end_x)
    ang = np.concatenate([np.outer(tx, freqs), np.outer(ty, freqs)], axis=-1)  # (HW, dim//2)
    return np.cos(ang), np.sin(ang)


def apply_rope(x, cos, sin, repeat: int = 1):
    """Rotate consecutive (even, odd) channel pairs of x (..., L, D) by the
    per-position angles; `repeat` tiles the tables along L for memory keys
    (reference apply_rotary_enc with repeat_freqs_k)."""
    if repeat > 1:
        cos = jnp.tile(cos, (repeat, 1))
        sin = jnp.tile(sin, (repeat, 1))
    xf = x.astype(jnp.float32)
    a, b = xf[..., 0::2], xf[..., 1::2]
    ra = a * cos - b * sin
    rb = a * sin + b * cos
    return jnp.stack([ra, rb], axis=-1).reshape(x.shape).astype(x.dtype)


class RoPEAttention(nn.Module):
    """Single-projection attention with axial RoPE on q/k; the trailing
    `num_k_exclude` key tokens (object pointers) skip rotation and an
    additive `k_bias` masks invalid fixed slots (reference
    blocks.py:405-485 RoPEAttention)."""

    num_heads: int = 1
    kv_in_dim: Optional[int] = None
    q_hw: Tuple[int, int] = (64, 64)  # static spatial grid of the queries
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude: int = 0, k_bias=None):
        c = q.shape[-1]
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(v)

        def heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        cos, sin = axial_rope_tables(self.q_hw[1], self.q_hw[0], hd)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        q = apply_rope(q, cos, sin)
        n_rope = k.shape[2] - num_k_exclude
        assert n_rope % (self.q_hw[0] * self.q_hw[1]) == 0, "memory keys must tile the query grid"
        k_rot = apply_rope(k[:, :, :n_rope], cos, sin, repeat=n_rope // (self.q_hw[0] * self.q_hw[1]))
        k = jnp.concatenate([k_rot, k[:, :, n_rope:]], axis=2) if num_k_exclude else k_rot

        attn = jnp.einsum("bnld,bnmd->bnlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        if k_bias is not None:
            # (L,) shared or (B, L) per-batch-row slot masking
            kb = k_bias[None, :] if k_bias.ndim == 1 else k_bias
            attn = attn + kb[:, None, None, :]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
        b = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """Pre-norm self-attn + cross-attn(memory) + FFN, all residual
    (reference memory_attention.py:12-154). kv_in_dim=64 for the memory."""

    d_model: int = 256
    dim_feedforward: int = 2048
    q_hw: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_pos, num_obj_ptr_tokens: int = 0, k_bias=None):
        t2 = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tgt).astype(self.dtype)
        tgt = tgt + RoPEAttention(q_hw=self.q_hw, dtype=self.dtype, name="self_attn")(t2, t2, t2)
        t2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")(tgt).astype(self.dtype)
        tgt = tgt + RoPEAttention(q_hw=self.q_hw, dtype=self.dtype, name="cross_attn_image")(
            t2, memory + memory_pos, memory, num_k_exclude=num_obj_ptr_tokens, k_bias=k_bias
        )
        t2 = nn.LayerNorm(dtype=jnp.float32, name="norm3")(tgt).astype(self.dtype)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(t2)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(jax.nn.relu(h))
        return tgt + h


class MemoryAttention(nn.Module):
    """Stack of MemoryAttentionLayers + final norm; queries get
    0.1 * pos at the input (reference memory_attention.py:157-299)."""

    num_layers: int = 4
    d_model: int = 256
    q_hw: Tuple[int, int] = (64, 64)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos, num_obj_ptr_tokens: int = 0, k_bias=None):
        x = curr + 0.1 * curr_pos
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, q_hw=self.q_hw, dtype=self.dtype,
                                     name=f"layers_{i}")(x, memory, memory_pos,
                                                         num_obj_ptr_tokens, k_bias)
        return nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(self.dtype)


# ---------------------------------------------------------------------------
# Memory encoder (reference encoders.py:357-439, blocks.py:54-261)
# ---------------------------------------------------------------------------


class CXBlock(nn.Module):
    """ConvNeXt block: 7x7 depthwise + LN + 2 pointwise + layer scale
    (reference blocks.py:114-205)."""

    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = LayerNorm2d(name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32)
        return inp + gamma.astype(x.dtype) * x


class MemoryEncoder(nn.Module):
    """Fuse the top-level pixel features with the (scaled-sigmoid) predicted
    mask into a compact 64-d memory map (reference encoders.py:357-439)."""

    out_dim: int = 64
    in_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, mask):  # pix (B,h,w,256); mask (B,16h,16w,1)
        # MaskDownSampler: 4 x [conv k3 s2 p1, LN2d, GELU], channels x4 each
        m = mask.astype(self.dtype)
        ch = 1
        for i in range(4):
            ch *= 4
            m = nn.Conv(ch, (3, 3), (2, 2), padding=1, dtype=self.dtype, name=f"mask_down_{i}")(m)
            m = LayerNorm2d(name=f"mask_down_ln_{i}")(m)
            m = jax.nn.gelu(m, approximate=False)
        m = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="mask_down_out")(m)

        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, name="pix_feat_proj")(pix_feat)
        x = x + m
        x = CXBlock(self.in_dim, dtype=self.dtype, name="fuser_0")(x)
        x = CXBlock(self.in_dim, dtype=self.dtype, name="fuser_1")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="out_proj")(x)


# ---------------------------------------------------------------------------
# SAM2 mask decoder (reference decoders.py:175-515)
# ---------------------------------------------------------------------------


class SAM2MaskDecoder(nn.Module):
    """SAM mask decoder extended with an object-score token, high-res skip
    features in the upscaler, sigmoid IoU head and stability-based dynamic
    multimask selection (reference decoders.py:175-515)."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 feat_s0, feat_s1, multimask: bool = False):
        """image_embeddings (B,h,w,256); feat_s1 (B,2h,2w,64), feat_s0
        (B,4h,4w,32) pre-projected by conv_s1/conv_s0. Returns
        (masks (B,1|3,4h,4w), iou (B,1|3), sam_tokens (B,1|3,C),
        obj_score_logits (B,1))."""
        nm = self.num_multimask_outputs + 1
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim), jnp.float32)
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (nm, self.transformer_dim), jnp.float32)
        b = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([obj_token, iou_token, mask_tokens], axis=0)[None],
            (b, 2 + nm, self.transformer_dim),
        ).astype(self.dtype)
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embeddings + dense_prompt[None] if dense_prompt.ndim == 3 else image_embeddings + dense_prompt
        hs, src = TwoWayTransformer(dtype=self.dtype, name="transformer")(src, image_pe[None], tokens)
        obj_out, iou_out = hs[:, 0], hs[:, 1]
        mask_out = hs[:, 2 : 2 + nm]

        h, w = image_embeddings.shape[1:3]
        srcm = src.reshape(b, h, w, self.transformer_dim)
        # upscale with high-res skips (decoders.py:428-434)
        u = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), (2, 2), dtype=self.dtype, name="upscale_0")(srcm)
        u = LayerNorm2d(name="upscale_1")(u + feat_s1)
        u = jax.nn.gelu(u, approximate=False)
        u = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), (2, 2), dtype=self.dtype, name="upscale_2")(u)
        u = jax.nn.gelu(u + feat_s0, approximate=False)

        hyper = jnp.stack(
            [
                _HyperMLP(self.transformer_dim // 8, self.transformer_dim, dtype=self.dtype,
                          name=f"output_hypernetworks_mlps_{i}")(mask_out[:, i])
                for i in range(nm)
            ],
            axis=1,
        )
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper.astype(jnp.float32), u.astype(jnp.float32))
        iou_pred = _HyperMLP(nm, self.transformer_dim, sigmoid=True, dtype=self.dtype,
                             name="iou_prediction_head")(iou_out).astype(jnp.float32)
        obj_score = _HyperMLP(1, self.transformer_dim, dtype=self.dtype,
                              name="pred_obj_score_head")(obj_out).astype(jnp.float32)

        if multimask:
            sel_masks, sel_iou = masks[:, 1:], iou_pred[:, 1:]
            sam_tokens = mask_out[:, 1:]  # use_multimask_token_for_obj_ptr
        else:
            sel_masks, sel_iou = self._dynamic_select(masks, iou_pred)
            sam_tokens = mask_out[:, 0:1]
        return sel_masks, sel_iou, sam_tokens, obj_score

    def _dynamic_select(self, masks, iou_pred):
        """Single-mask output with stability fallback to the best multimask
        (decoders.py:454-515) — branchless jnp.where, jit-friendly."""
        flat = masks[:, 0].reshape(masks.shape[0], -1)
        area_i = (flat > self.stability_delta).sum(-1).astype(jnp.float32)
        area_u = (flat > -self.stability_delta).sum(-1).astype(jnp.float32)
        stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)
        stable = stability >= self.stability_thresh
        best = jnp.argmax(iou_pred[:, 1:], axis=-1) + 1
        bi = jnp.arange(masks.shape[0])
        out_mask = jnp.where(stable[:, None, None, None], masks[:, 0:1], masks[bi, best][:, None])
        out_iou = jnp.where(stable[:, None], iou_pred[:, 0:1], iou_pred[bi, best][:, None])
        return out_mask, out_iou


# ---------------------------------------------------------------------------
# SAM2Model (reference modules/sam.py:105-1004)
# ---------------------------------------------------------------------------

NO_OBJ_SCORE = -1024.0  # reference sam.py:24


def get_1d_sine_pe(pos, dim, temperature=10000.0):
    """1D sine positional embedding (reference utils.py:63-87)."""
    half = dim // 2
    dim_t = temperature ** (2 * (jnp.arange(half, dtype=jnp.float32) // 2) / half)
    pe = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=-1)


class SAM2Model(nn.Module):
    """Hiera encoder + memory attention/encoder + SAM2 heads. All public
    methods are fixed-shape and jittable; the video loop lives in the
    SAM2 facade (reference modules/sam.py SAM2Model + predict.py)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    img_size: int = 1024
    num_maskmem: int = 7
    max_obj_ptrs: int = 16
    hidden_dim: int = 256
    mem_dim: int = 64
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    # SAM2.1 extras (build.py:266,292-294 is_sam2_1): spatial no-object
    # memory embedding + projected/signed temporal pos enc on pointers
    v21: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        g = self.img_size // 16
        self.trunk = Hiera(
            embed_dim=self.embed_dim, num_heads=self.num_heads, stages=self.stages,
            global_att_blocks=self.global_att_blocks, window_spec=self.window_spec,
            window_pos_embed_bkg_spatial_size=self.window_pos_embed_bkg_spatial_size,
            dtype=self.dtype, name="image_encoder_trunk",
        )
        self.neck = FpnNeck(backbone_channel_list=self.backbone_channel_list,
                            dtype=self.dtype, name="image_encoder_neck")
        self.memory_attention = MemoryAttention(q_hw=(g, g), dtype=self.dtype, name="memory_attention")
        self.memory_encoder = MemoryEncoder(dtype=self.dtype, name="memory_encoder")
        self.sam_prompt_encoder = PromptEncoder(
            image_embedding_size=(g, g), input_image_size=(self.img_size,) * 2,
            dtype=self.dtype, name="sam_prompt_encoder",
        )
        self.sam_mask_decoder = SAM2MaskDecoder(dtype=self.dtype, name="sam_mask_decoder")
        # high-res skip projections (decoders.py:287-289, applied in
        # forward_image like reference sam.py:594-602)
        self.conv_s0 = nn.Conv(self.hidden_dim // 8, (1, 1), dtype=self.dtype, name="conv_s0")
        self.conv_s1 = nn.Conv(self.hidden_dim // 4, (1, 1), dtype=self.dtype, name="conv_s1")
        # memory tokens (sam.py:271-279)
        self.maskmem_tpos_enc = self.param("maskmem_tpos_enc", nn.initializers.normal(0.02),
                                           (self.num_maskmem, 1, 1, self.mem_dim), jnp.float32)
        self.no_mem_embed = self.param("no_mem_embed", nn.initializers.normal(0.02),
                                       (1, 1, self.hidden_dim), jnp.float32)
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", nn.initializers.normal(0.02),
                                         (1, 1, self.hidden_dim), jnp.float32)
        self.no_obj_ptr = self.param("no_obj_ptr", nn.initializers.normal(0.02),
                                     (1, self.hidden_dim), jnp.float32)
        self.obj_ptr_proj = _HyperMLP(self.hidden_dim, self.hidden_dim, dtype=self.dtype,
                                      name="obj_ptr_proj")
        self.mask_downsample = nn.Conv(1, (4, 4), (4, 4), dtype=self.dtype, name="mask_downsample")
        if self.v21:
            # sam2.1: spatial no-object memory embedding (sam.py:314-317)
            # + a linear projection on the pointer temporal pos enc
            # (sam.py:385-388 obj_ptr_tpos_proj)
            self.no_obj_embed_spatial = self.param("no_obj_embed_spatial",
                                                   nn.initializers.normal(0.02),
                                                   (1, self.mem_dim), jnp.float32)
            self.obj_ptr_tpos_proj = nn.Dense(self.mem_dim, dtype=self.dtype, name="obj_ptr_tpos_proj")

    # -- image path ------------------------------------------------------
    def encode(self, x):
        """(B, S, S, 3) -> (feat_s0 (B,S/4,S/4,32), feat_s1 (B,S/8,S/8,64),
        pix_top (B,S/16,S/16,256)). scalp=1 drops the stride-32 level
        (reference encoders.py:501-513, sam.py:594-602)."""
        feats = self.neck(self.trunk(x))[:-1]  # scalp=1
        return self.conv_s0(feats[0]), self.conv_s1(feats[1]), feats[2]

    def _pos_top(self, h, w):
        return jnp.asarray(sine_pos_embed(h, w, self.hidden_dim))

    def no_mem_features(self, pix_top):
        """First (conditioning) frame: directly add the no-memory embedding
        (sam.py:756-762 directly_add_no_mem_embed)."""
        b, h, w, c = pix_top.shape
        x = pix_top.reshape(b, h * w, c) + self.no_mem_embed.astype(pix_top.dtype)
        return x.reshape(b, h, w, c)

    def condition_features(self, pix_top, mem_feats, mem_pos, mem_valid, mem_tpos_idx,
                           obj_ptrs, ptr_tdiff, ptr_valid):
        """Fuse the current frame with the fixed-slot memory bank
        (sam.py:619-781 _prepare_memory_conditioned_features).

        pix_top (B,h,w,256); mem_feats (S,h*w,64) + mem_pos same + mem_valid
        (S,) + mem_tpos_idx (S,) int index into maskmem_tpos_enc (t_rel-1
        for a frame t_rel steps back, num_maskmem-1 for the conditioning
        frame — sam.py:683-695); obj_ptrs (P,256), ptr_tdiff (P,) frame
        distances, ptr_valid (P,). Invalid slots are masked out of the
        cross-attention softmax.

        All bank inputs also accept a leading per-object batch dim matching
        pix_top's B (multi-object tracking — reference SAM2VideoPredictor
        batches objects of the same frame, predict.py propagate_in_video):
        mem_feats (B,S,hw,64), mem_valid (B,S), obj_ptrs (B,P,256), ...
        """
        b, h, w, c = pix_top.shape
        curr = pix_top.reshape(b, h * w, c)
        curr_pos = self._pos_top(h, w).reshape(1, h * w, c).astype(curr.dtype)

        if mem_feats.ndim == 3:  # shared (single-object) bank -> B copies
            mem_feats, mem_pos = mem_feats[None], mem_pos[None]
            mem_valid, mem_tpos_idx = mem_valid[None], mem_tpos_idx[None]
            obj_ptrs, ptr_tdiff, ptr_valid = obj_ptrs[None], ptr_tdiff[None], ptr_valid[None]

        # temporal positional encoding per slot (sam.py:693-694)
        bb = mem_feats.shape[0]
        tpos = self.maskmem_tpos_enc[mem_tpos_idx].reshape(bb, -1, 1, self.mem_dim)
        spatial = mem_feats.reshape(bb, -1, self.mem_dim)  # (B', S*hw, 64)
        spatial_pos = (mem_pos + tpos).reshape(bb, -1, self.mem_dim)
        spatial_bias = jnp.repeat(jnp.where(mem_valid, 0.0, -1e9), h * w, axis=-1)

        # object pointers: 256-d ptr -> 4 x 64-d tokens; sine tpos embedding
        # (sam.py:737-753)
        n_split = self.hidden_dim // self.mem_dim
        tpos_dim = self.hidden_dim if self.v21 else self.mem_dim
        tpos = get_1d_sine_pe(ptr_tdiff / max(self.max_obj_ptrs - 1, 1), tpos_dim)
        if self.v21:  # project 256-d tpos down to mem_dim (sam.py:742)
            tpos = self.obj_ptr_tpos_proj(tpos.astype(self.dtype)).astype(jnp.float32)
        ptr_tok = obj_ptrs.reshape(bb, -1, n_split, self.mem_dim).reshape(bb, -1, self.mem_dim)
        ptr_pos = jnp.repeat(tpos, n_split, axis=-2).astype(ptr_tok.dtype)
        ptr_bias = jnp.repeat(jnp.where(ptr_valid, 0.0, -1e9), n_split, axis=-1)

        memory = jnp.concatenate([spatial, jnp.asarray(ptr_tok, spatial.dtype)], axis=1)
        memory_pos = jnp.concatenate([spatial_pos, ptr_pos], axis=1)
        k_bias = jnp.concatenate([spatial_bias, ptr_bias], axis=-1)
        memory = jnp.broadcast_to(memory, (b,) + memory.shape[1:])
        memory_pos = jnp.broadcast_to(memory_pos, (b,) + memory_pos.shape[1:])
        k_bias = jnp.broadcast_to(k_bias, (b, k_bias.shape[-1]))

        fused = self.memory_attention(curr, curr_pos, memory, memory_pos,
                                      num_obj_ptr_tokens=ptr_tok.shape[1], k_bias=k_bias)
        return fused.reshape(b, h, w, c)

    def sam_heads(self, pix_feat, points, labels, feat_s0, feat_s1, multimask: bool = False):
        """Prompt encode + mask decode (sam.py:392-545 _forward_sam_heads).
        Returns (low_res_multimasks, ious, best low-res mask, obj_ptr,
        obj_score_logits)."""
        b = pix_feat.shape[0]
        sparse, dense = self.sam_prompt_encoder(points, labels)
        pe = self.sam_prompt_encoder.image_pe()
        masks, ious, sam_tokens, obj_score = self.sam_mask_decoder(
            pix_feat, pe, sparse, dense, feat_s0, feat_s1, multimask=multimask
        )
        # hard no-object gating of the spatial masks (sam.py:496-500)
        is_obj = obj_score[:, 0] > 0
        masks = jnp.where(is_obj[:, None, None, None], masks, NO_OBJ_SCORE)
        best = jnp.argmax(ious, axis=-1)
        bi = jnp.arange(b)
        best_mask = masks[bi, best][:, None]
        sam_token = sam_tokens[bi, jnp.minimum(best, sam_tokens.shape[1] - 1)]
        obj_ptr = self.obj_ptr_proj(sam_token.astype(self.dtype))
        # fixed_no_obj_ptr mixing (sam.py:526-535)
        lam = is_obj.astype(jnp.float32)[:, None]
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return masks, ious, best_mask, obj_ptr, obj_score

    def encode_memory(self, pix_top, best_mask_high_res, obj_score):
        """Predicted mask -> new memory slot (sam.py:783-825
        _encode_new_memory). best_mask_high_res is (B, S, S, 1) logits at
        image resolution."""
        m = jax.nn.sigmoid(best_mask_high_res)
        m = m * self.sigmoid_scale_for_mem_enc + self.sigmoid_bias_for_mem_enc
        feats = self.memory_encoder(pix_top, m)  # (B, h, w, 64)
        if self.v21:  # occluded-frame marker in the spatial memory (sam.py:819-823)
            is_obj = (obj_score[:, 0] > 0).astype(feats.dtype)
            feats = feats + (1.0 - is_obj)[:, None, None, None] * \
                self.no_obj_embed_spatial.reshape(1, 1, 1, -1).astype(feats.dtype)
        b, h, w, c = feats.shape
        pos = jnp.asarray(sine_pos_embed(h, w, self.mem_dim))[None]
        return feats.reshape(b, h * w, c), jnp.broadcast_to(pos.reshape(1, h * w, c), (b, h * w, c))

    def __call__(self, x, points, labels):
        """Init/compile path: encode + no-mem conditioning + heads +
        memory encoder (materializes every parameter)."""
        s0, s1, top = self.encode(x)
        pix = self.no_mem_features(top)
        masks, ious, best_mask, obj_ptr, obj_score = self.sam_heads(pix, points, labels, s0, s1, multimask=True)
        hi = jax.image.resize(best_mask[:, 0], (x.shape[0], x.shape[1], x.shape[2]),
                              method="bilinear")[..., None]
        mem, mem_pos = self.encode_memory(top, hi, obj_score)
        # materialize the memory-attention branch with a 1-frame bank
        fused = self.condition_features(
            top, mem[:1], mem_pos[:1], jnp.ones((1,), bool), jnp.zeros((1,), jnp.int32),
            jnp.zeros((self.max_obj_ptrs, self.hidden_dim)), jnp.zeros((self.max_obj_ptrs,)),
            jnp.zeros((self.max_obj_ptrs,), bool).at[0].set(True),
        )
        self.mask_downsample(jnp.zeros((1, self.img_size, self.img_size, 1), self.dtype))
        return masks, ious, obj_ptr, obj_score, fused, mem
