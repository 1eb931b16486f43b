"""RT-DETR transformer modules (AIFI, deformable decoder, RTDETRDecoder).

TPU-native re-designs of reference nn/modules/transformer.py:28-713 and
the RTDETRDecoder head (reference nn/modules/head.py:570-838):

  * NHWC throughout; AIFI flattens (B,H,W,C) -> (B,HW,C) directly (the
    reference permutes NCHW through HBM twice, transformer.py:177-178);
  * multi-scale deformable attention's `F.grid_sample` becomes four
    corner gathers + a bilinear blend — static shapes, XLA-friendly,
    no dynamic grid op (reference nn/modules/utils.py
    multi_scale_deformable_attn_pytorch);
  * the contrastive-denoising (CDN) group is rebuilt fixed-shape: the
    group count derives from the *static* padded-GT capacity instead of
    the batch's dynamic max GT count (reference models/utils/ops.py:160
    get_cdn_group sizes tensors by `max(gt_groups)`), so the whole
    train step stays one compiled graph. Padded GT slots carry zero
    embeddings and are masked out of the loss;
  * the decoder layer stack is unrolled at trace time (6 layers); the
    train-time bbox-refinement ladder uses `stop_gradient` exactly where
    the reference calls `.detach()` (transformer.py:693-711).

Weight layout matches torch for porting: MultiheadAttention uses the
packed `in_proj` + `out_proj` scheme of modules.WindowMHSA.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv, _DenseParams

_xavier = nn.initializers.xavier_uniform()


def inverse_sigmoid(x, eps: float = 1e-5):
    """Numerically-safe logit (reference nn/modules/utils.py:inverse_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1.0 - x, eps, None))


class MHA(nn.Module):
    """torch nn.MultiheadAttention analog with distinct q/k/v inputs.

    Packed (C, 3C) in-projection + biased out-projection so reference
    `in_proj_weight`/`out_proj` tensors port 1:1 (cf. modules.WindowMHSA,
    which only covers the self-attention q=k=v case).
    """

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None):
        c = q.shape[-1]
        hd = c // self.num_heads
        w, b = _DenseParams(3 * c, _xavier, name="in_proj")(c)
        w = w.astype(self.dtype)
        b = b.astype(self.dtype)
        q = q @ w[:, :c] + b[:c]
        k = k @ w[:, c : 2 * c] + b[c : 2 * c]
        v = v @ w[:, 2 * c :] + b[2 * c :]

        def heads(t):
            n, l, _ = t.shape
            return t.reshape(n, l, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("nhld,nhmd->nhlm", q, k, preferred_element_type=jnp.float32) / math.sqrt(hd)
        if attn_mask is not None:
            # boolean mask, True = blocked (torch attn_mask convention)
            attn = jnp.where(attn_mask[None, None], -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhlm,nhmd->nhld", attn, v)
        n, _, l, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(n, l, c)
        return nn.Dense(c, kernel_init=_xavier, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm (default) transformer encoder layer (reference
    transformer.py:28-140). Dropout omitted — every in-tree config uses
    dropout=0.0."""

    cm: int = 2048
    num_heads: int = 8
    normalize_before: bool = False
    act: str = "gelu"
    dtype: Any = jnp.float32

    def _ffn(self, x):
        h = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False) if self.act == "gelu" else jax.nn.relu(h)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)

    @nn.compact
    def __call__(self, src, pos: Optional[jnp.ndarray] = None, train: bool = False):
        n1 = nn.LayerNorm(dtype=jnp.float32, name="norm1")
        n2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")
        ma = MHA(self.num_heads, dtype=self.dtype, name="ma")
        if self.normalize_before:
            s2 = n1(src).astype(self.dtype)
            q = s2 if pos is None else s2 + pos
            src = src + ma(q, q, s2)
            s2 = n2(src).astype(self.dtype)
            return src + self._ffn(s2)
        q = src if pos is None else src + pos
        src = n1(src + ma(q, q, src)).astype(self.dtype)
        return n2(src + self._ffn(src)).astype(self.dtype)


def sincos_2d_pos(w: int, h: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    """2D sine-cosine table, bit-matching the reference's x-major flatten
    quirk (transformer.py:180-205 builds the grid with indexing='ij' over
    (w, h) while features flatten row-major; we reproduce the table as-is
    so ported weights see identical positions)."""
    assert dim % 4 == 0, "embed dim must be divisible by 4"
    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32), indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
    out_w = grid_w.reshape(-1, 1) @ omega[None]
    out_h = grid_h.reshape(-1, 1) @ omega[None]
    return np.concatenate([np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1)[None]


class AIFI(nn.Module):
    """Attention-based intra-scale feature interaction (reference
    transformer.py:143-205): one encoder layer over the flattened P5 map
    with a fixed 2D sincos positional table (constant-folded by XLA)."""

    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        b, h, w, c = x.shape
        pos = jnp.asarray(sincos_2d_pos(w, h, c), dtype=self.dtype)
        y = TransformerEncoderLayer(self.cm, self.num_heads, dtype=self.dtype, name="enc")(
            x.reshape(b, h * w, c), pos=pos, train=train
        )
        return y.reshape(b, h, w, c)


class MLP(nn.Module):
    """N-layer perceptron with ReLU between layers (reference
    transformer.py:317-359); torch child names `layers.{i}` -> `layers_{i}`."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    sigmoid: bool = False
    dtype: Any = jnp.float32
    last_init: Optional[Any] = None  # (kernel_init, bias_init) override for the final layer

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feats = self.output_dim if last else self.hidden_dim
            kw = {}
            if last and self.last_init is not None:
                kw = {"kernel_init": self.last_init[0], "bias_init": self.last_init[1]}
            x = nn.Dense(feats, dtype=self.dtype, name=f"layers_{i}", **kw)(x)
            if not last:
                x = jax.nn.relu(x)
        return jax.nn.sigmoid(x) if self.sigmoid else x


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Reference MSDeformAttn._reset_parameters grid bias (transformer.py:455-468):
    heads start sampling on a unit circle scaled by point index."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (nh, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference transformer.py:406-517).

    grid_sample(mode=bilinear, padding=zeros, align_corners=False) is
    re-expressed as 4 corner gathers per sample point with out-of-range
    corners weighted to zero — identical values, static shapes.
    """

    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes: Sequence[Tuple[int, int]]):
        # query (B, Lq, C); refer_bbox (B, Lq, 1 or nl, 4) in [0,1];
        # value (B, Lv, C); value_shapes static [(H, W)] * n_levels
        bs, len_q, c = query.shape
        nh, npnt, nl = self.n_heads, self.n_points, self.n_levels
        hd = c // nh

        value = nn.Dense(c, dtype=self.dtype, name="value_proj")(value)
        value = value.reshape(bs, -1, nh, hd)

        off = nn.Dense(
            nh * nl * npnt * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, dtype=jnp.float32: jnp.asarray(
                _offset_bias_init(nh, nl, npnt), dtype
            ),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(bs, len_q, nh, nl, npnt, 2)
        aw = nn.Dense(
            nh * nl * npnt,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query).reshape(bs, len_q, nh, nl * npnt)
        aw = jax.nn.softmax(aw.astype(jnp.float32), axis=-1).reshape(bs, len_q, nh, nl, npnt)

        off = off.astype(jnp.float32)
        refer_bbox = refer_bbox.astype(jnp.float32)
        if refer_bbox.shape[-1] == 4:
            loc = refer_bbox[:, :, None, :, None, :2] + off / npnt * refer_bbox[:, :, None, :, None, 2:] * 0.5
        else:  # 2-point reference (not used by RT-DETR configs; kept for parity)
            norm = jnp.asarray([[wh[1], wh[0]] for wh in value_shapes], jnp.float32)
            loc = refer_bbox[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        # loc: (B, Lq, nh, nl, npnt, 2) normalized [0,1]

        start = 0
        out = jnp.zeros((bs, len_q, nh, hd), jnp.float32)
        for l, (hgt, wid) in enumerate(value_shapes):
            v_l = value[:, start : start + hgt * wid].astype(jnp.float32)  # (B, HW, nh, hd)
            start += hgt * wid
            g = loc[:, :, :, l]  # (B, Lq, nh, npnt, 2)
            # grid_sample align_corners=False: pixel = coord * size - 0.5
            px = g[..., 0] * wid - 0.5
            py = g[..., 1] * hgt - 0.5
            x0 = jnp.floor(px)
            y0 = jnp.floor(py)
            fx = px - x0
            fy = py - y0
            sampled = 0.0
            for dy, dx, wgt in (
                (0, 0, (1 - fx) * (1 - fy)),
                (0, 1, fx * (1 - fy)),
                (1, 0, (1 - fx) * fy),
                (1, 1, fx * fy),
            ):
                xx = x0 + dx
                yy = y0 + dy
                ok = (xx >= 0) & (xx < wid) & (yy >= 0) & (yy < hgt)
                idx = (
                    jnp.clip(yy, 0, hgt - 1) * wid + jnp.clip(xx, 0, wid - 1)
                ).astype(jnp.int32)  # (B, Lq, nh, npnt)
                # gather per head: (B, Lq*npnt, nh) indices into axis 1
                idx_t = idx.transpose(0, 1, 3, 2).reshape(bs, len_q * npnt, nh)
                gath = jnp.take_along_axis(v_l, idx_t[..., None], axis=1)  # (B, Lq*npnt, nh, hd)
                gath = gath.reshape(bs, len_q, npnt, nh, hd).transpose(0, 1, 3, 2, 4)
                sampled = sampled + gath * (wgt * ok)[..., None]  # (B, Lq, nh, npnt, hd)
            # sampled: (B, Lq, nh, npnt, hd); weight by attention
            out = out + (sampled * aw[:, :, :, l, :, None]).sum(axis=3)
        out = out.reshape(bs, len_q, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference
    transformer.py:520-626)."""

    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None, query_pos=None):
        q = embed if query_pos is None else embed + query_pos
        tgt = MHA(self.n_heads, dtype=self.dtype, name="self_attn")(q, q, embed, attn_mask=attn_mask)
        embed = nn.LayerNorm(dtype=jnp.float32, name="norm1")(embed + tgt).astype(self.dtype)

        tgt = MSDeformAttn(self.n_levels, self.n_heads, self.n_points, dtype=self.dtype, name="cross_attn")(
            embed if query_pos is None else embed + query_pos, refer_bbox[:, :, None, :], feats, shapes
        )
        embed = nn.LayerNorm(dtype=jnp.float32, name="norm2")(embed + tgt).astype(self.dtype)

        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        h = nn.Dense(embed.shape[-1], dtype=self.dtype, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(embed + h).astype(self.dtype)


def build_cdn_attn_mask(num_dn: int, max_nums: int, num_group: int, nq: int) -> np.ndarray:
    """Static CDN attention mask (True = blocked), replicating reference
    models/utils/ops.py:244-256 with the static padded-GT capacity playing
    the role of `max_nums`."""
    tgt = num_dn + nq
    m = np.zeros((tgt, tgt), dtype=bool)
    m[num_dn:, :num_dn] = True  # match queries cannot see dn queries
    for i in range(num_group):
        lo, hi = max_nums * 2 * i, max_nums * 2 * (i + 1)
        m[lo:hi, hi:num_dn] = True
        m[lo:hi, :lo] = True
    return m


def get_cdn_group(
    gt_cls: jnp.ndarray,  # (B, G) int
    gt_bbox: jnp.ndarray,  # (B, G, 4) normalized xywh
    gt_mask: jnp.ndarray,  # (B, G) 0/1
    class_embed: jnp.ndarray,  # (nc, hd)
    rng: jax.Array,
    num_classes: int,
    num_dn: int = 100,
    cls_noise_ratio: float = 0.5,
    box_noise_scale: float = 1.0,
):
    """Fixed-shape contrastive denoising group (reference
    models/utils/ops.py:160-268).

    Deviation (documented): the reference sizes the group count by the
    batch's dynamic max GT count; here the group count comes from the
    static GT slot capacity, and padded slots are masked. Returns
    (dn_embed (B, num_dn_total, hd), dn_bbox_logit (B, num_dn_total, 4),
    dn_valid (B, num_dn_total), num_group).
    """
    from ..ops.boxes import xywh2xyxy, xyxy2xywh

    b, g = gt_cls.shape
    ng = max(1, num_dn // g)
    total = 2 * ng * g
    mask2 = jnp.tile(gt_mask.astype(jnp.float32), (1, 2 * ng))  # (B, total)
    cls2 = jnp.tile(gt_cls, (1, 2 * ng))
    bbox2 = jnp.tile(gt_bbox.astype(jnp.float32), (1, 2 * ng, 1))
    # copies 0..ng-1 positive, ng..2ng-1 negative (reference neg_idx)
    neg = (jnp.arange(total) // g) >= ng

    k_flip, k_cls, k_sign, k_part = jax.random.split(rng, 4)
    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k_flip, (b, total)) < (cls_noise_ratio * 0.5)
        rand_cls = jax.random.randint(k_cls, (b, total), 0, num_classes)
        cls2 = jnp.where(flip, rand_cls, cls2)
    if box_noise_scale > 0:
        known = xywh2xyxy(bbox2)
        diff = jnp.tile(bbox2[..., 2:] * 0.5, (1, 1, 2)) * box_noise_scale
        sign = jax.random.randint(k_sign, (b, total, 4), 0, 2).astype(jnp.float32) * 2.0 - 1.0
        part = jax.random.uniform(k_part, (b, total, 4)) + neg[None, :, None].astype(jnp.float32)
        known = jnp.clip(known + part * sign * diff, 0.0, 1.0)
        bbox2 = xyxy2xywh(known)
    dn_bbox = inverse_sigmoid(bbox2, eps=1e-6) * mask2[..., None]
    dn_embed = class_embed[jnp.clip(cls2, 0, num_classes - 1)] * mask2[..., None]
    return dn_embed, dn_bbox, mask2, ng


class RTDETRDecoder(nn.Module):
    """RT-DETR hybrid-encoder decoder head (reference head.py:570-838).

    Train returns a dict of stacked per-layer outputs (enc + dn + match
    queries, static shapes); eval returns ((B, nq, 4+nc) with sigmoid
    scores, aux) like the reference's `(y, x)` tuple.
    """

    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    num_dn: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    learnt_init_query: bool = False
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    def _anchors(self, shapes, grid_size: float = 0.05, eps: float = 1e-2):
        """Static anchor grid + validity (reference head.py:707-735);
        numpy so XLA sees constants."""
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
            gxy = (np.stack([gx, gy], -1) + 0.5) / np.asarray([w, h], np.float32)
            wh = np.ones_like(gxy) * grid_size * (2.0**i)
            anchors.append(np.concatenate([gxy, wh], -1).reshape(-1, 4))
        a = np.concatenate(anchors, 0)[None]  # (1, A, 4)
        valid = ((a > eps) & (a < 1 - eps)).all(-1, keepdims=True)
        a = np.log(a / (1 - a))
        a = np.where(valid, a, np.inf)
        return jnp.asarray(a), jnp.asarray(valid.astype(np.float32))

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False, targets=None):
        b = xs[0].shape[0]
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx

        # ---- encoder input (reference _get_encoder_input) ----
        shapes = [(x.shape[1], x.shape[2]) for x in xs]
        proj = [
            Conv(self.hd, 1, act=False, dtype=self.dtype, name=f"input_proj_{i}")(x, train)
            for i, x in enumerate(xs)
        ]
        feats = jnp.concatenate([p.reshape(b, -1, self.hd) for p in proj], axis=1)  # (B, A, hd)

        # ---- denoising group ----
        dn_embed = dn_bbox = None
        num_dn = 0
        class_embed = self.param(
            "denoising_class_embed", nn.initializers.normal(1.0), (self.nc, self.hd), jnp.float32
        )
        if train and targets is not None:
            g = min(targets["cls"].shape[1], max(self.num_dn, 1))
            ng = max(1, self.num_dn // g)
            num_dn = 2 * ng * g
            dn_embed, dn_bbox, _, _ = get_cdn_group(
                targets["cls"][:, :g],
                targets["bboxes"][:, :g],
                targets["mask"][:, :g],
                class_embed.astype(self.dtype),
                self.make_rng("dn"),
                self.nc,
                self.num_dn,
                self.label_noise_ratio,
                self.box_noise_scale,
            )
            attn_mask = jnp.asarray(build_cdn_attn_mask(num_dn, g, ng, self.nq))
        else:
            attn_mask = None

        # ---- decoder input (reference _get_decoder_input) ----
        anchors, valid_mask = self._anchors(shapes)
        feats_m = valid_mask.astype(feats.dtype) * feats
        enc_feats = nn.Dense(self.hd, kernel_init=_xavier, dtype=self.dtype, name="enc_output_0")(feats_m)
        enc_feats = nn.LayerNorm(dtype=jnp.float32, name="enc_output_1")(enc_feats).astype(self.dtype)

        bias_cls = float(-math.log((1 - 0.01) / 0.01)) / 80.0 * self.nc
        enc_scores_all = nn.Dense(
            self.nc,
            bias_init=nn.initializers.constant(bias_cls),
            dtype=self.dtype,
            name="enc_score_head",
        )(enc_feats)  # (B, A, nc)

        # nq is clamped to the anchor count so tiny-image shape checks build
        # (at 640px A=8400 >> nq=300 and the clamp is a no-op).
        nq = min(self.nq, enc_scores_all.shape[1])
        topk_val, topk_ind = jax.lax.top_k(
            enc_scores_all.astype(jnp.float32).max(-1), nq
        )  # (B, nq)
        top_feats = jnp.take_along_axis(enc_feats, topk_ind[..., None], axis=1)  # (B, nq, hd)
        top_anchors = jnp.take_along_axis(
            jnp.broadcast_to(anchors, (b, anchors.shape[1], 4)), topk_ind[..., None], axis=1
        )
        zero_last = (nn.initializers.zeros, nn.initializers.zeros)
        refer = (
            MLP(self.hd, 4, 3, dtype=self.dtype, last_init=zero_last, name="enc_bbox_head")(top_feats)
            + top_anchors.astype(self.dtype)
        )
        enc_bboxes = jax.nn.sigmoid(refer.astype(jnp.float32))
        enc_scores = jnp.take_along_axis(enc_scores_all, topk_ind[..., None], axis=1)  # (B, nq, nc)

        if self.learnt_init_query:
            tgt = self.param("tgt_embed", _xavier, (self.nq, self.hd), jnp.float32)
            embed = jnp.broadcast_to(tgt[None, :nq].astype(self.dtype), (b, nq, self.hd))
        else:
            embed = top_feats
        if train:
            refer = jax.lax.stop_gradient(refer)
            if not self.learnt_init_query:
                embed = jax.lax.stop_gradient(embed)
        if dn_embed is not None:
            embed = jnp.concatenate([dn_embed.astype(self.dtype), embed], axis=1)
            refer = jnp.concatenate([dn_bbox.astype(refer.dtype), refer], axis=1)

        # ---- decoder (reference DeformableTransformerDecoder.forward) ----
        pos_mlp = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        layers = [
            DeformableTransformerDecoderLayer(
                self.nh, self.d_ffn, len(self.ch), self.ndp, dtype=self.dtype, name=f"decoder_layers_{i}"
            )
            for i in range(self.ndl)
        ]
        score_heads = [
            nn.Dense(self.nc, bias_init=nn.initializers.constant(bias_cls), dtype=self.dtype,
                     name=f"dec_score_head_{i}")
            for i in range(self.ndl)
        ]
        bbox_heads = [
            MLP(self.hd, 4, 3, dtype=self.dtype, last_init=zero_last, name=f"dec_bbox_head_{i}")
            for i in range(self.ndl)
        ]

        output = embed
        refer_s = jax.nn.sigmoid(refer.astype(jnp.float32))
        dec_bboxes, dec_scores = [], []
        last_refined = None
        for i in range(self.ndl):
            output = layers[i](
                output, refer_s.astype(self.dtype), feats, shapes, attn_mask=attn_mask,
                query_pos=pos_mlp(refer_s.astype(self.dtype)),
            )
            bbox = bbox_heads[i](output).astype(jnp.float32)
            # score head applied every layer (param tree must be complete at
            # init; the extra eval-mode matmuls are negligible vs the layer)
            score = score_heads[i](output).astype(jnp.float32)
            refined = jax.nn.sigmoid(bbox + inverse_sigmoid(refer_s))
            if train:
                dec_scores.append(score)
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(bbox + inverse_sigmoid(last_refined)))
            elif i == eval_idx:
                dec_scores.append(score)
                dec_bboxes.append(refined)
                break
            last_refined = refined
            refer_s = jax.lax.stop_gradient(refined) if train else refined

        if train:
            return {
                "dec_bboxes": jnp.stack(dec_bboxes),  # (ndl, B, num_dn+nq, 4) sigmoid
                "dec_scores": jnp.stack(dec_scores),  # (ndl, B, num_dn+nq, nc) logits
                "enc_bboxes": enc_bboxes,  # (B, nq, 4) sigmoid
                "enc_scores": enc_scores.astype(jnp.float32),  # (B, nq, nc) logits
            }
        y = jnp.concatenate(
            [dec_bboxes[-1], jax.nn.sigmoid(dec_scores[-1])], axis=-1
        )  # (B, nq, 4+nc), boxes normalized xywh
        return y, None
