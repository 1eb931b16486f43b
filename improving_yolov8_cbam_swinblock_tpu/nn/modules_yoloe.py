"""YOLOE prompt-driven detection/segmentation modules (NHWC flax).

TPU-native re-designs of reference nn/modules/block.py:1891-2000
(SwiGLUFFN / Residual / SAVPE) and nn/modules/head.py:383-565
(YOLOEDetect / YOLOESegment). Prompts:

  * text prompts: embeddings -> Residual(SwiGLUFFN) refiner (`reprta`)
    -> L2 norm -> BN contrastive scoring per level;
  * visual prompts: SAVPE pools P3/P4/P5 features under the prompt masks
    into per-prompt embeddings used in place of text.

Deviation (documented): the reference's LRPC prompt-free path
(head.py:348-381, forward_lrpc) builds a DYNAMIC token subset from a
proposal filter — incompatible with fixed-shape XLA; the prompt-driven
paths (text / visual) are complete, and prompt-free inference is served
by the standard conf-threshold NMS instead.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv, DWConv, conv_kernel_init
from .modules_world import BNContrastiveHead, ContrastiveHead


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward (reference block.py:1891-1906)."""

    ec: int
    e: int = 4
    zero_out: bool = False  # Residual wrapper zero-inits the out proj

    @nn.compact
    def __call__(self, x):
        x12 = nn.Dense(self.e * self.ec, name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        hidden = jax.nn.silu(x1) * x2
        kw = {"kernel_init": nn.initializers.zeros, "bias_init": nn.initializers.zeros} if self.zero_out else {}
        return nn.Dense(self.ec, name="w3", **kw)(hidden)


class SAVPE(nn.Module):
    """Spatial-aware visual prompt encoder (reference block.py:1925-1980):
    pools multi-scale features under per-prompt masks (vp at P3
    resolution) into L2-normalized (B, Q, embed) prompt embeddings."""

    c3: int
    embed: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], vp, train: bool = False):
        # cv2 path -> 16ch score features; cv1 path -> embed features
        ys, zs = [], []
        for i, x in enumerate(xs):
            z = Conv(self.c3, 3, dtype=self.dtype, name=f"cv1_{i}_0")(x, train)
            z = Conv(self.c3, 3, dtype=self.dtype, name=f"cv1_{i}_1")(z, train)
            y = Conv(self.c3, 1, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            if i in (1, 2):
                s = 2 * i
                b_, h_, w_, c_ = z.shape
                z = jax.image.resize(z, (b_, h_ * s, w_ * s, c_), "nearest")
                y = jax.image.resize(y, (b_, h_ * s, w_ * s, c_), "nearest")
            zs.append(z)
            ys.append(y)
        x_emb = nn.Conv(self.embed, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="cv3")(jnp.concatenate(zs, -1))  # (B, H, W, embed)
        y16 = nn.Conv(16, (3, 3), padding=1, use_bias=True, kernel_init=conv_kernel_init,
                      dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1))  # (B, H, W, 16)

        b, h, w, _ = x_emb.shape
        q = vp.shape[1]
        vpq = vp.reshape(b * q, h, w, 1).astype(self.dtype)
        v16 = nn.Conv(16, (3, 3), padding=1, use_bias=True, kernel_init=conv_kernel_init,
                      dtype=self.dtype, name="cv5")(vpq)
        yq = jnp.broadcast_to(y16[:, None], (b, q, h, w, 16)).reshape(b * q, h, w, 16)
        m = Conv(16, 3, dtype=self.dtype, name="cv6_0")(jnp.concatenate([yq, v16], -1), train)
        m = nn.Conv(16, (3, 3), padding=1, use_bias=True, kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="cv6_1")(m)  # (B*Q, H, W, 16)

        m = m.reshape(b, q, h * w, 16).transpose(0, 1, 3, 2).astype(jnp.float32)  # (B, Q, 16, HW)
        vflat = vp.reshape(b, q, 1, h * w).astype(jnp.float32)
        score = jnp.where(vflat > 0, m * vflat, jnp.finfo(jnp.float32).min)
        score = jax.nn.softmax(score, axis=-1)  # (B, Q, 16, HW)
        # channel-grouped aggregation: embed split into 16 groups
        xg = x_emb.reshape(b, h * w, 16, self.embed // 16).astype(jnp.float32)
        agg = jnp.einsum("bqgs,bsgd->bqgd", score, xg).reshape(b, q, self.embed)
        return agg / jnp.maximum(jnp.linalg.norm(agg, axis=-1, keepdims=True), 1e-12)


class YOLOEDetect(nn.Module):
    """Prompt-conditioned Detect head (reference head.py:383-543): box
    branch identical to Detect; class scores = BN-contrastive similarity
    of per-level embeddings against refined prompt embeddings."""

    nc: int = 80
    embed: int = 512
    with_bn: bool = True
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = False
    reg_max: int = 16
    raw: bool = False  # YOLOESegment asks for undecoded maps
    dtype: Any = jnp.float32

    def _cls_pe(self, txt, xs, vp, train):
        """Refine prompts: text -> Residual(SwiGLUFFN) + L2 norm
        (get_tpe, head.py:462); visual -> SAVPE (get_vpe, head.py:466)."""
        c3 = max(self.ch[0], min(self.nc, 100))
        savpe = SAVPE(c3, self.embed, dtype=self.dtype, name="savpe")
        if vp is not None:
            return savpe(xs, vp, train)
        if self.is_initializing():
            savpe(xs, jnp.ones((xs[0].shape[0], 1) + xs[0].shape[1:3]), train)  # materialize params
        t = txt + SwiGLUFFN(self.embed, zero_out=True, name="reprta_m")(txt)  # Residual
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

    def _forward(self, xs, txt, train, vp=None):
        cls_pe = self._cls_pe(txt, list(xs), vp, train).astype(self.dtype)
        nq = cls_pe.shape[1]
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        bias_init=nn.initializers.ones, dtype=self.dtype, name=f"cv2_{i}_2")(b)
            if self.legacy:
                e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
                e = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(e, train)
            else:
                e = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
                e = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(e, train)
                e = DWConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(e, train)
                e = Conv(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(e, train)
            e = nn.Conv(self.embed, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv3_{i}_2")(e)
            # per-level cls-prior bias on the contrastive head (bias_init,
            # head.py:536-543: cv4 bias = log(5/nc/(640/s)^2))
            prior = math.log(5 / self.nc / (640 / float(self.strides[i])) ** 2)
            head = (
                BNContrastiveHead(self.embed, bias_init_val=prior, dtype=self.dtype, name=f"cv4_{i}")
                if self.with_bn
                else ContrastiveHead(bias_init_val=prior, dtype=self.dtype, name=f"cv4_{i}")
            )
            cls = head(e, cls_pe, train)
            feats.append(jnp.concatenate([b, cls.astype(b.dtype)], axis=-1))
        return feats, nq

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], txt, train: bool = False, vp=None,
                 return_vpe: bool = False):
        from .modules import Detect

        if return_vpe:
            # visual-prompt embeddings only (reference YOLOEModel.get_visual_pe
            # -> YOLOEDetect.get_vpe, head.py:464-470): SAVPE over the prompt
            # masks, no detection branch
            return self._cls_pe(txt, list(xs), vp, train).astype(jnp.float32)
        feats, nq = self._forward(xs, txt, train, vp)
        if self.raw:
            return feats, nq
        if train:
            return feats
        dec = Detect(nc=nq, ch=tuple(self.ch), strides=self.strides,
                     reg_max=self.reg_max, dtype=self.dtype, parent=None)
        return dec._inference([f.astype(jnp.float32) for f in feats]), feats


class YOLOESegment(nn.Module):
    """Prompt-conditioned Segment head (reference head.py:546-565):
    YOLOEDetect + mask prototypes + coefficient branch; output contract
    matches heads.Segment so the segment loss/validator are reused."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    embed: int = 512
    with_bn: bool = True
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = False
    reg_max: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], txt, train: bool = False, vp=None,
                 return_vpe: bool = False):
        from .heads import Proto
        from .modules import Detect

        if return_vpe:
            det = YOLOEDetect(nc=self.nc, embed=self.embed, with_bn=self.with_bn, ch=tuple(self.ch),
                              strides=self.strides, legacy=self.legacy, reg_max=self.reg_max,
                              raw=True, dtype=self.dtype, name="det")
            return det(list(xs), txt, train, vp, return_vpe=True)
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c5 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, x in enumerate(xs):
            m = Conv(c5, 3, dtype=self.dtype, name=f"cv5_{i}_0")(x, train)
            m = Conv(c5, 3, dtype=self.dtype, name=f"cv5_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv5_{i}_2")(m)
            mcs.append(m)
        det = YOLOEDetect(nc=self.nc, embed=self.embed, with_bn=self.with_bn, ch=tuple(self.ch),
                          strides=self.strides, legacy=self.legacy, reg_max=self.reg_max,
                          raw=True, dtype=self.dtype, name="det")
        feats, nq = det(list(xs), txt, train, vp)
        b = xs[0].shape[0]
        mc = jnp.concatenate([m.reshape(b, -1, self.nm) for m in mcs], axis=1)  # (B, A, nm)
        if train:
            return feats, mc, proto
        dec = Detect(nc=nq, ch=tuple(self.ch), strides=self.strides,
                     reg_max=self.reg_max, dtype=self.dtype, parent=None)
        y = dec._inference([f.astype(jnp.float32) for f in feats])
        return jnp.concatenate([y, mc.astype(jnp.float32).transpose(0, 2, 1)], axis=1), (feats, mc, proto)
