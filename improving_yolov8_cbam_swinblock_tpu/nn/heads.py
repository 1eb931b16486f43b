"""Task heads beyond Detect: Classify, Segment (+Proto), Pose, OBB.

NHWC re-implementations of reference nn/modules/head.py:186-874 (detect
subset already lives in modules.Detect). Training returns raw branch
maps; inference returns the reference's decoded layouts so downstream
post-processing is shared.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv, Detect, DWConv, conv_kernel_init


class Classify(nn.Module):
    """Image classification head (reference head.py Classify):
    Conv -> global avg pool -> dropout -> linear."""

    nc: int = 1000
    c_: int = 1280
    dropout: float = 0.0  # classify-train regularization (reference head.py Classify drop, cfg dropout)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(list(x), axis=-1)
        y = Conv(self.c_, 1, 1, dtype=self.dtype, name="conv")(x, train)
        y = y.mean(axis=(1, 2))  # (B, c_)
        if self.dropout > 0.0:
            y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.nc, dtype=self.dtype, name="linear")(y)
        return y if train else jax.nn.softmax(y.astype(jnp.float32), axis=-1)


class Proto(nn.Module):
    """Mask prototype generator (reference block.py Proto)."""

    c_: int = 256
    c2: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        y = nn.ConvTranspose(self.c_, (2, 2), (2, 2), use_bias=True,
                             kernel_init=conv_kernel_init, dtype=self.dtype, name="upsample")(y)
        y = Conv(self.c_, 3, dtype=self.dtype, name="cv2")(y, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(y, train)


class Segment(nn.Module):
    """Detect + mask coefficients + prototypes (reference head.py:186-240)."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, x in enumerate(xs):
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv4_{i}_2")(m)
            mcs.append(m)  # (B, H, W, nm)
        det = Detect(nc=self.nc, ch=tuple(self.ch), strides=self.strides, legacy=self.legacy,
                     dtype=self.dtype, name="detect")(list(xs), train)
        b = xs[0].shape[0]
        mc = jnp.concatenate([m.reshape(b, -1, self.nm) for m in mcs], axis=1)  # (B, A, nm)
        if train:
            return det, mc, proto
        y, feats = det
        return jnp.concatenate([y, mc.transpose(0, 2, 1)], axis=1), (feats, mc, proto)


class Pose(nn.Module):
    """Detect + keypoint regression (reference head.py Pose)."""

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(xs):
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            k = nn.Conv(nk, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv4_{i}_2")(k)
            kpts.append(k)
        det = Detect(nc=self.nc, ch=tuple(self.ch), strides=self.strides, legacy=self.legacy,
                     dtype=self.dtype, name="detect")(list(xs), train)
        b = xs[0].shape[0]
        kpt = jnp.concatenate([k.reshape(b, -1, nk) for k in kpts], axis=1)  # (B, A, nk)
        if train:
            return det, kpt
        y, feats = det
        pkpt = self._decode_kpts(kpt, [(x.shape[1], x.shape[2]) for x in xs])
        return jnp.concatenate([y, pkpt.transpose(0, 2, 1)], axis=1), (feats, kpt)

    def _decode_kpts(self, kpt, shapes):
        from ..ops.anchors import make_anchors

        anchors, strides = make_anchors(shapes, self.strides, 0.5)
        nd = self.kpt_shape[1]
        b, a, _ = kpt.shape
        k = kpt.astype(jnp.float32).reshape(b, a, self.kpt_shape[0], nd)
        xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * strides[None, :, None, :]
        if nd == 3:
            vis = jax.nn.sigmoid(k[..., 2:3])
            out = jnp.concatenate([xy, vis], axis=-1)
        else:
            out = xy
        return out.reshape(b, a, -1)


class v10Detect(nn.Module):
    """YOLOv10 NMS-free head (reference head.py:841-874 + Detect
    forward_end2end :77-101): the usual box branch, a depthwise-separable
    'light' cls branch, and a detached one2one twin of both. Training
    returns {'one2many', 'one2one'} raw map lists; inference decodes the
    one2one maps to XYXY (decode_bboxes xywh=False when end2end) and
    topk-postprocesses to (B, max_det, 6) — no NMS anywhere."""

    nc: int = 80
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = False
    reg_max: int = 16
    max_det: int = 300
    dtype: Any = jnp.float32

    def _branches(self, xs, train, prefix: str):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        feats = []
        for i, x in enumerate(xs):
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_0")(x, train)
            b = Conv(c2, 3, dtype=self.dtype, name=f"{prefix}cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        bias_init=nn.initializers.ones, dtype=self.dtype, name=f"{prefix}cv2_{i}_2")(b)
            s = float(self.strides[i])
            prior = math.log(5 / self.nc / (640 / s) ** 2)
            c = Conv(x.shape[-1], 3, g=x.shape[-1], dtype=self.dtype, name=f"{prefix}cv3_{i}_0_0")(x, train)
            c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_0_1")(c, train)
            c = Conv(c3, 3, g=c3, dtype=self.dtype, name=f"{prefix}cv3_{i}_1_0")(c, train)
            c = Conv(c3, 1, dtype=self.dtype, name=f"{prefix}cv3_{i}_1_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        bias_init=lambda k, sh, dtype=jnp.float32, pr=prior: jnp.full(sh, pr, dtype),
                        dtype=self.dtype, name=f"{prefix}cv3_{i}_2")(c)
            feats.append(jnp.concatenate([b, c], axis=-1))
        return feats

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        one2many = self._branches(list(xs), train, "")
        detached = [jax.lax.stop_gradient(x) for x in xs]
        one2one = self._branches(detached, train, "one2one_")
        if train:
            return {"one2many": one2many, "one2one": one2one}
        from ..ops.anchors import dfl_decode, dist2bbox, make_anchors
        from ..ops.nms import e2e_postprocess

        b = one2one[0].shape[0]
        no = 4 * self.reg_max + self.nc
        shapes = [(f.shape[1], f.shape[2]) for f in one2one]
        x_cat = jnp.concatenate([f.reshape(b, -1, no) for f in one2one], axis=1)
        box, cls = x_cat[..., : 4 * self.reg_max], x_cat[..., 4 * self.reg_max :]
        anchors, strides = make_anchors(shapes, self.strides, 0.5, dtype=jnp.float32)
        dist = dfl_decode(box.astype(jnp.float32), self.reg_max)
        dbox = dist2bbox(dist, anchors[None], xywh=False, axis=-1) * strides[None]  # XYXY (end2end)
        y = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1).transpose(0, 2, 1)
        dets = e2e_postprocess(y, self.max_det, self.nc)
        return dets, {"one2many": one2many, "one2one": one2one}


class OBB(nn.Module):
    """Detect + rotation angle branch (reference head.py OBB)."""

    nc: int = 80
    ne: int = 1
    ch: Tuple[int, ...] = ()
    strides: Tuple[int, ...] = (8, 16, 32)
    legacy: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, x in enumerate(xs):
            a = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            a = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(a, train)
            a = nn.Conv(self.ne, (1, 1), use_bias=True, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name=f"cv4_{i}_2")(a)
            angles.append(a)
        b = xs[0].shape[0]
        angle = jnp.concatenate([a.reshape(b, -1, self.ne) for a in angles], axis=1)
        angle = (jax.nn.sigmoid(angle.astype(jnp.float32)) - 0.25) * math.pi  # [-pi/4, 3pi/4)
        # angle feeds the Detect decode (dist2rbox) at inference so predicted
        # rotated centers match the training-time decode (reference head.py
        # OBB.forward sets self.angle before Detect.forward)
        det = Detect(nc=self.nc, ch=tuple(self.ch), strides=self.strides, legacy=self.legacy,
                     dtype=self.dtype, name="detect")(list(xs), train, None if train else angle)
        if train:
            return det, angle
        y, feats = det
        return jnp.concatenate([y, angle.transpose(0, 2, 1)], axis=1), (feats, angle)
