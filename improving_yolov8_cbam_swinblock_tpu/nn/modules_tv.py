"""Native `TorchVision` registry block.

The reference's TorchVision module (block.py:1601) loads an arbitrary
torchvision backbone, optionally unwrapping the child list and dropping
the last `truncate` layers — used by cfg/models/11/yolo11-cls-resnet18.yaml
as `[-1, 1, TorchVision, [512, resnet18, DEFAULT, True, 2]]`.

This TPU-native analog builds the named backbone directly in flax
(NHWC, fused Conv+BN like every other block here) instead of wrapping
torch. Supported names: resnet18 / resnet34 (BasicBlock stacks) and
resnet50 (Bottleneck, sharing ResNetBlock). `weights` is accepted for
YAML compatibility; pretrained tensors come through the torch-ckpt
importer like every other module (no downloads in this environment).
`unwrap=True, truncate=2` drops avgpool+fc, leaving the (B, H/32, W/32,
c2) feature trunk the Classify head consumes.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv
from .modules_extra import ResNetLayer

# per-stage block counts
_RESNET_STAGES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3), "resnet50": (3, 4, 6, 3)}


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (the e=1 ResNet
    block torchvision uses for resnet18/34; the bottleneck variant is
    modules_extra.ResNetBlock)."""

    c2: int
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = Conv(self.c2, 3, self.s, p=1, act="relu", dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, 3, 1, p=1, act=False, dtype=self.dtype, name="cv2")(y, train)
        sc = (
            Conv(self.c2, 1, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, train)
            if self.s != 1 or c1 != self.c2
            else x
        )
        return jax.nn.relu((y + sc).astype(jnp.float32)).astype(y.dtype)


class TorchVision(nn.Module):
    """Named-backbone trunk (reference block.py:1601 TorchVision)."""

    c2: int
    model: str = "resnet18"
    weights: str = "DEFAULT"  # YAML-compat; weights load via the ckpt importer
    unwrap: bool = True
    truncate: int = 2
    split: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        name = str(self.model)
        if name not in _RESNET_STAGES:
            raise NotImplementedError(
                f"TorchVision backbone '{name}' not supported natively "
                f"(available: {sorted(_RESNET_STAGES)})"
            )
        if self.split:
            raise NotImplementedError("TorchVision split=True is not supported")
        if not (self.unwrap and self.truncate == 2):
            raise NotImplementedError(
                "only the feature-trunk form (unwrap=True, truncate=2 — drop "
                "avgpool+fc) is supported; classification uses the Classify head"
            )
        stages = _RESNET_STAGES[name]
        bottleneck = name == "resnet50"
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool (ResNetLayer is_first)
        x = ResNetLayer(64, is_first=True, dtype=self.dtype, name="stem")(x, train)
        widths: Tuple[int, ...] = (64, 128, 256, 512)
        for si, (w, nblk) in enumerate(zip(widths, stages)):
            stride = 1 if si == 0 else 2
            if bottleneck:
                x = ResNetLayer(w, s=stride, n=nblk, e=4, dtype=self.dtype, name=f"layer{si + 1}")(x, train)
            else:
                x = BasicBlock(w, stride, dtype=self.dtype, name=f"layer{si + 1}_0")(x, train)
                for bi in range(1, nblk):
                    x = BasicBlock(w, 1, dtype=self.dtype, name=f"layer{si + 1}_{bi}")(x, train)
        return x
