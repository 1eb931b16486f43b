"""Class-based transform API over the functional augmentation kernels.

The reference exposes augmentation as composable transform OBJECTS
(reference data/augment.py: BaseTransform :68, Compose :118, Mosaic :490,
MixUp :867, CopyPaste :1636, RandomPerspective :952, RandomHSV :1303,
RandomFlip :1385, LetterBox :1479, Format :1928, Albumentations :1738,
classify transforms :2444+, v8_transforms :2375) that users subclass and
splice into `dataset.transforms`. This framework's pipelines are
functional (data/augment.py — the right shape for feeding a jitted
train step), but the object API is the reference's documented extension
point, so these wrappers provide it: each class delegates to the
functional kernel and operates on this framework's sample dicts
(img HWC uint8 BGR, bboxes (n,4) xyxy px, cls (n,)).
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from . import augment as A


def _has_inst(labels: Dict) -> bool:
    """True when the sample carries real polygon/keypoint instances (the
    loader emits empty 'segments'/'kpts' lists for plain detect data)."""
    if "polys" in labels:
        return True
    return any(p is not None for p in (labels.get("segments") or [])) or any(
        k is not None for k in (labels.get("kpts") or [])
    )


def _as_inst(labels: Dict) -> Dict:
    """Pixel-space instance view (idempotent)."""
    return labels if "polys" in labels else A._inst_px(labels)


class BaseTransform:
    """Transform interface (reference augment.py:68-117): override the
    apply_* hooks; __call__ applies all to a labels dict."""

    def apply_image(self, labels: Dict):
        pass

    def apply_instances(self, labels: Dict):
        pass

    def apply_semantic(self, labels: Dict):
        pass

    def __call__(self, labels: Dict):
        self.apply_image(labels)
        self.apply_instances(labels)
        self.apply_semantic(labels)
        return labels


class Compose:
    """Chain of transforms (reference augment.py:118-200)."""

    def __init__(self, transforms):
        self.transforms = list(transforms) if isinstance(transforms, (list, tuple)) else [transforms]

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
        return data

    def append(self, transform):
        self.transforms.append(transform)

    def insert(self, index, transform):
        self.transforms.insert(index, transform)

    def __getitem__(self, index):
        if isinstance(index, list):
            return Compose([self.transforms[i] for i in index])
        return self.transforms[index]

    def __setitem__(self, index, value):
        if isinstance(index, list):
            for i, v in zip(index, value):
                self.transforms[i] = v
        else:
            self.transforms[index] = value

    def tolist(self):
        return self.transforms

    def __repr__(self):
        return f"{self.__class__.__name__}({', '.join(repr(t) for t in self.transforms)})"


class BaseMixTransform:
    """Multi-image transform base (reference augment.py:201-300): draws
    donor samples from the dataset, optionally pre-transforms them, then
    hands everything to _mix_transform."""

    def __init__(self, dataset, pre_transform=None, p: float = 0.0):
        self.dataset = dataset
        self.pre_transform = pre_transform
        self.p = p
        self._rng = np.random.default_rng()

    def get_indexes(self):
        return [random.randint(0, len(self.dataset) - 1)]

    def _mix_transform(self, labels: Dict) -> Dict:
        raise NotImplementedError

    def __call__(self, labels: Dict) -> Dict:
        if random.random() > self.p:
            return labels
        indexes = self.get_indexes()
        if isinstance(indexes, int):
            indexes = [indexes]
        mix = [self.dataset.load_sample(i) for i in indexes]
        if self.pre_transform is not None:
            mix = [self.pre_transform(m) for m in mix]
        labels = dict(labels)
        labels["mix_labels"] = mix
        labels = self._mix_transform(labels)
        labels.pop("mix_labels", None)
        return labels


class Mosaic(BaseMixTransform):
    """4/9/3-image mosaic (reference augment.py:490-866; functional
    kernels mosaic4/mosaic9/mosaic3)."""

    def __init__(self, dataset, imgsz: int = 640, p: float = 1.0, n: int = 4):
        assert n in (3, 4, 9), "grid must be 3, 1x3 strip, or 9"
        super().__init__(dataset, p=p)
        self.imgsz = imgsz
        self.n = n

    def get_indexes(self):
        return [random.randint(0, len(self.dataset) - 1) for _ in range(self.n - 1)]

    def _mix_transform(self, labels: Dict) -> Dict:
        samples = [labels] + labels["mix_labels"]
        fn = {4: A.mosaic4, 9: A.mosaic9, 3: A.mosaic3}[self.n]
        return fn(samples, self.imgsz, self._rng)


class MixUp(BaseMixTransform):
    """Beta(32,32) blend of two samples (reference augment.py:867-920)."""

    def __init__(self, dataset, pre_transform=None, p: float = 0.0):
        super().__init__(dataset, pre_transform, p)

    def _mix_transform(self, labels: Dict) -> Dict:
        return A.mixup(labels, labels["mix_labels"][0], self._rng)


class CopyPaste:
    """Instance copy-paste for segment labels (reference
    augment.py:1636-1736; functional copy_paste_inst — requires
    'segments' in the sample)."""

    def __init__(self, dataset=None, pre_transform=None, p: float = 0.5, mode: str = "flip"):
        assert mode in ("flip", "mixup")
        self.dataset = dataset
        self.pre_transform = pre_transform
        self.p = p
        self.mode = mode
        self._rng = np.random.default_rng()

    def __call__(self, labels: Dict) -> Dict:
        donor = None
        if self.mode == "mixup" and self.dataset is not None and len(self.dataset):
            donor = self.dataset.load_sample(random.randint(0, len(self.dataset) - 1))
            if self.pre_transform is not None:
                donor = self.pre_transform(donor)
            donor = _as_inst(donor)
        return A.copy_paste_inst(_as_inst(labels), self._rng, p=self.p, donor=donor)


class RandomPerspective:
    """Combined affine/perspective warp (reference augment.py:952-1302)."""

    def __init__(self, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
                 perspective=0.0, border=(0, 0), pre_transform=None):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.perspective = perspective
        self.border = border
        self.pre_transform = pre_transform
        self._rng = np.random.default_rng()

    def __call__(self, labels: Dict) -> Dict:
        if self.pre_transform is not None:
            labels = self.pre_transform(labels)
        if _has_inst(labels):
            return A.random_perspective_inst(
                _as_inst(labels), self._rng, degrees=self.degrees, translate=self.translate,
                scale=self.scale, shear=self.shear, perspective=self.perspective,
                border=self.border,
            )
        return A.random_perspective(
            labels, self._rng, degrees=self.degrees, translate=self.translate,
            scale=self.scale, shear=self.shear, perspective=self.perspective,
            border=self.border,
        )


class RandomHSV:
    """LUT-based HSV jitter, uint8 in place (reference augment.py:1303-84)."""

    def __init__(self, hgain=0.5, sgain=0.5, vgain=0.5):
        self.hgain = hgain
        self.sgain = sgain
        self.vgain = vgain
        self._rng = np.random.default_rng()

    def __call__(self, labels: Dict) -> Dict:
        labels = dict(labels)
        labels["img"] = A.random_hsv(labels["img"], self._rng, self.hgain, self.sgain, self.vgain)
        return labels


class RandomFlip:
    """Horizontal/vertical flip incl. keypoint flip_idx (reference
    augment.py:1385-1478)."""

    def __init__(self, p: float = 0.5, direction: str = "horizontal", flip_idx=None):
        assert direction in ("horizontal", "vertical")
        self.p = p
        self.direction = direction
        self.flip_idx = flip_idx
        self._rng = np.random.default_rng()

    def __call__(self, labels: Dict) -> Dict:
        if _has_inst(labels):
            lr = self.p if self.direction == "horizontal" else 0.0
            ud = self.p if self.direction == "vertical" else 0.0
            return A.flip_inst(_as_inst(labels), self._rng, flipud=ud, fliplr=lr, flip_idx=self.flip_idx)
        if self.direction == "horizontal":
            return A.random_flip_lr(labels, self._rng, p=self.p)
        return A.random_flip_ud(labels, self._rng, p=self.p)


class LetterBox:
    """Min-ratio resize + gray pad; updates bboxes (reference
    augment.py:1479-1635). Also callable on a bare image via
    __call__(image=...) like the reference predictor path."""

    def __init__(self, new_shape: Tuple[int, int] = (640, 640), auto: bool = False,
                 scale_fill: bool = False, scaleup: bool = True, center: bool = True,
                 stride: int = 32):
        self.new_shape = (new_shape, new_shape) if isinstance(new_shape, int) else tuple(new_shape)
        self.auto = auto
        self.scale_fill = scale_fill
        self.scaleup = scaleup
        self.center = center
        self.stride = stride

    def _shape_for(self, img) -> Tuple[int, int]:
        if not self.auto:
            return self.new_shape
        # auto: minimum stride-multiple rectangle (reference auto mode)
        h, w = img.shape[:2]
        r = min(self.new_shape[0] / h, self.new_shape[1] / w)
        if not self.scaleup:
            r = min(r, 1.0)
        nh, nw = round(h * r), round(w * r)
        s = self.stride
        return (math.ceil(nh / s) * s, math.ceil(nw / s) * s)

    def __call__(self, labels: Optional[Dict] = None, image: Optional[np.ndarray] = None):
        if labels is None:
            img, _, _ = A.letterbox(image, self._shape_for(image), scaleup=self.scaleup,
                                    center=self.center, scale_fill=self.scale_fill)
            return img
        img = labels["img"]
        out, r, (padw, padh) = A.letterbox(img, self._shape_for(img), scaleup=self.scaleup,
                                           center=self.center, scale_fill=self.scale_fill)
        labels = dict(labels)
        labels["img"] = out
        if "bboxes" in labels and len(labels["bboxes"]):
            b = np.asarray(labels["bboxes"], np.float32).copy()
            b[:, [0, 2]] = b[:, [0, 2]] * r + padw
            b[:, [1, 3]] = b[:, [1, 3]] * r + padh
            labels["bboxes"] = b
        labels["ratio_pad"] = ((r, r), (padw, padh))
        return labels


class Format:
    """Final fixed-shape conversion: float image RGB, normalized xywh
    labels padded to max_gt (reference augment.py:1928-2142; replaces the
    variable-length batch_idx collate with the XLA-friendly padded
    layout)."""

    def __init__(self, bbox_format: str = "xywh", normalize: bool = True,
                 max_gt: int = 300, imgsz: Optional[int] = None, **_ignored):
        assert bbox_format in ("xywh", "xyxy")
        self.bbox_format = bbox_format
        self.normalize = normalize
        self.max_gt = max_gt
        self.imgsz = imgsz

    def __call__(self, labels: Dict) -> Dict:
        imgsz = self.imgsz or labels["img"].shape[0]
        out = A.format_sample(labels, imgsz, self.max_gt)
        if self.bbox_format == "xyxy":
            b = out["bboxes"]
            xy = b[:, :2] - b[:, 2:] / 2
            out["bboxes"] = np.concatenate([xy, xy + b[:, 2:]], 1)
        if not self.normalize:
            h, w = labels["img"].shape[:2]
            out["bboxes"] = out["bboxes"] * np.array([w, h, w, h], np.float32)
        return out


class Albumentations:
    """Pixel-level photometric bundle: Blur/MedianBlur/ToGray/CLAHE each
    at p=0.01 (reference augment.py:1738-1860 wraps the albumentations
    package; here the equivalent cv2 ops, data/augment.py pixel_augment)."""

    def __init__(self, p: float = 1.0):
        self.p = p
        self._rng = np.random.default_rng()

    def __call__(self, labels: Dict) -> Dict:
        labels = dict(labels)
        labels["img"] = A.pixel_augment(labels["img"], self._rng, p=self.p)
        return labels


class RandomLoadText:
    """Open-vocabulary text sampling for World/YOLOE training (reference
    augment.py:2240-2370): keeps the positive class prompts, pads with
    sampled negatives, remaps cls to the sampled vocabulary."""

    def __init__(self, prompt_format: str = "{}", neg_samples: Tuple[int, int] = (80, 80),
                 max_samples: int = 80, padding: bool = False, padding_value: str = ""):
        self.prompt_format = prompt_format
        self.neg_samples = neg_samples
        self.max_samples = max_samples
        self.padding = padding
        self.padding_value = padding_value

    def __call__(self, labels: Dict) -> Dict:
        assert "texts" in labels, "RandomLoadText needs labels['texts']"
        class_texts = labels["texts"]
        num_classes = len(class_texts)
        cls = np.asarray(labels.get("cls", np.zeros(0)), int).reshape(-1)
        pos = sorted(set(cls.tolist()))
        neg_budget = min(
            random.randint(*self.neg_samples), self.max_samples - len(pos), num_classes - len(pos)
        )
        negs = [c for c in range(num_classes) if c not in pos]
        random.shuffle(negs)
        chosen = pos + negs[:max(neg_budget, 0)]
        id_map = {c: i for i, c in enumerate(chosen)}
        labels = dict(labels)
        labels["cls"] = np.array([id_map[c] for c in cls], np.float32)
        texts = [self.prompt_format.format(class_texts[c][0] if isinstance(class_texts[c], (list, tuple)) else class_texts[c]) for c in chosen]
        if self.padding:
            texts += [self.padding_value] * (self.max_samples - len(texts))
        labels["texts"] = texts
        return labels


# ---------------------------------------------------------------------------
# classification transforms (reference augment.py:2444-2600)
# ---------------------------------------------------------------------------


class ClassifyLetterBox:
    """Center letterbox to a square canvas (reference augment.py:2490)."""

    def __init__(self, size: int = 224):
        self.h = self.w = size if isinstance(size, int) else size[0]

    def __call__(self, im: np.ndarray) -> np.ndarray:
        h, w = im.shape[:2]
        r = min(self.h / h, self.w / w)
        nh, nw = round(h * r), round(w * r)
        top, left = (self.h - nh) // 2, (self.w - nw) // 2
        out = np.full((self.h, self.w, 3), 114, im.dtype)
        out[top:top + nh, left:left + nw] = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
        return out


class CenterCrop:
    """Resize-then-center-crop to size (reference augment.py:2530)."""

    def __init__(self, size: int = 224):
        self.h = self.w = size if isinstance(size, int) else size[0]

    def __call__(self, im: np.ndarray) -> np.ndarray:
        h, w = im.shape[:2]
        m = min(h, w)
        top, left = (h - m) // 2, (w - m) // 2
        return cv2.resize(im[top:top + m, left:left + m], (self.w, self.h), interpolation=cv2.INTER_LINEAR)


class ToTensor:
    """HWC BGR uint8 -> CHW RGB float [0,1] array (reference
    augment.py:2560 returns a torch tensor; here a numpy array in the
    same layout — the jitted step casts on device)."""

    def __init__(self, half: bool = False):
        self.half = half

    def __call__(self, im: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(im[..., ::-1].transpose(2, 0, 1)).astype(
            np.float16 if self.half else np.float32
        ) / 255.0
        return out


def classify_augmentations(size: int = 224, scale=(0.08, 1.0), hflip: float = 0.5,
                           erasing: float = 0.0, mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                           **_ignored) -> Compose:
    """Train-time classification pipeline (reference augment.py:2444:
    RandomResizedCrop + flip + erasing + ToTensor/normalize)."""
    rng = np.random.default_rng()
    mean_a = np.asarray(mean, np.float32).reshape(3, 1, 1)
    std_a = np.asarray(std, np.float32).reshape(3, 1, 1)

    def rrc(im):
        h, w = im.shape[:2]
        area = h * w
        for _ in range(10):
            a = rng.uniform(*scale) * area
            ar = math.exp(rng.uniform(math.log(3 / 4), math.log(4 / 3)))
            cw, ch = int(round(math.sqrt(a * ar))), int(round(math.sqrt(a / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                x0, y0 = rng.integers(0, w - cw + 1), rng.integers(0, h - ch + 1)
                return cv2.resize(im[y0:y0 + ch, x0:x0 + cw], (size, size), interpolation=cv2.INTER_LINEAR)
        return CenterCrop(size)(im)

    def flip(im):
        return np.ascontiguousarray(im[:, ::-1]) if rng.random() < hflip else im

    def erase(im):
        if erasing and rng.random() < erasing:
            h, w = im.shape[:2]
            eh, ew = int(h * rng.uniform(0.02, 0.33) ** 0.5), int(w * rng.uniform(0.02, 0.33) ** 0.5)
            y0, x0 = rng.integers(0, max(h - eh, 1)), rng.integers(0, max(w - ew, 1))
            im = im.copy()
            im[y0:y0 + eh, x0:x0 + ew] = rng.integers(0, 256, (eh, ew, im.shape[2]), dtype=im.dtype)
        return im

    def norm(chw):
        return (chw - mean_a) / std_a

    return Compose([rrc, flip, erase, ToTensor(), norm])


def classify_transforms(size: int = 224, crop_fraction: float = 1.0, **_ignored) -> Compose:
    """Eval-time classification pipeline (reference augment.py:2410)."""
    return Compose([CenterCrop(int(size / crop_fraction)), ToTensor()])


def v8_transforms(dataset, imgsz: int, hyp, stretch: bool = False) -> Compose:
    """The reference train pipeline as a Compose of the object transforms
    (reference augment.py:2375-2439): Mosaic -> CopyPaste ->
    RandomPerspective -> MixUp -> Albumentations -> RandomHSV ->
    RandomFlip(v) -> RandomFlip(h)."""
    _MISSING = object()

    def g(k, d=0.0):
        v = hyp.get(k, _MISSING) if isinstance(hyp, dict) else getattr(hyp, k, _MISSING)
        return d if v is _MISSING or v is None else float(v)

    flip_idx = getattr(dataset, "flip_idx", None)
    pre = Compose([
        Mosaic(dataset, imgsz=imgsz, p=g("mosaic", 1.0), n=9 if g("mosaic9") > 0 else 4),
        CopyPaste(dataset, p=g("copy_paste", 0.0), mode=str(getattr(hyp, "copy_paste_mode", "flip") or "flip")),
        RandomPerspective(
            degrees=g("degrees"), translate=g("translate", 0.1), scale=g("scale", 0.5),
            shear=g("shear"), perspective=g("perspective"),
            pre_transform=None if stretch else LetterBox((imgsz, imgsz)),
        ),
    ])
    return Compose([
        pre,
        MixUp(dataset, pre_transform=pre, p=g("mixup", 0.0)),
        Albumentations(p=1.0),
        RandomHSV(hgain=g("hsv_h", 0.015), sgain=g("hsv_s", 0.7), vgain=g("hsv_v", 0.4)),
        RandomFlip(direction="vertical", p=g("flipud", 0.0)),
        RandomFlip(direction="horizontal", p=g("fliplr", 0.5), flip_idx=flip_idx),
    ])
