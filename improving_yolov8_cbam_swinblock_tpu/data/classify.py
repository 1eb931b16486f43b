"""Classification dataset: imagefolder layout (root/split/class_x/*.jpg)
— reference data/dataset.py ClassificationDataset analog, with the same
simple resize-center pipeline for val and random resized crop + flip for
train (reference classify_transforms / classify_augmentations)."""

from __future__ import annotations

import concurrent.futures as cf
from pathlib import Path
from typing import Dict

import cv2
import numpy as np

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def _randaugment(img: np.ndarray, rng: np.random.Generator, n: int = 2, m: int = 9) -> np.ndarray:
    """Numpy/cv2 RandAugment (reference classify_augmentations
    auto_augment='randaugment', augment.py:2561 -> torchvision
    T.RandAugment defaults N=2, M=9 of 31): apply n random ops at
    magnitude m. uint8 BGR in/out."""
    h, w = img.shape[:2]
    mag = m / 30.0

    def affine(mat):
        return cv2.warpAffine(img, mat, (w, h), borderValue=(128, 128, 128))

    def op_rotate():
        return affine(cv2.getRotationMatrix2D((w / 2, h / 2), rng.choice([-1, 1]) * mag * 30.0, 1.0))

    def op_shear_x():
        s = rng.choice([-1, 1]) * mag * 0.3
        return affine(np.float32([[1, s, -s * h / 2], [0, 1, 0]]))

    def op_shear_y():
        s = rng.choice([-1, 1]) * mag * 0.3
        return affine(np.float32([[1, 0, 0], [s, 1, -s * w / 2]]))

    def op_translate_x():
        return affine(np.float32([[1, 0, rng.choice([-1, 1]) * mag * 0.45 * w], [0, 1, 0]]))

    def op_translate_y():
        return affine(np.float32([[1, 0, 0], [0, 1, rng.choice([-1, 1]) * mag * 0.45 * h]]))

    def op_brightness():
        f = 1.0 + rng.choice([-1, 1]) * mag * 0.9
        return np.clip(img.astype(np.float32) * f, 0, 255).astype(np.uint8)

    def op_contrast():
        f = 1.0 + rng.choice([-1, 1]) * mag * 0.9
        mean = img.astype(np.float32).mean()
        return np.clip((img.astype(np.float32) - mean) * f + mean, 0, 255).astype(np.uint8)

    def op_sharpness():
        blur = cv2.GaussianBlur(img, (3, 3), 0).astype(np.float32)
        f = 1.0 + rng.choice([-1, 1]) * mag * 0.9
        return np.clip(blur + (img.astype(np.float32) - blur) * f, 0, 255).astype(np.uint8)

    def op_posterize():
        bits = max(1, 8 - int(round(mag * 4)))
        keep = np.uint8((0xFF << (8 - bits)) & 0xFF)
        return img & keep

    def op_solarize():
        thr = int(255 - mag * 255)
        return np.where(img >= thr, 255 - img, img).astype(np.uint8)

    def op_equalize():
        ycrcb = cv2.cvtColor(img, cv2.COLOR_BGR2YCrCb)
        ycrcb[..., 0] = cv2.equalizeHist(ycrcb[..., 0])
        return cv2.cvtColor(ycrcb, cv2.COLOR_YCrCb2BGR)

    ops = [op_rotate, op_shear_x, op_shear_y, op_translate_x, op_translate_y,
           op_brightness, op_contrast, op_sharpness, op_posterize, op_solarize, op_equalize]
    for idx in rng.integers(0, len(ops), n):
        img = ops[int(idx)]()
    return img


class ClassificationDataset:
    def __init__(self, root: str, imgsz: int = 224, erasing: float = 0.0, auto_augment: str | None = None):
        self.root = Path(root)
        self.imgsz = imgsz
        self.erasing = float(erasing)
        if auto_augment not in (None, "", "randaugment"):
            raise ValueError(
                f"auto_augment={auto_augment!r} not supported (only 'randaugment'; "
                "reference dispatches autoaugment/augmix to torchvision)"
            )
        self.auto_augment = auto_augment or None
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (str(p), self.class_to_idx[c])
            for c in classes
            for p in sorted((self.root / c).rglob("*"))
            if p.suffix.lower() in IMG_EXTS
        ]
        if not self.samples:
            raise FileNotFoundError(f"no class images under {root}")
        self.nc = len(classes)
        self.names = {i: c for c, i in self.class_to_idx.items()}

    def __len__(self):
        return len(self.samples)

    def load(self, idx: int, train: bool, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        path, label = self.samples[idx]
        from ..utils.patches import imread

        img = imread(path)
        if train:
            # random resized crop (scale 0.5-1.0) + horizontal flip
            h, w = img.shape[:2]
            s = rng.uniform(0.5, 1.0)
            ch, cw = int(h * s), int(w * s)
            y0 = int(rng.integers(0, h - ch + 1))
            x0 = int(rng.integers(0, w - cw + 1))
            img = img[y0 : y0 + ch, x0 : x0 + cw]
            if rng.random() < 0.5:
                img = img[:, ::-1]
        img = cv2.resize(img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if train and self.auto_augment == "randaugment":
            img = _randaugment(img, rng)
        img = np.ascontiguousarray(img[..., ::-1])
        if train and self.erasing > 0 and rng.random() < self.erasing:
            # random erasing (reference classify_augmentations
            # T.RandomErasing, augment.py:2591): zero a rectangle with
            # area 2-33% of the image and aspect in [0.3, 3.3]
            hh = ww = self.imgsz
            for _ in range(10):
                area = hh * ww * rng.uniform(0.02, 0.33)
                ar = float(np.exp(rng.uniform(np.log(0.3), np.log(3.3))))
                eh, ew = int(round(np.sqrt(area * ar))), int(round(np.sqrt(area / ar)))
                if eh < hh and ew < ww:
                    y0 = int(rng.integers(0, hh - eh + 1))
                    x0 = int(rng.integers(0, ww - ew + 1))
                    img[y0 : y0 + eh, x0 : x0 + ew] = 0
                    break
        return {"img": img, "label": np.int32(label)}


class ClassificationLoader:
    def __init__(self, dataset: ClassificationDataset, batch_size: int, train: bool = True, seed: int = 0, workers: int = 8):
        self.ds = dataset
        self.bs = batch_size
        self.train = train
        self.seed = seed
        self.epoch = 0
        self._pool = cf.ThreadPoolExecutor(max_workers=workers)
        n = len(dataset)
        self.batches_per_epoch = max(1, n // batch_size) if train else int(np.ceil(n / batch_size))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close_mosaic(self):
        pass

    def __len__(self):
        return self.batches_per_epoch

    def __iter__(self):
        n = len(self.ds)
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = rng.permutation(n) if self.train else np.arange(n)
        for b in range(self.batches_per_epoch):
            sel = [(b * self.bs + j) % n for j in range(self.bs)]
            futs = [
                self._pool.submit(
                    self.ds.load, int(idx[s]), self.train,
                    np.random.default_rng((self.seed + self.epoch) * 1_000_003 + s),
                )
                for s in sel
            ]
            out = [f.result() for f in futs]
            yield {
                "img": np.stack([o["img"] for o in out]),
                "label": np.stack([o["label"] for o in out]),
            }
