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


class ClassificationDataset:
    def __init__(self, root: str, imgsz: int = 224, erasing: float = 0.0):
        self.root = Path(root)
        self.imgsz = imgsz
        self.erasing = float(erasing)
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
        img = cv2.imread(path)
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
