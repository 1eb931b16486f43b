"""YOLO-format detection dataset + batch loader.

Host-side equivalent of the reference BaseDataset/YOLODataset/
InfiniteDataLoader stack (reference data/base.py:21, dataset.py:46,
build.py:28) redesigned for a single-controller JAX trainer:

  * label parsing and verification up front into memory (the datasets
    in scope — coco8/coco128-class — fit trivially; a disk cache file
    is written next to the labels like the reference's *.cache);
  * the loader is a thread-pool prefetcher producing fixed-shape numpy
    batches (B, H, W, 3 uint8) + padded targets, ready for a single
    device_put — no per-worker process fork, no collate;
  * epoch/seed determinism: batch i of epoch e is a pure function of
    (seed, e, i) (reference seed_worker analog, build.py:99).
"""

from __future__ import annotations

import concurrent.futures as cf
import math
import threading
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np
import yaml

from .augment import train_transform, val_transform

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def check_det_dataset(data) -> Dict:
    """Parse a data.yaml (reference data/utils.py:297 minus auto-download:
    this environment has no egress, datasets must exist locally).

    Bare descriptor names (`data="coco8.yaml"`) resolve against the
    packaged cfg/datasets/ registry (reference checks.check_file search);
    a packaged descriptor's relative `path:` is anchored at the user's
    `datasets_dir` setting (reference DATASETS_DIR semantics), while a
    user YAML's relative `path:` stays anchored at the YAML itself.
    """
    packaged = False
    if isinstance(data, (str, Path)):
        p = Path(data)
        if not p.exists() and p.suffix in (".yaml", ".yml") and len(p.parts) == 1:
            from ..cfg import CFG_DIR

            cand = CFG_DIR / "datasets" / p.name
            if cand.exists():
                p, packaged = cand, True
        data = yaml.safe_load(p.read_text()) | {"yaml_file": str(p)}
    root = Path(data.get("path", "."))
    if not root.is_absolute():
        if packaged:
            from ..utils.settings import SETTINGS

            root = Path(SETTINGS["datasets_dir"]) / root
        elif "yaml_file" in data:
            root = Path(data["yaml_file"]).parent / root
    out = dict(data)
    for split in ("train", "val", "test"):
        if data.get(split):
            p = Path(data[split])
            out[split] = str(p if p.is_absolute() else root / p)
    names = data.get("names")
    if isinstance(names, list):
        names = dict(enumerate(names))
    out["names"] = names or {i: str(i) for i in range(data.get("nc", 80))}
    out["nc"] = data.get("nc", len(out["names"]))
    return out


class YOLODataset:
    """Images + YOLO txt labels for one split."""

    def __init__(
        self, img_dir: str, imgsz: int = 640, max_gt: int = 300, nc: int = 80,
        single_cls: bool = False, kpt_shape=None, fraction: float = 1.0,
        cache=False,
    ):
        self.img_dir = Path(img_dir)
        self.imgsz = imgsz
        self.max_gt = max_gt
        self.nc = nc
        self.single_cls = single_cls
        self.kpt_shape = tuple(kpt_shape) if kpt_shape else None
        # image cache (reference base.py:253-269 cache_images): 'ram' keeps
        # decoded frames in memory, 'disk' writes sibling .npy files that
        # skip JPEG decode on every epoch; False decodes on demand
        self.cache = "ram" if cache is True else (str(cache).lower() if cache else None)
        if self.cache not in (None, "ram", "disk"):
            raise ValueError(f"cache={cache!r} must be True/'ram', 'disk' or False")
        self._ram: Dict[int, np.ndarray] = {}
        self._ram_lock = threading.Lock()
        self.img_files = sorted(
            str(p) for p in self.img_dir.rglob("*") if p.suffix.lower() in IMG_EXTS
        )
        if not self.img_files:
            raise FileNotFoundError(f"no images found under {img_dir}")
        if fraction < 1.0:  # train on a subset (reference base.py fraction)
            self.img_files = self.img_files[: max(1, round(len(self.img_files) * fraction))]
        # verified labels via the hash-keyed sibling .cache file
        # (reference cache_labels/verify_image_label, data/utils.py)
        from .utils import load_or_build_cache

        self.labels, self.stats = load_or_build_cache(
            self.img_files, nc, self.kpt_shape, single_cls
        )
        if self.stats.get("ncorrupt"):
            bad = self.stats["msgs"][:3]
            raise ValueError(f"{self.stats['ncorrupt']} corrupt images/labels under {img_dir}: {bad}")

    def rect_shape(self, stride: int = 32):
        """One stride-multiple rectangular letterbox shape for the whole
        split, from the median aspect ratio. The reference groups per-batch
        shapes (base.py:341); XLA static shapes want ONE shape per split —
        the median keeps most of the padding win with a single compile."""
        from PIL import Image

        ars = []
        for f in self.img_files[:64]:  # sample is plenty for a median
            with Image.open(f) as im:
                w, h = im.size
            ars.append(h / w)
        ar = float(np.median(ars))
        # reference batch-shape formula incl. its pad=0.5 half-stride bump on
        # BOTH dims (base.py:341: ceil(shape*imgsz/stride + 0.5)*stride) so
        # rect-val geometry — and therefore the whole val protocol — matches
        h = math.ceil(min(ar, 1.0) * self.imgsz / stride + 0.5) * stride
        w = math.ceil(min(1.0 / ar, 1.0) * self.imgsz / stride + 0.5) * stride
        return (h, w)

    def __len__(self):
        return len(self.img_files)

    def _read_image(self, idx: int) -> np.ndarray:
        """Decode one frame through the configured cache."""
        from ..utils.patches import imread

        if self.cache == "ram":
            with self._ram_lock:
                hit = self._ram.get(idx)
            if hit is not None:
                return hit.copy()  # downstream augments mutate in place
        elif self.cache == "disk":
            npy = Path(self.img_files[idx]).with_suffix(".npy")
            if npy.exists():
                return np.load(npy)
        img = imread(self.img_files[idx])
        if img is None:
            raise IOError(f"failed to read {self.img_files[idx]}")
        if self.cache == "ram":
            with self._ram_lock:
                self._ram[idx] = img
            return img.copy()
        if self.cache == "disk":
            np.save(Path(self.img_files[idx]).with_suffix(".npy"), img)
        return img

    def load_sample(self, idx: int) -> Dict:
        """Raw sample: BGR image + pixel xyxy boxes."""
        img = self._read_image(idx)
        h, w = img.shape[:2]
        lab = self.labels[idx]
        xywhn = lab["xywhn"]
        if len(xywhn):
            cx, cy, bw, bh = xywhn[:, 0] * w, xywhn[:, 1] * h, xywhn[:, 2] * w, xywhn[:, 3] * h
            bboxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=1).astype(np.float32)
        else:
            bboxes = np.zeros((0, 4), np.float32)
        return {
            "img": img,
            "bboxes": bboxes,
            "cls": lab["cls"].copy(),
            "segments": lab.get("segments", []),
            "kpts": lab.get("kpts", []),
        }


class DataLoader:
    """Deterministic thread-prefetch loader yielding fixed-shape batches."""

    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int,
        train: bool = True,
        hyp: Optional[Dict] = None,
        seed: int = 0,
        workers: int = 8,
        shard_index: int = 0,
        num_shards: int = 1,
        task: str = "detect",
        device_augment: bool = False,
        rect_shape=None,
    ):
        self.ds = dataset
        self.bs = batch_size
        self.train = train
        self.task = task
        self.device_augment = device_augment and train and task == "detect"
        self.rect_shape = tuple(rect_shape) if rect_shape else None  # val-only (h, w)
        self.hyp = dict(hyp or {})
        self.seed = seed
        self.workers = workers
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0
        n = len(dataset)
        self.batches_per_epoch = max(1, (n // num_shards) // batch_size) if train else int(np.ceil(n / num_shards / batch_size))
        # workers=0 = synchronous in-caller loading (reference build.py nw=0
        # single-process DataLoader semantics); still pooled API-wise
        self._pool = cf.ThreadPoolExecutor(max_workers=max(1, workers))

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close_mosaic(self):
        """Disable mosaic for final epochs (reference trainer.py:359)."""
        self.hyp["mosaic"] = 0.0

    def _indices(self):
        n = len(self.ds)
        rng = np.random.default_rng(self.seed + self.epoch)
        idx = rng.permutation(n) if self.train else np.arange(n)
        return idx[self.shard_index :: self.num_shards]

    def _load_group(self, rng, main: int):
        """Main sample + donors for mosaic(+mixup) when training."""
        if not self.train:
            return self.ds.load_sample(main)
        n_extra = 7 if self.hyp.get("mixup", 0.0) > 0 else 3
        if (
            str(self.hyp.get("copy_paste_mode", "flip")) == "mixup"
            and self.hyp.get("copy_paste", 0.0) > 0
        ):
            n_extra += 4  # dedicated copy-paste donor group (reference CopyPaste mixup mode)
        extra = rng.integers(0, len(self.ds), n_extra)
        return [self.ds.load_sample(main)] + [self.ds.load_sample(int(j)) for j in extra]

    def _make_sample(self, epoch: int, pos: int, idx_list: np.ndarray, i: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed * 1_000_003 + epoch) * 1_000_003 + int(idx_list[i]) * 7 + pos)
        if self.task == "segment":
            from .augment import segment_transform

            return segment_transform(
                self._load_group(rng, int(idx_list[i])), self.ds.imgsz, self.ds.max_gt, self.train, rng, self.hyp
            )
        if self.task == "obb":
            from .augment import obb_transform

            return obb_transform(
                self._load_group(rng, int(idx_list[i])), self.ds.imgsz, self.ds.max_gt, self.train, rng, self.hyp
            )
        if self.task == "pose":
            from .augment import pose_transform

            return pose_transform(
                self._load_group(rng, int(idx_list[i])), self.ds.imgsz, self.ds.max_gt,
                self.ds.kpt_shape or (17, 3), self.train, rng, self.hyp,
                flip_idx=getattr(self.ds, "flip_idx", None),
            )
        if self.device_augment:
            from .augment import raw_train_transform

            return raw_train_transform(self.ds.load_sample(int(idx_list[i])), self.ds.imgsz, self.ds.max_gt)
        if self.train:
            main = int(idx_list[i])
            base = 8 if self.hyp.get("mosaic9", 0.0) > 0 else 3  # 3x3 or 2x2 grid donors
            n_extra = base + (4 if self.hyp.get("mixup", 0.0) > 0 else 0)  # + mixup mosaic
            extra = rng.integers(0, len(self.ds), n_extra)
            samples = [self.ds.load_sample(main)] + [self.ds.load_sample(int(j)) for j in extra]
            return train_transform(samples, self.ds.imgsz, self.ds.max_gt, rng, self.hyp)
        return val_transform(self.ds.load_sample(int(idx_list[i])), self.ds.imgsz, self.ds.max_gt, shape=self.rect_shape)

    def __len__(self):
        return self.batches_per_epoch

    def __iter__(self):
        idx = self._indices()
        n = len(idx)
        for b in range(self.batches_per_epoch):
            lo = b * self.bs
            sel = [(lo + j) % n for j in range(self.bs)]
            futs = [self._pool.submit(self._make_sample, self.epoch, lo + j, idx, sel[j]) for j in range(self.bs)]
            samples = [f.result() for f in futs]
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            if self.device_augment:
                # traced aug params ride with the batch so close_mosaic is a
                # value change, never a recompile (ops/augment_device.py)
                h = self.hyp
                batch["aug"] = np.asarray(
                    [
                        h.get("mosaic", 1.0), h.get("scale", 0.5), h.get("translate", 0.1),
                        h.get("fliplr", 0.5), h.get("hsv_h", 0.015), h.get("hsv_s", 0.7),
                        h.get("hsv_v", 0.4),
                    ],
                    np.float32,
                )
            yield batch


# reference entry names: BaseDataset (data/base.py:21) is this dataset's
# file-discovery + cache half; InfiniteDataLoader (data/build.py:28) is
# the epoch-looping loader
BaseDataset = YOLODataset
InfiniteDataLoader = DataLoader
