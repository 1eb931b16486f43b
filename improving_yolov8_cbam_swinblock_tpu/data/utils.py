"""Dataset verification + label caching (reference data/utils.py:44-711).

verify_image_label checks one image/label pair (corrupt images, bad
rows, out-of-range coords) and YOLODataset caches the verified labels in
a hash-keyed .cache file next to the labels — re-parsing only when files
change, like the reference's *.cache contract (dataset.py:89,
utils.py:691-711).
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

CACHE_VERSION = "0.2"


def img_label_paths(img_files: List[str]) -> List[str]:
    """images/ -> labels/ path swap on the last 'images' component."""
    out = []
    for img_path in img_files:
        parts = list(Path(img_path).parts)
        for i in range(len(parts) - 1, -1, -1):
            if parts[i] == "images":
                parts[i] = "labels"
                break
        out.append(str(Path(*parts).with_suffix(".txt")))
    return out


def dataset_hash(paths: List[str]) -> str:
    """Size-based content hash of every file in the split
    (reference utils.py get_hash)."""
    h = hashlib.sha256()
    total = 0
    for p in paths:
        try:
            total += Path(p).stat().st_size
        except OSError:
            pass
        h.update(str(p).encode())
    h.update(str(total).encode())
    return h.hexdigest()


def verify_image_label(
    im_file: str,
    lb_file: str,
    num_cls: int,
    kpt_shape: Optional[Tuple[int, int]] = None,
    single_cls: bool = False,
) -> Dict:
    """Verify one pair; returns the parsed label dict + status
    (nm missing, nf found, ne empty, ncorrupt) like reference
    utils.py:97-211. Bad rows raise; corrupt images mark ncorrupt."""
    from PIL import Image

    out = {"nm": 0, "nf": 0, "ne": 0, "ncorrupt": 0, "msg": ""}
    try:
        with Image.open(im_file) as im:
            im.verify()
            w, h = im.size
            if w < 10 or h < 10:
                raise ValueError(f"image too small {(w, h)}")
            if im.format and im.format.lower() not in {"bmp", "jpeg", "jpg", "png", "tiff", "webp", "mpo"}:
                raise ValueError(f"invalid format {im.format}")
    except Exception as e:
        out.update(ncorrupt=1, msg=f"corrupt image {im_file}: {e}")
        return out

    cls, boxes, segments, kpts = [], [], [], []
    lp = Path(lb_file)
    if not lp.exists():
        out["nm"] = 1
    else:
        lines = lp.read_text().strip().splitlines()
        if not lines:
            out["ne"] = 1
        for line in lines:
            vals = line.split()
            c = 0 if single_cls else int(float(vals[0]))
            if c >= num_cls:
                out["msg"] = f"label class {c} exceeds nc={num_cls} in {lb_file}"
                out["ncorrupt"] = 1
                return out
            if len(vals) > 5 and (len(vals) - 5) % 3 == 0 and kpt_shape:
                x, y, bw, bh = map(float, vals[1:5])
                k = np.asarray([float(v) for v in vals[5:]], np.float32).reshape(-1, 3)
                if bw > 0 and bh > 0:
                    cls.append(c)
                    boxes.append([x, y, bw, bh])
                    segments.append(None)
                    kpts.append(k)
                continue
            if len(vals) > 5 and len(vals) % 2 == 1:
                poly = np.asarray([float(v) for v in vals[1:]], np.float32).reshape(-1, 2)
                if ((poly < -0.01) | (poly > 1.01)).any():
                    out["msg"] = f"non-normalized segment coords in {lb_file}"
                x1, y1 = poly.min(0)
                x2, y2 = poly.max(0)
                if x2 > x1 and y2 > y1:
                    cls.append(c)
                    boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                    segments.append(poly)
                    kpts.append(None)
            elif len(vals) >= 5:
                x, y, bw, bh = map(float, vals[1:5])
                if not (0 <= x <= 1 and 0 <= y <= 1 and bw <= 1 and bh <= 1):
                    out["msg"] = f"non-normalized box coords in {lb_file}"
                if bw > 0 and bh > 0:
                    cls.append(c)
                    boxes.append([x, y, bw, bh])
                    segments.append(None)
                    kpts.append(None)
        if lines and not out["ne"]:
            out["nf"] = 1
    out["label"] = {
        "cls": np.asarray(cls, np.float32),
        "xywhn": np.asarray(boxes, np.float32).reshape(-1, 4),
        "segments": segments,
        "kpts": kpts,
    }
    return out


def load_or_build_cache(
    img_files: List[str],
    num_cls: int,
    kpt_shape: Optional[Tuple[int, int]] = None,
    single_cls: bool = False,
) -> Tuple[List[Dict], Dict]:
    """Verified labels for a split, via the sibling .cache file when its
    hash still matches (reference cache_labels, dataset.py:89)."""
    lb_files = img_label_paths(img_files)
    key = dataset_hash(img_files + lb_files)
    cache_path = Path(lb_files[0]).parent.with_suffix(".cache") if lb_files else None

    if cache_path and cache_path.exists():
        try:
            payload = pickle.loads(cache_path.read_bytes())
            if payload.get("version") == CACHE_VERSION and payload.get("hash") == key:
                return payload["labels"], payload["stats"]
        except Exception:
            pass  # stale/corrupt cache: rebuild

    labels, stats = [], {"nm": 0, "nf": 0, "ne": 0, "ncorrupt": 0, "msgs": []}
    for im, lb in zip(img_files, lb_files):
        r = verify_image_label(im, lb, num_cls, kpt_shape, single_cls)
        for k in ("nm", "nf", "ne", "ncorrupt"):
            stats[k] += r[k]
        if r["msg"]:
            stats["msgs"].append(r["msg"])
        labels.append(
            r.get(
                "label",
                {"cls": np.zeros(0, np.float32), "xywhn": np.zeros((0, 4), np.float32), "segments": [], "kpts": []},
            )
        )
    if cache_path:
        try:
            cache_path.write_bytes(
                pickle.dumps({"version": CACHE_VERSION, "hash": key, "labels": labels, "stats": stats})
            )
        except OSError:
            pass  # read-only label dir: caching is best-effort
    return labels, stats


def compress_one_image(f, f_new=None, max_dim: int = 1920, quality: int = 50):
    """Resize so the longest side <= max_dim and re-encode at reduced
    JPEG quality (reference data/utils.py compress_one_image) — preview
    assets for HUB-style dataset browsing."""
    from PIL import Image

    with Image.open(f) as im:
        im = im.convert("RGB")
        r = max_dim / max(im.height, im.width)
        if r < 1.0:
            im = im.resize((int(im.width * r), int(im.height * r)))
        im.save(f_new or f, "JPEG", quality=quality, optimize=True)


class HUBDatasetStats:
    """Dataset statistics JSON + compressed preview images
    (reference data/utils.py:470-660 HUBDatasetStats, minus the zip
    download path — no egress here, datasets are local).

    >>> stats = HUBDatasetStats("data.yaml", task="detect")
    >>> stats.get_json(save=True)   # writes <path>-hub/stats.json
    >>> stats.process_images()      # writes <path>-hub/images/*.jpg
    """

    def __init__(self, path="data.yaml", task: str = "detect"):
        from .dataset import check_det_dataset

        self.task = task
        data = check_det_dataset(path)
        root = Path(data.get("yaml_file", path)).parent
        self.hub_dir = Path(f"{root}-hub")
        self.im_dir = self.hub_dir / "images"
        names = data["names"]
        self.stats = {"nc": int(data["nc"]), "names": list(names.values())}
        self.data = data

    def _split_files(self, split: str):
        from .dataset import IMG_EXTS

        p = self.data.get(split)
        if not p or not Path(p).exists():
            return []
        return sorted(f for f in Path(p).rglob("*") if f.suffix.lower() in IMG_EXTS)

    def get_json(self, save: bool = False) -> Dict:
        for split in ("train", "val", "test"):
            self.stats[split] = None
            files = self._split_files(split)
            if not files:
                continue
            labels, _ = load_or_build_cache([str(f) for f in files], self.stats["nc"])
            x = np.array(
                [np.bincount(lb["cls"].astype(int), minlength=self.stats["nc"]) for lb in labels]
            ).reshape(len(labels), self.stats["nc"])
            self.stats[split] = {
                "instance_stats": {"total": int(x.sum()), "per_class": x.sum(0).tolist()},
                "image_stats": {
                    "total": len(files),
                    "unlabelled": int(np.all(x == 0, 1).sum()),
                    "per_class": (x > 0).sum(0).tolist(),
                },
                "labels": [
                    {
                        f.name: [
                            [int(c), *(round(float(v), 4) for v in b)]
                            for c, b in zip(lb["cls"], lb["xywhn"])
                        ]
                    }
                    for f, lb in zip(files, labels)
                ],
            }
        if save:
            import json

            self.hub_dir.mkdir(parents=True, exist_ok=True)
            (self.hub_dir / "stats.json").write_text(json.dumps(self.stats, indent=2))
        return self.stats

    def process_images(self):
        self.im_dir.mkdir(parents=True, exist_ok=True)
        done = []
        for split in ("train", "val", "test"):
            for f in self._split_files(split):
                out = self.im_dir / f"{f.stem}.jpg"
                compress_one_image(f, out)
                done.append(out)
        return done


# public alias matching the reference name (data/utils.py:53 img2label_paths)
img2label_paths = img_label_paths


def exif_size(img) -> Tuple[int, int]:
    """PIL size corrected for EXIF orientation (reference utils.py:58):
    rotation tags 6/8 swap width and height."""
    s = img.size
    try:
        exif = img.getexif()
        if exif and exif.get(274) in (6, 8):  # 274 = Orientation
            s = (s[1], s[0])
    except Exception:
        pass
    return s


def polygon2mask(imgsz, polygons, color: int = 1, downsample_ratio: int = 1) -> np.ndarray:
    """Rasterize polygons into one uint8 mask of (h, w) = imgsz, then
    resize by 1/downsample_ratio (reference data/utils.py:214 — fill at
    full resolution BEFORE the resize so mask_ratio=1 losses match)."""
    import cv2

    mask = np.zeros(imgsz, dtype=np.uint8)
    polys = [np.asarray(p, dtype=np.int32).reshape(-1, 2) for p in polygons]
    cv2.fillPoly(mask, polys, color=color)
    if downsample_ratio == 1:
        return mask
    return cv2.resize(mask, (imgsz[1] // downsample_ratio, imgsz[0] // downsample_ratio))


def polygons2masks(imgsz, polygons, color: int, downsample_ratio: int = 1) -> np.ndarray:
    """One binary mask per polygon (reference data/utils.py:237)."""
    return np.array([polygon2mask(imgsz, [np.asarray(p).reshape(-1)], color, downsample_ratio) for p in polygons])


def polygons2masks_overlap(imgsz, segments, downsample_ratio: int = 1):
    """Single index mask where pixel value i+1 = instance i, overlaps won
    by the SMALLER instance (reference data/utils.py:254 stamps in
    descending-area order with clipping — equivalent to overwriting).
    Returns (mask, descending-area instance order)."""
    dtype = np.int32 if len(segments) > 255 else np.uint8
    masks = np.zeros((imgsz[0] // downsample_ratio, imgsz[1] // downsample_ratio), dtype=dtype)
    ms = [polygon2mask(imgsz, [np.asarray(s).reshape(-1)], color=1, downsample_ratio=downsample_ratio)
          for s in segments]
    order = np.argsort(-np.array([m.sum() for m in ms] or [0], dtype=np.int64))[: len(ms)]
    for rank, idx in enumerate(order):
        masks[ms[idx] > 0] = rank + 1
    return masks, order


def find_dataset_yaml(path) -> Path:
    """Locate the single data.yaml under a dataset root (reference
    data/utils.py:276): prefer top-level matches, error on 0 or >1."""
    path = Path(path)
    files = sorted(path.glob("*.yaml")) or sorted(path.rglob("*.yaml"))
    if not files:
        raise FileNotFoundError(f"no *.yaml file found in {path}")
    if len(files) > 1:
        files = [f for f in files if f.stem == path.stem] or files
    if len(files) != 1:
        raise ValueError(f"expected 1 *.yaml in {path}, found {len(files)}: {files}")
    return files[0]


def check_cls_dataset(dataset, split: str = "") -> Dict:
    """Resolve a classification dataset folder into {train, val, test,
    nc, names} (reference data/utils.py:390 minus the download path — no
    egress here; class names come from the train/ subfolders)."""
    data_dir = Path(dataset).resolve()
    if not data_dir.is_dir():
        raise FileNotFoundError(f"classification dataset not found: {data_dir}")
    train_set = data_dir / "train"
    val_set = next((data_dir / n for n in ("val", "validation") if (data_dir / n).exists()), None)
    test_set = data_dir / "test" if (data_dir / "test").exists() else None
    if split == "val" and not val_set:
        val_set = test_set
    elif split == "test" and not test_set:
        test_set = val_set
    base = train_set if train_set.exists() else data_dir
    names = sorted(d.name for d in base.iterdir() if d.is_dir())
    return {
        "train": train_set if train_set.exists() else None,
        "val": val_set,
        "test": test_set,
        "nc": len(names),
        "names": dict(enumerate(names)),
    }


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False):
    """Split an images/ dir into autosplit_{train,val,test}.txt lists
    (reference data/utils.py:660; same seeded per-image weighted draw)."""
    import random

    from .dataset import IMG_EXTS

    path = Path(path)
    files = sorted(x for x in path.rglob("*.*") if x.suffix.lower() in IMG_EXTS)
    random.seed(0)
    indices = random.choices([0, 1, 2], weights=weights, k=len(files))
    txt = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for x in txt:
        (path.parent / x).unlink(missing_ok=True)
    for i, img in zip(indices, files):
        if not annotated_only or Path(img2label_paths([str(img)])[0]).exists():
            with open(path.parent / txt[i], "a", encoding="utf-8") as f:
                f.write(f"./{img.relative_to(path.parent).as_posix()}\n")
    return [path.parent / t for t in txt]


def visualize_image_annotations(image_path, txt_path, label_map: Dict[int, str], save_path=None):
    """Draw the YOLO-txt annotations of one image onto it (reference
    data/utils.py:170 — matplotlib there; the framework Annotator here)
    and save/return the BGR array."""
    from ..utils.patches import imread, imwrite
    from ..utils.plotting import Annotator

    img = imread(str(image_path))
    if img is None:
        raise FileNotFoundError(image_path)
    h, w = img.shape[:2]
    ann = Annotator(img)
    for line in Path(txt_path).read_text().splitlines():
        vals = line.split()
        if len(vals) < 5:
            continue
        c = int(float(vals[0]))
        x, y, bw, bh = (float(v) for v in vals[1:5])
        box = [(x - bw / 2) * w, (y - bh / 2) * h, (x + bw / 2) * w, (y + bh / 2) * h]
        ann.box_label(box, label=str(label_map.get(c, c)), color=(56, 56, 255))
    out = ann.result()
    if save_path:
        imwrite(str(save_path), out)
    return out


# reference-name aliases (data/utils.py:40 get_hash; dataset.py:60-85
# load_dataset_cache_file / save_dataset_cache_file)
get_hash = dataset_hash


def load_dataset_cache_file(path):
    """Load a label .cache file (reference dataset.py:60)."""
    import pickle as _pickle

    return _pickle.loads(Path(path).read_bytes())


def save_dataset_cache_file(prefix: str, path, x: Dict, version: str = CACHE_VERSION):
    """Write a label .cache file if the directory is writeable
    (reference dataset.py:72)."""
    import os
    import pickle as _pickle

    x["version"] = version
    if os.access(str(Path(path).parent), os.W_OK):
        Path(path).write_bytes(_pickle.dumps(x))
    else:
        from ..utils import LOGGER

        LOGGER.warning(f"{prefix}cache directory {Path(path).parent} is not writeable, cache not saved")
