"""Host-side image augmentations (numpy/cv2), reference-faithful.

Implements the v8 train-time pipeline (reference data/augment.py:2375-2439):
Mosaic -> RandomPerspective -> RandomHSV -> RandomFlip, plus LetterBox for
val/predict. Formulas match the reference (HSV LUT augment.py:1373-1383,
affine matrix composition :1026-1076, mosaic geometry :566-620, letterbox
:1479-1635); the stateful parts (dataset image buffer) are redesigned as
pure functions of an RNG + sample list so the pipeline is reproducible
and thread-safe.

Labels flow through as pixel-space xyxy and leave `format_sample` as
normalized xywh padded to a fixed max_gt — the fixed-shape contract the
jitted loss expects.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import cv2
import numpy as np


def random_hsv(img: np.ndarray, rng: np.random.Generator, hgain=0.015, sgain=0.7, vgain=0.4) -> np.ndarray:
    """LUT-based HSV jitter, uint8 (reference augment.py:1373-1383)."""
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        img = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return img


def mosaic4(
    samples: List[Dict],
    imgsz: int,
    rng: np.random.Generator,
) -> Dict:
    """4-image mosaic on a 2*imgsz canvas (reference augment.py:566-620).

    samples: 4 dicts with 'img' (HWC uint8), 'bboxes' pixel xyxy (n,4),
    'cls' (n,). Returns combined sample with border for the follow-up
    affine (border = -imgsz//2 each side).
    """
    s = imgsz
    border = (-s // 2, -s // 2)
    yc = int(rng.uniform(-border[0], 2 * s + border[0]))
    xc = int(rng.uniform(-border[1], 2 * s + border[1]))
    img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    cls4, boxes4 = [], []
    for i, sample in enumerate(samples):
        img = sample["img"]
        h, w = img.shape[:2]
        if i == 0:  # top left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(sample["bboxes"]):
            b = sample["bboxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            boxes4.append(b)
            cls4.append(sample["cls"])
    bboxes = np.concatenate(boxes4, 0) if boxes4 else np.zeros((0, 4), np.float32)
    cls = np.concatenate(cls4, 0) if cls4 else np.zeros((0,), np.float32)
    bboxes = np.clip(bboxes, 0, 2 * s)
    return {"img": img4, "bboxes": bboxes, "cls": cls, "mosaic_border": border}


def mosaic9(
    samples: List[Dict],
    imgsz: int,
    rng: np.random.Generator,
) -> Dict:
    """9-image (3x3) mosaic, reference augment.py:716-786 _mosaic9.

    The center image anchors a 3s x 3s canvas; eight donors tile around
    it clockwise from the top, each placed relative to the previous
    patch's size. The canvas is then center-cropped to the same 2s x 2s
    output (and the same follow-up affine border) as mosaic4. Output
    contract matches mosaic4.
    """
    s = imgsz
    border = (-s // 2, -s // 2)
    img9 = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    cls9, boxes9 = [], []
    hp = wp = -1  # previous patch h, w
    h0 = w0 = 0
    for i, sample in enumerate(samples[:9]):
        img = sample["img"]
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = s, s, s + w, s + h  # xmin, ymin, xmax, ymax on the canvas
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:  # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        x2, y2 = min(x2, s * 3), min(y2, s * 3)
        img9[y1:y2, x1:x2] = img[y1 - padh : y2 - padh, x1 - padw : x2 - padw]
        hp, wp = h, w
        if len(sample["bboxes"]):
            b = sample["bboxes"].copy()
            # labels relative to the final 2s crop: patch offset + border
            b[:, [0, 2]] += padw + border[0]
            b[:, [1, 3]] += padh + border[1]
            boxes9.append(b)
            cls9.append(sample["cls"])
    bboxes = np.concatenate(boxes9, 0) if boxes9 else np.zeros((0, 4), np.float32)
    cls = np.concatenate(cls9, 0) if cls9 else np.zeros((0,), np.float32)
    bboxes = np.clip(bboxes, 0, 2 * s)
    crop = img9[-border[0] : s * 3 + border[0], -border[1] : s * 3 + border[1]]
    return {"img": np.ascontiguousarray(crop), "bboxes": bboxes, "cls": cls, "mosaic_border": border}


def mosaic3(
    samples: List[Dict],
    imgsz: int,
    rng: np.random.Generator,
) -> Dict:
    """3-image (1x3 horizontal strip) mosaic, reference augment.py:599-656
    _mosaic3.

    The center image anchors a 3s x 3s canvas; one donor sits to its
    right at the center row, one to its left aligned to the center
    image's bottom edge. Center-cropped to the same 2s x 2s output and
    affine border as mosaic4/mosaic9. Output contract matches mosaic4.
    """
    s = imgsz
    border = (-s // 2, -s // 2)
    img3 = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    cls3, boxes3 = [], []
    h0 = w0 = 0
    for i, sample in enumerate(samples[:3]):
        img = sample["img"]
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = s, s, s + w, s + h  # xmin, ymin, xmax, ymax on the canvas
        elif i == 1:  # right
            c = s + w0, s, s + w0 + w, s + h
        else:  # left, bottom-aligned to the center image
            c = s - w, s + h0 - h, s, s + h0
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        x2, y2 = min(x2, s * 3), min(y2, s * 3)
        img3[y1:y2, x1:x2] = img[y1 - padh : y2 - padh, x1 - padw : x2 - padw]
        if len(sample["bboxes"]):
            b = sample["bboxes"].copy()
            # labels relative to the final 2s crop: patch offset + border
            b[:, [0, 2]] += padw + border[0]
            b[:, [1, 3]] += padh + border[1]
            boxes3.append(b)
            cls3.append(sample["cls"])
    bboxes = np.concatenate(boxes3, 0) if boxes3 else np.zeros((0, 4), np.float32)
    cls = np.concatenate(cls3, 0) if cls3 else np.zeros((0,), np.float32)
    bboxes = np.clip(bboxes, 0, 2 * s)
    crop = img3[-border[0] : s * 3 + border[0], -border[1] : s * 3 + border[1]]
    return {"img": np.ascontiguousarray(crop), "bboxes": bboxes, "cls": cls, "mosaic_border": border}


def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Filter degenerate warped boxes (reference augment.py:1280-1302)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(
    sample: Dict,
    rng: np.random.Generator,
    degrees=0.0,
    translate=0.1,
    scale=0.5,
    shear=0.0,
    perspective=0.0,
    border=(0, 0),
) -> Dict:
    """Combined center/perspective/rotation-scale/shear/translate warp
    (reference augment.py:1026-1130)."""
    img = sample["img"]
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h

    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    bboxes = sample["bboxes"]
    n = len(bboxes)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack((x.min(1), y.min(1), x.max(1), y.max(1)), axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = box_candidates(bboxes.T * s, new.T, area_thr=0.10)
        bboxes = new[keep]
        cls = sample["cls"][keep]
    else:
        cls = sample["cls"]
    return {"img": img, "bboxes": bboxes.astype(np.float32), "cls": cls}


def random_flip_lr(sample: Dict, rng: np.random.Generator, p=0.5) -> Dict:
    if rng.random() < p:
        img = np.ascontiguousarray(sample["img"][:, ::-1])
        b = sample["bboxes"].copy()
        w = img.shape[1]
        b[:, [0, 2]] = w - b[:, [2, 0]]
        return {**sample, "img": img, "bboxes": b}
    return sample


def random_flip_ud(sample: Dict, rng: np.random.Generator, p=0.0) -> Dict:
    if p and rng.random() < p:
        img = np.ascontiguousarray(sample["img"][::-1])
        b = sample["bboxes"].copy()
        h = img.shape[0]
        b[:, [1, 3]] = h - b[:, [3, 1]]
        return {**sample, "img": img, "bboxes": b}
    return sample


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int],
    color=(114, 114, 114),
    scaleup=True,
    center=True,
    scale_fill=False,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Min-ratio resize + pad (reference augment.py:1479-1635).

    scale_fill=True stretches to new_shape with no padding (the
    reference LetterBox(scale_fill=True) mode used by RT-DETR predict,
    rtdetr/predict.py:74-88). Returns (image, gain, (padw, padh))."""
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    if scale_fill:
        if shape != tuple(new_shape):
            img = cv2.resize(img, (new_shape[1], new_shape[0]), interpolation=cv2.INTER_LINEAR)
        return img, 1.0, (0.0, 0.0)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return img, r, (left, top)


def format_sample(sample: Dict, imgsz: int, max_gt: int) -> Dict[str, np.ndarray]:
    """Final fixed-shape conversion: image float, labels normalized xywh
    padded to max_gt (replaces the reference's variable-length
    batch_idx concat collate, data/dataset.py:282-311)."""
    img = sample["img"]
    h, w = img.shape[:2]
    bboxes = sample["bboxes"]
    cls = sample["cls"]
    n = min(len(bboxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_cls = np.zeros((max_gt,), np.float32)
    out_mask = np.zeros((max_gt,), np.float32)
    if n:
        b = bboxes[:n]
        cx = (b[:, 0] + b[:, 2]) / 2 / w
        cy = (b[:, 1] + b[:, 3]) / 2 / h
        bw = (b[:, 2] - b[:, 0]) / w
        bh = (b[:, 3] - b[:, 1]) / h
        out_boxes[:n] = np.stack([cx, cy, bw, bh], axis=1)
        out_cls[:n] = cls[:n]
        out_mask[:n] = 1.0
    return {
        "img": img[..., ::-1].copy(),  # BGR->RGB, HWC uint8
        "cls": out_cls,
        "bboxes": out_boxes,
        "mask": out_mask,
    }


def mixup(a: Dict, b: Dict, rng: np.random.Generator) -> Dict:
    """Beta(32, 32) image blend, labels concatenated
    (reference augment.py:867-920)."""
    r = rng.beta(32.0, 32.0)
    img = (a["img"].astype(np.float32) * r + b["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    return {
        "img": img,
        "bboxes": np.concatenate([a["bboxes"], b["bboxes"]], 0),
        "cls": np.concatenate([a["cls"], b["cls"]], 0),
    }


def pixel_augment(img: np.ndarray, rng: np.random.Generator, p: float = 1.0) -> np.ndarray:
    """Pixel-level photometric jitter matching the reference's default
    Albumentations bundle (augment.py:1846-1854: Blur p=.01, MedianBlur
    p=.01, ToGray p=.01, CLAHE p=.01 — the RandomBrightnessContrast /
    RandomGamma / ImageCompression entries ship with p=0.0). cv2-backed so
    no albumentations dependency; kernel/clip ranges mirror the
    albumentations defaults (blur_limit=(3,7) odd, clip_limit=(1,4),
    tile_grid_size=(8,8))."""
    if rng.random() >= p:
        return img
    import cv2

    if rng.random() < 0.01:  # Blur
        k = int(rng.integers(1, 4)) * 2 + 1  # odd in [3, 7]
        img = cv2.blur(img, (k, k))
    if rng.random() < 0.01:  # MedianBlur
        k = int(rng.integers(1, 4)) * 2 + 1
        img = cv2.medianBlur(img, k)
    if rng.random() < 0.01:  # ToGray
        img = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), cv2.COLOR_GRAY2BGR)
    if rng.random() < 0.01:  # CLAHE (applied on L of LAB like albumentations)
        clip = float(rng.uniform(1.0, 4.0))
        lab = cv2.cvtColor(img, cv2.COLOR_BGR2LAB)
        lab[..., 0] = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(lab[..., 0])
        img = cv2.cvtColor(lab, cv2.COLOR_LAB2BGR)
    return img


def train_transform(
    samples: List[Dict],
    imgsz: int,
    max_gt: int,
    rng: np.random.Generator,
    hyp: Dict,
) -> Dict[str, np.ndarray]:
    """Full train pipeline for one output image (needs 4 input samples
    for mosaic, 8 when mixup can fire; falls back gracefully)."""
    use_mosaic = rng.random() < hyp.get("mosaic", 1.0)
    # mosaic9: probability of the 3x3 grid replacing the 2x2 one when
    # mosaic fires (reference exposes n=9 on the Mosaic ctor, not a flag;
    # a hyp key is this config system's equivalent). Needs 9 samples.
    use_9 = use_mosaic and len(samples) >= 9 and rng.random() < hyp.get("mosaic9", 0.0)
    # mosaic3: same ctor-arg-as-hyp-key treatment (reference n=3,
    # augment.py:599-656). Checked after mosaic9 so the two keys compose.
    use_3 = (
        use_mosaic and not use_9 and len(samples) >= 3 and rng.random() < hyp.get("mosaic3", 0.0)
    )
    if use_9:
        m = mosaic9(samples[:9], imgsz, rng)
        border = m.pop("mosaic_border")
    elif use_3:
        m = mosaic3(samples[:3], imgsz, rng)
        border = m.pop("mosaic_border")
    elif use_mosaic:
        m = mosaic4(samples[:4], imgsz, rng)
        border = m.pop("mosaic_border")
    else:
        s0 = samples[0]
        img, r, (padw, padh) = letterbox(s0["img"], imgsz)
        b = s0["bboxes"].copy()
        if len(b):
            b = b * r
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
        m = {"img": img, "bboxes": b.astype(np.float32), "cls": s0["cls"]}
        border = (0, 0)
    m = random_perspective(
        m,
        rng,
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=border,
    )
    mix_lo = 9 if use_9 else 4  # mixup donors follow the mosaic's
    if use_mosaic and len(samples) >= mix_lo + 4 and rng.random() < hyp.get("mixup", 0.0):
        m2 = mosaic4(samples[mix_lo : mix_lo + 4], imgsz, rng)
        b2 = m2.pop("mosaic_border")
        m2 = random_perspective(
            m2, rng,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=b2,
        )
        m = mixup(m, m2, rng)
    # reference order: Albumentations sits between MixUp and RandomHSV
    # (v8_transforms, augment.py:2375-2439)
    m["img"] = pixel_augment(m["img"], rng, hyp.get("pixel_augment", 1.0))
    m["img"] = random_hsv(
        m["img"], rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)
    )
    m = random_flip_ud(m, rng, hyp.get("flipud", 0.0))
    m = random_flip_lr(m, rng, hyp.get("fliplr", 0.5))
    return format_sample(m, imgsz, max_gt)


# ---------------------------------------------------------------------------
# Instance-aware geometric pipeline (segments/keypoints ride the same
# transforms — reference augment.py:952-1302 handles them inside
# RandomPerspective; mosaic/copy-paste/mixup concat them)
# ---------------------------------------------------------------------------


def _inst_px(sample: Dict) -> Dict:
    """Normalize a loader sample to pixel-space instances: polys/kpts in
    pixels aligned with 'bboxes' (xyxy px)."""
    h, w = sample["img"].shape[:2]
    n = len(sample["cls"])
    polys = list(sample.get("segments") or [None] * n)
    kpts = list(sample.get("kpts") or [None] * n)
    px_polys, px_kpts = [], []
    for j in range(n):
        p = polys[j] if j < len(polys) else None
        k = kpts[j] if j < len(kpts) else None
        px_polys.append(None if p is None else p * np.array([w, h], np.float32))
        if k is None:
            px_kpts.append(None)
        else:
            q = k.copy()
            q[:, 0] *= w
            q[:, 1] *= h
            px_kpts.append(q)
    return {
        "img": sample["img"],
        "bboxes": sample["bboxes"].astype(np.float32),
        "cls": sample["cls"],
        "polys": px_polys,
        "kpts": px_kpts,
    }


def _shift_inst(s: Dict, dx: float, dy: float) -> Dict:
    b = s["bboxes"].copy()
    if len(b):
        b[:, [0, 2]] += dx
        b[:, [1, 3]] += dy
    return {
        **s,
        "bboxes": b,
        "polys": [None if p is None else p + np.array([dx, dy], np.float32) for p in s["polys"]],
        "kpts": [
            None if k is None else np.concatenate([k[:, :2] + np.array([dx, dy], np.float32), k[:, 2:]], 1)
            for k in s["kpts"]
        ],
    }


def mosaic4_inst(samples: List[Dict], imgsz: int, rng: np.random.Generator) -> Dict:
    """Instance-carrying mosaic (geometry identical to mosaic4)."""
    s = imgsz
    border = (-s // 2, -s // 2)
    yc = int(rng.uniform(-border[0], 2 * s + border[0]))
    xc = int(rng.uniform(-border[1], 2 * s + border[1]))
    img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    parts = []
    for i, sample in enumerate(samples):
        img = sample["img"]
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        parts.append(_shift_inst(sample, x1a - x1b, y1a - y1b))
    out = {
        "img": img4,
        "bboxes": np.concatenate([p["bboxes"] for p in parts], 0) if parts else np.zeros((0, 4), np.float32),
        "cls": np.concatenate([p["cls"] for p in parts], 0),
        "polys": sum((p["polys"] for p in parts), []),
        "kpts": sum((p["kpts"] for p in parts), []),
        "mosaic_border": border,
    }
    out["bboxes"] = np.clip(out["bboxes"], 0, 2 * s)
    return out


def copy_paste_inst(s: Dict, rng: np.random.Generator, p: float = 0.5, donor: Optional[Dict] = None) -> Dict:
    """Reference CopyPaste._transform (augment.py:1636-1736). Candidate
    instances come from `donor` (mixup mode) or from this image's
    lr-mirrored instances (flip mode, donor=None). Candidates that occlude
    existing boxes by >= 30% IoA are rejected; survivors are sorted by max
    IoA ascending and the first round(p*n) are pasted (with the donor's —
    or flipped self's — pixels under the candidate polygon)."""
    n = len(s["cls"])
    if p <= 0 or n == 0:
        return s
    h, w = s["img"].shape[:2]
    if donor is None:
        # flip mode: mirrored copies of this image's own instances
        if all(q is None for q in s["polys"]):
            return s
        src_img = np.ascontiguousarray(s["img"][:, ::-1])
        cand_boxes = s["bboxes"].copy()
        cand_boxes[:, [0, 2]] = w - s["bboxes"][:, [2, 0]]
        cand_cls = s["cls"]
        cand_polys = [
            None if q is None else np.stack([w - q[:, 0], q[:, 1]], 1) for q in s["polys"]
        ]
    else:
        if len(donor["cls"]) == 0 or all(q is None for q in donor["polys"]):
            return s
        src_img = donor["img"]
        cand_boxes, cand_cls, cand_polys = donor["bboxes"], donor["cls"], donor["polys"]
    m = len(cand_cls)
    # IoA of each candidate box vs all existing boxes (reference bbox_ioa)
    lt = np.maximum(cand_boxes[:, None, :2], s["bboxes"][None, :, :2])
    rb = np.minimum(cand_boxes[:, None, 2:], s["bboxes"][None, :, 2:])
    inter = np.prod(np.clip(rb - lt, 0, None), -1)  # (M, N)
    area = np.maximum(
        (cand_boxes[:, 2] - cand_boxes[:, 0]) * (cand_boxes[:, 3] - cand_boxes[:, 1]), 1e-9
    )
    ioa = inter / area[:, None]
    ok = np.nonzero(((ioa < 0.30).all(1)) & np.array([q is not None for q in cand_polys]))[0]
    if len(ok) == 0:
        return s
    ok = ok[np.argsort(ioa[ok].max(1))][: round(p * len(ok))]
    if len(ok) == 0:
        return s
    img = s["img"].copy()
    new_boxes, new_cls, new_polys, new_kpts = [], [], [], []
    paste = np.zeros((h, w), np.uint8)
    for j in ok:
        cv2.fillPoly(paste, [np.round(cand_polys[j]).astype(np.int32)], 1)
        new_boxes.append(cand_boxes[j])
        new_cls.append(cand_cls[j])
        new_polys.append(cand_polys[j])
        new_kpts.append(None)
    if src_img.shape[:2] != (h, w):  # donor geometry must match (same pipeline)
        return s
    sel = paste == 1
    img[sel] = src_img[sel]
    return {
        **s,
        "img": img,
        "bboxes": np.concatenate([s["bboxes"], np.stack(new_boxes)], 0),
        "cls": np.concatenate([s["cls"], np.asarray(new_cls, s["cls"].dtype)], 0),
        "polys": s["polys"] + new_polys,
        "kpts": s["kpts"] + new_kpts,
    }


def random_perspective_inst(
    sample: Dict, rng: np.random.Generator,
    degrees=0.0, translate=0.1, scale=0.5, shear=0.0, perspective=0.0, border=(0, 0),
) -> Dict:
    """Instance-carrying RandomPerspective: polys/kpts go through the same
    combined matrix; boxes are recomputed from warped polygons when
    present (reference augment.py:1131-1230)."""
    img = sample["img"]
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    sc = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=sc)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    def warp_pts(pts):  # (K, 2) -> (K, 2)
        xy = np.ones((len(pts), 3))
        xy[:, :2] = pts
        xy = xy @ M.T
        return (xy[:, :2] / xy[:, 2:3]) if perspective else xy[:, :2]

    n = len(sample["cls"])
    new_boxes = np.zeros((n, 4), np.float32)
    new_polys, new_kpts = [], []
    for j in range(n):
        poly = sample["polys"][j]
        kp = sample["kpts"][j]
        if poly is not None:
            wp = warp_pts(poly).astype(np.float32)
            new_polys.append(wp)
            cp = np.clip(wp, [0, 0], [w, h])
            new_boxes[j] = [cp[:, 0].min(), cp[:, 1].min(), cp[:, 0].max(), cp[:, 1].max()]
        else:
            new_polys.append(None)
            b = sample["bboxes"][j]
            corners = warp_pts(np.array([[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]]))
            corners = np.clip(corners, [0, 0], [w, h])
            new_boxes[j] = [corners[:, 0].min(), corners[:, 1].min(), corners[:, 0].max(), corners[:, 1].max()]
        if kp is not None:
            q = kp.copy()
            q[:, :2] = warp_pts(kp[:, :2]).astype(np.float32)
            # kpts leaving the frame become invisible (reference :1216)
            out_of = (q[:, 0] < 0) | (q[:, 0] > w) | (q[:, 1] < 0) | (q[:, 1] > h)
            q[out_of, 2] = 0 if q.shape[1] == 3 else q[out_of, -1]
            new_kpts.append(q)
        else:
            new_kpts.append(None)

    keep = box_candidates(sample["bboxes"].T * sc, new_boxes.T, area_thr=0.01 if any(
        p is not None for p in sample["polys"]) else 0.10)
    return {
        "img": img,
        "bboxes": new_boxes[keep],
        "cls": sample["cls"][keep],
        "polys": [p for p, k in zip(new_polys, keep) if k],
        "kpts": [p for p, k in zip(new_kpts, keep) if k],
    }


def flip_inst(s: Dict, rng: np.random.Generator, flipud=0.0, fliplr=0.5, flip_idx=None) -> Dict:
    img = s["img"]
    h, w = img.shape[:2]
    out = dict(s)
    if flipud and rng.random() < flipud:
        img = np.ascontiguousarray(img[::-1])
        b = out["bboxes"].copy()
        b[:, [1, 3]] = h - b[:, [3, 1]]
        out.update(
            img=img, bboxes=b,
            polys=[None if p is None else np.stack([p[:, 0], h - p[:, 1]], 1) for p in out["polys"]],
            kpts=[
                None if k is None else np.concatenate([k[:, :1], h - k[:, 1:2], k[:, 2:]], 1)
                for k in out["kpts"]
            ],
        )
    if fliplr and rng.random() < fliplr:
        img = np.ascontiguousarray(out["img"][:, ::-1])
        b = out["bboxes"].copy()
        b[:, [0, 2]] = w - b[:, [2, 0]]

        def flip_k(k):
            if k is None:
                return None
            q = np.concatenate([w - k[:, :1], k[:, 1:]], 1)
            if flip_idx is not None:  # left/right kpt swap (reference flip_idx)
                q = q[np.asarray(flip_idx)]
            return q

        out.update(
            img=img, bboxes=b,
            polys=[None if p is None else np.stack([w - p[:, 0], p[:, 1]], 1) for p in out["polys"]],
            kpts=[flip_k(k) for k in out["kpts"]],
        )
    return out


def geometric_train_transform(
    samples: List[Dict], imgsz: int, rng: np.random.Generator, hyp: Dict, flip_idx=None,
) -> Dict:
    """Reference v8_transforms order for instance tasks: Mosaic ->
    CopyPaste -> RandomPerspective -> MixUp -> HSV -> flips
    (augment.py:2375-2439). Returns a pixel-space instance sample."""
    insts = [_inst_px(s) for s in samples]
    use_mosaic = rng.random() < hyp.get("mosaic", 1.0)
    if use_mosaic and len(insts) >= 4:
        m = mosaic4_inst(insts[:4], imgsz, rng)
        border = m.pop("mosaic_border")
    else:
        s0 = insts[0]
        img, r, (padw, padh) = letterbox(s0["img"], imgsz)
        m = _shift_inst(
            {
                **s0,
                "img": img,
                "bboxes": s0["bboxes"] * r,
                "polys": [None if p is None else p * r for p in s0["polys"]],
                "kpts": [
                    None if k is None else np.concatenate([k[:, :2] * r, k[:, 2:]], 1) for k in s0["kpts"]
                ],
            },
            padw, padh,
        )
        m["img"] = img
        border = (0, 0)
    cp_mode = str(hyp.get("copy_paste_mode", "flip") or "flip")
    if cp_mode == "flip":
        # reference v8_transforms inserts flip-mode CopyPaste between
        # Mosaic and RandomPerspective (augment.py:2410-2411)
        m = copy_paste_inst(m, rng, hyp.get("copy_paste", 0.0))
    m = random_perspective_inst(
        m, rng,
        degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0), border=border,
    )
    if cp_mode == "mixup" and hyp.get("copy_paste", 0.0) > 0 and len(insts) >= 8:
        # mixup mode runs AFTER the affine with a donor that went through
        # its own mosaic+affine (reference pre_transform.append(CopyPaste),
        # augment.py:2412-2421); the loader appends 4 dedicated donors
        d = mosaic4_inst(insts[-4:], imgsz, rng)
        db = d.pop("mosaic_border")
        d = random_perspective_inst(
            d, rng,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=db,
        )
        m = copy_paste_inst(m, rng, hyp.get("copy_paste", 0.0), donor=d)
    if use_mosaic and len(insts) >= 8 and rng.random() < hyp.get("mixup", 0.0):
        m2 = mosaic4_inst(insts[4:8], imgsz, rng)
        b2 = m2.pop("mosaic_border")
        m2 = random_perspective_inst(
            m2, rng,
            degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
            scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
            perspective=hyp.get("perspective", 0.0), border=b2,
        )
        r = rng.beta(32.0, 32.0)
        m = {
            "img": (m["img"].astype(np.float32) * r + m2["img"].astype(np.float32) * (1 - r)).astype(np.uint8),
            "bboxes": np.concatenate([m["bboxes"], m2["bboxes"]], 0),
            "cls": np.concatenate([m["cls"], m2["cls"]], 0),
            "polys": m["polys"] + m2["polys"],
            "kpts": m["kpts"] + m2["kpts"],
        }
    m["img"] = pixel_augment(m["img"], rng, hyp.get("pixel_augment", 1.0))
    m["img"] = random_hsv(
        m["img"], rng, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)
    )
    return flip_inst(m, rng, hyp.get("flipud", 0.0), hyp.get("fliplr", 0.5), flip_idx)


def raw_train_transform(sample: Dict, imgsz: int, max_gt: int) -> Dict[str, np.ndarray]:
    """Host side of the on-device pipeline: decode + letterbox only.
    All augmentation (mosaic/affine/HSV/flip) runs jitted ahead of the
    model (ops/augment_device.py) — the BASELINE north-star contract."""
    img, r, (padw, padh) = letterbox(sample["img"], imgsz, scaleup=True)
    b = sample["bboxes"].copy()
    if len(b):
        b = b * r
        b[:, [0, 2]] += padw
        b[:, [1, 3]] += padh
    return format_sample({"img": img, "bboxes": b.astype(np.float32), "cls": sample["cls"]}, imgsz, max_gt)


def _val_inst(sample: Dict, imgsz: int) -> Dict:
    """Letterbox a loader sample into a pixel-space instance dict."""
    img, r, (padw, padh) = letterbox(sample["img"], imgsz, scaleup=False)
    m = _inst_px(sample)
    m = _shift_inst(
        {
            **m,
            "bboxes": m["bboxes"] * r,
            "polys": [None if p is None else p * r for p in m["polys"]],
            "kpts": [None if k is None else np.concatenate([k[:, :2] * r, k[:, 2:]], 1) for k in m["kpts"]],
        },
        padw, padh,
    )
    m["img"] = img
    m["ratio_pad"] = np.array([r, padw, padh], np.float32)
    return m


def segment_transform(sample, imgsz: int, max_gt: int, train: bool, rng, hyp: Dict) -> Dict[str, np.ndarray]:
    """Segmentation pipeline. Train: the full geometric stack
    (mosaic/copy-paste/affine/mixup/HSV/flip) with polygons warped through
    the same matrices (reference v8_transforms); val: letterbox. Targets:
    boxes + an instance *overlap map* at imgsz/4 — the reference's
    overlap_mask=True representation (data/utils.py polygons2masks_overlap):
    pixel = GT index + 1, larger instances drawn first."""
    if train:
        samples = sample if isinstance(sample, list) else [sample]
        m = geometric_train_transform(samples, imgsz, rng, hyp)
        rp = np.array([1.0, 0.0, 0.0], np.float32)
    else:
        m = _val_inst(sample if not isinstance(sample, list) else sample[0], imgsz)
        rp = m["ratio_pad"]
    out = format_sample({k: m[k] for k in ("img", "bboxes", "cls")}, imgsz, max_gt)
    # train honors mask_ratio (reference Format(mask_ratio), default 4 ==
    # proto resolution); val stays at /4 so the metric protocol is fixed
    ratio = int(hyp.get("mask_ratio", 4) or 4) if train else 4
    ms = imgsz // ratio
    n = min(len(m["bboxes"]), max_gt)
    if train and not bool(hyp.get("overlap_mask", True)):
        # overlap_mask=False: per-instance masks (occluded regions kept,
        # reference polygons2masks) bit-packed into int32 planes — instance
        # j lives in plane j//32 bit j%32, a fixed (P, ms, ms) target
        # instead of the reference's (N, H, W) ragged stack
        planes = (max_gt + 31) // 32
        seg = np.zeros((planes, ms, ms), np.int32)
        for j in range(n):
            p = m["polys"][j] if j < len(m["polys"]) else None
            one = np.zeros((ms, ms), np.uint8)
            if p is None:
                x1, y1, x2, y2 = (m["bboxes"][j] / ratio).astype(int)
                one[max(y1, 0) : y2, max(x1, 0) : x2] = 1
            else:
                cv2.fillPoly(one, [np.round(p / ratio).astype(np.int32)], color=1)
            seg[j // 32] |= one.astype(np.int32) << (j % 32)
        out["seg_map"] = seg
    else:
        overlap = np.zeros((ms, ms), np.int32)
        order = np.argsort([-(bb[2] - bb[0]) * (bb[3] - bb[1]) for bb in m["bboxes"][:n]]) if n else []
        for j in order:  # big first; small instances overwrite
            p = m["polys"][j] if j < len(m["polys"]) else None
            if p is None:
                x1, y1, x2, y2 = (m["bboxes"][j] / ratio).astype(int)
                overlap[max(y1, 0) : y2, max(x1, 0) : x2] = j + 1
            else:
                cv2.fillPoly(overlap, [np.round(p / ratio).astype(np.int32)], color=int(j + 1))
        out["seg_map"] = overlap
    out["ratio_pad"] = rp
    return out


def pose_transform(sample, imgsz: int, max_gt: int, kpt_shape, train: bool, rng, hyp: Dict, flip_idx=None) -> Dict[str, np.ndarray]:
    """Pose pipeline: full geometric stack in train (keypoints warped with
    the boxes, out-of-frame points dropped to v=0); letterbox val.
    Targets: (max_gt, K, 3) xy normalized to the output frame."""
    if train:
        samples = sample if isinstance(sample, list) else [sample]
        m = geometric_train_transform(samples, imgsz, rng, hyp, flip_idx=flip_idx)
    else:
        m = _val_inst(sample if not isinstance(sample, list) else sample[0], imgsz)
    out = format_sample({k: m[k] for k in ("img", "bboxes", "cls")}, imgsz, max_gt)
    nk, nd = kpt_shape
    kp = np.zeros((max_gt, nk, 3), np.float32)
    n = min(len(m["cls"]), max_gt)
    for j in range(n):
        k = m["kpts"][j] if j < len(m["kpts"]) else None
        if k is not None:
            q = k.copy().astype(np.float32)
            q[:, 0] /= imgsz
            q[:, 1] /= imgsz
            # invisible kpts keep v=0 and zeroed coords (reference convention)
            q[q[:, 2] == 0, :2] = 0
            kp[j, : len(q)] = q[:nk]
    out["kpts"] = kp
    return out


def obb_transform(sample, imgsz: int, max_gt: int, train: bool, rng, hyp: Dict) -> Dict[str, np.ndarray]:
    """OBB pipeline: full geometric stack in train (the 4-corner polygons
    warp through the affine, so rotation-consistent); letterbox val.
    Targets: normalized xywhr via minAreaRect (DOTA label convention)."""
    if train:
        samples = sample if isinstance(sample, list) else [sample]
        m = geometric_train_transform(samples, imgsz, rng, hyp)
    else:
        m = _val_inst(sample if not isinstance(sample, list) else sample[0], imgsz)
    out_box = np.zeros((max_gt, 5), np.float32)
    out_cls = np.zeros((max_gt,), np.float32)
    out_mask = np.zeros((max_gt,), np.float32)
    n = 0
    for j, p in enumerate(m["polys"]):
        if n >= max_gt:
            break
        if p is None or len(p) < 4:
            continue
        (cx, cy), (bw, bh), ang = cv2.minAreaRect(p.astype(np.float32))
        if bw <= 1 or bh <= 1:
            continue
        out_box[n] = [cx / imgsz, cy / imgsz, bw / imgsz, bh / imgsz, np.deg2rad(ang)]
        out_cls[n] = m["cls"][j]
        out_mask[n] = 1.0
        n += 1
    return {
        "img": m["img"][..., ::-1].copy(),
        "cls": out_cls,
        "bboxes": out_box,
        "mask": out_mask,
    }


def val_transform(sample: Dict, imgsz: int, max_gt: int, shape: Tuple[int, int] | None = None) -> Dict[str, np.ndarray]:
    """Val pipeline: letterbox only (reference dataset.py:205 val branch).
    `shape` overrides the square target for rect validation; rect then
    mirrors the reference's two-stage geometry (base.py load_image scales
    max-side to imgsz — up OR down — THEN LetterBox(scaleup=False) pads to
    the half-stride-bumped batch shape), so val pixels match exactly."""
    if shape is not None:
        img0 = sample["img"]
        h0, w0 = img0.shape[:2]
        r0 = imgsz / max(h0, w0)
        if r0 != 1.0:
            interp = cv2.INTER_LINEAR if r0 > 1 else cv2.INTER_AREA
            img0 = cv2.resize(img0, (min(math.ceil(w0 * r0), imgsz), min(math.ceil(h0 * r0), imgsz)), interpolation=interp)
        img, r_lb, (padw, padh) = letterbox(img0, shape, scaleup=False)
        r = r0 * r_lb
    else:
        img, r, (padw, padh) = letterbox(sample["img"], imgsz, scaleup=False)
    b = sample["bboxes"].copy()
    if len(b):
        b = b * r
        b[:, [0, 2]] += padw
        b[:, [1, 3]] += padh
    out = format_sample({"img": img, "bboxes": b.astype(np.float32), "cls": sample["cls"]}, imgsz, max_gt)
    out["ratio_pad"] = np.array([r, padw, padh], np.float32)
    out["orig_shape"] = np.array(sample["img"].shape[:2], np.int32)
    return out
