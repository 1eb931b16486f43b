"""Detection predictor: letterbox -> jitted forward+NMS -> rescale.

Equivalent of reference BasePredictor/DetectionPredictor
(engine/predictor.py:108-497, models/yolo/detect/predict.py:33-102).
The per-shape jit cache replaces the reference's warmup+AutoBackend
machinery; sources are images / ndarrays / paths / dirs (streams later).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from .results import Results

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


class DetectionPredictor:
    def __init__(self, model, args):
        self.model = model
        self.args = args
        self._jitted = {}

    def _get_fn(self, shape):
        if shape not in self._jitted:
            model = self.model
            nc = model.nc
            conf = self.args.conf if self.args.conf is not None else 0.25
            iou = self.args.iou
            segment = model.task == "segment"
            rotated = model.task == "obb"

            @jax.jit
            def fn(variables, img):
                x = img.astype(model.dtype) / 255.0
                pred, aux = model.net.apply(variables, x, train=False)
                dets = non_max_suppression(
                    pred,
                    conf_thres=float(conf),
                    iou_thres=float(iou),
                    max_det=int(self.args.max_det),
                    agnostic=bool(self.args.agnostic_nms),
                    nc=nc,
                    rotated=rotated,
                )
                if segment:
                    from ..ops.boxes import process_mask

                    _, _, proto = aux  # (B, h/4, w/4, nm)
                    hw = (img.shape[1], img.shape[2])
                    masks = jax.vmap(lambda d, p: process_mask(p, d[:, 6:], d[:, :4], hw))(dets, proto)
                    return dets[..., :6], masks
                return dets, None

            self._jitted[shape] = fn
        return self._jitted[shape]

    VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}

    def _load_sources(self, source) -> List:
        """Resolve source to a list of (image BGR, path).

        Accepts: ndarray (HWC BGR or 4-D batch), PIL image, jax/torch-like
        tensor (via __array__), path to image / video / directory, glob
        pattern, list of any of these (reference load_inference_source,
        data/build.py:182-258 + loaders.py)."""
        import cv2

        if isinstance(source, (list, tuple)):
            out = []
            for s in source:
                out.extend(self._load_sources(s))
            return out
        if hasattr(source, "convert") and hasattr(source, "size"):  # PIL
            arr = np.asarray(source.convert("RGB"))[..., ::-1].copy()
            return [(arr, "pil")]
        if hasattr(source, "__array__") and not isinstance(source, np.ndarray):
            source = np.asarray(source)  # jax / torch tensors
        if isinstance(source, np.ndarray):
            if source.ndim == 4:
                return [(source[i], f"array[{i}]") for i in range(source.shape[0])]
            return [(source, "array")]
        p = Path(source)
        if p.is_dir():
            return [(cv2.imread(str(f)), str(f)) for f in sorted(p.iterdir()) if f.suffix.lower() in IMG_EXTS]
        if p.suffix.lower() in self.VID_EXTS:
            cap = cv2.VideoCapture(str(p))
            frames = []
            i = 0
            stride = int(self.args.vid_stride or 1)
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if i % stride == 0:
                    frames.append((frame, f"{p}#{i}"))
                i += 1
            cap.release()
            return frames
        if any(ch in str(source) for ch in "*?["):  # glob pattern
            import glob as _glob

            return [(cv2.imread(f), f) for f in sorted(_glob.glob(str(source))) if Path(f).suffix.lower() in IMG_EXTS]
        img = cv2.imread(str(p))
        if img is None:
            raise FileNotFoundError(f"cannot read image source: {source}")
        return [(img, str(p))]

    def __call__(self, variables, source, imgsz: Optional[int] = None) -> List[Results]:
        imgsz = int(imgsz or self.args.imgsz)
        sources = self._load_sources(source)
        results = []
        for img0, path in sources:
            t0 = time.time()
            img, r, (padw, padh) = letterbox(img0, imgsz, scaleup=True)
            batch = jnp.asarray(img[None, ..., ::-1].copy())  # BGR->RGB NHWC
            t1 = time.time()
            dets, masks = self._get_fn(batch.shape)(variables, batch)
            det = np.asarray(dets)[0]
            t2 = time.time()
            valid = det[:, 4] > 0
            det = det[valid]
            res_masks = None
            if masks is not None and valid.any():
                import cv2

                m = np.asarray(masks)[0][valid]  # (n, h/4, w/4) soft masks
                # upsample to letterboxed size, strip pad, resize to original
                oh, ow = img0.shape[:2]
                up = np.stack([cv2.resize(mm, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR) for mm in m])
                y0, x0 = int(round(padh)), int(round(padw))
                y1 = imgsz - y0 if padh > 0 else imgsz
                x1 = imgsz - x0 if padw > 0 else imgsz
                up = up[:, y0:y1, x0:x1]
                res_masks = np.stack([cv2.resize(mm, (ow, oh), interpolation=cv2.INTER_LINEAR) for mm in up]) > 0.5
            if self.model.task == "obb":
                # rotated rows (x, y, w, h, conf, cls, angle): unpad/unscale
                # centers + wh, canonicalize (reference obb/predict.py:
                # regularize_rboxes + scale_boxes xywh=True)
                from ..ops.rotated import regularize_rboxes
                from .results import OBB as OBBContainer, Boxes

                res = Results(img0, path, self.model.names, np.zeros((0, 6)))
                if len(det):
                    det[:, 0] = (det[:, 0] - padw) / r
                    det[:, 1] = (det[:, 1] - padh) / r
                    det[:, 2:4] /= r
                    rb = np.asarray(regularize_rboxes(jnp.asarray(
                        np.concatenate([det[:, :4], det[:, 6:7]], axis=1))))
                    res.obb = OBBContainer(
                        np.concatenate([rb, det[:, 4:6]], axis=1), img0.shape[:2])
                    res.boxes = Boxes(
                        np.concatenate([res.obb.xyxy, det[:, 4:6]], axis=1), img0.shape[:2])
                res.speed = {
                    "preprocess": (t1 - t0) * 1000,
                    "inference": (t2 - t1) * 1000,
                    "postprocess": 0.0,
                }
                results.append(res)
                continue
            if len(det):
                det[:, :4] = np.asarray(
                    scale_boxes((imgsz, imgsz), jnp.asarray(det[:, :4]), img0.shape[:2])
                )
            extra = det[:, 6:] if det.shape[1] > 6 else None
            res = Results(img0, path, self.model.names, det[:, :6])
            if res_masks is not None:
                res.masks = res_masks
            if extra is not None and self.model.task == "pose" and len(det):
                from .results import Keypoints

                kpt_shape = dict(self.model.specs[-1].kwargs).get("kpt_shape", (17, 3))
                k = extra.reshape(len(det), *kpt_shape).copy()
                k[..., 0] = np.clip((k[..., 0] - padw) / r, 0, img0.shape[1])
                k[..., 1] = np.clip((k[..., 1] - padh) / r, 0, img0.shape[0])
                res.keypoints = Keypoints(k, img0.shape[:2])
            res.speed = {
                "preprocess": (t1 - t0) * 1000,
                "inference": (t2 - t1) * 1000,
                "postprocess": 0.0,
            }
            results.append(res)
        return results
