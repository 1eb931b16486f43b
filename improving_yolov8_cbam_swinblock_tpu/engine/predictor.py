"""Detection predictor: letterbox -> batched jitted forward+NMS -> rescale.

Equivalent of reference BasePredictor/DetectionPredictor
(engine/predictor.py:108-497, models/yolo/detect/predict.py:33-102).
The per-(batch, size) jit cache replaces the reference's warmup +
AutoBackend machinery. Sources: images / ndarrays / paths / dirs /
videos / globs (materialized), plus predict(stream=True) for
webcam/RTSP/video via threaded readers (data/loaders.py). Device
inference is batched (args.batch frames per dispatch) — round-1's
per-image loop left the chip idle between frames (weakness #4).
augment=True runs 3-scale + flip TTA (nn/tasks.py predict_augment).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import letterbox
from ..ops.boxes import scale_boxes
from ..ops.nms import non_max_suppression
from ..utils.patches import imread
from .results import Results

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


class DetectionPredictor:
    def __init__(self, model, args, callbacks=None):
        self.model = model
        self.args = args
        self._jitted = {}
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()

    def _get_fn(self, shape):
        model = self.model
        conf = self.args.conf if self.args.conf is not None else 0.25
        iou = self.args.iou
        tta = bool(getattr(self.args, "augment", False)) and model.task == "detect"
        retina = bool(getattr(self.args, "retina_masks", False))
        # option values are closed over by the traced fn — they belong in
        # the cache key alongside the batch shape
        key = (shape, float(conf), float(iou), tta, retina, bool(self.args.agnostic_nms))
        shape = key
        if shape not in self._jitted:
            nc = model.nc
            segment = model.task == "segment"
            rotated = model.task == "obb"

            end2end = bool(getattr(model, "end2end", False))

            is_rtdetr = bool(getattr(model, "is_rtdetr", False))

            if model.task == "classify":
                # ClassificationModel.apply already returns softmax probs
                # (reference ClassificationPredictor, classify/predict.py:49)
                @jax.jit
                def cfn(variables, img):
                    return model.apply(variables, img.astype(model.dtype) / 255.0, train=False), None

                self._jitted[shape] = cfn
                return cfn

            @jax.jit
            def fn(variables, img):
                x = img.astype(model.dtype) / 255.0
                if is_rtdetr:
                    # RT-DETR: NMS-free; boxes stay NORMALIZED xyxy so the
                    # host side scales by the original frame directly
                    # (reference rtdetr/predict.py:32-72)
                    from ..ops.boxes import xywh2xyxy

                    y, _ = model.apply(variables, x, train=False)  # (B, nq, 4+nc)
                    boxes = xywh2xyxy(y[..., :4])
                    score = y[..., 4:].max(-1)
                    cls = jnp.argmax(y[..., 4:], axis=-1).astype(jnp.float32)
                    keep = score > float(conf)
                    det = jnp.concatenate([boxes, score[..., None], cls[..., None]], axis=-1)
                    return det * keep[..., None], None
                if end2end:
                    # v10: the head already returns topk (B, max_det, 6) in
                    # xyxy — no NMS; just apply the confidence gate
                    dets, _ = model.apply(variables, x, train=False)
                    keep = dets[..., 4] > float(conf)
                    return dets * keep[..., None], None
                if tta:
                    pred = model.predict_augment(variables, x)
                    aux = None
                else:
                    pred, aux = model.apply(variables, x, train=False)
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
                    if bool(getattr(self.args, "retina_masks", False)):
                        # retina_masks: no proto-res crop — soft masks go to
                        # the host, which crops with the final native-space
                        # boxes AFTER full-res upsampling (reference
                        # ops.process_mask_native, utils/ops.py:720)
                        def soft(d, p):
                            h, w, nm = p.shape
                            return jax.nn.sigmoid(d[:, 6:] @ p.reshape(-1, nm).T).reshape(-1, h, w)

                        masks = jax.vmap(soft)(dets, proto)
                    else:
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
            return [(imread(str(f)), str(f)) for f in sorted(p.iterdir()) if f.suffix.lower() in IMG_EXTS]
        if p.suffix.lower() in self.VID_EXTS:
            from ..data.loaders import LoadImagesAndVideos

            return list(LoadImagesAndVideos(p, vid_stride=int(self.args.vid_stride or 1)))
        if any(ch in str(source) for ch in "*?["):  # glob pattern
            import glob as _glob

            return [(imread(f), f) for f in sorted(_glob.glob(str(source))) if Path(f).suffix.lower() in IMG_EXTS]
        img = imread(str(p))
        if img is None:
            raise FileNotFoundError(f"cannot read image source: {source}")
        return [(img, str(p))]

    # ------------------------------------------------------------------
    def _postprocess_one(self, det, mask_arr, img0, path, imgsz, r, padw, padh, speed):
        """One image's NMS rows -> Results in original coordinates."""
        valid = det[:, 4] > 0
        det = det[valid].copy()
        if self.model.task == "obb":
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
            res.speed = speed
            return res

        if getattr(self.model, "is_rtdetr", False):
            # normalized xyxy -> original pixels (reference rtdetr predict)
            oh, ow = img0.shape[:2]
            det[:, [0, 2]] *= ow
            det[:, [1, 3]] *= oh
            res = Results(img0, path, self.model.names, det[:, :6])
            res.speed = speed
            return res

        res_masks = None
        soft_masks = None
        retina = bool(getattr(self.args, "retina_masks", False))
        if mask_arr is not None and valid.any():
            import cv2

            m = mask_arr[valid]  # (n, h/4, w/4) soft masks
            oh, ow = img0.shape[:2]
            up = np.stack([cv2.resize(mm, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR) for mm in m])
            y0, x0 = int(round(padh)), int(round(padw))
            y1 = imgsz - y0 if padh > 0 else imgsz
            x1 = imgsz - x0 if padw > 0 else imgsz
            up = up[:, y0:y1, x0:x1]
            native = np.stack([cv2.resize(mm, (ow, oh), interpolation=cv2.INTER_LINEAR) for mm in up])
            if retina:
                soft_masks = native  # crop with final boxes below
            else:
                res_masks = native > 0.5
        if len(det):
            det[:, :4] = np.asarray(
                scale_boxes((imgsz, imgsz), jnp.asarray(det[:, :4]), img0.shape[:2])
            )
        if soft_masks is not None:
            # retina_masks: crop at native resolution with the rescaled boxes
            res_masks = np.zeros(soft_masks.shape, bool)
            for k in range(len(soft_masks)):
                x1b, y1b, x2b, y2b = det[k, :4]
                x1b, y1b = max(int(x1b), 0), max(int(y1b), 0)
                x2b, y2b = int(np.ceil(x2b)), int(np.ceil(y2b))
                res_masks[k, y1b:y2b, x1b:x2b] = soft_masks[k, y1b:y2b, x1b:x2b] > 0.5
        extra = det[:, 6:] if det.shape[1] > 6 else None
        res = Results(img0, path, self.model.names, det[:, :6])
        if res_masks is not None:
            from .results import Masks

            res.masks = Masks(res_masks, img0.shape[:2])
        if extra is not None and self.model.task == "pose" and len(det):
            from .results import Keypoints

            kpt_shape = dict(self.model.specs[-1].kwargs).get("kpt_shape", (17, 3))
            k = extra.reshape(len(det), *kpt_shape).copy()
            k[..., 0] = np.clip((k[..., 0] - padw) / r, 0, img0.shape[1])
            k[..., 1] = np.clip((k[..., 1] - padh) / r, 0, img0.shape[0])
            res.keypoints = Keypoints(k, img0.shape[:2])
        res.speed = speed
        return res

    def _run_batch(self, variables, frames, imgsz, bs: Optional[int] = None) -> List[Results]:
        """Letterbox + stack + one device dispatch for a list of
        (img0, path); pads the batch to a stable shape for the jit cache."""
        t0 = time.time()
        if self.model.task == "classify":
            return self._run_classify_batch(variables, frames, imgsz, bs)
        # RT-DETR expects square scale-filled input (reference
        # rtdetr/predict.py pre_transform: LetterBox(auto=False, scale_fill))
        sf = bool(getattr(self.model, "is_rtdetr", False))
        pre = [letterbox(img0, imgsz, scaleup=True, scale_fill=sf) for img0, _ in frames]
        batch = np.stack([img[..., ::-1] for img, _, _ in pre])  # BGR->RGB
        n = len(frames)
        bs = bs or n
        if n < bs:  # pad partial chunk to the canonical batch shape
            batch = np.concatenate([batch, np.zeros((bs - n, *batch.shape[1:]), batch.dtype)])
        t1 = time.time()
        dets, masks = self._get_fn(batch.shape)(variables, jnp.asarray(batch))
        if getattr(self.args, "visualize", False):
            self._save_feature_maps(variables, batch, [p for _, p in frames])
        dets = np.asarray(dets)
        masks_np = np.asarray(masks) if masks is not None else None
        t2 = time.time()
        speed = {
            "preprocess": (t1 - t0) * 1000 / n,
            "inference": (t2 - t1) * 1000 / n,
            "postprocess": 0.0,
        }
        out = []
        for i, ((img0, path), (_, r, (padw, padh))) in enumerate(zip(frames, pre)):
            out.append(
                self._postprocess_one(
                    dets[i], masks_np[i] if masks_np is not None else None,
                    img0, path, imgsz, r, padw, padh, dict(speed),
                )
            )
        self._log_results(out)
        return out

    def _log_results(self, results) -> None:
        """Per-image console line (reference stream_inference,
        predictor.py:327: 'image i/N path: HxW 2 persons, 12.3ms')."""
        if not getattr(self.args, "verbose", True):
            return
        from ..utils import LOGGER

        self._seen = getattr(self, "_seen", 0)
        for res in results:
            self._seen += 1
            h, w = res.orig_img.shape[:2] if getattr(res, "orig_img", None) is not None else (0, 0)
            LOGGER.info(
                f"image {self._seen} {res.path}: {h}x{w} {res.verbose()}"
                f"{res.speed.get('inference', 0.0):.1f}ms"
            )

    def _run_classify_batch(self, variables, frames, imgsz, bs=None):
        """Classify: plain resize (the val transform, data/classify.py:121)
        -> softmax probs -> Results.probs (reference classify/predict.py)."""
        import cv2

        from .results import Probs

        t0 = time.time()
        batch = np.stack(
            [cv2.resize(img0, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)[..., ::-1] for img0, _ in frames]
        )
        n = len(frames)
        bs = bs or n
        if n < bs:
            batch = np.concatenate([batch, np.zeros((bs - n, *batch.shape[1:]), batch.dtype)])
        t1 = time.time()
        probs, _ = self._get_fn(batch.shape)(variables, jnp.asarray(batch))
        probs = np.asarray(probs)
        t2 = time.time()
        out = []
        for i, (img0, path) in enumerate(frames):
            res = Results(img0, path, self.model.names)
            res.probs = Probs(probs[i])
            res.speed = {
                "preprocess": (t1 - t0) * 1000 / n,
                "inference": (t2 - t1) * 1000 / n,
                "postprocess": 0.0,
            }
            out.append(res)
        self._log_results(out)
        return out

    def _save_feature_maps(self, variables, batch, paths):
        """visualize=True: one activation-grid png per layer per image under
        <project>/<name>/<stem>/ (reference BasePredictor visualize ->
        feature_visualization, engine/predictor.py:166, plotting.py:974)."""
        from ..utils.plotting import feature_visualization

        x = jnp.asarray(batch[: len(paths)]).astype(self.model.dtype) / 255.0
        feats = self.model.features(variables, x)
        root = Path(getattr(self.args, "project", None) or "runs/detect") / (
            getattr(self.args, "name", None) or "predict"
        )
        for bi, p in enumerate(paths):
            d = root / (Path(str(p)).stem or f"img{bi}")
            d.mkdir(parents=True, exist_ok=True)
            for i, name, f in feats:
                feature_visualization(f[bi : bi + 1], f"stage{i}_{name}", save_dir=str(d))

    def __call__(self, variables, source, imgsz: Optional[int] = None) -> List[Results]:
        from ..utils.callbacks import run_callbacks

        imgsz = int(imgsz or self.args.imgsz)
        run_callbacks(self.callbacks, "on_predict_start", self)
        sources = self._load_sources(source)
        # batch up to args.batch frames per dispatch, never more than given
        bs = max(1, min(len(sources), int(getattr(self.args, "batch", 1) or 1)))
        results: List[Results] = []
        for lo in range(0, len(sources), bs):
            run_callbacks(self.callbacks, "on_predict_batch_start", self)
            batch_results = self._run_batch(variables, sources[lo : lo + bs], imgsz, bs)
            # per-batch postprocess hook: self.results holds the CURRENT
            # batch while it fires (reference predictor.py:357 — this is
            # where register_tracker's association callback runs)
            self.results = batch_results
            run_callbacks(self.callbacks, "on_predict_postprocess_end", self)
            results.extend(batch_results)
            run_callbacks(self.callbacks, "on_predict_batch_end", self)
        self.results = results
        run_callbacks(self.callbacks, "on_predict_end", self)
        return results

    def stream(self, variables, source, imgsz: Optional[int] = None):
        """Generator over frames from a live/lazy source: webcam index,
        rtsp/http URL, or a video/image path streamed frame-by-frame
        (reference stream_inference, predictor.py:274)."""
        from ..data.build import check_source, load_inference_source

        imgsz = int(imgsz or self.args.imgsz)
        _, st = check_source(source)
        loader = load_inference_source(
            source, vid_stride=int(self.args.vid_stride or 1),
            stream_buffer=bool(getattr(self.args, "stream_buffer", False)),
        )
        if st.screenshot or st.stream:
            try:
                for frames, paths in loader:
                    yield from self._run_batch(variables, list(zip(frames, paths)), imgsz)
            finally:
                if st.stream:
                    loader.close()
        else:
            for frame, path in loader:
                yield from self._run_batch(variables, [(frame, path)], imgsz)


# reference entry name (engine/predictor.py:108 BasePredictor); this
# framework's predictor covers all tasks through the model's head
BasePredictor = DetectionPredictor
