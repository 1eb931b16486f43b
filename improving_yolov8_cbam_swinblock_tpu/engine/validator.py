"""Detection validator: jitted forward+NMS on device, mAP on host.

Equivalent of reference BaseValidator/DetectionValidator
(engine/validator.py:94-377, models/yolo/detect/val.py:66-220):
preprocess -> forward (EMA weights) -> fixed-shape NMS at conf 0.001 /
iou 0.7 multi-label -> rescale to native space -> TP matching over 10
IoU thresholds -> ap_per_class. Device work stays fixed-shape; the
variable-length tail (matching + AP) runs on host numpy per batch.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import xywh2xyxy
from ..ops.nms import non_max_suppression
from ..utils.metrics import (
    OKS_SIGMA,
    ConfusionMatrix,
    DetMetrics,
    box_iou_np,
    kpt_iou_np,
    mask_iou_np,
    match_predictions,
    probiou_np,
)


def _iter_val_batches(validator):
    """Yield val batches with a progress bar, counting images into
    validator.seen and firing on_val_batch_start/end on the owning
    trainer's callback bus when attached (reference BaseValidator loop,
    engine/validator.py:186-204: TQDM(bar, desc) + per-batch events)."""
    from ..utils import TQDM
    from ..utils.callbacks import run_callbacks

    cbs = getattr(validator, "callbacks", None)
    owner = getattr(validator, "owner", validator)
    validator.seen = 0
    bar = validator.loader
    if getattr(validator.args, "verbose", True):
        total = len(validator.loader) if hasattr(validator.loader, "__len__") else None
        bar = TQDM(bar, total=total, desc="val")
    sharding = getattr(validator, "batch_sharding", None)  # set by YOLO.val(device="all")
    for batch in bar:
        if cbs is not None:
            run_callbacks(cbs, "on_val_batch_start", owner)
        validator.seen += int(batch["img"].shape[0])
        if sharding is not None:
            # DP eval: split the batch dim over the mesh; the jitted
            # forward+NMS then runs one shard per chip (GSPMD follows the
            # input sharding — no per-validator changes needed)
            batch = dict(batch)
            batch["img"] = jax.device_put(batch["img"], sharding)
        yield batch
        if cbs is not None:
            run_callbacks(cbs, "on_val_batch_end", owner)


class ClassificationValidator:
    """Top-1 / top-5 accuracy (reference models/yolo/classify/val.py)."""

    callbacks = None  # set by the trainer to fire on_val_batch_* events
    owner = None

    def _batches(self):
        return _iter_val_batches(self)

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args

        @jax.jit
        def _forward(variables, img):
            x = img.astype(model.dtype) / 255.0
            return model.apply(variables, x, train=False)  # softmax probs

        self._forward = _forward

    def __call__(self, variables) -> Dict[str, float]:
        top1 = top5 = n = 0
        for batch in self._batches():
            probs = np.asarray(self._forward(variables, jnp.asarray(batch["img"])))
            labels = batch["label"]
            k = min(5, probs.shape[-1])
            topk = np.argsort(-probs, axis=-1)[:, :k]
            top1 += int((topk[:, 0] == labels).sum())
            top5 += int((topk == labels[:, None]).any(axis=1).sum())
            n += len(labels)
        out = {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}
        out["fitness"] = out["top1"]
        if getattr(self.args, "verbose", True):
            from ..utils import LOGGER

            # reference classify val print_results (classify/val.py)
            LOGGER.info("%22s%11s%11s" % ("classes", "top1_acc", "top5_acc"))
            LOGGER.info("%22s%11.3g%11.3g" % ("all", out["top1"], out["top5"]))
        return out


class DetectionValidator:
    callbacks = None  # set by the trainer to fire on_val_batch_* events
    owner = None
    seen = 0

    def _batches(self):
        return _iter_val_batches(self)

    def print_results(self, named_metrics):
        """Reference-format metrics table (models/yolo/detect/val.py
        print_results / segment val's extended header): an 'all' row
        always, per-class rows on standalone val with nc > 1.
        `named_metrics`: [(tag, DetMetrics, computed_dict), ...]."""
        from ..utils import LOGGER

        if not getattr(self.args, "verbose", True):
            return
        cols = ["Class", "Images", "Instances"]
        for tag, _, _ in named_metrics:
            cols += [f"{tag}(P", "R", "mAP50", "mAP50-95)"]
        LOGGER.info(("%22s" + "%11s" * (len(cols) - 1)) % tuple(cols))
        pf = "%22s" + "%11i" * 2 + "%11.3g" * (4 * len(named_metrics))
        first = named_metrics[0][1]
        # GT instance count from the raw stats (reference nt_per_class.sum();
        # per_class is empty when the model produced zero detections)
        nt_total = sum(len(s[3]) for s in first.stats)
        all_vals = []
        for _, _, o in named_metrics:  # each o is that metric's plain compute() dict
            all_vals += [o["precision"], o["recall"], o["mAP50"], o["mAP50-95"]]
        LOGGER.info(pf % ("all", self.seen, nt_total, *all_vals))
        standalone = self.owner is None or self.owner is self
        if standalone and len(first.per_class) > 1:
            for cname, v in first.per_class.items():
                row = []
                for _, m, _ in named_metrics:
                    pc = m.per_class.get(cname, {"precision": 0, "recall": 0, "mAP50": 0, "mAP50-95": 0, "n": 0})
                    row += [pc["precision"], pc["recall"], pc["mAP50"], pc["mAP50-95"]]
                LOGGER.info(pf % (cname, self.seen, v["n"], *row))

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args
        self.conf = 0.001
        self.iou = 0.7
        self.metrics = DetMetrics(model.names)

        nc = model.nc
        end2end = bool(getattr(model, "end2end", False))
        is_rtdetr = bool(getattr(model, "is_rtdetr", False))

        @jax.jit
        def _forward_nms(variables, img):
            x = img.astype(model.dtype) / 255.0
            if is_rtdetr:
                # RT-DETR: no NMS — all nq queries, conf-sorted (reference
                # rtdetr/val.py:126-155 postprocess)
                y, _ = model.apply(variables, x, train=False)  # (B, nq, 4+nc) xywhn
                h, w = img.shape[1], img.shape[2]
                boxes = xywh2xyxy(y[..., :4] * jnp.asarray([w, h, w, h], jnp.float32))
                score = y[..., 4:].max(-1)
                cls = jnp.argmax(y[..., 4:], axis=-1).astype(jnp.float32)
                order = jnp.argsort(-score, axis=-1)
                det = jnp.concatenate([boxes, score[..., None], cls[..., None]], axis=-1)
                return jnp.take_along_axis(det, order[..., None], axis=1)
            if end2end:  # v10 NMS-free head: gate by val conf only
                dets, _ = model.apply(variables, x, train=False)
                keep = dets[..., 4] > self.conf
                return dets * keep[..., None]
            pred, _ = model.apply(variables, x, train=False)
            return non_max_suppression(
                pred,
                conf_thres=self.conf,
                iou_thres=self.iou,
                max_det=int(args.max_det),
                multi_label=nc > 1,
                nc=nc,
            )

        self._forward_nms = _forward_nms

    def __call__(self, variables) -> Dict[str, float]:
        self.metrics = DetMetrics(self.model.names)
        imgsz = int(self.args.imgsz)
        plots = bool(getattr(self.args, "plots", False))
        save_json = bool(getattr(self.args, "save_json", False))
        self.confusion_matrix = ConfusionMatrix(self.model.nc) if plots else None
        json_dets = []
        img_id = 0
        for batch in self._batches():
            dets = np.asarray(self._forward_nms(variables, jnp.asarray(batch["img"])))
            bs = dets.shape[0]
            # GT scale from the actual (possibly rect) letterboxed frame
            fh, fw = batch["img"].shape[1:3]
            frame = np.array([fw, fh, fw, fh], np.float32)
            for i in range(bs):
                det = dets[i]
                det = det[det[:, 4] > 0]
                if "ratio_pad" in batch:
                    # reference protocol clips pred boxes to the image bounds
                    # before matching (scale_boxes -> clip_boxes, ops.py:93);
                    # in letterbox space that is the content region
                    # [pad, pad + orig*r] — IoU vs GT is then identical to
                    # the reference's native-space matching (same affine)
                    r, padw, padh = batch["ratio_pad"][i]
                    oh, ow = batch["orig_shape"][i]
                    det = det.copy()
                    det[:, [0, 2]] = det[:, [0, 2]].clip(padw, padw + ow * r)
                    det[:, [1, 3]] = det[:, [1, 3]].clip(padh, padh + oh * r)
                gt_m = batch["mask"][i] > 0
                gt_cls = batch["cls"][i][gt_m]
                gt_xywhn = batch["bboxes"][i][gt_m]
                # GT to letterboxed pixel space (labels were normalized to
                # the letterboxed image in val_transform)
                gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(gt_xywhn * frame)))
                if self.confusion_matrix is not None:
                    self.confusion_matrix.process_batch(det, gt_xyxy, gt_cls.astype(int))
                if save_json and len(det):
                    json_dets.append({"image_id": img_id, "boxes": det[:, :6]})
                img_id += 1
                if len(det) == 0:
                    if len(gt_cls):
                        self.metrics.update(
                            np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls.astype(int)
                        )
                    continue
                iou = box_iou_np(gt_xyxy, det[:, :4])
                tp = match_predictions(det[:, 5].astype(int), gt_cls.astype(int), iou)
                self.metrics.update(tp, det[:, 4], det[:, 5].astype(int), gt_cls.astype(int))
        out = self.metrics.compute()
        self.per_class = self.metrics.per_class
        self.print_results([("Box", self.metrics, out)])
        save_dir = self._save_dir()
        if save_json and json_dets:
            from ..utils.coco_json import detections_to_coco_json

            self.json_path = detections_to_coco_json(json_dets, str(save_dir / "predictions.json"))
        if plots:
            from ..utils.metrics import plot_pr_curves

            if self.confusion_matrix is not None:
                self.confusion_matrix.plot(str(save_dir / "confusion_matrix.png"), self.model.names)
            if self.metrics.result is not None:
                plot_pr_curves(self.metrics.result, str(save_dir), self.model.names)
        return out

    def _save_dir(self):
        from pathlib import Path

        d = Path(getattr(self.args, "project", None) or "runs/detect") / (
            getattr(self.args, "name", None) or "val"
        )
        d.mkdir(parents=True, exist_ok=True)
        return d


class SegmentationValidator(DetectionValidator):
    """Box + mask mAP (reference models/yolo/segment/val.py): masks are
    evaluated at proto resolution against the overlap-map GT, matching the
    reference's overlap_mask=True fast path."""

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args
        self.conf = 0.001
        self.iou = 0.7
        nc = model.nc

        @jax.jit
        def _forward_nms(variables, img):
            from ..ops.boxes import process_mask

            x = img.astype(model.dtype) / 255.0
            pred, aux = model.apply(variables, x, train=False)
            dets = non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=int(args.max_det), multi_label=nc > 1, nc=nc,
            )  # (B, max_det, 6+nm)
            proto = aux[2]  # (B, h4, w4, nm)
            hw = (img.shape[1], img.shape[2])
            masks = jax.vmap(lambda d, p: process_mask(p, d[:, 6:], d[:, :4], hw))(dets, proto)
            return dets[..., :6], masks > 0.5  # masks at proto res

        self._forward_nms = _forward_nms

    def __call__(self, variables) -> Dict[str, float]:
        box_m = DetMetrics(self.model.names)
        mask_m = DetMetrics(self.model.names)
        imgsz = int(self.args.imgsz)
        for batch in self._batches():
            dets, pmasks = self._forward_nms(variables, jnp.asarray(batch["img"]))
            dets, pmasks = np.asarray(dets), np.asarray(pmasks)
            for i in range(dets.shape[0]):
                valid = dets[i][:, 4] > 0
                det = dets[i][valid]
                pm = pmasks[i][valid]
                gt_sel = batch["mask"][i] > 0
                gt_cls = batch["cls"][i][gt_sel].astype(int)
                gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(batch["bboxes"][i][gt_sel]) * imgsz))
                seg_map = batch["seg_map"][i]  # (h4, w4) int, GT idx + 1
                if len(det) == 0:
                    if len(gt_cls):
                        z = np.zeros((0, 10), bool)
                        box_m.update(z, np.zeros(0), np.zeros(0), gt_cls)
                        mask_m.update(z, np.zeros(0), np.zeros(0), gt_cls)
                    continue
                iou_b = box_iou_np(gt_xyxy, det[:, :4])
                tp_b = match_predictions(det[:, 5].astype(int), gt_cls, iou_b)
                gids = np.nonzero(gt_sel)[0]
                gm = (seg_map[None] == (gids[:, None, None] + 1))  # (G, h4, w4)
                iou_m = mask_iou_np(gm.reshape(len(gids), -1), pm.reshape(len(det), -1))
                tp_m = match_predictions(det[:, 5].astype(int), gt_cls, iou_m)
                box_m.update(tp_b, det[:, 4], det[:, 5].astype(int), gt_cls)
                mask_m.update(tp_m, det[:, 4], det[:, 5].astype(int), gt_cls)
        b, m = box_m.compute(), mask_m.compute()
        self.box_m, self.mask_m = box_m, mask_m  # attribute-style API (model.val)
        self.print_results([("Box", box_m, b), ("Mask", mask_m, m)])
        out = {f"{k}(B)": v for k, v in b.items() if k != "fitness"}
        out.update({f"{k}(M)": v for k, v in m.items() if k != "fitness"})
        # reference SegmentMetrics.fitness = box fitness + mask fitness
        out["fitness"] = b["fitness"] + m["fitness"]
        out["mAP50-95"] = m["mAP50-95"]  # headline = mask mAP
        return out


class PoseValidator(DetectionValidator):
    """Box + OKS keypoint mAP (reference models/yolo/pose/val.py)."""

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args
        self.conf = 0.001
        self.iou = 0.7
        nc = model.nc
        self.kpt_shape = tuple(dict(model.specs[-1].kwargs).get("kpt_shape", (17, 3)))
        nk = self.kpt_shape[0]
        self.sigma = OKS_SIGMA if nk == 17 else np.ones(nk) / nk

        @jax.jit
        def _forward_nms(variables, img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=int(args.max_det), multi_label=nc > 1, nc=nc,
            )  # (B, max_det, 6 + nk*nd), kpts decoded in input pixels

        self._forward_nms = _forward_nms

    def __call__(self, variables) -> Dict[str, float]:
        box_m = DetMetrics(self.model.names)
        pose_m = DetMetrics(self.model.names)
        imgsz = int(self.args.imgsz)
        nk, nd = self.kpt_shape
        for batch in self._batches():
            dets = np.asarray(self._forward_nms(variables, jnp.asarray(batch["img"])))
            for i in range(dets.shape[0]):
                det = dets[i][dets[i][:, 4] > 0]
                gt_sel = batch["mask"][i] > 0
                gt_cls = batch["cls"][i][gt_sel].astype(int)
                gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(batch["bboxes"][i][gt_sel]) * imgsz))
                gt_kpts = batch["kpts"][i][gt_sel].copy()  # (G, K, 3) normalized
                gt_kpts[..., :2] *= imgsz
                if len(det) == 0:
                    if len(gt_cls):
                        z = np.zeros((0, 10), bool)
                        box_m.update(z, np.zeros(0), np.zeros(0), gt_cls)
                        pose_m.update(z, np.zeros(0), np.zeros(0), gt_cls)
                    continue
                iou_b = box_iou_np(gt_xyxy, det[:, :4])
                tp_b = match_predictions(det[:, 5].astype(int), gt_cls, iou_b)
                pk = det[:, 6:].reshape(len(det), nk, nd)
                # OKS normalizes by gt box area * 0.53 (reference pose/val.py)
                area = (gt_xyxy[:, 2] - gt_xyxy[:, 0]) * (gt_xyxy[:, 3] - gt_xyxy[:, 1]) * 0.53
                iou_p = kpt_iou_np(gt_kpts, pk, area, self.sigma)
                tp_p = match_predictions(det[:, 5].astype(int), gt_cls, iou_p)
                box_m.update(tp_b, det[:, 4], det[:, 5].astype(int), gt_cls)
                pose_m.update(tp_p, det[:, 4], det[:, 5].astype(int), gt_cls)
        b, p = box_m.compute(), pose_m.compute()
        self.box_m, self.pose_m = box_m, pose_m  # attribute-style API (model.val)
        self.print_results([("Box", box_m, b), ("Pose", pose_m, p)])
        out = {f"{k}(B)": v for k, v in b.items() if k != "fitness"}
        out.update({f"{k}(P)": v for k, v in p.items() if k != "fitness"})
        out["fitness"] = b["fitness"] + p["fitness"]
        out["mAP50-95"] = p["mAP50-95"]
        return out


class OBBValidator(DetectionValidator):
    """Rotated-box mAP via probiou matching (reference models/yolo/obb/val.py)."""

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args
        self.conf = 0.001
        self.iou = 0.7
        self.metrics = DetMetrics(model.names)
        nc = model.nc

        @jax.jit
        def _forward_nms(variables, img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            return non_max_suppression(
                pred, conf_thres=self.conf, iou_thres=self.iou,
                max_det=int(args.max_det), multi_label=nc > 1, nc=nc, rotated=True,
            )  # (B, max_det, 7): x, y, w, h, conf, cls, angle

        self._forward_nms = _forward_nms

    def __call__(self, variables) -> Dict[str, float]:
        self.metrics = DetMetrics(self.model.names)
        imgsz = int(self.args.imgsz)
        for batch in self._batches():
            dets = np.asarray(self._forward_nms(variables, jnp.asarray(batch["img"])))
            for i in range(dets.shape[0]):
                det = dets[i][dets[i][:, 4] > 0]
                gt_sel = batch["mask"][i] > 0
                gt_cls = batch["cls"][i][gt_sel].astype(int)
                gt_r = batch["bboxes"][i][gt_sel].copy()  # (G, 5) normalized xywhr
                gt_r[:, :4] *= imgsz
                if len(det) == 0:
                    if len(gt_cls):
                        self.metrics.update(np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls)
                    continue
                pred_r = np.concatenate([det[:, :4], det[:, 6:7]], axis=1)
                iou = probiou_np(gt_r, pred_r)
                tp = match_predictions(det[:, 5].astype(int), gt_cls, iou)
                self.metrics.update(tp, det[:, 4], det[:, 5].astype(int), gt_cls)
        out = self.metrics.compute()
        self.print_results([("Box", self.metrics, out)])
        return out


TASK_VALIDATORS = {
    "detect": DetectionValidator,
    "segment": SegmentationValidator,
    "pose": PoseValidator,
    "obb": OBBValidator,
    "classify": ClassificationValidator,
}
