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
from ..utils.metrics import DetMetrics, box_iou_np, match_predictions


class ClassificationValidator:
    """Top-1 / top-5 accuracy (reference models/yolo/classify/val.py)."""

    def __init__(self, model, loader, args):
        self.model = model
        self.loader = loader
        self.args = args

        @jax.jit
        def _forward(variables, img):
            x = img.astype(model.dtype) / 255.0
            return model.net.apply(variables, x, train=False)  # softmax probs

        self._forward = _forward

    def __call__(self, variables) -> Dict[str, float]:
        top1 = top5 = n = 0
        for batch in self.loader:
            probs = np.asarray(self._forward(variables, jnp.asarray(batch["img"])))
            labels = batch["label"]
            k = min(5, probs.shape[-1])
            topk = np.argsort(-probs, axis=-1)[:, :k]
            top1 += int((topk[:, 0] == labels).sum())
            top5 += int((topk == labels[:, None]).any(axis=1).sum())
            n += len(labels)
        out = {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}
        out["fitness"] = out["top1"]
        return out


class DetectionValidator:
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
            pred, _ = model.net.apply(variables, x, train=False)
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
        for batch in self.loader:
            dets = np.asarray(self._forward_nms(variables, jnp.asarray(batch["img"])))
            bs = dets.shape[0]
            for i in range(bs):
                det = dets[i]
                det = det[det[:, 4] > 0]
                gt_m = batch["mask"][i] > 0
                gt_cls = batch["cls"][i][gt_m]
                gt_xywhn = batch["bboxes"][i][gt_m]
                # GT to letterboxed pixel space (labels were normalized to
                # the letterboxed image in val_transform)
                gt_xyxy = np.asarray(xywh2xyxy(jnp.asarray(gt_xywhn) * imgsz))
                if len(det) == 0:
                    if len(gt_cls):
                        self.metrics.update(
                            np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gt_cls.astype(int)
                        )
                    continue
                iou = box_iou_np(gt_xyxy, det[:, :4])
                tp = match_predictions(det[:, 5].astype(int), gt_cls.astype(int), iou)
                self.metrics.update(tp, det[:, 4], det[:, 5].astype(int), gt_cls.astype(int))
        return self.metrics.compute()
