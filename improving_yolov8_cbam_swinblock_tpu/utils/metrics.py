"""Detection metrics: IoU matching, per-class AP (101-pt interp), DetMetrics.

Host-side numpy equivalents of reference utils/metrics.py:573-931 and the
validator's match_predictions (engine/validator.py:256-298). These run on
small per-epoch aggregates — host numpy is the right tool; the per-batch
IoU matrix is computed on device by the validator and shipped back.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def box_iou_np(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(N,4),(M,4) xyxy -> (N,M) IoU."""
    lt = np.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = np.minimum(box1[:, None, 2:], box2[None, :, 2:])
    inter = np.prod(np.clip(rb - lt, 0, None), axis=2)
    a1 = np.prod(box1[:, 2:] - box1[:, :2], axis=1)
    a2 = np.prod(box2[:, 2:] - box2[:, :2], axis=1)
    return inter / (a1[:, None] + a2[None] - inter + eps)


def mask_iou_np(mask1: np.ndarray, mask2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(N, HW) gt, (M, HW) pred binary masks -> (N, M) IoU
    (reference metrics.py:137)."""
    inter = mask1.astype(np.float32) @ mask2.astype(np.float32).T
    union = mask1.sum(1)[:, None] + mask2.sum(1)[None] - inter
    return inter / (union + eps)


# COCO 17-keypoint OKS sigmas (reference utils/metrics.py OKS_SIGMA)
OKS_SIGMA = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


def kpt_iou_np(kpt1: np.ndarray, kpt2: np.ndarray, area: np.ndarray, sigma: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """OKS between gt (N, K, 3) and pred (M, K, 2|3) keypoints with gt box
    areas (N,) (reference metrics.py:156)."""
    d = (kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2 + (kpt1[:, None, :, 1] - kpt2[None, :, :, 1]) ** 2
    kpt_mask = kpt1[..., 2] != 0  # (N, K)
    e = d / ((2 * sigma[None, None]) ** 2) / (area[:, None, None] + eps) / 2
    oks = (np.exp(-e) * kpt_mask[:, None]).sum(-1) / (kpt_mask.sum(-1)[:, None] + eps)
    return oks


def _probiou_terms(b: np.ndarray):
    a_ = b[:, 2] ** 2 / 12.0
    b_ = b[:, 3] ** 2 / 12.0
    r = b[:, 4]
    c, s = np.cos(r), np.sin(r)
    return a_ * c**2 + b_ * s**2, a_ * s**2 + b_ * c**2, (a_ - b_) * c * s


def probiou_np(obb1: np.ndarray, obb2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """(N, 5) gt, (M, 5) pred xywhr -> (N, M) probabilistic IoU
    (reference metrics.py:198; numpy twin of ops.rotated.probiou for the
    host-side matching path)."""
    x1, y1 = obb1[:, 0, None], obb1[:, 1, None]
    x2, y2 = obb2[None, :, 0], obb2[None, :, 1]
    a1, b1, c1 = (t[:, None] for t in _probiou_terms(obb1))
    a2, b2, c2 = (t[None, :] for t in _probiou_terms(obb2))
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = 0.5 * np.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * np.sqrt(np.clip(a1 * b1 - c1**2, 0, None) * np.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    )
    bd = np.clip(t1 + t2 + t3, eps, 100.0)
    return 1.0 - np.sqrt(1.0 - np.exp(-bd) + eps)


IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)


def match_predictions(pred_classes, true_classes, iou, use_scipy=False) -> np.ndarray:
    """TP matrix (npred, 10) over IoU thresholds 0.50:0.95
    (reference validator.py:256-298 greedy unique matching)."""
    correct = np.zeros((pred_classes.shape[0], IOU_THRESHOLDS.shape[0]), dtype=bool)
    correct_class = true_classes[:, None] == pred_classes[None, :]
    iou = iou * correct_class  # zero out wrong-class pairs
    for i, threshold in enumerate(IOU_THRESHOLDS):
        matches = np.nonzero(iou >= threshold)
        matches = np.array(matches).T
        if matches.shape[0]:
            if matches.shape[0] > 1:
                order = iou[matches[:, 0], matches[:, 1]].argsort()[::-1]
                matches = matches[order]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            correct[matches[:, 1].astype(int), i] = True
    return correct


def compute_ap(recall: np.ndarray, precision: np.ndarray):
    """101-point interpolated AP (reference metrics.py:540-572)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x) if hasattr(np, "trapezoid") else np.trapz(np.interp(x, mrec, mpre), x)  # noqa: NPY201
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls, eps=1e-16) -> Dict:
    """Per-class precision/recall/AP (reference metrics.py:573-661)."""
    i = np.argsort(-conf)
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]
    unique_classes, nt = np.unique(target_cls, return_counts=True)
    nc = unique_classes.shape[0]

    ap = np.zeros((nc, tp.shape[1]))
    p_curve = np.zeros((nc, 1000))
    r_curve = np.zeros((nc, 1000))
    x = np.linspace(0, 1, 1000)
    for ci, c in enumerate(unique_classes):
        idx = pred_cls == c
        n_l = nt[ci]
        n_p = idx.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[idx]).cumsum(0)
        tpc = tp[idx].cumsum(0)
        recall = tpc / (n_l + eps)
        r_curve[ci] = np.interp(-x, -conf[idx], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p_curve[ci] = np.interp(-x, -conf[idx], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])

    f1_curve = 2 * p_curve * r_curve / (p_curve + r_curve + eps)
    i_best = smooth(f1_curve.mean(0), 0.1).argmax()
    p, r, f1 = p_curve[:, i_best], r_curve[:, i_best], f1_curve[:, i_best]
    return {
        "ap": ap,
        "p": p,
        "r": r,
        "f1": f1,
        "unique_classes": unique_classes.astype(int),
        "nt": nt,
    }


def smooth(y: np.ndarray, f: float = 0.05) -> np.ndarray:
    """Box-filter smoothing (reference metrics.py:467)."""
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]), 0)
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


class DetMetrics:
    """mAP aggregation; fitness = 0.1*mAP50 + 0.9*mAP50-95
    (reference metrics.py:835-931)."""

    def __init__(self, names: Dict[int, str]):
        self.names = names
        self.stats: List = []
        self.nc = len(names)

    def update(self, tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray, target_cls: np.ndarray):
        self.stats.append((tp, conf, pred_cls, target_cls))

    def compute(self) -> Dict[str, float]:
        if not self.stats:
            return {"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0, "fitness": 0.0}
        tp = np.concatenate([s[0] for s in self.stats], 0)
        conf = np.concatenate([s[1] for s in self.stats], 0)
        pred_cls = np.concatenate([s[2] for s in self.stats], 0)
        target_cls = np.concatenate([s[3] for s in self.stats], 0)
        if tp.shape[0] == 0 or target_cls.shape[0] == 0:
            return {"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0, "fitness": 0.0}
        res = ap_per_class(tp, conf, pred_cls, target_cls)
        ap50 = res["ap"][:, 0].mean() if len(res["ap"]) else 0.0
        ap = res["ap"].mean() if len(res["ap"]) else 0.0
        out = {
            "precision": float(res["p"].mean()),
            "recall": float(res["r"].mean()),
            "mAP50": float(ap50),
            "mAP50-95": float(ap),
        }
        out["fitness"] = 0.1 * out["mAP50"] + 0.9 * out["mAP50-95"]
        return out
