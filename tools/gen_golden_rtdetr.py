"""Generate tests/golden/detr_loss.npz: reference DETRLoss values on a
fixed random batch (run with /root/reference present).

The fixture drives tests/test_rtdetr.py::test_detr_loss_golden — our dense
fixed-shape Hungarian loss (utils/detr_loss.py) must reproduce the
reference's ragged-list implementation (reference models/utils/loss.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (stubs torchvision for the reference import)

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from ultralytics.models.utils.loss import DETRLoss


def main():
    rng = np.random.default_rng(0)
    L, B, NQ, NC = 3, 2, 24, 5
    gt_groups = [3, 2]
    G = 4  # dense pad capacity for our side

    pred_bboxes = rng.uniform(0.15, 0.85, (L, B, NQ, 4)).astype(np.float32)
    pred_bboxes[..., 2:] *= 0.3  # keep wh sane
    pred_scores = rng.normal(0, 1, (L, B, NQ, NC)).astype(np.float32)
    gt_cls_flat = rng.integers(0, NC, (sum(gt_groups),)).astype(np.int64)
    gt_box_flat = rng.uniform(0.2, 0.8, (sum(gt_groups), 4)).astype(np.float32)
    gt_box_flat[:, 2:] *= 0.4

    loss_fn = DETRLoss(nc=NC, aux_loss=True, use_fl=True, use_vfl=True)
    batch = {
        "cls": torch.from_numpy(gt_cls_flat),
        "bboxes": torch.from_numpy(gt_box_flat),
        "gt_groups": gt_groups,
    }
    out = loss_fn(torch.from_numpy(pred_bboxes), torch.from_numpy(pred_scores), batch)
    ref = {k: float(v) for k, v in out.items()}
    print(ref)

    # dense-padded GT for our side
    gt_cls = np.zeros((B, G), np.int32)
    gt_box = np.zeros((B, G, 4), np.float32)
    gt_mask = np.zeros((B, G), np.float32)
    o = 0
    for b, n in enumerate(gt_groups):
        gt_cls[b, :n] = gt_cls_flat[o : o + n]
        gt_box[b, :n] = gt_box_flat[o : o + n]
        gt_mask[b, :n] = 1.0
        o += n

    np.savez(
        Path(__file__).parent.parent / "tests" / "golden" / "detr_loss.npz",
        pred_bboxes=pred_bboxes,
        pred_scores=pred_scores,
        gt_cls=gt_cls,
        gt_box=gt_box,
        gt_mask=gt_mask,
        loss_class=ref["loss_class"],
        loss_bbox=ref["loss_bbox"],
        loss_giou=ref["loss_giou"],
        loss_class_aux=ref["loss_class_aux"],
        loss_bbox_aux=ref["loss_bbox_aux"],
        loss_giou_aux=ref["loss_giou_aux"],
    )
    print("wrote tests/golden/detr_loss.npz")


if __name__ == "__main__":
    main()
