"""Generate golden fixtures for the seg / pose / obb task losses.

Runs the reference v8SegmentationLoss / v8PoseLoss / v8OBBLoss (torch,
CPU — reference utils/loss.py:258/441/607) on fixed random inputs and
saves inputs+outputs to tests/golden/{seg,pose,obb}_loss.npz in this
framework's input conventions (NHWC feats, (B, A, ...) predictions,
padded (B, G) targets). tests/test_task_loss_golden.py then asserts
numeric parity without importing the reference.

Usage: python tools/gen_golden_tasks.py
"""

import contextlib
import io
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (torchvision shim)

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)

IMGSZ = 64
REG_MAX = 16
SHAPES = [(8, 8), (4, 4), (2, 2)]
HYP = dict(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0, overlap_mask=True)


def _build(yaml_name, cls_name, **kw):
    import ultralytics.nn.tasks as RT

    d = RT.yaml_model_load(f"/root/reference/ultralytics/cfg/models/v8/{yaml_name}")
    d["scale"] = "n"
    with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
        model = getattr(RT, cls_name)(d, ch=3, verbose=False, **kw)
    model.args = SimpleNamespace(**HYP)
    return model


def _targets(rng, nc, n_obj):
    """Random normalized xywh boxes + classes; returns flat lists."""
    batch_idx, cls_l, boxes = [], [], []
    for i, n in enumerate(n_obj):
        for _ in range(n):
            batch_idx.append(i)
            cls_l.append(int(rng.integers(0, nc)))
            w, h = rng.uniform(0.15, 0.45, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            boxes.append([cx, cy, w, h])
    return batch_idx, cls_l, np.array(boxes, np.float32)


def _padded(n_obj, cls_l, arr, g, tail_shape):
    """(B, G, ...) padded form + mask from flat per-image lists."""
    b = len(n_obj)
    gt = np.zeros((b, g) + tail_shape, np.float32)
    gc = np.zeros((b, g), np.int32)
    gm = np.zeros((b, g), np.float32)
    ptr = 0
    for i, n in enumerate(n_obj):
        for j in range(n):
            gc[i, j] = cls_l[ptr]
            gt[i, j] = arr[ptr]
            gm[i, j] = 1
            ptr += 1
    return gc, gt, gm


def gen_seg():
    nc, nm, b, g = 4, 32, 2, 5
    n_obj = [3, 2]
    model = _build("yolov8-seg.yaml", "SegmentationModel", nc=nc)
    crit = model.init_criterion()
    rng = np.random.default_rng(7)

    no = 4 * REG_MAX + nc
    feats = [torch.tensor(rng.normal(0, 1, (b, no, h, w)).astype(np.float32)) for h, w in SHAPES]
    a_tot = sum(h * w for h, w in SHAPES)
    pred_masks = torch.tensor(rng.normal(0, 1, (b, nm, a_tot)).astype(np.float32))
    h4 = w4 = IMGSZ // 4
    proto = torch.tensor(rng.normal(0, 1, (b, nm, h4, w4)).astype(np.float32))

    batch_idx, cls_l, boxes = _targets(rng, nc, n_obj)
    # overlap mask map: per-image GT order, index+1, painted in the box
    masks = np.zeros((b, h4, w4), np.float32)
    ptr = 0
    for i, n in enumerate(n_obj):
        for j in range(n):
            cx, cy, w, h = boxes[ptr]
            x1, y1 = int((cx - w / 2) * w4), int((cy - h / 2) * h4)
            x2, y2 = int((cx + w / 2) * w4) + 1, int((cy + h / 2) * h4) + 1
            masks[i, y1:y2, x1:x2] = j + 1
            ptr += 1

    batch = {
        "batch_idx": torch.tensor(batch_idx, dtype=torch.float32),
        "cls": torch.tensor(cls_l, dtype=torch.float32).view(-1, 1),
        "bboxes": torch.tensor(boxes),
        "masks": torch.tensor(masks),
    }
    loss, items = crit(([f.clone() for f in feats], pred_masks.clone(), proto.clone()), batch)
    print("seg items (box, seg, cls, dfl):", items.numpy())

    gc, gt, gm = _padded(n_obj, cls_l, boxes, g, (4,))
    np.savez(
        OUT / "seg_loss.npz",
        feats0=feats[0].numpy().transpose(0, 2, 3, 1),
        feats1=feats[1].numpy().transpose(0, 2, 3, 1),
        feats2=feats[2].numpy().transpose(0, 2, 3, 1),
        mask_coeffs=pred_masks.numpy().transpose(0, 2, 1),
        protos=proto.numpy().transpose(0, 2, 3, 1),
        gt_cls=gc, gt_xywhn=gt, gt_mask=gm,
        seg_map=masks.astype(np.int32),
        loss_total=loss.detach().numpy(),
        loss_items=items.numpy(),
        nc=np.array(nc), nm=np.array(nm),
    )
    print("seg_loss.npz: total", float(loss.sum()))


def gen_pose():
    nc, b, g, nk = 1, 2, 5, 17
    n_obj = [3, 2]
    model = _build("yolov8-pose.yaml", "PoseModel", nc=nc, data_kpt_shape=(nk, 3))
    crit = model.init_criterion()
    rng = np.random.default_rng(11)

    no = 4 * REG_MAX + nc
    feats = [torch.tensor(rng.normal(0, 1, (b, no, h, w)).astype(np.float32)) for h, w in SHAPES]
    a_tot = sum(h * w for h, w in SHAPES)
    pred_kpts = torch.tensor(rng.normal(0, 1, (b, nk * 3, a_tot)).astype(np.float32))

    batch_idx, cls_l, boxes = _targets(rng, nc, n_obj)
    n_tot = len(batch_idx)
    # normalized keypoints inside each box, ~20% invisible (v == 0)
    kpts = np.zeros((n_tot, nk, 3), np.float32)
    for t in range(n_tot):
        cx, cy, w, h = boxes[t]
        kpts[t, :, 0] = rng.uniform(cx - w / 2, cx + w / 2, nk)
        kpts[t, :, 1] = rng.uniform(cy - h / 2, cy + h / 2, nk)
        kpts[t, :, 2] = (rng.random(nk) > 0.2).astype(np.float32) * 2.0

    batch = {
        "batch_idx": torch.tensor(batch_idx, dtype=torch.float32),
        "cls": torch.tensor(cls_l, dtype=torch.float32).view(-1, 1),
        "bboxes": torch.tensor(boxes),
        "keypoints": torch.tensor(kpts),
    }
    loss, items = crit(([f.clone() for f in feats], pred_kpts.clone()), batch)
    print("pose items (box, pose, kobj, cls, dfl):", items.numpy())

    gc, gt, gm = _padded(n_obj, cls_l, boxes, g, (4,))
    _, gk, _ = _padded(n_obj, cls_l, kpts, g, (nk, 3))
    np.savez(
        OUT / "pose_loss.npz",
        feats0=feats[0].numpy().transpose(0, 2, 3, 1),
        feats1=feats[1].numpy().transpose(0, 2, 3, 1),
        feats2=feats[2].numpy().transpose(0, 2, 3, 1),
        pred_kpts=pred_kpts.numpy().transpose(0, 2, 1),
        gt_cls=gc, gt_xywhn=gt, gt_mask=gm, gt_kpts=gk,
        loss_total=loss.detach().numpy(),
        loss_items=items.numpy(),
        nc=np.array(nc), nk=np.array(nk),
    )
    print("pose_loss.npz: total", float(loss.sum()))


def gen_obb():
    nc, b, g = 4, 2, 5
    n_obj = [3, 2]
    model = _build("yolov8-obb.yaml", "OBBModel", nc=nc)
    crit = model.init_criterion()
    rng = np.random.default_rng(13)

    no = 4 * REG_MAX + nc
    feats = [torch.tensor(rng.normal(0, 1, (b, no, h, w)).astype(np.float32)) for h, w in SHAPES]
    a_tot = sum(h * w for h, w in SHAPES)
    # decoded angle, the OBB head's (sigmoid - 0.25) * pi range
    angle = (rng.uniform(0, 1, (b, 1, a_tot)).astype(np.float32) - 0.25) * np.pi
    pred_angle = torch.tensor(angle)

    batch_idx, cls_l, boxes = _targets(rng, nc, n_obj)
    r = rng.uniform(-np.pi / 4, np.pi / 4, (len(cls_l), 1)).astype(np.float32)
    rboxes = np.concatenate([boxes, r], -1)

    batch = {
        "batch_idx": torch.tensor(batch_idx, dtype=torch.float32),
        "cls": torch.tensor(cls_l, dtype=torch.float32).view(-1, 1),
        "bboxes": torch.tensor(rboxes),
    }
    loss, items = crit(([f.clone() for f in feats], pred_angle.clone()), batch)
    print("obb items (box, cls, dfl):", items.numpy())

    gc, gt, gm = _padded(n_obj, cls_l, rboxes, g, (5,))
    np.savez(
        OUT / "obb_loss.npz",
        feats0=feats[0].numpy().transpose(0, 2, 3, 1),
        feats1=feats[1].numpy().transpose(0, 2, 3, 1),
        feats2=feats[2].numpy().transpose(0, 2, 3, 1),
        pred_angle=angle.transpose(0, 2, 1),
        gt_cls=gc, gt_xywhrn=gt, gt_mask=gm,
        loss_total=loss.detach().numpy(),
        loss_items=items.numpy(),
        nc=np.array(nc),
    )
    print("obb_loss.npz: total", float(loss.sum()))


if __name__ == "__main__":
    gen_seg()
    gen_pose()
    gen_obb()
