"""Generate golden fixtures from the reference implementation.

Runs the reference TaskAlignedAssigner and v8DetectionLoss (torch, CPU)
on fixed random inputs and saves inputs+outputs to tests/golden/*.npz.
The JAX tests then assert numeric parity without importing the reference.

Usage: python tools/gen_golden.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
import ref_stub  # noqa: F401  (torchvision shim)

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"
OUT.mkdir(parents=True, exist_ok=True)


def gen_tal():
    from ultralytics.utils.tal import TaskAlignedAssigner, make_anchors

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    b, nc, g = 2, 4, 6
    shapes = [(8, 8), (4, 4), (2, 2)]
    strides = [8, 16, 32]
    feats = [torch.zeros(b, 1, h, w) for h, w in shapes]
    anc, stride_t = make_anchors(feats, torch.tensor(strides, dtype=torch.float32), 0.5)
    a = anc.shape[0]

    pd_scores = torch.tensor(rng.uniform(0, 1, (b, a, nc)).astype(np.float32))
    # plausible boxes around anchor centers, image units
    centers = (anc * stride_t).numpy()
    wh = rng.uniform(8, 40, (b, a, 2)).astype(np.float32)
    ctr = centers[None] + rng.uniform(-4, 4, (b, a, 2)).astype(np.float32)
    pd_bboxes = torch.tensor(
        np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    )
    # ground truth: valid counts [4, 2]
    gt_labels = torch.tensor(rng.integers(0, nc, (b, g, 1)))
    cxy = rng.uniform(10, 54, (b, g, 2)).astype(np.float32)
    gwh = rng.uniform(10, 30, (b, g, 2)).astype(np.float32)
    gt_bboxes = torch.tensor(np.concatenate([cxy - gwh / 2, cxy + gwh / 2], -1).astype(np.float32)).clamp(0, 64)
    mask = np.zeros((b, g, 1), np.float32)
    mask[0, :4] = 1
    mask[1, :2] = 1
    mask_gt = torch.tensor(mask)
    gt_bboxes = gt_bboxes * mask_gt
    gt_labels = (gt_labels.float() * mask_gt).long()

    assigner = TaskAlignedAssigner(topk=10, num_classes=nc, alpha=0.5, beta=6.0)
    tl, tb, ts, fg, tgi = assigner(pd_scores, pd_bboxes, anc * stride_t, gt_labels, gt_bboxes, mask_gt)

    np.savez(
        OUT / "tal.npz",
        pd_scores=pd_scores.numpy(),
        pd_bboxes=pd_bboxes.numpy(),
        anc_points=(anc * stride_t).numpy(),
        gt_labels=gt_labels.numpy(),
        gt_bboxes=gt_bboxes.numpy(),
        mask_gt=mask_gt.numpy(),
        target_labels=tl.numpy(),
        target_bboxes=tb.numpy(),
        target_scores=ts.numpy(),
        fg_mask=fg.numpy(),
        target_gt_idx=tgi.numpy(),
        shapes=np.array(shapes),
        strides=np.array(strides),
    )
    print("tal.npz:", int(fg.sum()), "fg anchors")


def gen_loss():
    import contextlib
    import io

    from ultralytics.nn.tasks import DetectionModel, yaml_model_load

    torch.manual_seed(0)
    rng = np.random.default_rng(1)
    nc, b, imgsz, reg_max = 4, 2, 64, 16
    d = yaml_model_load("/root/reference/ultralytics/cfg/models/v8/yolov8.yaml")
    d["scale"] = "s"  # the fork's custom graph only builds at scale s
    with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
        model = DetectionModel(d, ch=3, nc=nc, verbose=False)
    from types import SimpleNamespace

    model.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    crit = model.init_criterion()

    shapes = [(imgsz // s, imgsz // s) for s in (8, 16, 32)]
    no = 4 * reg_max + nc
    feats = [torch.tensor(rng.normal(0, 1, (b, no, h, w)).astype(np.float32)) for h, w in shapes]

    # targets: 3 boxes in image 0, 1 box in image 1 (normalized xywh)
    n_obj = [3, 1]
    batch_idx, cls_l, boxes = [], [], []
    for i, n in enumerate(n_obj):
        for _ in range(n):
            batch_idx.append(i)
            cls_l.append(rng.integers(0, nc))
            w, h = rng.uniform(0.1, 0.4, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            boxes.append([cx, cy, w, h])
    batch = {
        "batch_idx": torch.tensor(batch_idx, dtype=torch.float32),
        "cls": torch.tensor(cls_l, dtype=torch.float32).view(-1, 1),
        "bboxes": torch.tensor(np.array(boxes, np.float32)),
    }
    loss, items = crit([f.clone() for f in feats], batch)
    print("loss items (box, cls, dfl):", items.numpy())

    # padded-target form for the JAX loss
    g = 5
    gt_cls = np.zeros((b, g), np.int32)
    gt_xywhn = np.zeros((b, g, 4), np.float32)
    gt_mask = np.zeros((b, g), np.float32)
    ptr = 0
    for i, n in enumerate(n_obj):
        for j in range(n):
            gt_cls[i, j] = cls_l[ptr]
            gt_xywhn[i, j] = boxes[ptr]
            gt_mask[i, j] = 1
            ptr += 1

    np.savez(
        OUT / "loss.npz",
        feats0=feats[0].numpy(),
        feats1=feats[1].numpy(),
        feats2=feats[2].numpy(),
        gt_cls=gt_cls,
        gt_xywhn=gt_xywhn,
        gt_mask=gt_mask,
        loss_total=loss.detach().numpy(),
        loss_items=items.numpy(),
        nc=np.array(nc),
    )
    print("loss.npz: total", float(loss.sum()))


if __name__ == "__main__":
    gen_tal()
    gen_loss()
