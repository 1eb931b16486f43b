"""Stub torchvision (absent in this image) so the read-only reference
package imports for golden-value generation. Used by tools/gen_golden*.py."""
import sys, types
import torch

tv = types.ModuleType("torchvision")
tv.__version__ = "0.15.0"
ops = types.ModuleType("torchvision.ops")
def _nms(boxes, scores, iou_threshold):
    order = scores.argsort(descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0].item()
        keep.append(i)
        if order.numel() == 1:
            break
        b = boxes[i]
        rest = boxes[order[1:]]
        x1 = torch.maximum(rest[:, 0], b[0]); y1 = torch.maximum(rest[:, 1], b[1])
        x2 = torch.minimum(rest[:, 2], b[2]); y2 = torch.minimum(rest[:, 3], b[3])
        inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
        area_b = (b[2] - b[0]) * (b[3] - b[1])
        area_r = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
        iou = inter / (area_b + area_r - inter + 1e-7)
        order = order[1:][iou <= iou_threshold]
    return torch.tensor(keep, dtype=torch.long)
ops.nms = _nms
tv.ops = ops
transforms = types.ModuleType("torchvision.transforms")
tv.transforms = transforms
sys.modules["torchvision"] = tv
sys.modules["torchvision.ops"] = ops
sys.modules["torchvision.transforms"] = transforms

# package metadata shim for importlib.metadata lookups
import importlib.metadata as _md
_orig_version = _md.version
def _version(name):
    if name == "torchvision":
        return "0.15.0"
    return _orig_version(name)
_md.version = _version
