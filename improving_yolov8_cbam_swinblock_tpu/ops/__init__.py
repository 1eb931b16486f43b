from .anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors  # noqa: F401
from .boxes import (  # noqa: F401
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from .nms import non_max_suppression  # noqa: F401
