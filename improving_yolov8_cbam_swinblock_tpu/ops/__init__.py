from .anchors import bbox2dist, dfl_decode, dist2bbox, make_anchors  # noqa: F401
from .boxes import (  # noqa: F401
    bbox_iou,
    box_iou,
    clip_boxes,
    clip_coords,
    crop_mask,
    ltwh2xywh,
    ltwh2xyxy,
    process_mask,
    process_mask_native,
    scale_boxes,
    scale_coords,
    xywh2ltwh,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
)
from .nms import non_max_suppression  # noqa: F401
from .rotated import nms_rotated, regularize_rboxes, xywhr2xyxyxyxy, xyxyxyxy2xywhr  # noqa: F401
from .segments import (  # noqa: F401
    clean_str,
    convert_torch2numpy_batch,
    empty_like,
    masks2segments,
    resample_segments,
    scale_image,
    scale_masks,
    segment2box,
    segments2boxes,
)
