"""COCO-format prediction export (reference detect/val.py pred_to_json):
detections -> results.json for external pycocotools cross-checks."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List


def detections_to_coco_json(
    per_image: List[Dict],  # [{"image_id": int|str, "boxes": (n,6) xyxy+conf+cls}]
    out_path: str,
    class_map: Dict[int, int] | None = None,
) -> str:
    """Write [{image_id, category_id, bbox xywh, score}, ...]."""
    records = []
    for item in per_image:
        image_id = item["image_id"]
        for row in item["boxes"]:
            x1, y1, x2, y2, conf, cls = [float(v) for v in row[:6]]
            cat = int(cls)
            if class_map:
                cat = class_map.get(cat, cat)
            records.append(
                {
                    "image_id": image_id,
                    "category_id": cat,
                    "bbox": [round(x1, 3), round(y1, 3), round(x2 - x1, 3), round(y2 - y1, 3)],
                    "score": round(conf, 5),
                }
            )
    Path(out_path).write_text(json.dumps(records))
    return out_path
