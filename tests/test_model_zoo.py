"""Whole-zoo build coverage: every YAML under cfg/models compiles and
shape-checks (the reference's test_all_model_yamls, tests/test_python.py:222),
plus param-count parity anchors for the round-3 zoo additions taken from the
reference YAML summary comments (e.g. cfg/models/v8/yolov8-ghost.yaml:5-9).

shape_init is abstract (jax.eval_shape) so even the x-scale graphs build in
milliseconds without allocating parameters.
"""

import re
from pathlib import Path

import pytest
import yaml

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import CFG_DIR, DetectionModel

DFL_PARAMS = 16  # reference DFL conv's frozen arange weights are functional here

ZOO = sorted((CFG_DIR / "models").rglob("*.yaml"))


def _request_name(p: Path) -> str:
    """Map a zoo file to a loadable model name: scale-table files without a
    scale char in the stem get 'n' (or the table's first scale) inserted after
    the version digits, mirroring reference yaml_model_load semantics."""
    d = yaml.safe_load(p.read_text())
    scales = d.get("scales") or {}
    if scales and not re.search(r"\d+[nsblmx]", p.stem):
        s = "n" if "n" in scales else sorted(scales)[0]
        stem = re.sub(r"(\d+)", rf"\g<1>{s}", p.stem, count=1)
        if stem != p.stem:
            return stem + ".yaml"
    return p.name


@pytest.mark.parametrize("path", ZOO, ids=lambda p: p.parent.name + "/" + p.name)
def test_zoo_builds(path):
    m = DetectionModel(_request_name(path))
    v = m.shape_init(imgsz=64)
    assert m.param_count(v) > 0
    assert m.task in ("detect", "segment", "pose", "obb", "classify")
    # every non-classify graph must expose at least one stride-consistent level
    if m.task != "classify":
        assert len(m.strides) >= 1
        assert all(s in (4, 8, 16, 32, 64) for s in m.strides)


@pytest.mark.parametrize(
    "cfg,ref_params,has_dfl",
    [
        # reference summary comments in the corresponding reference YAMLs
        ("yolov8n-ghost.yaml", 1_865_316, True),
        ("yolov8n-ghost-p2.yaml", 2_033_944, True),
        ("yolov8n-ghost-p6.yaml", 2_901_100, True),
        ("yolov8n-p6.yaml", 4_984_352, True),
        ("yolov8n-rtdetr.yaml", 9_643_868, False),  # DETR head: no DFL buffer
        ("yolo11n-seg.yaml", 2_876_848, True),
        ("yolo11n-pose.yaml", 2_908_507, True),
        ("yolo11n-obb.yaml", 2_695_747, True),
        # the reference YAML's summary comment says 1,633,584 but the actual
        # torch build is 2,812,104 (stale comment; verified by instantiating
        # reference ClassificationModel("yolo11n-cls.yaml") and summing numel)
        ("yolo11n-cls.yaml", 2_812_104, False),
        ("yolo12n-seg.yaml", 2_855_056, True),
        ("yolo12n-pose.yaml", 2_886_715, True),
        ("yolo12n-obb.yaml", 2_673_955, True),
        ("yolo12n-cls.yaml", 1_820_976, False),
    ],
)
def test_zoo_param_count_parity(cfg, ref_params, has_dfl):
    m = DetectionModel(cfg)
    v = m.shape_init(imgsz=64)
    assert m.param_count(v) == ref_params - (DFL_PARAMS if has_dfl else 0)


def test_p6_strides():
    m = DetectionModel("yolov8n-p6.yaml")
    assert m.strides == (8, 16, 32, 64)
    m = DetectionModel("yolov8n-p2.yaml")
    assert m.strides == (4, 8, 16, 32)


def test_v9e_dual_branch_builds():
    """yolov9e: CBLinear/CBFuse cross-branch injection + nn.Identity image
    pin (reference cfg/models/v9/yolov9e.yaml)."""
    m = DetectionModel("yolov9e.yaml")
    v = m.shape_init(imgsz=64)
    assert m.param_count(v) > 50_000_000  # 58.1M reference scale
    assert m.strides == (8, 16, 32)
