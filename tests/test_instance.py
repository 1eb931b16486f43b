"""Bboxes/Instances label containers (reference utils/instance.py:34/195):
format conversion, joint geometric ops, indexing/concat."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.utils.instance import Bboxes, Instances


def test_bboxes_convert_roundtrip_and_areas():
    xyxy = np.array([[10, 10, 30, 50], [0, 0, 4, 4]], np.float32)
    b = Bboxes(xyxy.copy(), "xyxy")
    np.testing.assert_allclose(b.areas(), [800, 16])
    b.convert("xywh")
    np.testing.assert_allclose(b.bboxes[0], [20, 30, 20, 40])
    b.convert("ltwh")
    np.testing.assert_allclose(b.bboxes[0], [10, 10, 20, 40])
    b.convert("xyxy")
    np.testing.assert_allclose(b.bboxes, xyxy, atol=1e-5)
    b.mul((2, 2, 2, 2))
    b.add(1)
    np.testing.assert_allclose(b.bboxes[1], [1, 1, 9, 9])
    both = Bboxes.concatenate([b, b])
    assert len(both) == 4 and len(both[1:3]) == 2


def test_instances_joint_geometry():
    bb = np.array([[0.5, 0.5, 0.25, 0.25]], np.float32)  # normalized xywh
    seg = np.array([[[0.4, 0.4], [0.6, 0.4], [0.6, 0.6]]], np.float32)
    kpt = np.array([[[0.5, 0.5, 1.0]]], np.float32)
    inst = Instances(bb.copy(), seg.copy(), kpt.copy(), bbox_format="xywh", normalized=True)
    inst.denormalize(100, 200)
    np.testing.assert_allclose(inst.bboxes[0], [50, 100, 25, 50])
    np.testing.assert_allclose(inst.segments[0, 0], [40, 80])
    np.testing.assert_allclose(inst.keypoints[0, 0, :2], [50, 100])
    inst.fliplr(100)
    np.testing.assert_allclose(inst.bboxes[0, 0], 50)  # symmetric center
    np.testing.assert_allclose(inst.segments[0, 0, 0], 60)
    inst.flipud(200)
    np.testing.assert_allclose(inst.segments[0, 0, 1], 120)
    inst.add_padding(10, 20)
    np.testing.assert_allclose(inst.bboxes[0, :2], [60, 120])
    inst.convert_bbox("xyxy")
    inst.clip(70, 130)
    assert inst.bboxes[:, 2].max() <= 70 and inst.bboxes[:, 3].max() <= 130
    inst.normalize(70, 130)
    assert inst.normalized and inst.bboxes.max() <= 1.0 + 1e-6


def test_instances_zero_area_and_concat():
    bb = np.array([[10, 10, 20, 20], [5, 5, 5, 25]], np.float32)  # 2nd zero width
    inst = Instances(bb, bbox_format="xyxy", normalized=False)
    good = inst.remove_zero_area_boxes()
    assert good.tolist() == [True, False] and len(inst) == 1
    a = Instances(np.array([[1, 1, 3, 3]], np.float32), np.random.rand(1, 4, 2).astype(np.float32),
                  bbox_format="xyxy", normalized=False)
    c = Instances(np.array([[2, 2, 4, 4]], np.float32), np.random.rand(1, 6, 2).astype(np.float32),
                  bbox_format="xyxy", normalized=False)
    cat = Instances.concatenate([a, c])
    assert len(cat) == 2 and cat.segments.shape == (2, 6, 2)  # re-padded to max
    sub = cat[0]
    assert len(sub) == 1 and sub.segments.shape[0] == 1
    with pytest.raises(AssertionError):
        Instances(np.zeros((1, 4), np.float32), bbox_format="xyxy", normalized=False).add_padding  # attr ok
        bad = Instances(np.zeros((1, 4), np.float32), bbox_format="xyxy", normalized=True)
        bad.add_padding(1, 1)
