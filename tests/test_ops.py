"""Unit tests for core box/anchor/NMS numerics.

Golden values cross-checked against the reference formulas
(utils/metrics.py:74, utils/tal.py:364-404, utils/ops.py:181)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.ops import (
    bbox2dist,
    bbox_iou,
    box_iou,
    dfl_decode,
    dist2bbox,
    make_anchors,
    non_max_suppression,
    xywh2xyxy,
    xyxy2xywh,
)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xywh = jnp.asarray(rng.uniform(10, 100, (32, 4)).astype(np.float32))
    back = xyxy2xywh(xywh2xyxy(xywh))
    np.testing.assert_allclose(back, xywh, rtol=1e-5, atol=1e-5)


def test_box_iou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    iou = box_iou(a, a)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), [1.0, 1.0], atol=1e-5)
    assert float(iou[0, 1]) == pytest.approx(0.0, abs=1e-6)


def test_bbox_iou_half_overlap():
    # two unit squares overlapping half: inter=0.5, union=1.5
    b1 = jnp.asarray([0.0, 0, 1, 1])
    b2 = jnp.asarray([0.5, 0, 1.5, 1])
    iou = bbox_iou(b1, b2, xywh=False)
    assert float(iou[0]) == pytest.approx(0.5 / 1.5, abs=1e-4)


def test_ciou_less_than_iou_when_offset():
    b1 = jnp.asarray([0.0, 0, 2, 2])
    b2 = jnp.asarray([1.0, 1, 3, 3])
    plain = float(bbox_iou(b1, b2, xywh=False)[0])
    ciou = float(bbox_iou(b1, b2, xywh=False, CIoU=True)[0])
    assert ciou < plain
    # same aspect ratio -> v == 0 -> CIoU == DIoU
    diou = float(bbox_iou(b1, b2, xywh=False, DIoU=True)[0])
    assert ciou == pytest.approx(diou, abs=1e-6)


def test_make_anchors_matches_reference_layout():
    anchors, strides = make_anchors([(2, 3), (1, 2)], [8, 16])
    assert anchors.shape == (8, 2)
    # first level row-major: (x+0.5, y+0.5) with x fastest
    np.testing.assert_allclose(
        np.asarray(anchors[:6]),
        [[0.5, 0.5], [1.5, 0.5], [2.5, 0.5], [0.5, 1.5], [1.5, 1.5], [2.5, 1.5]],
    )
    np.testing.assert_allclose(np.asarray(strides[:6, 0]), [8] * 6)
    np.testing.assert_allclose(np.asarray(strides[6:, 0]), [16] * 2)


def test_dist_bbox_roundtrip():
    anchors, _ = make_anchors([(4, 4)], [8])
    rng = np.random.default_rng(1)
    dist = jnp.asarray(rng.uniform(0.1, 2.0, (1, 16, 4)).astype(np.float32))
    boxes = dist2bbox(dist, anchors[None], xywh=False)
    back = bbox2dist(anchors[None], boxes, reg_max=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), rtol=1e-5, atol=1e-5)


def test_dfl_decode_delta_distribution():
    # logits strongly peaked at bin 7 -> expectation ~= 7
    logits = np.full((2, 3, 64), -20.0, dtype=np.float32)
    logits[..., 7] = 20.0  # l-bin of reshaped (...,4,16): index 7 of first group
    x = logits.reshape(2, 3, 4, 16).copy()
    x[:] = -20.0
    x[..., 7] = 20.0
    out = dfl_decode(jnp.asarray(x.reshape(2, 3, 64)))
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-3)


def test_nms_suppresses_duplicates_keeps_classes():
    # build (B, 4+nc, A) prediction with two overlapping boxes same class
    # and one distinct box of another class
    nc, a = 3, 16
    pred = np.zeros((1, 4 + nc, a), dtype=np.float32)
    # candidate 0: box at (50,50) size 20, class 0, conf .9
    pred[0, :4, 0] = [50, 50, 20, 20]
    pred[0, 4, 0] = 0.9
    # candidate 1: nearly same box, class 0, conf .8 -> suppressed
    pred[0, :4, 1] = [51, 51, 20, 20]
    pred[0, 4, 1] = 0.8
    # candidate 2: same location but class 1 -> kept (per-class NMS)
    pred[0, :4, 2] = [50, 50, 20, 20]
    pred[0, 5, 2] = 0.7
    out = np.asarray(non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8, nc=nc))
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 2
    assert valid[0][4] == pytest.approx(0.9, abs=1e-5)
    assert valid[0][5] == 0.0
    assert valid[1][4] == pytest.approx(0.7, abs=1e-5)
    assert valid[1][5] == 1.0


def test_nms_agnostic_mode():
    nc, a = 3, 8
    pred = np.zeros((1, 4 + nc, a), dtype=np.float32)
    pred[0, :4, 0] = [50, 50, 20, 20]
    pred[0, 4, 0] = 0.9
    pred[0, :4, 1] = [50, 50, 20, 20]
    pred[0, 5, 1] = 0.7  # other class, same box
    out = np.asarray(
        non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8, nc=nc, agnostic=True)
    )
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 1  # cross-class suppression in agnostic mode


def test_nms_multilabel_emits_both_classes():
    nc, a = 3, 8
    pred = np.zeros((1, 4 + nc, a), dtype=np.float32)
    pred[0, :4, 0] = [50, 50, 20, 20]
    pred[0, 4, 0] = 0.9
    pred[0, 5, 0] = 0.6  # same anchor, second class above threshold
    out = np.asarray(
        non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8, nc=nc, multi_label=True)
    )
    valid = out[0][out[0][:, 4] > 0]
    assert len(valid) == 2
    assert set(valid[:, 5].astype(int).tolist()) == {0, 1}


def test_confusion_matrix_counts():
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import ConfusionMatrix

    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thres=0.45)
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)
    gt_cls = np.array([0, 1])
    det = np.array(
        [
            [11, 11, 49, 49, 0.9, 0],   # TP class 0
            [61, 59, 91, 91, 0.8, 0],   # confused: matches gt 1 but wrong class
            [5, 80, 25, 99, 0.7, 1],    # FP (background)
            [0, 0, 3, 3, 0.1, 0],       # below conf: ignored
        ],
        np.float32,
    )
    cm.process_batch(det, gt, gt_cls)
    assert cm.matrix[0, 0] == 1      # TP
    assert cm.matrix[0, 1] == 1      # class-1 gt predicted as class 0
    assert cm.matrix[1, 2] == 1      # background FP
    assert cm.matrix.sum() == 3
    # no detections: all gts become background FN
    cm2 = ConfusionMatrix(nc=2)
    cm2.process_batch(np.zeros((0, 6), np.float32), gt, gt_cls)
    assert cm2.matrix[2, 0] == 1 and cm2.matrix[2, 1] == 1


def test_validator_artifacts(tmp_path):
    """plots/save_json produce confusion_matrix.png, PR curves, and
    predictions.json; per-class table is exposed."""
    import jax

    from improving_yolov8_cbam_swinblock_tpu.cfg import get_cfg
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import DataLoader, YOLODataset
    from improving_yolov8_cbam_swinblock_tpu.engine.validator import DetectionValidator
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from tests.synth_data import make_synth_dataset

    data_yaml = make_synth_dataset(tmp_path / "ds", n_train=4, n_val=4, imgsz=128, nc=2, seed=1)
    ds = YOLODataset(str(tmp_path / "ds" / "images" / "val"), imgsz=96, max_gt=16, nc=2)
    loader = DataLoader(ds, 2, train=False, workers=2)
    m = DetectionModel("yolov8n.yaml", nc=2)
    m.names = {0: "a", 1: "b"}
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    args = get_cfg(overrides={
        "imgsz": 96, "plots": True, "save_json": True, "conf": 0.0,
        "project": str(tmp_path / "out"), "name": "val",
    })
    val = DetectionValidator(m, loader, args)
    val.conf = 1e-6  # random init: let some detections through
    out = val(v)
    d = tmp_path / "out" / "val"
    assert (d / "confusion_matrix.png").exists()
    assert (d / "PR_curve.png").exists() and (d / "F1_curve.png").exists()
    assert (d / "predictions.json").exists()
    import json

    recs = json.loads((d / "predictions.json").read_text())
    assert recs and {"image_id", "category_id", "bbox", "score"} <= set(recs[0])
    assert isinstance(val.per_class, dict)


def test_ltwh_converters_roundtrip():
    """xywh <-> ltwh <-> xyxy round trips (reference ops.py:502-620)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    rng = np.random.default_rng(0)
    xywh = np.concatenate([rng.uniform(20, 80, (16, 2)), rng.uniform(2, 20, (16, 2))], -1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(O.ltwh2xywh(O.xywh2ltwh(xywh))), xywh, atol=1e-5)
    xyxy = np.asarray(O.xywh2xyxy(xywh))
    np.testing.assert_allclose(np.asarray(O.ltwh2xyxy(O.xyxy2ltwh(xyxy))), xyxy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(O.xywh2ltwh(xywh)), np.asarray(O.xyxy2ltwh(xyxy)), atol=1e-5)


def test_rbox_corner_roundtrip():
    """xywhr -> corners -> xywhr is identity on canonical rboxes."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    rng = np.random.default_rng(1)
    rb = np.stack(
        [rng.uniform(40, 60, 8), rng.uniform(40, 60, 8), rng.uniform(10, 20, 8),
         rng.uniform(4, 9, 8), rng.uniform(0.05, 3.0, 8)], -1
    ).astype(np.float32)
    back = np.asarray(O.xyxyxyxy2xywhr(O.xywhr2xyxyxyxy(rb)))
    # w/h/angle identified up to the reference's (w,h,theta+pi/2) symmetry:
    # compare after regularization
    a = np.asarray(O.regularize_rboxes(rb))
    b = np.asarray(O.regularize_rboxes(back))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_segments_utilities():
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    tri = np.array([[10, 10], [50, 12], [30, 40]], np.float32)
    box = O.segment2box(tri, 640, 640)
    np.testing.assert_allclose(box, [10, 10, 50, 40])
    xywh = O.segments2boxes([tri])
    np.testing.assert_allclose(xywh[0], [30, 25, 40, 30])
    rs = O.resample_segments([tri], n=100)[0]
    assert rs.shape == (100, 2)
    # resampled points stay within the polygon's bbox
    assert rs[:, 0].min() >= 10 - 1e-3 and rs[:, 0].max() <= 50 + 1e-3
    # mask <-> segments
    m = np.zeros((1, 64, 64), np.uint8)
    m[0, 10:30, 20:50] = 1
    segs = O.masks2segments(m, strategy="largest")
    assert len(segs) == 1 and segs[0].shape[1] == 2 and len(segs[0]) >= 4
    assert O.clean_str("a|b@c") == "a_b_c"


def test_scale_masks_and_image_unletterbox():
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    # 160x160 network canvas letterboxing an 80x160 image: 40px pad top+bottom
    m = np.zeros((1, 160, 160), np.float32)
    m[0, 40:120, :] = 1.0  # mask covers exactly the content area
    out = O.scale_masks(m, (80, 160))
    assert out.shape == (1, 80, 160)
    assert out.mean() > 0.95  # pad removed -> all content
    img = np.zeros((160, 160, 3), np.uint8)
    img[40:120, :] = 255
    out2 = O.scale_image(img, (80, 160, 3))
    assert out2.shape[:2] == (80, 160) and out2.mean() > 250


def test_scale_and_clip_coords():
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    # 640-square letterbox of a 320x640 image: pad_h = 160
    pts = np.array([[320.0, 320.0, 0.9], [0.0, 0.0, 0.5]], np.float32)
    out = np.asarray(O.scale_coords((640, 640), pts, (320, 640)))
    np.testing.assert_allclose(out[0], [320, 160, 0.9], atol=1e-3)
    np.testing.assert_allclose(out[1], [0, 0, 0.5], atol=1e-3)  # clipped
    n = np.asarray(O.scale_coords((640, 640), pts, (320, 640), normalize=True))
    np.testing.assert_allclose(n[0, :2], [0.5, 0.5], atol=1e-3)


def test_nms_rotated_fast_nms():
    """probiou fast-NMS keep set (reference ops.py nms_rotated)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    boxes = np.array(
        [
            [50, 50, 20, 10, 0.1],   # A
            [50, 50, 20, 10, 0.12],  # ~= A, lower score -> suppressed
            [120, 120, 30, 14, 1.2], # B, disjoint
            [50, 50, 20, 10, 0.1],   # == A, lower score -> suppressed
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    keep = O.nms_rotated(boxes, scores, threshold=0.45)
    assert sorted(keep.tolist()) == [0, 2]
    # empty input
    assert O.nms_rotated(np.zeros((0, 5), np.float32), np.zeros((0,), np.float32)).size == 0


def test_process_mask_native_upsample_crop():
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    h = w = 40  # proto resolution for a 160px input
    nm = 8
    protos = np.zeros((h, w, nm), np.float32)
    protos[:, :, 0] = 4.0  # channel 0: everywhere-positive logits
    coeffs = np.array([[1.0] + [0.0] * (nm - 1)], np.float32)
    # original image 80x160 letterboxed into 160x160 -> 40px pad rows at proto/4
    boxes = np.array([[20.0, 10.0, 120.0, 70.0]], np.float32)  # original-image px
    out = np.asarray(
        O.process_mask_native(protos, coeffs, boxes, img_shape=(80, 160), input_shape=(160, 160))
    )
    assert out.shape == (1, 80, 160) and out.dtype == bool
    assert out[0, 40, 60]  # inside box -> positive logit kept
    assert not out[0, 5, 5] and not out[0, 75, 150]  # outside box cropped


def test_empty_like_and_batch_convert():
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import ops as O

    e = O.empty_like(np.zeros((3, 4), np.float64))
    assert e.shape == (3, 4) and e.dtype == np.float32
    batch = np.random.rand(2, 3, 8, 8).astype(np.float32)
    out = O.convert_torch2numpy_batch(batch)
    assert out.shape == (2, 8, 8, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :, :, 0], np.clip(batch[:, 0] * 255, 0, 255).astype(np.uint8))
    import torch

    out2 = O.convert_torch2numpy_batch(torch.from_numpy(batch))
    np.testing.assert_array_equal(out, out2)
