"""Golden numeric parity for the seg / pose / obb task losses against the
reference v8SegmentationLoss / v8PoseLoss / v8OBBLoss outputs
(reference utils/loss.py:258/441/607) captured by
tools/gen_golden_tasks.py on fixed random inputs."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


def _feats(d):
    return [jnp.asarray(d[f"feats{i}"]) for i in range(3)]


def test_segmentation_loss_golden():
    from improving_yolov8_cbam_swinblock_tpu.utils.seg_loss import segmentation_loss

    d = np.load(GOLDEN / "seg_loss.npz")
    total, items, seg = segmentation_loss(
        _feats(d),
        jnp.asarray(d["mask_coeffs"]),
        jnp.asarray(d["protos"]),
        jnp.asarray(d["gt_cls"]),
        jnp.asarray(d["gt_xywhn"]),
        jnp.asarray(d["gt_mask"]),
        jnp.asarray(d["seg_map"]),
        nc=int(d["nc"]),
        nm=int(d["nm"]),
    )
    ref = d["loss_items"]  # (box, seg, cls, dfl)
    np.testing.assert_allclose(float(items.box), ref[0], rtol=2e-4)
    np.testing.assert_allclose(float(seg), ref[1], rtol=2e-4)
    np.testing.assert_allclose(float(items.cls), ref[2], rtol=2e-4)
    np.testing.assert_allclose(float(items.dfl), ref[3], rtol=2e-4)
    np.testing.assert_allclose(float(total), float(d["loss_total"].sum()), rtol=2e-4)


def test_pose_loss_golden():
    from improving_yolov8_cbam_swinblock_tpu.utils.pose_loss import pose_loss

    d = np.load(GOLDEN / "pose_loss.npz")
    total, items, (pose, kobj) = pose_loss(
        _feats(d),
        jnp.asarray(d["pred_kpts"]),
        jnp.asarray(d["gt_cls"]),
        jnp.asarray(d["gt_xywhn"]),
        jnp.asarray(d["gt_mask"]),
        jnp.asarray(d["gt_kpts"]),
        nc=int(d["nc"]),
        kpt_shape=(int(d["nk"]), 3),
    )
    ref = d["loss_items"]  # (box, pose, kobj, cls, dfl)
    np.testing.assert_allclose(float(items.box), ref[0], rtol=2e-4)
    np.testing.assert_allclose(float(pose), ref[1], rtol=2e-4)
    np.testing.assert_allclose(float(kobj), ref[2], rtol=2e-4)
    np.testing.assert_allclose(float(items.cls), ref[3], rtol=2e-4)
    np.testing.assert_allclose(float(items.dfl), ref[4], rtol=2e-4)
    np.testing.assert_allclose(float(total), float(d["loss_total"].sum()), rtol=2e-4)


def test_obb_loss_golden():
    from improving_yolov8_cbam_swinblock_tpu.utils.obb_loss import obb_loss

    d = np.load(GOLDEN / "obb_loss.npz")
    total, items = obb_loss(
        _feats(d),
        jnp.asarray(d["pred_angle"]),
        jnp.asarray(d["gt_cls"]),
        jnp.asarray(d["gt_xywhrn"]),
        jnp.asarray(d["gt_mask"]),
        nc=int(d["nc"]),
    )
    ref = d["loss_items"]  # (box, cls, dfl)
    np.testing.assert_allclose(float(items.box), ref[0], rtol=2e-4)
    np.testing.assert_allclose(float(items.cls), ref[1], rtol=2e-4)
    np.testing.assert_allclose(float(items.dfl), ref[2], rtol=2e-4)
    np.testing.assert_allclose(float(total), float(d["loss_total"].sum()), rtol=2e-4)
