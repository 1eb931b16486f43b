"""RT-DETR family: build parity, forward shapes, CDN training, golden loss.

Covers the reference's models/rtdetr/* + nn/modules/transformer.py surface
(RTDETRDetectionModel, DETRLoss/HungarianMatcher, RTDETRPredictor/Validator).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

GOLDEN = Path(__file__).parent / "golden"

# tiny graph: 2 decoder layers, 16 queries — fast CPU compile
TINY_RTDETR = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],  # P1/2
        [-1, 1, "Conv", [32, 3, 2]],  # P2/4
        [-1, 1, "Conv", [32, 3, 2]],  # P3/8
        [-1, 1, "Conv", [48, 3, 2]],  # P4/16
        [-1, 1, "Conv", [64, 3, 2]],  # P5/32
    ],
    "head": [
        [-1, 1, "AIFI", [64, 4]],
        # nc, (ch), hd, nq, ndp, nh, ndl, d_ffn
        [[2, 3, 5], 1, "RTDETRDecoder", ["nc", 32, 16, 2, 4, 2, 64]],
    ],
}


def test_rtdetr_l_param_parity():
    """Exact param-count parity with reference RTDETRDetectionModel
    ('rtdetr-l.yaml'): 32,970,476 (torch .parameters() sum, counted from
    /root/reference at fixture time)."""
    m = DetectionModel("rtdetr-l.yaml", verbose=False)
    v = m.shape_init(128)
    import math

    n = sum(int(math.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == 32970476
    assert m.is_rtdetr and m.task == "detect"


@pytest.fixture(scope="module")
def tiny_model():
    m = DetectionModel(dict(TINY_RTDETR), verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_rtdetr_eval_forward(tiny_model):
    m, v = tiny_model
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y, _ = m.apply(v, x, train=False)
    assert y.shape == (2, 16, 4 + 3)
    assert float(y[..., :4].min()) >= 0.0 and float(y[..., :4].max()) <= 1.0  # sigmoid xywh
    assert float(y[..., 4:].min()) >= 0.0 and float(y[..., 4:].max()) <= 1.0  # sigmoid scores


def test_rtdetr_train_forward_and_loss(tiny_model):
    from improving_yolov8_cbam_swinblock_tpu.utils.detr_loss import rtdetr_loss

    m, v = tiny_model
    B, G = 2, 8
    targets = {
        "cls": jnp.asarray([[0, 1, 2, 0, 0, 0, 0, 0], [1, 1, 0, 0, 0, 0, 0, 0]], jnp.int32),
        "bboxes": jnp.tile(jnp.asarray([0.5, 0.5, 0.2, 0.3]), (B, G, 1)),
        "mask": jnp.asarray([[1, 1, 1, 0, 0, 0, 0, 0], [1, 1, 0, 0, 0, 0, 0, 0]], jnp.float32),
    }
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, 64, 64, 3))

    def loss_fn(params):
        out, _ = m.net.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True,
            targets=targets, rngs={"dn": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
        )
        # CDN group: g = min(G, num_dn) = 8, ng = 100 // 8 = 12 -> 192 dn slots
        assert out["dec_bboxes"].shape == (2, B, 192 + 16, 4)
        assert out["enc_scores"].shape == (B, 16, 3)
        total, items = rtdetr_loss(out, targets["cls"], targets["bboxes"], targets["mask"], 3, num_dn=192)
        return total, items

    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    gnorm = sum(float(jnp.abs(g.astype(jnp.float32)).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_detr_loss_golden():
    """Dense fixed-shape Hungarian loss == reference ragged DETRLoss
    (fixture from tools/gen_golden_rtdetr.py)."""
    from improving_yolov8_cbam_swinblock_tpu.utils.detr_loss import detr_layers_loss

    f = np.load(GOLDEN / "detr_loss.npz")
    cls_l, l1_l, giou_l = detr_layers_loss(
        jnp.asarray(f["pred_bboxes"]),
        jnp.asarray(f["pred_scores"]),
        jnp.asarray(f["gt_cls"]),
        jnp.asarray(f["gt_box"]),
        jnp.asarray(f["gt_mask"]),
        nc=5,
        use_vfl=True,
    )
    # reference: main = last layer, aux = sum of the rest
    np.testing.assert_allclose(float(cls_l[-1]), f["loss_class"], rtol=2e-4)
    np.testing.assert_allclose(float(l1_l[-1]), f["loss_bbox"], rtol=2e-4)
    np.testing.assert_allclose(float(giou_l[-1]), f["loss_giou"], rtol=2e-4)
    np.testing.assert_allclose(float(cls_l[:-1].sum()), f["loss_class_aux"], rtol=2e-4)
    np.testing.assert_allclose(float(l1_l[:-1].sum()), f["loss_bbox_aux"], rtol=2e-4)
    np.testing.assert_allclose(float(giou_l[:-1].sum()), f["loss_giou_aux"], rtol=2e-4)


def test_rtdetr_validator_postprocess(tiny_model):
    """Validator path: NMS-free (B, nq, 6) conf-sorted detections."""
    from types import SimpleNamespace

    from improving_yolov8_cbam_swinblock_tpu.engine.validator import DetectionValidator

    m, v = tiny_model
    args = SimpleNamespace(imgsz=64, max_det=300, plots=False, save_json=False)
    val = DetectionValidator(m, loader=None, args=args)
    img = (jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 255).astype(jnp.uint8)
    dets = np.asarray(val._forward_nms(v, img))
    assert dets.shape == (2, 16, 6)
    assert (np.diff(dets[:, :, 4], axis=1) <= 1e-6).all()  # conf-sorted
    assert dets[..., :4].min() >= 0 and dets[..., :4].max() <= 64 + 1e-3


def test_rtdetr_facade_predict(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.model import RTDETR, YOLO

    y = YOLO(dict(TINY_RTDETR))
    assert y.task == "detect" and y.model.is_rtdetr
    img = (np.random.default_rng(0).uniform(0, 255, (80, 60, 3))).astype(np.uint8)
    res = y.predict(img, imgsz=64, conf=0.0)
    assert len(res) == 1
    b = res[0].boxes
    if b is not None and len(b.data):
        assert b.data[:, :4].max() <= 80 + 1e-3  # original-frame pixels
    with pytest.raises(ValueError):
        RTDETR("yolov8n.yaml")


def test_rtdetr_train_step_e2e(tmp_path):
    """Trainer integration: jitted RT-DETR train step (Hungarian callback
    inside jit) runs and the loss decreases while overfitting one batch."""
    import sys

    import yaml

    sys.path.insert(0, str(Path(__file__).parent))
    from synth_data import make_synth_dataset

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer

    cfg_path = tmp_path / "rtdetr-tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(TINY_RTDETR))
    data_yaml = make_synth_dataset(tmp_path, n_train=8, n_val=4, imgsz=128, nc=3, seed=0)
    tr = DetectionTrainer(
        overrides={
            "data": str(data_yaml), "model": str(cfg_path), "epochs": 50,
            "imgsz": 64, "batch": 4, "nbs": 4, "workers": 1, "max_gt": 8,
            "val": False, "project": str(tmp_path / "runs"), "mosaic": 0.0,
            "optimizer": "SGD", "lr0": 0.05, "fliplr": 0.0, "scale": 0.0,
            "translate": 0.0, "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0,
            "device_augment": False, "warmup_epochs": 0.0,
        }
    )
    tr.setup()
    assert tr.model.is_rtdetr
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = tr.state
    first = last = None
    for i in range(12):
        s, m = tr.train_step(s, jb)
        if i == 0:
            first = float(np.asarray(m).sum())
    last = float(np.asarray(m).sum())
    assert np.isfinite(last)
    assert last < first  # giou+cls+l1 drop while overfitting
