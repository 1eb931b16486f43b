"""Reference-idiom loss/assigner classes (utils/loss_api.py) delegate
exactly to the functional kernels (reference utils/loss.py:152-700,
utils/tal.py:14-361 class contracts)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def det_setup():
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
    feats, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    return m, feats


def test_v8detectionloss_matches_functional(det_setup):
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.utils.loss import detection_loss
    from improving_yolov8_cbam_swinblock_tpu.utils.loss_api import v8DetectionLoss

    m, feats = det_setup
    rng = np.random.default_rng(1)
    gc = jnp.asarray(rng.integers(0, 3, (2, 4)).astype(np.float32))
    gb = jnp.asarray(rng.uniform(0.3, 0.6, (2, 4, 4)).astype(np.float32))
    gm = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)

    crit = v8DetectionLoss(m)
    total, items = crit(feats, {"cls": gc, "bboxes": gb, "mask": gm})
    ref_total, ref_items = detection_loss(feats, gc, gb, gm, nc=m.nc, strides=m.strides)
    assert float(total) == pytest.approx(float(ref_total), rel=1e-6)
    assert items.shape == (3,)
    np.testing.assert_allclose(
        np.asarray(items), [ref_items.box, ref_items.cls, ref_items.dfl], rtol=1e-6
    )


def test_v8detectionloss_reference_batch_layout(det_setup):
    from improving_yolov8_cbam_swinblock_tpu.utils.loss_api import v8DetectionLoss

    m, feats = det_setup
    # reference collate layout: flat instances with batch_idx
    batch_ref = {
        "batch_idx": np.array([0, 0, 1]),
        "cls": np.array([[1.0], [2.0], [0.0]]),
        "bboxes": np.array([[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1], [0.6, 0.6, 0.3, 0.3]]),
    }
    batch_pad = {
        "cls": np.array([[1.0, 2.0], [0.0, 0.0]]),
        "bboxes": np.array([
            [[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.1]],
            [[0.6, 0.6, 0.3, 0.3], [0, 0, 0, 0]],
        ]),
        "mask": np.array([[1.0, 1.0], [1.0, 0.0]]),
    }
    crit = v8DetectionLoss(m)
    t1, i1 = crit(feats, batch_ref)
    t2, i2 = crit(feats, batch_pad)
    assert float(t1) == pytest.approx(float(t2), rel=1e-6)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-6)


def test_task_aligned_assigner_class():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.anchors import make_anchors
    from improving_yolov8_cbam_swinblock_tpu.utils.loss_api import TaskAlignedAssigner
    from improving_yolov8_cbam_swinblock_tpu.utils.tal import task_aligned_assign

    rng = np.random.default_rng(0)
    anc, _ = make_anchors([(8, 8), (4, 4)], (8, 16), 0.5)
    a = anc.shape[0]
    scores = jnp.asarray(rng.random((2, a, 5)).astype(np.float32))
    boxes = jnp.asarray(np.sort(rng.uniform(0, 64, (2, a, 2, 2)), axis=2).reshape(2, a, 4).astype(np.float32))
    gl = jnp.asarray(rng.integers(0, 5, (2, 3, 1)))
    gbx = jnp.asarray(np.stack([
        rng.uniform(0, 20, (2, 3, 2)), rng.uniform(30, 64, (2, 3, 2))
    ], axis=2).reshape(2, 3, 4).astype(np.float32))
    mg = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)[..., None]

    assigner = TaskAlignedAssigner(topk=10, num_classes=5)
    tl, tb, ts, fg, gi = assigner(scores, boxes, anc, gl, gbx, mg)
    ref = task_aligned_assign(scores, boxes, anc, gl, gbx, mg, topk=10, num_classes=5)
    np.testing.assert_array_equal(np.asarray(tl), np.asarray(ref.target_labels))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(ref.target_scores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(fg), np.asarray(ref.fg_mask).astype(bool))
    assert assigner.forward is not None


def test_classification_loss_class():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.utils.loss_api import v8ClassificationLoss

    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    batch = {"cls": np.array([0, 1])}
    loss, items = v8ClassificationLoss()(logits, batch)
    # manual CE
    p = np.exp(np.asarray(logits))
    p /= p.sum(-1, keepdims=True)
    ref = -np.log([p[0, 0], p[1, 1]]).mean()
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_classification_loss_large_logits_stable():
    """Raw exp-softmax overflowed to NaN for logits >~90 (r4 advisor);
    log_softmax must keep this finite like the reference F.cross_entropy."""
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.utils.loss_api import v8ClassificationLoss

    logits = jnp.asarray([[120.0, 0.0, -50.0], [0.0, 300.0, 0.0]])
    loss, _ = v8ClassificationLoss()(logits, {"cls": np.array([0, 1])})
    assert np.isfinite(float(loss))
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
