"""YOLO-World open-vocabulary family: build parity, text threading,
set_classes, train loss.

Covers reference nn/modules/block.py:579-836 (MaxSigmoidAttnBlock /
C2fAttn / ImagePoolingAttn / ContrastiveHead / BNContrastiveHead),
head.py:318-346 (WorldDetect), tasks.py:697-800 (WorldModel). The text
encoder is the documented offline hash-projection stand-in
(utils/text_model.py) — architecture parity, not CLIP semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

TINY_WORLD = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],   # P2/4
        [-1, 1, "Conv", [32, 3, 2]],   # P3/8
        [-1, 1, "Conv", [48, 3, 2]],   # P4/16
        [-1, 1, "Conv", [64, 3, 2]],   # P5/32
    ],
    "head": [
        [-1, 1, "C2fAttn", [64, 32, 2]],            # 5 (P5, text-guided)
        [[2, 3, -1], 1, "ImagePoolingAttn", [32]],  # 6 refine txt
        [2, 1, "C2fAttn", [32, 16, 1]],             # 7 (P3)
        [3, 1, "C2fAttn", [48, 16, 1]],             # 8 (P4)
        [[7, 8, 5], 1, "WorldDetect", ["nc", 512, False]],  # embed = text dim
    ],
}


def test_world_param_parity():
    """yolov8s-world / worldv2 param counts match the reference WorldModel
    to within the functional DFL's 16 fixed weights (counted from
    /root/reference at fixture time: 13,383,496 / 12,759,880)."""
    import math

    for cfg, ref in (("yolov8s-world.yaml", 13383496), ("yolov8s-worldv2.yaml", 12759880)):
        m = DetectionModel(cfg, verbose=False)
        v = m.shape_init(128)
        n = sum(int(math.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n == ref - 16, (cfg, n, ref)
        assert m.is_world


@pytest.fixture(scope="module")
def tiny_world():
    m = DetectionModel(dict(TINY_WORLD), verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_world_eval_and_set_classes(tiny_world):
    m, v = tiny_world
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y, _ = m.apply(v, x, train=False)
    assert y.shape[1] == 4 + 3  # (B, 4+nc, A)
    # open-vocabulary swap: same weights, different class axis
    m.set_classes(["person", "cat", "dog", "car", "bus"])
    y5, _ = m.apply(v, x, train=False)
    assert y5.shape[1] == 4 + 5
    assert m.names[1] == "cat"
    m.set_classes(["a", "b", "c"])  # restore for other tests


def test_world_text_encoder_deterministic():
    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import encode_texts

    a = encode_texts(["person", "cat"])
    b = encode_texts(["person", "cat"])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, rtol=1e-5)
    # distinct prompts are near-orthogonal in the hash space
    assert abs(float(a[0] @ a[1])) < 0.2


def test_world_train_loss_and_grads(tiny_world):
    from improving_yolov8_cbam_swinblock_tpu.utils.loss import detection_loss

    m, v = tiny_world
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    gt_cls = jnp.asarray([[0, 1, 0, 0], [2, 0, 0, 0]], jnp.int32)
    gt_b = jnp.tile(jnp.asarray([0.5, 0.5, 0.25, 0.25]), (2, 4, 1))
    gt_m = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)

    def loss_fn(params):
        feats, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True, mutable=["batch_stats"]
        )
        tot, items = detection_loss(tuple(feats), gt_cls, gt_b, gt_m, nc=3, strides=tuple(m.strides))
        return tot

    tot, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(tot))
    # text-guided attention gets gradients
    gl = grads["model_5"]["attn"]["gl"]["kernel"]
    assert float(jnp.abs(gl).sum()) > 0


def test_world_facade_predict():
    from improving_yolov8_cbam_swinblock_tpu.engine.model import YOLO

    y = YOLO(dict(TINY_WORLD))
    y.set_classes(["thing-a", "thing-b"])
    img = (np.random.default_rng(0).uniform(0, 255, (96, 72, 3))).astype(np.uint8)
    res = y.predict(img, imgsz=64, conf=0.0)
    assert len(res) == 1 and y.names[0] == "thing-a"
