"""YOLOE prompt-driven family: build parity, text + visual prompts,
segment contract, train losses.

Covers reference nn/modules/block.py:1891-1980 (SwiGLUFFN / Residual /
SAVPE) and head.py:383-565 (YOLOEDetect / YOLOESegment), models/yolo/
yoloe/*. LRPC prompt-free inference is a documented deviation
(dynamic-token path; see nn/modules_yoloe.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

TINY_YOLOE = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],   # P2/4
        [-1, 1, "Conv", [32, 3, 2]],   # 2 P3/8
        [-1, 1, "Conv", [48, 3, 2]],   # 3 P4/16
        [-1, 1, "Conv", [64, 3, 2]],   # 4 P5/32
    ],
    "head": [
        [[2, 3, 4], 1, "YOLOEDetect", ["nc", 512, True]],
    ],
}

TINY_YOLOE_SEG = dict(TINY_YOLOE, head=[[[2, 3, 4], 1, "YOLOESegment", ["nc", 8, 32, 512, True]]])


def test_yoloe_param_parity():
    """Exact param parity (± the functional DFL's 16 fixed weights) with
    reference YOLOEModel/YOLOESegModel (counted from /root/reference):
    yoloe-v8s 14,763,350 / yoloe-v8s-seg 15,417,846 / yoloe-11s 13,055,542."""
    import math

    for cfg, ref in (
        ("yoloe-v8s.yaml", 14763350),
        ("yoloe-v8s-seg.yaml", 15417846),
        ("yoloe-11s.yaml", 13055542),
    ):
        m = DetectionModel(cfg, verbose=False)
        v = m.shape_init(128)
        n = sum(int(math.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
        assert n == ref - 16, (cfg, n, ref)
        assert m.is_yoloe


@pytest.fixture(scope="module")
def tiny_yoloe():
    m = DetectionModel(dict(TINY_YOLOE), verbose=False)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def test_yoloe_text_prompts(tiny_yoloe):
    m, v = tiny_yoloe
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y, _ = m.apply(v, x, train=False)
    assert y.shape[1] == 4 + 3
    m.set_classes(["person", "cat", "dog", "car"])
    y4, _ = m.apply(v, x, train=False)
    assert y4.shape[1] == 4 + 4
    m.set_classes(["a", "b", "c"])


def test_yoloe_visual_prompts(tiny_yoloe):
    """Visual prompt masks (B, Q, H/8, W/8) switch the head to SAVPE
    embeddings; the class axis becomes the prompt count Q."""
    m, v = tiny_yoloe
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    vp = jnp.zeros((2, 2, 8, 8)).at[:, 0, 2:5, 2:5].set(1.0).at[:, 1, 5:8, 5:8].set(1.0)
    y, _ = m.net.apply(v, x, train=False, txt=None, vp=vp)
    assert y.shape[1] == 4 + 2  # Q=2 prompt classes
    assert np.isfinite(np.asarray(y)).all()


def test_yoloe_train_loss(tiny_yoloe):
    from improving_yolov8_cbam_swinblock_tpu.utils.loss import detection_loss

    m, v = tiny_yoloe
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    gt_cls = jnp.asarray([[0, 1, 0, 0], [2, 0, 0, 0]], jnp.int32)
    gt_b = jnp.tile(jnp.asarray([0.5, 0.5, 0.25, 0.25]), (2, 4, 1))
    gt_m = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)

    def loss_fn(params):
        feats, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True, mutable=["batch_stats"]
        )
        tot, _ = detection_loss(tuple(feats), gt_cls, gt_b, gt_m, nc=3, strides=tuple(m.strides))
        return tot

    tot, grads = jax.value_and_grad(loss_fn)(v["params"])
    assert np.isfinite(float(tot))
    # the prompt refiner (reprta) is zero-init (Residual), so its w3 grads
    # flow but w12 must exist too
    g = grads["model_5"]["reprta_m"]["w12"]["kernel"]
    assert g.shape[0] == 512


def test_yoloe_facade_visual_prompts():
    """YOLOE facade (reference models/yolo/model.py:144): predict with
    visual_prompts encodes box prompts via SAVPE (get_visual_pe), swaps the
    class table to the Q unique prompt classes, and runs a normal predict."""
    from improving_yolov8_cbam_swinblock_tpu import YOLOE

    m = YOLOE(dict(TINY_YOLOE))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    prompts = {"bboxes": [[10, 10, 40, 40], [50, 20, 90, 60], [15, 45, 45, 70]], "cls": [0, 1, 0]}
    pe, uniq = m.get_visual_pe(img, prompts, imgsz=64)
    assert pe.shape == (1, 2, 512) and list(uniq) == [0, 1]
    assert np.allclose(np.linalg.norm(pe, axis=-1), 1.0, atol=1e-3)  # SAVPE L2-normalizes
    res = m.predict(img, visual_prompts=dict(prompts), imgsz=64, conf=0.0001)
    assert len(res) == 1
    assert m.model.nc == 2 and m.model.names[0] == "object0"
    # text-prompt API surface (reference get_text_pe/set_vocab/get_vocab)
    t = m.get_text_pe(["person", "bus"])
    assert t.shape == (1, 2, 512)
    m.set_vocab(m.get_vocab(["person", "bus"]), ["person", "bus"])
    assert m.model.names[1] == "bus"


def test_yoloworld_facade():
    """YOLOWorld facade accepts only WorldDetect graphs (reference
    models/yolo/model.py:93) and swaps classes via set_classes."""
    from improving_yolov8_cbam_swinblock_tpu import YOLOWorld

    with pytest.raises(ValueError):
        YOLOWorld("yolov8n.yaml")
    tiny_world = dict(TINY_YOLOE, head=[[[2, 3, 4], 1, "WorldDetect", ["nc", 64, False]]])
    m = YOLOWorld(tiny_world)
    m.set_classes(["cat", "dog"])
    assert m.model.nc == 2


def test_yoloe_segment_contract():
    from improving_yolov8_cbam_swinblock_tpu.utils.seg_loss import segmentation_loss

    m = DetectionModel(dict(TINY_YOLOE_SEG), verbose=False)
    assert m.task == "segment"
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    y, (feats, mc, proto) = m.apply(v, x, train=False)
    A = y.shape[2]
    assert y.shape == (2, 4 + 3 + 8, A)  # boxes + cls + nm coefs
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    det_feats, mc_t, proto_t = out
    assert proto_t.shape[-1] == 8
    gt_cls = jnp.zeros((2, 4), jnp.int32)
    gt_b = jnp.tile(jnp.asarray([0.5, 0.5, 0.25, 0.25]), (2, 4, 1))
    gt_m = jnp.asarray([[1, 0, 0, 0], [1, 1, 0, 0]], jnp.float32)
    seg_map = jnp.zeros((2, 16, 16), jnp.int32).at[:, 4:9, 4:9].set(1)
    tot, items, _ = segmentation_loss(
        det_feats, mc_t, proto_t, gt_cls, gt_b, gt_m, seg_map, nc=3, strides=tuple(m.strides)
    )
    assert np.isfinite(float(tot))
