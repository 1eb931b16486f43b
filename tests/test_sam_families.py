"""SAM / FastSAM / NAS family surfaces.

Covers reference models/sam/* (ImageEncoderViT, PromptEncoder,
MaskDecoder, predictor + everything mode), models/fastsam/* (prompted
post-selection) and models/nas/* (pretrained-only facade contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow_ok


@pytest.fixture(scope="module")
def tiny_sam():
    from improving_yolov8_cbam_swinblock_tpu.models.sam import SAM

    # 128px image grid (8x8 embedding) keeps CPU compile fast
    sam = SAM("sam_b", img_size=128, points_per_side=4)
    sam._ensure_variables()
    return sam


def test_sam_b_param_parity():
    """Exact param parity with the reference torch build at 1024px:
    build_sam_vit_b -> 93,735,472 (counted from /root/reference)."""
    import math

    from improving_yolov8_cbam_swinblock_tpu.models.sam import SAM

    sam = SAM("sam_b", img_size=1024)
    x = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts = jnp.zeros((1, 2, 2), jnp.float32)
    lbl = -jnp.ones((1, 2), jnp.int32)
    v = jax.eval_shape(lambda: sam.net.init(jax.random.PRNGKey(0), x, pts, lbl))
    n = sum(int(math.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == 93735472


def test_sam_point_and_box_prompts(tiny_sam):
    img = (np.random.default_rng(0).uniform(0, 255, (100, 80, 3))).astype(np.uint8)
    res = tiny_sam.predict(img, points=[[40, 50]], multimask_output=True)
    assert res[0].masks.shape == (1, 100, 80)
    res = tiny_sam.predict(img, bboxes=[[10, 10, 60, 80]])
    assert res[0].masks.shape == (1, 100, 80)
    assert res[0].boxes.data.shape == (1, 6)


def test_sam_everything_mode(tiny_sam):
    img = (np.random.default_rng(1).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    res = tiny_sam.predict(img, conf=-1.0, stability_thresh=0.0)  # keep all on random weights
    assert res[0].masks.shape[1:] == (64, 64)
    assert len(res[0].masks) > 0  # grid proposals survive permissive filters


def test_fastsam_prompt_selection():
    """Box/point prompt post-selection math (reference fastsam/predict.py
    prompt) on synthetic results."""
    from improving_yolov8_cbam_swinblock_tpu.engine.results import Results
    from improving_yolov8_cbam_swinblock_tpu.models.fastsam import prompt_select

    img = np.zeros((40, 40, 3), np.uint8)
    det = np.array(
        [[0, 0, 20, 20, 0.9, 0], [20, 20, 40, 40, 0.8, 0]], np.float32
    )
    r = Results(img, "synthetic", {0: "object"}, det)
    masks = np.zeros((2, 40, 40), bool)
    masks[0, :20, :20] = True
    masks[1, 20:, 20:] = True
    r.masks = masks

    out = prompt_select([r], bboxes=[[0, 0, 20, 20]])
    assert len(out[0]) == 1 and out[0].masks[0, 5, 5]

    out = prompt_select([r], points=[[30, 30]])
    assert len(out[0]) == 1 and out[0].masks[0, 30, 30]

    # background point excludes its mask (all-negative -> keep others)
    out = prompt_select([r], points=[[5, 5]], labels=[0])
    assert len(out[0]) == 1 and out[0].masks[0, 30, 30]

    with pytest.raises(ValueError):
        prompt_select([r], texts=["a square"])


def test_fastsam_facade_build():
    from improving_yolov8_cbam_swinblock_tpu.models import FastSAM

    m = FastSAM("FastSAM-s.yaml")
    assert m.task == "segment" and m.model.nc == 1


def test_nas_contract():
    from improving_yolov8_cbam_swinblock_tpu.models import NAS

    with pytest.raises(ValueError):
        NAS("yolov8n.yaml")  # yaml rejected: pretrained-only (reference nas/model.py:58)


def test_mobile_sam_param_parity():
    """MobileSAM TinyViT trunk: exact parity with reference
    build_mobile_sam minus its inert 321,640-param classification head
    (head + norm_head are never used by SAM; 10,130,092 - 321,640)."""
    import math

    from improving_yolov8_cbam_swinblock_tpu.models.sam import SAM

    sam = SAM("mobile_sam", img_size=1024)
    x = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    pts = jnp.zeros((1, 2, 2), jnp.float32)
    lbl = -jnp.ones((1, 2), jnp.int32)
    v = jax.eval_shape(lambda: sam.net.init(jax.random.PRNGKey(0), x, pts, lbl))
    n = sum(int(math.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == 9808452


def test_mobile_sam_prompt_predict():
    from improving_yolov8_cbam_swinblock_tpu.models.sam import SAM

    sam = SAM("mobile_sam", img_size=128, points_per_side=4)
    img = (np.random.default_rng(2).uniform(0, 255, (90, 70, 3))).astype(np.uint8)
    res = sam.predict(img, points=[[30, 40]])
    assert res[0].masks.shape == (1, 90, 70)
