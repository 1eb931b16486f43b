"""Graph compiler tests: param-count parity with the reference scale
tables and forward-shape checks for the custom CBAM+Swin graphs.

Reference parity anchors:
  * yolov8 scale table (reference cfg/models/v8/yolov8.yaml:11-15)
  * yolo11 scale table (reference cfg/models/11/yolo11.yaml:9-13)
  * custom-graph counts measured from the reference DetectionModel
    (13,405,269 for yolov8s-cbam-swin nc=1; 27,382,389 for yolo11m).
The constant 16 accounts for the reference DFL conv's fixed
(non-learnable) arange weights, which are functional here.
"""

import jax
import jax.numpy as jnp
import pytest

from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

DFL_PARAMS = 16


@pytest.mark.parametrize(
    "cfg,ref_params",
    [
        ("yolov8n.yaml", 3_157_200),
        ("yolov8s.yaml", 11_166_560),
        ("yolo11n.yaml", 2_624_080),
        ("yolo11s.yaml", 9_458_752),
        ("yolov8s-cbam-swin.yaml", 13_405_269),
        ("yolo11m-cbam-swin.yaml", 27_382_389),
        # task heads + other families (reference DetectionModel counts, scale n)
        ("yolov8n-seg.yaml", 3_409_968),
        ("yolov8n-pose.yaml", 3_295_470),
        ("yolov8n-obb.yaml", 3_228_867),
        ("yolov5n.yaml", 2_654_816),
        ("yolov9t.yaml", 2_128_720),
        ("yolov9s.yaml", 7_318_368),
        ("yolov6n.yaml", 4_500_080),
        # round-2 families (reference torch counts, tools/export_ref_state path)
        ("yolov10n.yaml", 2_775_520),
        ("yolov10s.yaml", 8_128_272),
        ("yolo12n.yaml", 2_602_288),
        ("yolo12s.yaml", 9_284_096),
        ("yolov3.yaml", 103_754_144),
        ("yolov3-tiny.yaml", 12_173_248),
        ("yolov3-spp.yaml", 104_803_744),
    ],
)
def test_param_count_parity(cfg, ref_params):
    m = DetectionModel(cfg)
    v = m.shape_init(imgsz=64)  # abstract — no compute
    dfl = 0 if m.task == "classify" else DFL_PARAMS
    assert m.param_count(v) == ref_params - dfl


def test_cls_param_count_parity():
    m = DetectionModel("yolov8n-cls.yaml")
    assert m.task == "classify"
    assert m.param_count(m.shape_init(imgsz=64)) == 2_719_288  # no DFL in cls


def test_strides_derived_analytically():
    m = DetectionModel("yolov8n.yaml")
    assert m.strides == (8, 16, 32)
    m = DetectionModel("yolo11n-cbam-swin.yaml")
    assert m.strides == (8, 16, 32)


def test_forward_shapes_train_and_infer():
    m = DetectionModel("yolov8n-cbam-swin.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=128)
    x = jnp.zeros((2, 128, 128, 3))
    out, feats = m.apply(v, x, train=False)
    a = (128 // 8) ** 2 + (128 // 16) ** 2 + (128 // 32) ** 2
    assert out.shape == (2, 4 + m.nc, a)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 64 + m.nc),
        (2, 8, 8, 64 + m.nc),
        (2, 4, 4, 64 + m.nc),
    ]
    feats_t, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert len(feats_t) == 3
    assert "batch_stats" in mutated


def test_cbam_swin_all_scales_build():
    """The reference crashes for n/s/x on its custom yolo11 graph (hard-coded
    SwinBlock dim); our shape-inferred SwinBlock must build at every scale."""
    for cfg in ["yolov8n-cbam-swin.yaml", "yolo11s-cbam-swin.yaml"]:
        m = DetectionModel(cfg)
        v = m.shape_init(imgsz=64)
        assert m.param_count(v) > 0


def test_jit_forward_no_recompile_same_shape():
    m = DetectionModel("yolov8n.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    fn = jax.jit(lambda vv, x: m.apply(vv, x, train=False)[0])
    x = jnp.zeros((1, 64, 64, 3))
    out1 = fn(v, x)
    out2 = fn(v, x + 1.0)
    assert out1.shape == out2.shape


def test_v10_end2end_train_and_predict(tmp_path):
    """v10Detect: dual-branch training loss (one2many topk10 + one2one
    topk1) decreases; NMS-free inference returns (B, max_det, 6)."""
    import jax.numpy as jnp
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.engine.trainer import DetectionTrainer
    from tests.synth_data import make_synth_dataset

    data_yaml = make_synth_dataset(tmp_path / "ds", n_train=8, n_val=4, imgsz=128, nc=2, seed=0)
    tr = DetectionTrainer(
        overrides={
            "data": str(data_yaml), "model": "yolov10n.yaml", "epochs": 40, "imgsz": 96,
            "batch": 4, "nbs": 4, "workers": 2, "max_gt": 8, "val": False, "amp": False,
            "project": str(tmp_path / "runs"), "warmup_epochs": 0.0, "optimizer": "SGD",
            "lr0": 0.02, "mosaic": 0.0, "fliplr": 0.0, "scale": 0.0, "translate": 0.0,
            "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "device_augment": False,
        }
    )
    tr.setup()
    assert tr.model.end2end
    batch = next(iter(tr.train_loader))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s = tr.state
    first = None
    for i in range(40):
        s, m = tr.train_step(s, jb)
        if i == 0:
            first = np.asarray(m)
    last = np.asarray(m)
    assert np.isfinite(last).all()
    assert last.sum() < 0.8 * first.sum(), (first, last)

    # NMS-free predict path
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    y = YOLO("yolov10n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (100, 140, 3), dtype=np.uint8)
    res = y.predict(img, imgsz=96, conf=1e-6)[0]
    assert res.boxes.data.shape[1] == 6


def test_embed_api():
    """Model.embed returns pooled per-layer features concatenated over
    the requested layers (reference Model.embed / _predict_once embed)."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n.yaml")
    img = np.random.default_rng(0).integers(0, 255, (80, 60, 3)).astype(np.uint8)
    e1 = m.embed(img, layers=(9,), imgsz=64)
    e2 = m.embed([img, img], layers=(4, 9), imgsz=64)
    assert e1.shape[0] == 1 and e2.shape[0] == 2
    assert e2.shape[1] > e1.shape[1]  # two layers concatenated
