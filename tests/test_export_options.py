"""Export option surface (VERDICT r2 missing #3): batch / dynamic / half /
int8 / nms must be honored by the exporter with output parity, and
unsupported flags must raise instead of being silently ignored
(reference engine/exporter.py:112-146 format table, :304-353 option
resolution)."""

from types import SimpleNamespace

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_model():
    import jax

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml", nc=3)
    m.names = {0: "a", 1: "b", 2: "c"}
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    return m, v


def _args(tmp_path, **kw):
    d = dict(format="stablehlo", imgsz=64, project=str(tmp_path))
    d.update(kw)
    return SimpleNamespace(**d)


def _native_out(m, v, img):
    import jax.numpy as jnp

    x = jnp.asarray(img).astype(m.dtype) / 255.0
    pred, _ = m.net.apply(v, x, train=False)
    return np.asarray(pred, np.float32)


def _imgs(b):
    return np.random.default_rng(0).integers(0, 255, (b, 64, 64, 3), dtype=np.uint8)


def test_batch_n(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, batch=4))()
    be = Backend(path)
    img = _imgs(4)
    out = np.asarray(be(img))
    assert out.shape[0] == 4
    np.testing.assert_allclose(out, _native_out(m, v, img), rtol=2e-2, atol=2e-3)
    # wrong batch must fail, proving the size is baked in
    with pytest.raises(Exception):
        be(_imgs(2))


@pytest.mark.parametrize("fmt", ["stablehlo", "saved_model"])
def test_dynamic_batch(fmt, small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, format=fmt, dynamic=True))()
    be = Backend(path)
    for b in (1, 3):
        img = _imgs(b)
        out = np.asarray(be(img))
        assert out.shape[0] == b
        np.testing.assert_allclose(out, _native_out(m, v, img), rtol=2e-2, atol=2e-3)


def test_half(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, half=True, batch=2))()
    be = Backend(path)
    assert be.metadata["half"] is True
    img = _imgs(2)
    out = np.asarray(be(img))
    ref = _native_out(m, v, img)
    assert out.shape == ref.shape
    # bf16 compute: loose tolerance, but boxes are in pixel units so
    # relative error stays small
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.5)


def test_int8(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, int8=True, batch=2))()
    be = Backend(path)
    assert be.metadata["int8"] is True
    img = _imgs(2)
    out = np.asarray(be(img))
    ref = _native_out(m, v, img)
    assert out.shape == ref.shape
    # PTQ drift bound: mean abs deviation small relative to signal scale
    assert np.mean(np.abs(out - ref)) < 0.05 * max(np.mean(np.abs(ref)), 1.0)


def test_nms_embedded(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, nms=True, max_det=20, batch=2))()
    be = Backend(path)
    assert be.end2end is True
    img = _imgs(2)
    out = np.asarray(be(img))
    assert out.shape == (2, 20, 6)

    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.nms import e2e_postprocess

    ref = np.asarray(e2e_postprocess(jnp.asarray(_native_out(m, v, img)), 20, m.nc))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-3)


def test_half_int8_mutually_exclusive(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, half=True, int8=True))()
    be = Backend(path)
    assert be.metadata["int8"] is True
    assert be.metadata["half"] is False  # reference exporter.py:304-306


def test_unsupported_flags_raise(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter

    m, v = small_model
    with pytest.raises(ValueError, match="keras"):
        Exporter(m, v, _args(tmp_path, keras=True))()
    with pytest.raises(ValueError, match="dynamic"):
        Exporter(m, v, _args(tmp_path, format="tflite", dynamic=True))()


def test_tflite_int8_batch2(small_model, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.engine.exporter import Exporter
    from improving_yolov8_cbam_swinblock_tpu.nn.autobackend import Backend

    m, v = small_model
    path = Exporter(m, v, _args(tmp_path, format="tflite", int8=True, batch=2))()
    be = Backend(path)
    assert be.metadata["batch"] == 2
    img = _imgs(2)
    out = np.asarray(be(img))
    ref = _native_out(m, v, img)
    assert out.shape == ref.shape
    assert np.mean(np.abs(out - ref)) < 0.05 * max(np.mean(np.abs(ref)), 1.0)
