"""Native C++ pre/postprocess parity vs the Python/JAX implementations."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def _need_native():
    if not native.available():
        pytest.skip("native lib unavailable (no g++?)")


def test_letterbox_native_matches_cv2():
    from improving_yolov8_cbam_swinblock_tpu.data.augment import letterbox

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (97, 153, 3), dtype=np.uint8)
    out_n, gain_n, (pw_n, ph_n) = native.letterbox_native(img, 128)
    out_p, gain_p, (pw_p, ph_p) = letterbox(img, 128)
    assert out_n.shape == out_p.shape == (128, 128, 3)
    assert gain_n == pytest.approx(gain_p, abs=1e-6)
    assert (pw_n, ph_n) == (pw_p, ph_p)
    # cv2 INTER_LINEAR is fixed-point; on noise images rounding gives a few
    # LSB per pixel (no misalignment — checked with the gradient below)
    diff = np.abs(out_n.astype(int) - out_p.astype(int))
    assert diff.mean() < 5.0
    # pad region identical
    assert (out_n[:ph_n] == 114).all() and (out_p[:ph_p] == 114).all()

    # smooth gradient: any sampling-grid misalignment would show up large
    gy, gx = np.mgrid[0:97, 0:153]
    grad = np.stack([gx * 255 / 152, gy * 255 / 96, (gx + gy) % 256], -1).astype(np.uint8)
    g_n, _, _ = native.letterbox_native(grad, 128)
    g_p, _, _ = letterbox(grad, 128)
    assert np.abs(g_n.astype(int) - g_p.astype(int)).mean() < 1.0


def test_decode_nms_native_matches_jax():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(1)
    nc, na = 5, 200
    pred = np.zeros((4 + nc, na), np.float32)
    pred[0] = rng.uniform(50, 600, na)
    pred[1] = rng.uniform(50, 600, na)
    pred[2] = rng.uniform(10, 80, na)
    pred[3] = rng.uniform(10, 80, na)
    pred[4:] = rng.uniform(0, 0.6, (nc, na))

    out_n = native.decode_nms_native(pred, nc, conf_thres=0.25, iou_thres=0.45, max_det=50)
    out_j = np.asarray(
        non_max_suppression(jnp.asarray(pred[None]), conf_thres=0.25, iou_thres=0.45, max_det=50, nc=nc)
    )[0]
    out_j = out_j[out_j[:, 4] > 0]
    assert len(out_n) == len(out_j)
    # same kept set (order = score desc in both)
    np.testing.assert_allclose(out_n[:, 4], out_j[:, 4], rtol=1e-5)
    np.testing.assert_allclose(out_n[:, :4], out_j[:, :4], rtol=1e-4, atol=1e-2)
    np.testing.assert_array_equal(out_n[:, 5], out_j[:, 5])


def test_rescale_native():
    boxes = np.array([[20, 30, 60, 80, 0.9, 0]], np.float32)
    out = native.rescale_native(boxes.copy(), gain=0.5, padw=10, padh=20, orig_hw=(200, 300))
    np.testing.assert_allclose(out[0, :4], [(20 - 10) / 0.5, (30 - 20) / 0.5, (60 - 10) / 0.5, (80 - 20) / 0.5])
