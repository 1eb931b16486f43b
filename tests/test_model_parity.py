"""Whole-graph numeric parity: reference torch model vs this framework
with imported weights, same input -> same decoded output, for BOTH of
the fork's active custom graphs (SURVEY.md §2.1): yolov8s-cbam-swin and
yolo11m-cbam-swin.

One assertion covers every module's numerics (Conv+BN folding order,
C2f/C3k2 splits, SPPF pooling, C2PSA attention, CBAM gates, SwinBlock
attention layout, Detect DFL decode). Fixtures are generated from the
reference on demand (~50 MB each — not committed)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"
REPO = Path(__file__).resolve().parent.parent

CASES = {
    "v8": ("model_v8s_cbam_swin.npz", "yolov8s-cbam-swin.yaml"),
    "11": ("model_y11m_cbam_swin.npz", "yolo11m-cbam-swin.yaml"),
}


@pytest.fixture(scope="module", params=sorted(CASES))
def fixture(request):
    fname, yaml_name = CASES[request.param]
    golden = GOLDEN_DIR / fname
    if not golden.exists():
        if not Path("/root/reference").exists():
            pytest.skip("reference repo unavailable to generate model fixture")
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_golden_model.py"), request.param],
            check=True, cwd=REPO, timeout=900,
        )
    return np.load(golden), yaml_name


def test_full_model_forward_parity(fixture):
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.utils.torch_import import import_torch_state

    data, yaml_name = fixture
    state = {k: data[k] for k in data.files if not k.startswith(("__", "feat"))}
    x_nchw = data["__input__"]
    y_ref = data["__output__"]  # (1, 5, A)

    model = DetectionModel(yaml_name, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgsz=x_nchw.shape[-1])
    variables, report = import_torch_state(variables, state, strict=True)
    assert report["unused"] == [], f"unused torch tensors: {report['unused'][:8]}"

    x = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))  # NCHW -> NHWC
    y, feats = model.apply(variables, x, train=False)
    y = np.asarray(y)

    assert y.shape == y_ref.shape
    # boxes (first 4 rows) in pixels; class sigmoids tiny — compare separately
    np.testing.assert_allclose(y[:, :4], y_ref[:, :4], rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(y[:, 4:], y_ref[:, 4:], rtol=2e-3, atol=1e-5)

    # per-level raw feature maps too (tighter localization of any drift)
    for i in range(3):
        f_ref = data[f"feat{i}"].transpose(0, 2, 3, 1)
        f_mine = np.asarray(feats[i])
        # fp32 accumulation-order noise through ~25 conv layers: observed
        # max |diff| ~8e-3 on logits of magnitude ~7
        np.testing.assert_allclose(f_mine, f_ref, rtol=1e-2, atol=1e-2, err_msg=f"level {i}")
