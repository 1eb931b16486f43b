"""export_ref_state.py -> import_torch_state end-to-end: a real torch .pt
checkpoint of the reference custom model round-trips into this framework
with zero missing parameters (VERDICT round-1 'Next round' #10)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "export_ref_state.py"


@pytest.fixture(scope="module")
def ref_npz(tmp_path_factory):
    """Build the reference custom model, save a trainer-style .pt, export
    both the .pt and the fresh yaml through the tool."""
    tmp = tmp_path_factory.mktemp("refstate")
    code = f"""
import sys
sys.path.insert(0, r"{REPO / 'tools'}")
import ref_stub
sys.path.insert(0, "/root/reference")
import contextlib, io, torch
from ultralytics.nn.tasks import DetectionModel, yaml_model_load
torch.manual_seed(3)
d = yaml_model_load("/root/reference/ultralytics/cfg/models/v8/yolov8.yaml")
d["scale"] = "s"  # reference crashes at other scales (SwinBlock dim quirk)
with contextlib.redirect_stdout(io.StringIO()), contextlib.redirect_stderr(io.StringIO()):
    m = DetectionModel(d, ch=3, nc=1, verbose=False)
m.eval()
# lazy CBAM MLPs materialize on first forward (reference cbam.py:29-33)
with torch.no_grad():
    m(torch.zeros(1, 3, 128, 128))
torch.save({{"model": m, "ema": None, "epoch": 0}}, r"{tmp / 'ref.pt'}")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    for src, out in ((str(tmp / "ref.pt"), tmp / "from_pt.npz"),):
        r = subprocess.run(
            [sys.executable, str(TOOL), src, str(out)],
            capture_output=True, text=True, timeout=300, cwd=str(REPO),
        )
        assert r.returncode == 0, r.stderr[-2000:]
    return tmp / "from_pt.npz"


def test_pt_roundtrip_imports_cleanly(ref_npz):
    import jax

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.utils.torch_import import import_torch_state

    state = dict(np.load(ref_npz))
    assert len(state) > 100
    model = DetectionModel("yolov8s-cbam-swin.yaml", nc=1)
    variables = model.init(jax.random.PRNGKey(0), imgsz=128)
    new_vars, report = import_torch_state(variables, state, strict=True)
    assert report["missing"] == []
    assert report["n_loaded"] > 100
    # everything unused must be torch bookkeeping, not real weights
    assert all("num_batches_tracked" in k or ".dfl." in k for k in report["unused"]), report["unused"][:8]

    # imported weights actually landed: a conv kernel matches through the
    # OIHW->HWIO transform
    w_t = state["model.0.conv.weight"]  # (O, I, kh, kw)
    w_j = np.asarray(new_vars["params"]["model_0"]["conv"]["kernel"])  # (kh, kw, I, O)
    np.testing.assert_allclose(w_j, w_t.transpose(2, 3, 1, 0), atol=0)

    # and the model runs with them
    import jax.numpy as jnp

    out, _ = model.net.apply(new_vars, jnp.zeros((1, 128, 128, 3), jnp.float32), train=False)
    assert np.isfinite(np.asarray(out)).all()


def test_facade_load_npz(ref_npz):
    """YOLO(yaml).load('ref.npz') is the one-line migration workflow
    (docs/migration.md): ported torch weights land in the facade."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8s-cbam-swin.yaml")
    m._ensure_variables(imgsz=128)
    before = np.asarray(m.variables["params"]["model_0"]["conv"]["kernel"]).copy()
    m.load(str(ref_npz))
    after = np.asarray(m.variables["params"]["model_0"]["conv"]["kernel"])
    state = dict(np.load(ref_npz))
    np.testing.assert_allclose(after, state["model.0.conv.weight"].transpose(2, 3, 1, 0), atol=0)
    assert not np.allclose(before, after)
