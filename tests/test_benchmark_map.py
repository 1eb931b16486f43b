"""benchmark() accuracy column (reference utils/benchmarks.py:51: the
format sweep reports mAP per format alongside latency)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))


@pytest.fixture(scope="module")
def synth_yaml(tmp_path_factory):
    from synth_data import make_synth_dataset

    root = tmp_path_factory.mktemp("benchmap")
    return str(make_synth_dataset(root, n_train=4, n_val=4, imgsz=96, nc=3, seed=3))


def test_benchmark_reports_map_per_format(synth_yaml):
    from improving_yolov8_cbam_swinblock_tpu.engine.model import YOLO

    m = YOLO("yolov8n.yaml")
    rows = m.benchmark(data=synth_yaml, imgsz=64, batch=2, iters=2, formats=["jax"])
    assert len(rows) == 1
    row = rows[0]
    assert row["status"] == "ok"
    # latency columns still present
    assert "ms/batch" in row and "img/s" in row
    # accuracy column: the reference's metrics/mAP50-95(B) analog
    assert "mAP50-95" in row and isinstance(row["mAP50-95"], float)
    assert 0.0 <= row["mAP50-95"] <= 1.0


def test_benchmark_without_data_stays_latency_only(synth_yaml):
    from improving_yolov8_cbam_swinblock_tpu.engine.model import YOLO

    m = YOLO("yolov8n.yaml")
    rows = m.benchmark(imgsz=64, batch=1, iters=2, formats=["jax"])
    assert rows[0]["status"] == "ok" and "mAP50-95" not in rows[0]


def test_benchmark_default_sweep_cross_format_map_agreement(synth_yaml):
    """Default sweep covers every real export format with an accuracy
    column, and mAP agrees across formats (VERDICT r4 'Next round' #6;
    reference utils/benchmarks.py:51 sweeps all formats with
    metrics/mAP50-95(B) per row)."""
    from improving_yolov8_cbam_swinblock_tpu.engine.model import YOLO

    m = YOLO("yolov8n.yaml")
    rows = m.benchmark(data=synth_yaml, imgsz=64, batch=2, iters=2)  # default formats
    fmts = [r["format"] for r in rows]
    assert fmts == ["jax", "stablehlo", "saved_model", "pb", "tflite"]
    ok = [r for r in rows if r["status"] == "ok"]
    assert [r["format"] for r in ok] == fmts, rows  # every format exported + ran
    maps = {r["format"]: r["mAP50-95"] for r in ok}
    base = maps["jax"]
    for fmt, v in maps.items():
        assert v == pytest.approx(base, abs=5e-3), f"{fmt} mAP drifted: {maps}"
    assert all("ms/batch" in r and "img/s" in r for r in ok)
