"""ProfileModels analog (utils/benchmarks.py): per-model params/GFLOPs/
latency table with sigma-clipped timings (reference benchmarks.py:351)."""

import numpy as np

from improving_yolov8_cbam_swinblock_tpu.utils.benchmarks import ProfileModels


def test_profile_models_table():
    rows = ProfileModels(["yolov8n.yaml"], num_timed_runs=4, num_warmup_runs=1, imgsz=96).profile()
    (r,) = rows
    assert r["params_M"] > 2.5  # v8n ~3.16M
    assert r["GFLOPs"] > 0
    assert r["ms_mean"] > 0 and np.isfinite(r["ms_std"])


def test_sigma_clipping_drops_outliers():
    # one compile-spike among many steady timings (a 5-point array with a
    # single extreme value cannot be 2-sigma-clipped — sd is inflated)
    data = np.array([10.0, 10.2, 9.9, 10.1] * 5 + [500.0])
    out = ProfileModels.iterative_sigma_clipping(data)
    assert 500.0 not in out and len(out) == 20
