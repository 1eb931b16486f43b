"""Reference-idiom metrics API (reference utils/metrics.py:662-1336):
Metric / DetMetrics attribute surface, task metric bundles, and the small
function tail (bbox_ioa, batch_probiou, smooth_bce, plot_mc/pr_curve)."""

import numpy as np
import pytest


def _synth_stats(n=200, nc=3, seed=0):
    rng = np.random.default_rng(seed)
    tp = rng.random((n, 10)) < np.linspace(0.7, 0.3, 10)
    conf = rng.random(n)
    pred_cls = rng.integers(0, nc, n)
    target_cls = rng.integers(0, nc, n + 50)
    return tp, conf, pred_cls, target_cls


def test_metric_properties_consistent_with_detmetrics():
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import DetMetrics

    tp, conf, pred_cls, target_cls = _synth_stats()
    dm = DetMetrics({i: f"c{i}" for i in range(3)})
    out = dm.process(tp, conf, pred_cls, target_cls)
    assert dm.box is not None
    assert out["mAP50"] == pytest.approx(dm.box.map50, abs=1e-9)
    assert out["mAP50-95"] == pytest.approx(dm.box.map, abs=1e-9)
    assert out["precision"] == pytest.approx(dm.box.mp, abs=1e-9)
    assert out["recall"] == pytest.approx(dm.box.mr, abs=1e-9)
    assert out["fitness"] == pytest.approx(dm.fitness, abs=1e-9)
    # per-class accessors
    assert len(dm.maps) == 3
    p, r, ap50, ap = dm.class_result(0)
    assert 0.0 <= ap50 <= 1.0 and 0.0 <= ap <= 1.0
    assert dm.box.map75 <= dm.box.map50 + 1e-9
    rd = dm.results_dict
    assert rd["metrics/mAP50(B)"] == pytest.approx(out["mAP50"])
    assert list(rd) == dm.keys + ["fitness"]
    assert dm.box.mean_results() == [dm.box.mp, dm.box.mr, dm.box.map50, dm.box.map]


def test_segment_pose_obb_classify_bundles():
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import (
        ClassifyMetrics,
        OBBMetrics,
        PoseMetrics,
        SegmentMetrics,
    )

    tp, conf, pred_cls, target_cls = _synth_stats()
    tp2 = _synth_stats(seed=1)[0]
    names = {i: f"c{i}" for i in range(3)}

    sm = SegmentMetrics(names=names)
    sm.process(tp, tp2, conf, pred_cls, target_cls)
    assert sm.fitness == pytest.approx(sm.box.fitness() + sm.seg.fitness())
    assert len(sm.keys) == 8 and len(sm.mean_results()) == 8
    assert sm.results_dict["fitness"] == pytest.approx(sm.fitness)

    pm = PoseMetrics(names=names)
    pm.process(tp, tp2, conf, pred_cls, target_cls)
    assert pm.fitness == pytest.approx(pm.box.fitness() + pm.pose.fitness())
    assert pm.keys[4].endswith("(P)")

    om = OBBMetrics(names=names)
    om.process(tp, conf, pred_cls, target_cls)
    assert om.fitness == pytest.approx(om.box.fitness())
    assert len(om.maps) == 3

    cm = ClassifyMetrics()
    targets = np.array([0, 1, 2, 1])
    pred5 = np.array([[0, 2, 3, 4, 5], [2, 1, 0, 3, 4], [9, 8, 7, 6, 5], [1, 0, 2, 3, 4]])
    cm.process(targets, pred5)
    assert cm.top1 == pytest.approx(0.5)   # rows 0 and 3 correct at top-1
    assert cm.top5 == pytest.approx(0.75)  # row 2 never matches
    assert cm.fitness == pytest.approx(0.625)
    assert cm.results_dict["metrics/accuracy_top1"] == pytest.approx(0.5)


def test_function_tail():
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import (
        batch_probiou,
        bbox_ioa,
        probiou_np,
        smooth_bce,
    )

    assert smooth_bce(0.1) == (0.95, 0.05)
    b1 = np.array([[0.0, 0, 10, 10]])
    b2 = np.array([[5.0, 5, 15, 15], [20, 20, 30, 30]])
    ioa = bbox_ioa(b1, b2)
    assert ioa[0, 0] == pytest.approx(25 / 100, rel=1e-5)  # inter / box2 area
    assert ioa[0, 1] == 0.0
    iou = bbox_ioa(b1, b2, iou=True)
    assert iou[0, 0] == pytest.approx(25 / 175, rel=1e-5)
    obb = np.array([[10.0, 10, 6, 4, 0.3], [30.0, 30, 8, 2, 1.0]], np.float32)
    bp = batch_probiou(obb, obb)
    assert bp.shape == (2, 2)
    np.testing.assert_allclose(np.diag(bp), 1.0, atol=1e-3)
    np.testing.assert_allclose(bp, probiou_np(obb, obb), atol=1e-7)


def test_curve_plots(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import (
        ap_per_class,
        plot_mc_curve,
        plot_pr_curve,
    )

    tp, conf, pred_cls, target_cls = _synth_stats()
    res = ap_per_class(tp, conf, pred_cls, target_cls)
    names = {i: f"c{i}" for i in range(3)}
    x = np.linspace(0, 1, 1000)
    pr = tmp_path / "pr.png"
    mc = tmp_path / "f1.png"
    plot_pr_curve(x, res["p_curve"].T, res["ap"], save_dir=str(pr), names=names)
    plot_mc_curve(x, res["f1_curve"], save_dir=str(mc), names=names, ylabel="F1")
    assert pr.exists() and pr.stat().st_size > 1000
    assert mc.exists() and mc.stat().st_size > 1000


def test_valmetrics_wrapper():
    from improving_yolov8_cbam_swinblock_tpu.utils.metrics import DetMetrics, ValMetrics

    tp, conf, pred_cls, target_cls = _synth_stats()
    dm = DetMetrics({i: f"c{i}" for i in range(3)})
    out = dm.process(tp, conf, pred_cls, target_cls)
    vm = ValMetrics({**out, "metrics/mAP50(B)": out["mAP50"]})
    vm.box = dm.box
    assert vm["mAP50"] == out["mAP50"]          # dict access (native API)
    assert vm.box.map50 == pytest.approx(out["mAP50"])  # reference attribute API
    assert vm.mAP50 == out["mAP50"]             # key passthrough
    assert "metrics/mAP50(B)" in vm.results_dict
    assert len(vm.maps) == 3
