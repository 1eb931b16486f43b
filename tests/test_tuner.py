"""Tuner evolution artifacts (reference engine/tuner.py:224-242,
utils/plotting.py:897 plot_tune_results)."""

import csv

import numpy as np
import yaml

from improving_yolov8_cbam_swinblock_tpu.engine.tuner import SPACE, Tuner
from improving_yolov8_cbam_swinblock_tpu.utils.plotting import plot_tune_results


def test_mutate_stays_in_space():
    t = Tuner({"lr0": 0.01}, save_dir="runs/tune-test-mutate", seed=0)
    parent = {k: (lo + hi) / 2 for k, (lo, hi, _) in SPACE.items()}
    for _ in range(20):
        child = t._mutate(parent)
        for k, v in child.items():
            lo, hi, _ = SPACE[k]
            assert lo <= v <= hi, (k, v)


def test_finalize_writes_plots_and_best_yaml(tmp_path):
    t = Tuner({"lr0": 0.01}, save_dir=str(tmp_path), seed=0)
    rng = np.random.default_rng(0)
    for i in range(6):
        hyp = {k: float(rng.uniform(lo, hi)) for k, (lo, hi, _) in SPACE.items()}
        t.results.append((0.1 * i, hyp))
    t._write_csv()
    best = max(t.results, key=lambda r: r[0])[1]
    t._finalize(best)

    assert (tmp_path / "tune_scatter_plots.png").exists()
    assert (tmp_path / "tune_fitness.png").exists()
    loaded = yaml.safe_load(open(tmp_path / "best_hyperparameters.yaml"))
    assert loaded == {k: float(v) for k, v in best.items() if k in SPACE}

    # standalone call on the CSV also works
    out = plot_tune_results(str(tmp_path / "tune_results.csv"))
    assert out and out.endswith("tune_scatter_plots.png")

    rows = list(csv.DictReader(open(tmp_path / "tune_results.csv")))
    assert len(rows) == 6 and "fitness" in rows[0]
