"""Hyperparameter tuner: mutation-based evolution
(reference engine/tuner.py:30-242).

Each iteration mutates the best-known hyps (gaussian perturbation within
bounded spaces), trains a short run, and records fitness to tune_results.csv.
In-process instead of the reference's subprocess-per-iteration (JAX holds
no global torch state that needs isolating)."""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, Optional

import numpy as np

# (min, max, gain) per hyperparameter — reference tuner.py space
SPACE = {
    "lr0": (1e-5, 1e-1, 1.0),
    "lrf": (0.0001, 0.1, 1.0),
    "momentum": (0.7, 0.98, 0.3),
    "weight_decay": (0.0, 0.001, 1.0),
    "warmup_epochs": (0.0, 5.0, 1.0),
    "warmup_momentum": (0.0, 0.95, 1.0),
    "box": (1.0, 20.0, 1.0),
    "cls": (0.2, 4.0, 1.0),
    "dfl": (0.4, 6.0, 1.0),
    "hsv_h": (0.0, 0.1, 1.0),
    "hsv_s": (0.0, 0.9, 1.0),
    "hsv_v": (0.0, 0.9, 1.0),
    "degrees": (0.0, 45.0, 1.0),
    "translate": (0.0, 0.9, 1.0),
    "scale": (0.0, 0.95, 1.0),
    "shear": (0.0, 10.0, 1.0),
    "perspective": (0.0, 0.001, 1.0),
    "flipud": (0.0, 1.0, 1.0),
    "fliplr": (0.0, 1.0, 1.0),
    "mosaic": (0.0, 1.0, 1.0),
    "mixup": (0.0, 1.0, 1.0),
}


class Tuner:
    def __init__(self, base_overrides: Dict, save_dir: Optional[str] = None, seed: int = 0):
        self.base = dict(base_overrides)
        self.save_dir = Path(save_dir or "runs/tune")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.rng = np.random.default_rng(seed)
        self.results = []  # (fitness, hyps)

    def _mutate(self, parent: Dict, sigma: float = 0.2) -> Dict:
        hyp = dict(parent)
        n_mutate = max(1, int(len(SPACE) * 0.25))
        keys = self.rng.choice(list(SPACE), size=n_mutate, replace=False)
        for k in keys:
            lo, hi, gain = SPACE[k]
            v = float(hyp.get(k, (lo + hi) / 2))
            v *= float(1 + self.rng.normal(0, sigma) * gain)
            hyp[k] = float(np.clip(v, lo, hi))
        return hyp

    def __call__(self, iterations: int = 10) -> Dict:
        from .trainer import DetectionTrainer

        # Seed every tunable from the resolved config (reference tuner.py:139
        # reads initial values off self.args), so iteration 0 trains — and the
        # CSV/best yaml record — a complete hyp vector even when the caller
        # overrides none of them.
        from ..cfg import get_cfg

        defaults = vars(get_cfg(overrides={k: v for k, v in self.base.items() if k in SPACE}))
        best_hyp = {k: float(defaults[k]) for k in SPACE}
        for it in range(iterations):
            if self.results:  # mutate the best candidate so far
                hyp = self._mutate(max(self.results, key=lambda t: t[0])[1])
            else:
                hyp = dict(best_hyp)
            overrides = {**self.base, **hyp, "project": str(self.save_dir), "name": f"iter{it}"}
            try:
                trainer = DetectionTrainer(overrides=overrides)
                metrics = trainer.train()
                fitness = float(metrics.get("fitness", 0.0))
            except Exception as e:  # a bad hyp draw must not kill the loop
                print(f"tune iter {it} failed: {e}")
                fitness = 0.0
            self.results.append((fitness, hyp))
            self._write_csv()
        best = max(self.results, key=lambda t: t[0])[1]
        self._finalize(best)
        return best

    def _finalize(self, best: Dict):
        """Evolution artifacts (reference tuner.py:224-242): scatter/fitness
        plots from the CSV plus best_hyperparameters.yaml."""
        from ..utils.plotting import plot_tune_results

        plot_tune_results(str(self.save_dir / "tune_results.csv"))
        try:
            import yaml

            with open(self.save_dir / "best_hyperparameters.yaml", "w") as fh:
                yaml.safe_dump({k: float(v) for k, v in best.items() if k in SPACE}, fh, sort_keys=False)
        except Exception as e:
            print(f"tune: best_hyperparameters.yaml not written: {e}")

    def _write_csv(self):
        keys = sorted(SPACE)
        with open(self.save_dir / "tune_results.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["fitness"] + keys)
            for fit, hyp in self.results:
                w.writerow([fit] + [hyp.get(k, "") for k in keys])
