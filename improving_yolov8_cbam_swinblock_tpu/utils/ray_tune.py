"""Ray Tune hyperparameter search (reference utils/tuner.py run_ray_tune).

The reference exposes two tuning paths: its own mutation Tuner
(engine/tuner.py here) and `model.tune(use_ray=True)` which drives
Ray Tune with an ASHA scheduler over a bounded uniform search space
(reference utils/tuner.py:7-147). This is the TPU-stack equivalent:
the trainable calls the facade's train() (one jitted step program per
trial) and reports the validator's `fitness` scalar, which every task
validator emits (engine/validator.py) — the reference's per-task
TASK2METRIC names collapse onto that one key here.

`ray` is an optional dependency (not part of this image); importing
this module is free, calling run_ray_tune without ray raises the same
ModuleNotFoundError guidance as the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

from . import LOGGER

__all__ = ["run_ray_tune"]


def _default_space(tune) -> Dict:
    """Reference default search space (utils/tuner.py:59-84) — bounded
    uniform priors over the training hyperparameters. The bounds are
    config data shared with the reference (same numbers its Tuner uses)."""
    return {
        "lr0": tune.uniform(1e-5, 1e-1),
        "lrf": tune.uniform(0.01, 1.0),
        "momentum": tune.uniform(0.6, 0.98),
        "weight_decay": tune.uniform(0.0, 0.001),
        "warmup_epochs": tune.uniform(0.0, 5.0),
        "warmup_momentum": tune.uniform(0.0, 0.95),
        "box": tune.uniform(0.02, 0.2),
        "cls": tune.uniform(0.2, 4.0),
        "hsv_h": tune.uniform(0.0, 0.1),
        "hsv_s": tune.uniform(0.0, 0.9),
        "hsv_v": tune.uniform(0.0, 0.9),
        "degrees": tune.uniform(0.0, 45.0),
        "translate": tune.uniform(0.0, 0.9),
        "scale": tune.uniform(0.0, 0.9),
        "shear": tune.uniform(0.0, 10.0),
        "perspective": tune.uniform(0.0, 0.001),
        "flipud": tune.uniform(0.0, 1.0),
        "fliplr": tune.uniform(0.0, 1.0),
        "mosaic": tune.uniform(0.0, 1.0),
        "mixup": tune.uniform(0.0, 1.0),
        "copy_paste": tune.uniform(0.0, 1.0),
    }


def run_ray_tune(
    model,
    space: Optional[Dict] = None,
    grace_period: int = 10,
    gpu_per_trial: Optional[int] = None,
    max_samples: int = 10,
    **train_args,
):
    """Distributed hyperparameter search via Ray Tune + ASHA
    (reference utils/tuner.py run_ray_tune).

    model: a YOLO facade instance; each trial re-trains it with sampled
    hyperparameters and is scored by validator fitness (maximized).
    Returns the ray ResultGrid.
    """
    try:
        import ray
        from ray import tune
        from ray.tune.schedulers import ASHAScheduler
    except ImportError:
        raise ModuleNotFoundError(
            'Ray Tune required but not found. To install run: pip install "ray[tune]"'
        )

    train_args = dict(train_args)
    data = train_args.get("data")
    if data is None:
        raise ValueError("run_ray_tune needs data=... (no dataset downloads in this stack)")

    if not space:
        space = _default_space(tune)
        LOGGER.warning("search space not provided, using default search space")
    space = dict(space)
    space["data"] = data

    model_in_store = ray.put(model)

    def _tune(config):
        """One trial: train with sampled hyps, report final metrics
        (reference utils/tuner.py:92-98 _tune)."""
        trial_model = ray.get(model_in_store)
        trial_model.reset_callbacks()
        cfg = {**config, **train_args}
        metrics = trial_model.train(**cfg)
        # train() returns the final validator metrics dict incl. fitness
        return {"fitness": float(metrics.get("fitness", 0.0)), **{
            k: float(v) for k, v in metrics.items() if isinstance(v, (int, float))
        }}

    trainable = tune.with_resources(_tune, {"cpu": 1, "gpu": gpu_per_trial or 0})
    scheduler = ASHAScheduler(
        time_attr="epoch",
        metric="fitness",
        mode="max",
        max_t=int(train_args.get("epochs", 100)),
        grace_period=grace_period,
        reduction_factor=3,
    )
    tuner = tune.Tuner(
        trainable,
        param_space=space,
        tune_config=tune.TuneConfig(scheduler=scheduler, num_samples=max_samples),
    )
    results = tuner.fit()
    try:
        ray.shutdown()
    except Exception:  # noqa: BLE001 — shutdown best-effort like the reference
        pass
    return results
