"""run_ray_tune orchestration (reference utils/tuner.py run_ray_tune).

ray is not part of this image, so the test injects a minimal fake ray
package (same spirit as the reference's dockerized fake Triton server:
exercise our orchestration against a stand-in backend): uniform bounds
are recorded, the trainable runs once per sample at the space midpoint,
and ASHA scheduler arguments are captured for assertion.
"""

import sys
import types

import pytest


class _Uniform:
    def __init__(self, lo, hi):
        self.lo, self.hi = lo, hi


class _FakeTuner:
    last = None

    def __init__(self, trainable, param_space=None, tune_config=None):
        self.trainable = trainable
        self.param_space = param_space
        self.tune_config = tune_config
        _FakeTuner.last = self

    def fit(self):
        n = self.tune_config["num_samples"]
        results = []
        for _ in range(n):
            cfg = {
                k: (v.lo + v.hi) / 2 if isinstance(v, _Uniform) else v
                for k, v in self.param_space.items()
            }
            results.append(self.trainable(cfg))
        return results


def _install_fake_ray(monkeypatch):
    ray = types.ModuleType("ray")
    tune = types.ModuleType("ray.tune")
    schedulers = types.ModuleType("ray.tune.schedulers")

    store = {}

    def put(obj):
        store["obj"] = obj
        return "ref"

    ray.put = put
    ray.get = lambda ref: store["obj"]
    ray.shutdown = lambda: None
    ray.tune = tune

    tune.uniform = _Uniform
    tune.with_resources = lambda fn, res: fn
    tune.Tuner = _FakeTuner
    tune.TuneConfig = lambda scheduler=None, num_samples=10: {
        "scheduler": scheduler, "num_samples": num_samples,
    }

    captured = {}

    def asha(**kwargs):
        captured.update(kwargs)
        return ("asha", kwargs)

    schedulers.ASHAScheduler = asha
    tune.schedulers = schedulers

    monkeypatch.setitem(sys.modules, "ray", ray)
    monkeypatch.setitem(sys.modules, "ray.tune", tune)
    monkeypatch.setitem(sys.modules, "ray.tune.schedulers", schedulers)
    return captured


class _StubModel:
    """Facade stand-in: records train() configs, returns metrics."""

    def __init__(self):
        self.calls = []
        self.resets = 0

    def reset_callbacks(self):
        self.resets += 1

    def train(self, **cfg):
        self.calls.append(cfg)
        return {"fitness": 0.42, "mAP50-95": 0.4}


def test_run_ray_tune_orchestration(monkeypatch):
    captured = _install_fake_ray(monkeypatch)
    from improving_yolov8_cbam_swinblock_tpu.utils.ray_tune import run_ray_tune

    model = _StubModel()
    results = run_ray_tune(model, data="synth.yaml", max_samples=3, epochs=7, grace_period=2)

    assert len(results) == 3 and all(r["fitness"] == 0.42 for r in results)
    assert model.resets == 3 and len(model.calls) == 3
    # sampled hyps + pinned data/epochs reach train()
    cfg = model.calls[0]
    assert cfg["data"] == "synth.yaml" and cfg["epochs"] == 7
    assert 1e-5 < cfg["lr0"] < 1e-1 and 0.6 <= cfg["momentum"] <= 0.98
    # reference default-space keys all present (utils/tuner.py:59-84)
    for k in ("lrf", "weight_decay", "mosaic", "mixup", "copy_paste", "degrees", "shear"):
        assert k in cfg
    # ASHA configured like the reference (metric=fitness here, max mode)
    assert captured["metric"] == "fitness" and captured["mode"] == "max"
    assert captured["max_t"] == 7 and captured["grace_period"] == 2 and captured["reduction_factor"] == 3


def test_run_ray_tune_requires_data(monkeypatch):
    _install_fake_ray(monkeypatch)
    from improving_yolov8_cbam_swinblock_tpu.utils.ray_tune import run_ray_tune

    with pytest.raises(ValueError, match="data"):
        run_ray_tune(_StubModel())


def test_run_ray_tune_without_ray():
    """Without ray installed the call raises install guidance
    (reference utils/tuner.py:48-49)."""
    try:
        import ray  # noqa: F401

        pytest.skip("real ray present")
    except ImportError:
        pass
    from improving_yolov8_cbam_swinblock_tpu.utils.ray_tune import run_ray_tune

    with pytest.raises(ModuleNotFoundError, match="ray"):
        run_ray_tune(_StubModel(), data="synth.yaml")
