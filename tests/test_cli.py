"""CLI e2e: verb-compatible `yolo TASK MODE k=v` entrypoint across tasks
plus the settings / cfg verbs (reference tests/test_cli.py philosophy)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _run(*args, env_extra=None, timeout=600):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, str(REPO / "yolo"), *args],
        capture_output=True, text=True, cwd=str(REPO), env=env, timeout=timeout,
    )


def test_help_version_cfg():
    assert _run("help").returncode == 0
    r = _run("version")
    assert r.returncode == 0 and r.stdout.strip()
    r = _run("cfg")
    assert r.returncode == 0 and "lr0" in r.stdout


def test_settings_verb(tmp_path):
    env = {"XDG_CONFIG_HOME": str(tmp_path)}
    r = _run("settings", env_extra=env)
    assert r.returncode == 0
    s = json.loads(r.stdout[r.stdout.index("{"):])
    assert "runs_dir" in s
    r = _run("settings", "tensorboard=False", env_extra=env)
    assert r.returncode == 0
    assert json.loads(r.stdout[r.stdout.index("{"):])["tensorboard"] is False
    r = _run("settings", "reset", env_extra=env)
    assert json.loads(r.stdout[r.stdout.index("{"):])["tensorboard"] is True


def test_unknown_key_suggestion(tiny_dataset):
    r = _run("detect", "train", f"data={tiny_dataset}", "epoches=1")
    assert r.returncode != 0
    assert "did you mean" in (r.stderr + r.stdout)
    assert "epochs" in (r.stderr + r.stdout)


def test_train_predict_cli(tiny_dataset, tmp_path):
    r = _run(
        "detect", "train", f"data={tiny_dataset}", "model=yolov8n.yaml",
        "epochs=1", "imgsz=96", "batch=4", "workers=2", "optimizer=SGD",
        f"project={tmp_path / 'runs'}", "name=cli", "amp=False", "max_gt=8",
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt = tmp_path / "runs" / "cli" / "weights" / "last.ckpt"
    assert ckpt.exists()

    import cv2

    img = np.random.default_rng(0).integers(0, 255, (100, 120, 3), dtype=np.uint8)
    src = tmp_path / "img.jpg"
    cv2.imwrite(str(src), img)
    r = _run("detect", "predict", f"model={ckpt}", f"source={src}", "imgsz=96", "conf=0.001", timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "detections" in r.stdout


def test_cli_login_logout(tmp_path):
    """yolo login <key> / yolo logout persist the api_key setting
    (reference handle_yolo_hub, cfg/__init__.py:545)."""
    env = {"XDG_CONFIG_HOME": str(tmp_path)}
    r = _run("login", "k" * 42, env_extra=env)
    assert r.returncode == 0 and "logged in" in r.stdout
    r = _run("settings", env_extra=env)
    assert '"api_key": "' + "k" * 42 + '"' in r.stdout
    r = _run("hub", "logout", env_extra=env)
    assert r.returncode == 0 and "logged out" in r.stdout
