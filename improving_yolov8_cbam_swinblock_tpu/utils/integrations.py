"""Logger integrations riding the callback event bus
(reference utils/callbacks/{tensorboard,wandb,mlflow,comet,clearml,dvc,
neptune}.py, 9 backends hooked via base.py:194-234).

Each backend registers the same lifecycle hooks; backends whose package
is not importable are silently skipped, exactly like the reference's
conditional loading. In this image only TensorBoard (via tensorflow) and
the dependency-free JSONL logger are live; the wandb/mlflow/comet/
clearml/dvc/neptune adapters activate automatically when their packages
exist (their hook bodies are complete, not stubs)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List


def _epoch_row(trainer) -> Dict:
    return trainer.metrics_rows[-1] if trainer.metrics_rows else {}


def _scalars(row: Dict) -> Dict[str, float]:
    return {k: v for k, v in row.items() if isinstance(v, (int, float)) and k != "epoch"}


def add_tensorboard(callbacks: Dict[str, List], log_dir: str) -> bool:
    try:
        import tensorflow as tf
    except Exception:
        return False
    writer = tf.summary.create_file_writer(str(log_dir))

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        step = int(row.get("epoch", 0))
        with writer.as_default():
            for k, v in _scalars(row).items():
                tf.summary.scalar(k, v, step=step)
            writer.flush()

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    return True


def add_jsonl(callbacks: Dict[str, List], log_path: str) -> bool:
    """Dependency-free structured log: one JSON object per epoch
    (this stack's replacement for hosted loggers in egress-free envs)."""
    path = Path(log_path)

    def on_fit_epoch_end(trainer):
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as fh:
            fh.write(json.dumps(_epoch_row(trainer)) + "\n")

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    return True


def add_wandb(callbacks: Dict[str, List], project: str, name: str) -> bool:
    try:
        import wandb
    except Exception:
        return False
    run = wandb.init(project=project.replace("/", "-"), name=name, resume="allow")

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        run.log(_scalars(row), step=int(row.get("epoch", 0)))

    def on_train_end(trainer):
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            art = wandb.Artifact(f"run_{run.id}_model", type="model")
            art.add_file(str(best))
            run.log_artifact(art, aliases=["best"])
        run.finish()

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    callbacks["on_train_end"].append(on_train_end)
    return True


def add_mlflow(callbacks: Dict[str, List], experiment: str, run_name: str) -> bool:
    try:
        import mlflow
    except Exception:
        return False
    mlflow.set_experiment(experiment or "/Shared/YOLO")
    active = mlflow.start_run(run_name=run_name)

    def on_pretrain_routine_end(trainer):
        mlflow.log_params({k: str(v) for k, v in vars(trainer.args).items()})

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        mlflow.log_metrics(
            {k.replace("(", "").replace(")", ""): float(v) for k, v in _scalars(row).items()},
            step=int(row.get("epoch", 0)),
        )

    def on_train_end(trainer):
        for f in (trainer.wdir / "best.ckpt", trainer.save_dir / "results.csv"):
            if f.exists():
                mlflow.log_artifact(str(f))
        mlflow.end_run()

    callbacks["on_pretrain_routine_end"].append(on_pretrain_routine_end)
    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    callbacks["on_train_end"].append(on_train_end)
    return True


def add_comet(callbacks: Dict[str, List], project: str) -> bool:
    try:
        import comet_ml
    except Exception:
        return False
    exp = comet_ml.Experiment(project_name=project or "yolo")

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        exp.log_metrics(_scalars(row), epoch=int(row.get("epoch", 0)))

    def on_train_end(trainer):
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            exp.log_model("best", str(best))
        exp.end()

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    callbacks["on_train_end"].append(on_train_end)
    return True


def add_clearml(callbacks: Dict[str, List], project: str, name: str) -> bool:
    try:
        from clearml import Task
    except Exception:
        return False
    task = Task.init(project_name=project or "YOLO", task_name=name or "train")

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        for k, v in _scalars(row).items():
            task.get_logger().report_scalar("train", k, v, iteration=int(row.get("epoch", 0)))

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    return True


def add_dvc(callbacks: Dict[str, List]) -> bool:
    try:
        from dvclive import Live
    except Exception:
        return False
    live = Live(save_dvc_exp=True)

    def on_fit_epoch_end(trainer):
        for k, v in _scalars(_epoch_row(trainer)).items():
            live.log_metric(k, v)
        live.next_step()

    def on_train_end(trainer):
        live.end()

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    callbacks["on_train_end"].append(on_train_end)
    return True


def add_neptune(callbacks: Dict[str, List], project: str, name: str) -> bool:
    try:
        import neptune
    except Exception:
        return False
    run = neptune.init_run(project=project, name=name)

    def on_fit_epoch_end(trainer):
        row = _epoch_row(trainer)
        for k, v in _scalars(row).items():
            run[f"train/{k}"].append(v, step=int(row.get("epoch", 0)))

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    return True


def add_integration_callbacks(trainer) -> None:
    """Attach every available integration (reference base.py:194-234)."""
    from .settings import SETTINGS

    cb = trainer.callbacks
    project = str(getattr(trainer.args, "project", "") or "runs")
    name = str(getattr(trainer.args, "name", "") or "train")
    if SETTINGS.get("tensorboard", True):
        add_tensorboard(cb, str(trainer.save_dir / "tb"))
    add_jsonl(cb, str(trainer.save_dir / "metrics.jsonl"))
    add_wandb(cb, project, name)
    add_mlflow(cb, project, name)
    add_comet(cb, project)
    add_clearml(cb, project, name)
    add_dvc(cb)
    add_neptune(cb, project, name)
