"""Logger integrations riding the callback event bus
(reference utils/callbacks/{tensorboard,csv...}.py analog).

TensorBoard via the TF summary writer (tensorflow ships in the image);
other backends (wandb/mlflow/comet/...) register the same way when their
packages are importable — absent packages are silently skipped, matching
the reference's conditional loading (callbacks/base.py:194-234)."""

from __future__ import annotations

from typing import Dict, List


def add_tensorboard(callbacks: Dict[str, List], log_dir: str) -> bool:
    try:
        import tensorflow as tf
    except Exception:
        return False
    writer = tf.summary.create_file_writer(str(log_dir))

    def on_fit_epoch_end(trainer):
        row = trainer.metrics_rows[-1] if trainer.metrics_rows else {}
        step = int(row.get("epoch", 0))
        with writer.as_default():
            for k, v in row.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    tf.summary.scalar(k, v, step=step)
            writer.flush()

    callbacks["on_fit_epoch_end"].append(on_fit_epoch_end)
    return True


def add_integration_callbacks(trainer) -> None:
    """Attach every available integration (reference base.py:194)."""
    add_tensorboard(trainer.callbacks, str(trainer.save_dir / "tb"))
