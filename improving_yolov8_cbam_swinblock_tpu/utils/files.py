"""Run-directory and path utilities.

TPU-native analog of the reference `utils/files.py` (increment_path
files.py:107, get_latest_run) plus the reference `cfg/__init__.py:389
get_save_dir` policy: every train/predict/val run gets its own
`runs/{task}/{name}{N}` directory unless `exist_ok` (or a resume)
pins it.
"""

from __future__ import annotations

from pathlib import Path


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... (reference files.py:107).

    Files keep their suffix (results.txt -> results2.txt). With
    exist_ok=True the path is returned unchanged.
    """
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = Path(f"{path}{sep}{n}{suffix}")
            if not p.exists():
                path = p
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def get_save_dir(args, mode: str = "train") -> Path:
    """Resolve the run directory from (project, name, exist_ok, resume)
    the way the reference does (cfg/__init__.py:389): project defaults to
    runs/{task}, name to the mode verb, and the result increments unless
    exist_ok or an explicit resume pins it."""
    project = getattr(args, "project", None) or f"runs/{getattr(args, 'task', None) or 'detect'}"
    name = getattr(args, "name", None) or mode
    exist_ok = bool(getattr(args, "exist_ok", False)) or bool(getattr(args, "resume", False))
    return increment_path(Path(project) / name, exist_ok=exist_ok)


# ---------------------------------------------------------------------------
# Reference utils/files.py parity tail (WorkingDirectory files.py:23,
# spaces_in_path :56, file_age/file_date/file_size :94-130, update_models
# :160; get_latest_run lives in utils/model_utils.py and is re-exported
# here for reference-path imports)
# ---------------------------------------------------------------------------

import contextlib
import os
import shutil
import tempfile
from datetime import datetime

from .model_utils import get_latest_run  # noqa: F401  (reference import path)


class WorkingDirectory(contextlib.ContextDecorator):
    """cd into `new_dir` for the context / decorated function, restoring
    the previous cwd on exit (reference files.py:23)."""

    def __init__(self, new_dir):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, exc_type, exc_val, exc_tb):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path):
    """Yield a space-free copy of `path` (spaces -> underscores) and copy
    results back on exit (reference files.py:56)."""
    if " " in str(path):
        string = isinstance(path, str)
        path = Path(path)
        with tempfile.TemporaryDirectory() as tmp_dir:
            tmp_path = Path(tmp_dir) / path.name.replace(" ", "_")
            if path.is_dir():
                shutil.copytree(path, tmp_path)
            elif path.is_file():
                tmp_path.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(path, tmp_path)
            try:
                yield str(tmp_path) if string else tmp_path
            finally:
                if tmp_path.is_dir():
                    shutil.copytree(tmp_path, path, dirs_exist_ok=True)
                elif tmp_path.is_file():
                    shutil.copy2(tmp_path, path)
    else:
        yield path


def file_age(path=__file__) -> int:
    """Days since last modification (reference files.py:94)."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path=__file__) -> str:
    """'YYYY-M-D' modification date (reference files.py:101)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path) -> float:
    """File or directory size in MB (reference files.py:108)."""
    path = Path(path)
    mb = 1 << 20
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def update_models(model_names=("yolov8n.ckpt",), source_dir=Path("."), update_names=False):
    """Re-save checkpoints into an 'updated_models' subdirectory through
    the current facade (reference files.py:160: load -> optionally refresh
    names -> model.save under updated_models/)."""
    from ..engine.model import YOLO

    target_dir = Path(source_dir) / "updated_models"
    target_dir.mkdir(parents=True, exist_ok=True)
    for model_name in model_names:
        model_path = Path(source_dir) / model_name
        model = YOLO(str(model_path))
        if update_names:
            from ..data.dataset import check_det_dataset

            model.model.names = check_det_dataset("coco8.yaml")["names"]
        save_path = target_dir / model_name
        model.save(str(save_path))
