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
