"""Argument/environment checks (reference utils/checks.py).

The portable subset of the reference's checks: image-size stride
rounding, version parsing/comparison, suffix/YAML/file validation,
display detection, arg printing. Network-dependent checks
(pip/pypi/fonts/downloads) are N/A in this egress-free build; AMP and
CUDA checks are N/A on TPU (bf16 needs no loss scaling).
"""

from __future__ import annotations

import glob
import re
from pathlib import Path
from typing import List, Optional, Union

from . import LOGGER, check_yolo  # noqa: F401  (re-export: reference checks.check_yolo)


def parse_version(version: str = "0.0.0") -> tuple:
    """'2.0.1+cpu' -> (2, 0, 1) (reference checks.py:83)."""
    try:
        parts = [int(x) for x in re.findall(r"\d+", version)[:3]]
        return tuple(parts + [0] * (3 - len(parts)))
    except Exception:
        return (0, 0, 0)


def is_ascii(s) -> bool:
    """True when the string has only ASCII characters (reference :100)."""
    return all(ord(c) < 128 for c in str(s))


def check_imgsz(imgsz, stride: int = 32, min_dim: int = 1, max_dim: int = 2, floor: int = 0):
    """Round image size UP to the nearest stride multiple, warning when it
    changes (reference check_imgsz, checks.py:117). Accepts an int or a
    1/2-element list; returns the same structure."""
    import math

    stride = int(stride)
    if isinstance(imgsz, (int, float)):
        sizes = [int(imgsz)]
        scalar = True
    else:
        sizes = [int(v) for v in imgsz]
        scalar = False
    if len(sizes) > max_dim:
        raise ValueError(f"imgsz {imgsz} has {len(sizes)} dims, max_dim={max_dim}")
    if min_dim == 2 and len(sizes) == 1:
        sizes = sizes * 2
        scalar = False
    new = [max(math.ceil(v / stride) * stride, floor) for v in sizes]
    if new != sizes:
        LOGGER.warning(f"imgsz={sizes} must be multiple of max stride {stride}, updating to {new}")
    return new[0] if scalar else new


def check_version(
    current: str = "0.0.0",
    required: str = "0.0.0",
    name: str = "version",
    hard: bool = False,
    verbose: bool = False,
) -> bool:
    """Compare a version against constraints like '>=1.2,<2.0' or a bare
    minimum '8.0' (reference check_version, checks.py:171)."""
    if not current or not required:
        return True
    c = parse_version(current)
    ok = True
    for clause in required.split(","):
        m = re.match(r"([<>=!~]*)\s*([\d.]+)", clause.strip())
        if not m:
            continue
        op, ver = m.group(1) or ">=", parse_version(m.group(2))
        ok &= {
            "==": c == ver, "!=": c != ver, ">=": c >= ver, "": c >= ver,
            "<=": c <= ver, ">": c > ver, "<": c < ver, "~=": c[:2] == ver[:2],
        }.get(op, c >= ver)
    if not ok:
        msg = f"{name} {required} is required, but {name}=={current} is installed"
        if hard:
            raise ModuleNotFoundError(msg)
        if verbose:
            LOGGER.warning(msg)
    return ok


def check_python(minimum: str = "3.8.0", hard: bool = True) -> bool:
    """Current python vs a minimum (reference checks.py:332)."""
    import platform

    return check_version(platform.python_version(), f">={minimum}", name="Python", hard=hard)


def check_suffix(file: Union[str, List] = "model.ckpt", suffix=".ckpt", msg: str = ""):
    """Assert file(s) carry an accepted suffix (reference checks.py:450)."""
    if not (file and suffix):
        return
    if isinstance(suffix, str):
        suffix = (suffix,)
    for f in file if isinstance(file, (list, tuple)) else [file]:
        s = Path(f).suffix.lower().strip()
        if s and s not in suffix:
            raise ValueError(f"{msg}{f} acceptable suffix is {suffix}, not {s}")


def check_yaml(file, suffix=(".yaml", ".yml"), hard: bool = True):
    """Validate/resolve a YAML path (reference checks.py:552)."""
    return check_file(file, suffix, hard=hard)


def check_file(file, suffix="", hard: bool = True):
    """Resolve a file: exact path, or glob search under cwd and the
    package's cfg tree (reference check_file, checks.py:512 minus its
    download branch — no egress here)."""
    if suffix:
        check_suffix(file, suffix)
    file = str(file).strip()
    if not file or Path(file).exists():
        return file
    pkg_root = Path(__file__).parent.parent
    names = [Path(file).name]
    m = re.fullmatch(r"(.+?)([nslmx])(\.ya?ml)", names[0])
    if m:  # scale-suffixed model yaml: yolov8n.yaml -> yolov8.yaml
        names.append(m.group(1) + m.group(3))
    matches = []
    for nm in names:
        matches = glob.glob(str(pkg_root / "cfg" / "**" / nm), recursive=True) or glob.glob(
            f"**/{nm}", recursive=True
        )
        if matches:
            break
    if not matches:
        if hard:
            raise FileNotFoundError(f"'{file}' does not exist")
        return file
    return matches[0]


def check_is_path_safe(basedir, path) -> bool:
    """True when path resolves inside basedir — no traversal/symlink
    escape (reference checks.py:567)."""
    base = Path(basedir).resolve()
    p = Path(path).resolve()
    return p.parts[: len(base.parts)] == base.parts


def check_imshow(warn: bool = False) -> bool:
    """True when the environment can open display windows
    (reference checks.py:584)."""
    import os

    if os.environ.get("DISPLAY") is None:
        if warn:
            LOGGER.warning("Environment does not support cv2.imshow()")
        return False
    try:
        import cv2
        import numpy as np

        cv2.imshow("test", np.zeros((8, 8, 3), dtype="uint8"))
        cv2.destroyAllWindows()
        return True
    except Exception:
        if warn:
            LOGGER.warning("Environment does not support cv2.imshow()")
        return False


def print_args(args: Optional[dict] = None, show_file: bool = True):
    """Log a {k=v, ...} line for a call's arguments (reference
    checks.py:795)."""
    import inspect

    frame = inspect.currentframe().f_back
    if args is None:
        args, _, _, values = inspect.getargvalues(frame)
        args = {k: values[k] for k in args}
    fname = Path(frame.f_code.co_filename).stem if show_file else ""
    LOGGER.info((f"{fname}: " if fname else "") + ", ".join(f"{k}={v}" for k, v in args.items()))
    return args
