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


# ---------------------------------------------------------------------------
# Reference checks.py parity tail. Egress-dependent checks (PyPI versions,
# font downloads) answer honestly offline; CUDA probes report the truth on
# a TPU host (0 devices) with the accelerator count exposed separately.
# ---------------------------------------------------------------------------


def parse_requirements(file_path=None, package: str = "") -> List:
    """Parse a requirements.txt (or an installed package's Requires-Dist
    metadata) into [(name, specifier), ...] (reference checks.py:60)."""
    from types import SimpleNamespace

    lines: List[str] = []
    if package:
        try:
            from importlib import metadata

            lines = [
                r.split(";")[0].strip()
                for r in (metadata.distribution(package).requires or [])
                if "extra ==" not in r
            ]
        except Exception:
            return []
    elif file_path is not None:
        lines = Path(file_path).read_text().splitlines()
    out = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        line = line.split("#")[0].strip()
        m = re.match(r"([a-zA-Z0-9-_\.\[\]]+)\s*(.*)", line)
        if m:
            out.append(SimpleNamespace(name=m.group(1), specifier=m.group(2).strip()))
    return out


def check_requirements(requirements=(), exclude=(), install: bool = True, cmds: str = "") -> bool:
    """Verify requirements are importable/installed (reference
    checks.py:350). No egress in this environment, so missing packages are
    reported (returns False) instead of auto-installed."""
    from importlib import metadata

    if isinstance(requirements, (str, Path)) and str(requirements).endswith(".txt"):
        requirements = [f"{r.name}{r.specifier}" for r in parse_requirements(requirements)]
    elif isinstance(requirements, str):
        requirements = [requirements]
    missing = []
    for r in requirements:
        m = re.match(r"([a-zA-Z0-9-_\.]+)\s*(.*)", str(r))
        name, spec = m.group(1), m.group(2).strip()
        if name in exclude:
            continue
        try:
            current = metadata.version(name)
            if spec and not check_version(current, spec, name=name, hard=False):
                missing.append(str(r))
        except metadata.PackageNotFoundError:
            missing.append(str(r))
    if missing:
        LOGGER.warning(
            f"requirements not satisfied (no-egress environment, install skipped): {missing}"
        )
        return False
    return True


def check_torchvision():
    """Reference checks.py:429 validates torch/torchvision compatibility;
    this framework's compute path is JAX so there is nothing to pair —
    kept as a no-op for API compatibility."""
    return None


def check_font(font: str = "Arial.ttf"):
    """Resolve a font path for the Annotator. The reference downloads from
    its assets CDN (checks.py:450); offline, this searches matplotlib's
    bundled fonts and returns None when unavailable (Annotator then uses
    cv2's Hershey fonts)."""
    try:
        import matplotlib

        base = Path(matplotlib.get_data_path()) / "fonts" / "ttf"
        stem = Path(font).stem.lower()
        for cand in base.glob("*.ttf"):
            if stem in cand.stem.lower():
                return cand
        hits = sorted(base.glob("DejaVuSans.ttf"))
        return hits[0] if hits else None
    except Exception:
        return None


def check_latest_pypi_version(package_name: str = "ultralytics") -> str:
    """No egress: returns the empty string (reference checks.py:480 polls
    PyPI's JSON API)."""
    return ""


def check_pip_update_available() -> bool:
    """No egress: never reports an update (reference checks.py:495)."""
    return False


def check_model_file_from_stem(model: str = "yolov8n") -> str:
    """'yolov8n' -> 'yolov8n.yaml' here: the TPU build constructs from
    YAML + .ckpt rather than fetching .pt assets (reference
    checks.py:545 appends .pt)."""
    if model and not Path(model).suffix:
        try:
            from ..nn.tasks import yaml_model_load

            yaml_model_load(f"{model}.yaml")
            return f"{model}.yaml"
        except Exception:
            return model
    return model


def check_yolov5u_filename(file: str = "", verbose: bool = True) -> str:
    """Map yolov5 names to their u-variant (reference checks.py:520:
    yolov5n.pt -> yolov5nu.pt); here the YAML zoo carries the u-suffix-free
    graphs, so names pass through with the same substitution rule."""
    if "yolov3" in file or "yolov5" in file:
        if "u" not in file.partition(".")[0][-2:]:
            original = file
            file = re.sub(r"(.*yolov5([nsmlx]))\.", r"\1u.", file)
            file = re.sub(r"(.*yolov5([nsmlx])6)\.", r"\1u.", file)
            file = re.sub(r"(.*yolov3(|-tiny|-spp))\.", r"\1u.", file)
            if file != original and verbose:
                LOGGER.info(f"renaming {original} -> {file} (u-variant trained weights)")
    return file


def cuda_device_count() -> int:
    """Number of CUDA devices — honestly 0 on a TPU host (reference
    checks.py:700 parses nvidia-smi). Use accelerator_count() for the
    devices this framework actually computes on."""
    import shutil as _shutil
    import subprocess

    if _shutil.which("nvidia-smi") is None:
        return 0
    try:
        out = subprocess.run(
            ["nvidia-smi", "--query-gpu=count", "--format=csv,noheader,nounits"],
            capture_output=True, text=True, timeout=5,
        )
        return int(out.stdout.strip().split("\n")[0])
    except Exception:
        return 0


def cuda_is_available() -> bool:
    """reference checks.py:720."""
    return cuda_device_count() > 0


def accelerator_count() -> int:
    """Devices visible to JAX (the TPU-native analog of cuda_device_count)."""
    import jax

    return jax.device_count()


def is_rockchip() -> bool:
    """Rockchip SoC detection for RKNN export targets (reference
    checks.py:735 reads /proc/device-tree/compatible)."""
    try:
        compat = Path("/proc/device-tree/compatible").read_bytes().lower()
        return b"rockchip" in compat
    except Exception:
        return False


def is_sudo_available() -> bool:
    """reference checks.py:750."""
    import shutil as _shutil

    return _shutil.which("sudo") is not None


def git_describe(path=None) -> str:
    """'git describe --tags --long --always' of `path`'s repo, '' outside
    one (reference torch_utils.py git_describe)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", str(path or Path(__file__).parent), "describe", "--tags", "--long", "--always"],
            capture_output=True, text=True, timeout=5,
        )
        return out.stdout.strip() if out.returncode == 0 else ""
    except Exception:
        return ""


def _mem_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal"):
                    return round(int(line.split()[1]) / 1024 / 1024, 2)
    except Exception:
        pass
    return 0.0


def collect_system_info() -> dict:
    """Log + return a system/environment summary (reference checks.py:600:
    OS, python, RAM, CPU, install type, accelerator table)."""
    import os
    import platform

    import jax

    from .. import __version__

    devs = jax.devices()
    info = {
        "OS": platform.platform(),
        "Python": platform.python_version(),
        "RAM": f"{_mem_gb():.2f} GB",
        "CPU": platform.processor() or platform.machine(),
        "CPU count": os.cpu_count(),
        "Package": f"improving_yolov8_cbam_swinblock_tpu {__version__}",
        "JAX": jax.__version__,
        "Accelerators": f"{len(devs)}x {devs[0].platform}" if devs else "none",
        "CUDA": cuda_device_count() or None,
        "Git": git_describe() or None,
    }
    for k, v in info.items():
        LOGGER.info(f"{k:<15}{v}")
    return info


def check_amp(model=None, imgsz: int = 64) -> bool:
    """bf16 sanity check — the TPU analog of the reference's CUDA AMP
    probe (checks.py:704-778: fp32 vs autocast forward on an asset image,
    disable AMP on divergence/NaN). bf16 on TPU needs no loss scaling, so
    this validates numerics rather than gating a GradScaler: runs the
    flagship graph fp32 vs bf16 on random input and reports whether the
    outputs agree within bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..nn.tasks import DetectionModel

    try:
        m32 = model or DetectionModel("yolov8n.yaml")
        v = m32.init(jax.random.PRNGKey(0), imgsz=imgsz)
        x = jnp.asarray(np.random.default_rng(0).random((1, imgsz, imgsz, 3)), jnp.float32)
        y32, _ = m32.apply(v, x, train=False)
        mbf = DetectionModel(m32.cfg_name if hasattr(m32, "cfg_name") else "yolov8n.yaml", dtype=jnp.bfloat16)
        ybf, _ = mbf.apply(v, x, train=False)
        a, b = np.asarray(y32, np.float32), np.asarray(ybf, np.float32)
        if not np.isfinite(b).all():
            LOGGER.warning("check_amp: bf16 forward produced non-finite values")
            return False
        denom = np.abs(a).mean() + 1e-6
        rel = np.abs(a - b).mean() / denom
        ok = bool(rel < 0.1)
        if not ok:
            LOGGER.warning(f"check_amp: bf16 drift {rel:.3f} exceeds tolerance")
        return ok
    except Exception as e:  # pragma: no cover
        LOGGER.warning(f"check_amp skipped: {e}")
        return True
