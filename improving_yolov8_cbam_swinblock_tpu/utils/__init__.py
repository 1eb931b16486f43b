"""Platform utilities: console logging + progress (reference
ultralytics/utils/__init__.py:141 TQDM, :356-422 set_logging/LOGGER,
:851 colorstr).

The reference gates console output on DDP rank; here the analog is
`jax.process_index() == 0`, checked lazily so importing this module
never initializes a JAX backend.
"""

from __future__ import annotations

import logging
import os
import sys
import time

__all__ = ["LOGGER", "TQDM", "check_yolo", "colorstr", "set_logging"]

VERBOSE = str(os.getenv("YOLO_VERBOSE", True)).lower() == "true"


def _is_main_process() -> bool:
    # lazy: jax.process_index() would force backend init at import time
    try:
        import jax

        if getattr(jax._src.xla_bridge, "_backends", None):  # backend already up
            return jax.process_index() == 0
    except Exception:
        pass
    return True


class _StdoutProxy:
    """Delegates to the *current* sys.stdout at write time, so stream
    redirection (pytest capture, contextlib.redirect_stdout) works even
    though the handler outlives the redirect."""

    def write(self, s):
        return sys.stdout.write(s)

    def flush(self):
        return sys.stdout.flush()


def set_logging(name: str = "yolo", verbose: bool = True) -> logging.Logger:
    """Stream logger on stdout with a bare message format (reference
    set_logging, utils/__init__.py:356-422)."""
    level = logging.INFO if verbose and _is_main_process() else logging.ERROR
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler(_StdoutProxy())
        h.setFormatter(logging.Formatter("%(message)s"))
        h.setLevel(level)
        logger.addHandler(h)
    logger.propagate = False
    return logger


LOGGER = set_logging("yolo", VERBOSE)


def check_yolo():
    """System/environment summary (reference `ultralytics.checks` ->
    checks.check_yolo + collect_system_info, utils/checks.py): python,
    platform, JAX backend + devices, key library versions."""
    import platform

    import jax

    LOGGER.info(f"python {platform.python_version()} on {platform.platform()}")
    LOGGER.info(f"jax {jax.__version__}, backend {jax.default_backend()}, devices {jax.device_count()}")
    for lib in ("flax", "optax", "numpy", "cv2"):
        try:
            mod = __import__(lib)
            LOGGER.info(f"{lib} {getattr(mod, '__version__', '?')}")
        except Exception:
            LOGGER.info(f"{lib} MISSING")


def colorstr(*input):
    """ANSI-colored string, e.g. colorstr('blue', 'bold', 'hello')
    (reference utils/__init__.py:851)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors.get(x, "") for x in args) + f"{string}" + colors["end"]


class TQDM:
    """Minimal tqdm-compatible progress bar (reference wraps tqdm with
    project defaults, utils/__init__.py:141). Renders a carriage-return
    bar on stderr when attached to a TTY, falls back to silent iteration
    otherwise; always usable as an iterator or a manual .update() bar."""

    def __init__(self, iterable=None, total=None, desc: str = "", disable: bool = False,
                 bar_format: str = None, unit: str = "it", leave: bool = True):
        self.iterable = iterable
        self.total = total if total is not None else (len(iterable) if hasattr(iterable, "__len__") else None)
        self.desc = desc
        self.disable = disable or not VERBOSE or not _is_main_process()
        self.unit = unit
        self.leave = leave
        self.n = 0
        self._t0 = time.time()
        self._last_render = 0.0
        self._isatty = getattr(sys.stderr, "isatty", lambda: False)()

    # -- context manager / iterator protocols -------------------------
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        for x in self.iterable:
            yield x
            self.update(1)
        self.close()

    # -- rendering ----------------------------------------------------
    def set_description(self, desc: str):
        self.desc = desc
        self._render(force=True)

    def update(self, n: int = 1):
        self.n += n
        self._render()

    def _render(self, force: bool = False):
        if self.disable or not self._isatty:
            return
        now = time.time()
        if not force and now - self._last_render < 0.1:  # 10 Hz cap
            return
        self._last_render = now
        elapsed = now - self._t0
        rate = self.n / elapsed if elapsed > 0 else 0.0
        if self.total:
            frac = min(self.n / self.total, 1.0)
            nbar = 10
            bar = "█" * int(frac * nbar) + "░" * (nbar - int(frac * nbar))
            msg = f"\r{self.desc} {bar} {self.n}/{self.total} {rate:.1f}{self.unit}/s"
        else:
            msg = f"\r{self.desc} {self.n}{self.unit} {rate:.1f}{self.unit}/s"
        sys.stderr.write(msg[:160])
        sys.stderr.flush()

    def close(self):
        if self.disable or not self._isatty:
            return
        self._render(force=True)
        sys.stderr.write("\n" if self.leave else "\r" + " " * 80 + "\r")
        sys.stderr.flush()
