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


# ---------------------------------------------------------------------------
# Reference utils/__init__.py platform tail (:141-1367): container/base
# classes, YAML io, decorators, env detection. Egress-touching members
# (Sentry, online checks) answer honestly for this offline environment.
# ---------------------------------------------------------------------------


class SimpleClass:
    """Readable repr + attribute-error help base (reference
    utils/__init__.py SimpleClass)."""

    def __str__(self):
        attrs = []
        for a in dir(self):
            v = getattr(self, a)
            if not callable(v) and not a.startswith("_"):
                attrs.append(f"{a}: {v.__class__.__module__}.{v.__class__.__name__} object"
                             if isinstance(v, SimpleClass) else f"{a}: {v!r}")
        return f"{self.__class__.__module__}.{self.__class__.__name__} object with attributes:\n\n" + "\n".join(attrs)

    def __repr__(self):
        return self.__str__()

    def __getattr__(self, attr):
        raise AttributeError(f"'{self.__class__.__name__}' object has no attribute '{attr}'. See valid attributes below.\n{self.__doc__}")


class IterableSimpleNamespace:
    """Namespace that iterates like dict items (reference
    utils/__init__.py IterableSimpleNamespace — the cfg container type)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def __eq__(self, other):
        return vars(self) == vars(other)

    def get(self, key, default=None):
        return getattr(self, key, default)


def yaml_load(file="data.yaml", append_filename: bool = False) -> dict:
    """Load YAML, ignoring characters outside printable ASCII range like
    the reference does (utils/__init__.py:466)."""
    import re

    import yaml

    from pathlib import Path

    assert str(file).endswith((".yaml", ".yml")), f"not a YAML file: {file}"
    s = Path(file).read_text(encoding="utf-8", errors="ignore")
    if not s.isprintable():
        s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-퟿-�\U00010000-\U0010ffff]+", "", s)
    data = yaml.safe_load(s) or {}
    if append_filename:
        data["yaml_file"] = str(file)
    return data


def yaml_save(file="data.yaml", data=None, header: str = ""):
    """Save dict to YAML, stringifying non-serializable values
    (reference utils/__init__.py:507)."""
    from pathlib import Path

    import yaml

    data = data or {}
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) or not isinstance(v, (int, float, str, bool, list, dict, tuple, type(None))) else v)
             for k, v in data.items()}
    with open(file, "w", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(yaml_file) -> None:
    """Pretty-print a YAML file or dict (reference utils/__init__.py:538)."""
    import yaml

    data = yaml_load(yaml_file) if isinstance(yaml_file, (str,)) else dict(yaml_file)
    LOGGER.info(f"Printing '{colorstr('bold', 'black', yaml_file)}'\n\n{yaml.safe_dump(data, sort_keys=False, allow_unicode=True)}")


class TryExcept:
    """Context manager / decorator that logs instead of raising
    (reference utils/__init__.py TryExcept)."""

    def __init__(self, msg: str = "", verbose: bool = True):
        self.msg = msg
        self.verbose = verbose

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapped(*a, **kw):
            with self:
                return func(*a, **kw)

        return wrapped

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, traceback):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Retry:
    """Retry decorator with exponential backoff (reference
    utils/__init__.py:955)."""

    def __init__(self, times: int = 3, delay: int = 2):
        self.times = times
        self.delay = delay

    def __call__(self, func):
        import functools
        import time as _time

        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            attempts = 0
            while attempts < self.times:
                try:
                    return func(*args, **kwargs)
                except Exception as e:
                    attempts += 1
                    if attempts >= self.times:
                        raise
                    LOGGER.warning(f"Retry {attempts}/{self.times} failed: {e}")
                    _time.sleep(self.delay * (2**attempts))

        return wrapped


def threaded(func):
    """Run decorated function in a daemon thread unless threaded=False
    (reference utils/__init__.py threaded)."""
    import functools
    import threading

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if kwargs.pop("threaded", True):
            t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
            t.start()
            return t
        return func(*args, **kwargs)

    return wrapper


class ThreadingLocked:
    """Decorator serializing calls across threads (reference
    utils/__init__.py:432)."""

    def __init__(self):
        import threading

        self.lock = threading.Lock()

    def __call__(self, f):
        import functools

        @functools.wraps(f)
        def decorated(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return decorated


def emojis(string: str = "") -> str:
    """Platform-safe string: strips emoji on Windows (reference
    utils/__init__.py:851-adjacent)."""
    import platform

    return string.encode().decode("ascii", "ignore") if platform.system() == "Windows" else string


def remove_colorstr(input_string: str) -> str:
    """Strip ANSI escape codes (reference utils/__init__.py:880)."""
    import re

    return re.compile(r"\x1B\[[0-9;]*[A-Za-z]").sub("", input_string)


def clean_url(url) -> str:
    """Strip auth credentials and ?query from a URL (reference
    utils/__init__.py clean_url)."""
    import re
    import urllib.parse

    url = re.sub(r":/(?!/)", "://", str(url))  # 'https:/x' -> 'https://x'
    return urllib.parse.unquote(url).split("?", 1)[0]


def url2file(url) -> str:
    """URL -> local filename (reference utils/__init__.py url2file)."""
    from pathlib import Path

    return Path(clean_url(url)).name


def is_dir_writeable(dir_path) -> bool:
    """reference utils/__init__.py:700."""
    import os

    return os.access(str(dir_path), os.W_OK)


def is_online() -> bool:
    """Honest in a zero-egress environment: False (reference
    utils/__init__.py is_online pings DNS)."""
    return False


def is_docker() -> bool:
    from pathlib import Path

    try:
        return Path("/.dockerenv").exists() or "docker" in Path("/proc/self/cgroup").read_text()
    except Exception:
        return False


def is_colab() -> bool:
    import os

    return "COLAB_RELEASE_TAG" in os.environ or "COLAB_BACKEND_VERSION" in os.environ


def is_kaggle() -> bool:
    import os

    return os.environ.get("PWD") == "/kaggle/working"


def is_jupyter() -> bool:
    import sys

    return "ipykernel" in sys.modules


def is_pytest_running() -> bool:
    import os
    import sys

    return "PYTEST_CURRENT_TEST" in os.environ or "pytest" in sys.modules


def is_github_action_running() -> bool:
    import os

    return "GITHUB_ACTIONS" in os.environ and "GITHUB_WORKFLOW" in os.environ


def get_user_config_dir(sub_dir: str = "yolo_tpu"):
    """Platform config dir, honoring YOLO_CONFIG_DIR (reference
    utils/__init__.py:1160)."""
    import os
    from pathlib import Path

    if env := os.environ.get("YOLO_CONFIG_DIR"):
        return Path(env) / sub_dir
    return Path(os.environ.get("XDG_CONFIG_HOME", Path.home() / ".config")) / sub_dir


def deprecation_warn(arg: str, new_arg: str = None):
    """reference utils/__init__.py deprecation_warn."""
    msg = f"'{arg}' is deprecated and will be removed in the future."
    if new_arg:
        msg += f" Use '{new_arg}' instead."
    LOGGER.warning(msg)


def get_default_args(func) -> dict:
    """Argument-name -> default mapping (reference utils/__init__.py)."""
    import inspect

    return {
        k: v.default
        for k, v in inspect.signature(func).parameters.items()
        if v.default is not inspect.Parameter.empty
    }


def plt_settings(rcparams=None, backend: str = "Agg"):
    """Decorator running a plotting function under a temporary matplotlib
    backend + rcParams (reference utils/__init__.py plt_settings)."""
    if rcparams is None:
        rcparams = {"font.size": 11}

    def decorator(func):
        import functools

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            import matplotlib
            import matplotlib.pyplot as plt

            original = matplotlib.get_backend()
            switch = backend.lower() != original.lower()
            if switch:
                plt.close("all")
                plt.switch_backend(backend)
            try:
                with plt.rc_context(rcparams):
                    return func(*args, **kwargs)
            finally:
                if switch:
                    plt.close("all")
                    plt.switch_backend(original)

        return wrapper

    return decorator
