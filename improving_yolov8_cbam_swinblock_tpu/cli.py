"""CLI: `yolo TASK MODE k=v ...` — verb-compatible with the reference
entrypoint (reference cfg/__init__.py:828-989).

Examples:
    yolo detect train data=data.yaml model=yolov8s-cbam-swin.yaml epochs=10
    yolo detect val model=runs/detect/train/weights/best.ckpt data=data.yaml
    yolo detect predict model=best.ckpt source=imgs/ conf=0.25
    yolo export model=best.ckpt format=stablehlo
"""

from __future__ import annotations

import ast
import sys
from typing import Any, Dict

TASKS = {"detect", "segment", "pose", "obb", "classify"}
MODES = {"train", "val", "predict", "track", "export", "benchmark"}


def smart_value(v: str) -> Any:
    """k=v literal parsing (reference cfg/__init__.py:749-827)."""
    low = v.lower()
    if low == "none":
        return None
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def parse_args(argv) -> tuple[str, str, Dict[str, Any]]:
    task, mode = "detect", None
    overrides: Dict[str, Any] = {}
    for a in argv:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = smart_value(v)
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            raise SystemExit(f"unrecognized argument {a!r}; expected TASK ({TASKS}), MODE ({MODES}) or k=v")
    if mode is None:
        raise SystemExit(f"missing MODE; choose from {MODES}")
    return task, mode, overrides


def entrypoint(argv=None) -> int:
    # honor JAX_PLATFORMS=cpu authoritatively: the axon sitecustomize
    # force-registers the TPU regardless of the env var (CLAUDE.md), so
    # subprocess callers (tests, scripts) need the config-level override
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("help", "-h", "--help"):
        print(__doc__)
        return 0
    if argv[0] == "version":
        from . import __version__

        print(__version__)
        return 0
    if argv[0] == "settings":  # reference `yolo settings` verb (cfg/__init__.py:593)
        from .utils.settings import SETTINGS

        if len(argv) > 1 and argv[1] == "reset":
            SETTINGS.reset()
            print("settings reset to defaults")
        else:
            for a in argv[1:]:
                if "=" in a:
                    k, v = a.split("=", 1)
                    if k not in SETTINGS:
                        raise SystemExit(f"unknown setting {k!r}; valid: {sorted(SETTINGS)}")
                    SETTINGS.update({k: smart_value(v)})
            SETTINGS.save()
        print(__import__("json").dumps(dict(SETTINGS), indent=2))
        return 0
    if argv[0] == "cfg":  # print effective defaults (reference `yolo cfg`)
        from .cfg import DEFAULT_CFG_PATH

        print(DEFAULT_CFG_PATH.read_text())
        return 0
    if argv[0] == "copy-cfg":  # writable copy of defaults (reference copy_default_cfg)
        import shutil
        from pathlib import Path

        from .cfg import DEFAULT_CFG_PATH

        dst = Path.cwd() / DEFAULT_CFG_PATH.name.replace(".yaml", "_copy.yaml")
        shutil.copy2(DEFAULT_CFG_PATH, dst)
        print(f"{dst} copied — pass cfg={dst.name} to override defaults")
        return 0
    if argv[0] == "checks":  # system info (reference checks.collect_system_info)
        from .utils import check_yolo as checks

        checks()
        return 0
    if argv[0] in ("login", "logout", "hub"):  # reference handle_yolo_hub (cfg/__init__.py:545)
        from . import hub

        args = argv[1:] if argv[0] != "hub" else argv[2:]
        verb = argv[0] if argv[0] != "hub" else (argv[1] if len(argv) > 1 else "")
        if verb == "login":
            ok = hub.login(args[0] if args else None)
            print("logged in" if ok else "login failed")
            return 0 if ok else 1
        if verb == "logout":
            hub.logout()
            print("logged out")
            return 0
        raise SystemExit(f"unknown hub verb {verb!r}; valid: login, logout")
    if argv[0] == "solutions":  # reference handle_yolo_solutions
        from . import solutions as _s

        names = sorted(n for n in dir(_s) if n[0].isupper())
        print("available solutions:", ", ".join(names))
        return 0
    task, mode, overrides = parse_args(argv)
    from .engine.model import YOLO

    model_path = overrides.pop("model", None) or "yolov8n.yaml"
    model = YOLO(model_path, task=task)
    if mode == "train":
        data = overrides.pop("data", None)
        if not data:
            raise SystemExit("train requires data=...")
        metrics = model.train(data=data, **overrides)
        print({k: round(v, 5) for k, v in metrics.items()})
    elif mode == "val":
        data = overrides.pop("data", None)
        if not data:
            raise SystemExit("val requires data=...")
        metrics = model.val(data=data, **overrides)
        print({k: round(v, 5) for k, v in metrics.items()})
    elif mode == "predict":
        source = overrides.pop("source", None)
        if not source:
            raise SystemExit("predict requires source=...")
        results = model.predict(source, **overrides)
        for r in results:
            print(f"{r.path}: {len(r)} detections, inference {r.speed['inference']:.1f} ms")
    elif mode == "track":
        source = overrides.pop("source", None)
        if not source:
            raise SystemExit("track requires source=...")
        tracker = overrides.pop("tracker", "bytetrack")
        results = model.track(source, tracker=tracker, **overrides)
        for r in results:
            ids = getattr(r, "track_ids", [])
            print(f"{r.path}: {len(r)} detections, ids {list(ids)[:10]}")
    elif mode == "export":
        out = model.export(**overrides)
        print(f"exported: {out}")
    elif mode == "benchmark":
        from .utils.benchmarks import benchmark

        print(benchmark(model, **overrides))
    return 0


if __name__ == "__main__":
    raise SystemExit(entrypoint())
