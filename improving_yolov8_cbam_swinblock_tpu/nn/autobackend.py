"""AutoBackend analog: one inference facade over every artifact format.

The reference's AutoBackend (reference nn/autobackend.py:51-832) sniffs a
weights path and exposes a uniform forward(im) over 13 runtimes. The TPU
stack exports three formats (engine/exporter.py) plus its own training
checkpoints; Backend gives them the same uniform contract:

    be = Backend("model_640.stablehlo")       # or *_saved_model/ dir,
    out = be(img_uint8_nhwc)                  # .tflite, .ckpt, live model
    be.names, be.stride, be.imgsz, be.task    # from the metadata sidecar

Input: (B, H, W, 3) uint8 NHWC. Output: (B, 4+nc(+extra), A) float32 —
the Detect inference layout, so NMS/postprocess downstream is shared.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import yaml


class Backend:
    def __init__(self, weights: Any, imgsz: Optional[int] = None):
        self.format = None
        self.metadata: Dict = {}
        self._fn = None

        if hasattr(weights, "net") and hasattr(weights, "nc"):  # live DetectionModel
            self._init_live(weights, imgsz or 640)
        else:
            p = Path(str(weights))
            meta_candidates = [Path(str(p) + ".yaml"), p / "metadata.yaml"]
            for mp in meta_candidates:
                if mp.exists():
                    self.metadata = yaml.safe_load(mp.read_text()) or {}
                    break
            if str(p).endswith(".stablehlo"):
                self._init_stablehlo(p)
            elif p.is_dir() and (p / "saved_model.pb").exists():
                self._init_saved_model(p)
            elif str(p).endswith(".tflite"):
                self._init_tflite(p)
            elif str(p).endswith(".pb"):
                self._init_pb(p)
            elif str(p).endswith(".ckpt"):
                self._init_ckpt(p, imgsz)
            else:
                raise ValueError(
                    f"cannot infer backend for {weights!r} "
                    "(expected .stablehlo / saved_model dir / .tflite / .pb / .ckpt / live model)"
                )

    # -- metadata accessors (reference AutoBackend attribute contract) ----
    @property
    def names(self) -> Dict[int, str]:
        return {int(k): str(v) for k, v in self.metadata.get("names", {}).items()}

    @property
    def stride(self) -> int:
        return int(self.metadata.get("stride", 32))

    @property
    def imgsz(self):
        return self.metadata.get("imgsz")

    @property
    def task(self) -> str:
        return self.metadata.get("task", "detect")

    @property
    def nc(self) -> int:
        return int(self.metadata.get("nc", max(len(self.names), 1)))

    @property
    def end2end(self) -> bool:
        """True when the artifact embeds decode+NMS (export nms=True) and
        returns (B, max_det, 6) final detections — the reference
        AutoBackend end2end contract."""
        return bool(self.metadata.get("nms", False))

    # -- per-format initializers ------------------------------------------
    def _init_live(self, model, imgsz: int):
        import jax
        import jax.numpy as jnp

        self.format = "jax"
        variables = getattr(model, "_backend_variables", None)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), imgsz=imgsz)

        @jax.jit
        def fn(img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            return pred.astype(jnp.float32)

        self._fn = lambda im: np.asarray(fn(jnp.asarray(im, jnp.uint8)))
        self.metadata.setdefault("names", {int(k): str(v) for k, v in model.names.items()})
        self.metadata.setdefault("stride", int(max(model.strides)))
        self.metadata.setdefault("nc", int(model.nc))
        self.metadata.setdefault("task", model.task)

    def _init_stablehlo(self, path: Path):
        import jax.numpy as jnp
        from jax import export as jexport

        self.format = "stablehlo"
        exported = jexport.deserialize(path.read_bytes())
        self._fn = lambda im: np.asarray(exported.call(jnp.asarray(im, jnp.uint8)))

    def _init_saved_model(self, path: Path):
        import tensorflow as tf

        self.format = "saved_model"
        module = tf.saved_model.load(str(path))
        fn = module.f if hasattr(module, "f") else module.signatures["serving_default"]
        self._fn = lambda im: np.asarray(fn(tf.constant(im, tf.uint8)))

    def _init_pb(self, path: Path):
        """Frozen GraphDef: wrap_function + prune to ('images:0' ->
        'Identity:0') — the reference's pb branch (autobackend.py
        wrap_frozen_graph)."""
        import tensorflow as tf

        self.format = "pb"
        gd = tf.compat.v1.GraphDef()
        gd.ParseFromString(path.read_bytes())
        wrapped = tf.compat.v1.wrap_function(lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
        ge = wrapped.graph.as_graph_element
        fn = wrapped.prune(ge("images:0"), ge("Identity:0"))
        self._fn = lambda im: np.asarray(fn(tf.constant(im, tf.uint8)))

    def _init_tflite(self, path: Path):
        import tensorflow as tf

        self.format = "tflite"
        interp = tf.lite.Interpreter(model_path=str(path))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        out = interp.get_output_details()[0]

        def fn(im):
            interp.set_tensor(inp["index"], np.asarray(im, inp["dtype"]))
            interp.invoke()
            return interp.get_tensor(out["index"])

        self._fn = fn

    def _init_ckpt(self, path: Path, imgsz: Optional[int]):
        """Trainer checkpoint: rebuild the model, load the EMA weights —
        the deployed-weights contract (reference strip_optimizer analog)."""
        import jax
        import jax.numpy as jnp
        from flax import serialization

        from .tasks import DetectionModel

        self.format = "ckpt"
        payload = serialization.msgpack_restore(path.read_bytes())
        model = DetectionModel(payload["model_yaml"], nc=int(payload["nc"]))
        model.names = {int(k): str(v) for k, v in payload.get("names", {}).items()}
        variables = {"params": payload["ema_params"], "batch_stats": payload["ema_stats"]}

        @jax.jit
        def fn(img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            return pred.astype(jnp.float32)

        self._fn = lambda im: np.asarray(fn(jnp.asarray(im, jnp.uint8)))
        self.metadata.setdefault("names", model.names)
        self.metadata.setdefault("stride", int(max(model.strides)))
        self.metadata.setdefault("nc", int(model.nc))
        args = payload.get("args", {})
        if "imgsz" in args:
            self.metadata.setdefault("imgsz", [int(args["imgsz"])] * 2)

    # -- uniform inference --------------------------------------------------
    def __call__(self, im: np.ndarray) -> np.ndarray:
        return self._fn(im)

    forward = __call__

    def warmup(self, imgsz=(1, 640, 640, 3)):
        """One dummy forward to trigger compilation/allocation
        (reference AutoBackend.warmup)."""
        if self.imgsz:
            imgsz = (1, int(self.imgsz[0]), int(self.imgsz[1]), 3)
        self(np.zeros(imgsz, np.uint8))
        return self


def check_class_names(names, nc: int | None = None):
    """Validate/normalize a names mapping (reference autobackend.py:28
    check_class_names): lists become index dicts, string keys become
    ints, and out-of-range indices raise."""
    if isinstance(names, (list, tuple)):
        names = dict(enumerate(names))
    names = {int(k): str(v) for k, v in dict(names).items()}
    n = nc if nc is not None else (max(names) + 1 if names else 0)
    if names and max(names) >= n:
        raise KeyError(f"class indices {sorted(names)} invalid for nc={n} dataset")
    return names


def default_class_names(data=None):
    """Class names from a dataset YAML, falling back to COCO-80
    (reference autobackend.py:48 default_class_names)."""
    if data is not None:
        try:
            from ..data.dataset import check_det_dataset

            return check_class_names(check_det_dataset(str(data))["names"])
        except Exception:
            pass
    import yaml as _yaml

    coco = Path(__file__).parent.parent / "cfg" / "datasets" / "coco8.yaml"
    return check_class_names(_yaml.safe_load(coco.read_text())["names"])


# reference entry name (nn/autobackend.py:51)
AutoBackend = Backend
