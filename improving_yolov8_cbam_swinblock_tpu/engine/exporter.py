"""Exporter: StableHLO / TF SavedModel / TFLite.

TPU-native analog of the reference 16-format Exporter
(reference engine/exporter.py:222-1580). The portable interchange from
JAX is StableHLO (via jax.export) — the role ONNX plays for torch; the
TF chain (SavedModel -> TFLite) mirrors the reference's
onnx->saved_model->tflite path using jax2tf instead.

Every artifact ships with a sidecar metadata yaml (stride, imgsz, names)
like the reference (exporter.py metadata contract), and decodes to the
same (B, 4+nc, A) output layout so downstream consumers are identical.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml


class Exporter:
    def __init__(self, model, variables, args, callbacks=None):
        self.model = model
        self.variables = variables
        self.args = args
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()

    def _forward_fn(self):
        model = self.model
        variables = self.variables

        def forward(img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            return pred.astype(jnp.float32)

        return forward

    def _metadata(self, imgsz):
        return {
            "description": "improving_yolov8_cbam_swinblock_tpu export",
            "stride": int(max(self.model.strides)),
            "task": getattr(self.model, "task", "detect"),
            "batch": 1,
            "imgsz": [imgsz, imgsz],
            "names": {int(k): str(v) for k, v in self.model.names.items()},
            "nc": int(self.model.nc),
            "layout": "NHWC uint8 in, (B, 4+nc, A) out (xywh pixels + cls sigmoid)",
        }

    def __call__(self):
        from ..utils.callbacks import run_callbacks

        run_callbacks(self.callbacks, "on_export_start", self)
        fmt = str(self.args.format).lower()
        imgsz = int(self.args.imgsz)
        t0 = time.time()
        out_dir = Path(getattr(self.args, "project", None) or ".")
        stem = f"model_{imgsz}"
        if fmt in ("stablehlo", "hlo"):
            path = self.export_stablehlo(out_dir / f"{stem}.stablehlo", imgsz)
        elif fmt in ("saved_model", "tf"):
            path = self.export_saved_model(out_dir / f"{stem}_saved_model", imgsz)
        elif fmt == "tflite":
            path = self.export_tflite(out_dir / f"{stem}.tflite", imgsz)
        else:
            raise ValueError(f"unsupported export format {fmt!r}; use stablehlo | saved_model | tflite")
        meta_path = Path(str(path) + ".yaml") if not Path(path).is_dir() else Path(path) / "metadata.yaml"
        meta_path.write_text(yaml.safe_dump(self._metadata(imgsz)))
        print(f"export {fmt} done in {time.time() - t0:.1f}s -> {path}")
        self.path = str(path)
        run_callbacks(self.callbacks, "on_export_end", self)
        return str(path)

    # ------------------------------------------------------------------
    def export_stablehlo(self, path: Path, imgsz: int) -> Path:
        """Serialize the jitted forward as portable StableHLO bytes."""
        from jax import export as jexport

        fn = jax.jit(self._forward_fn())
        spec = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.uint8)
        exported = jexport.export(fn)(spec)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(exported.serialize())
        return path

    # ------------------------------------------------------------------
    def export_saved_model(self, path: Path, imgsz: int) -> Path:
        import tensorflow as tf
        from jax.experimental import jax2tf

        fn = self._forward_fn()
        tf_fn = tf.function(
            jax2tf.convert(fn, with_gradient=False),
            input_signature=[tf.TensorSpec((1, imgsz, imgsz, 3), tf.uint8, name="images")],
            autograph=False,
        )
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, str(path))
        return path

    # ------------------------------------------------------------------
    def export_tflite(self, path: Path, imgsz: int) -> Path:
        import tensorflow as tf

        sm_path = self.export_saved_model(path.parent / (path.stem + "_saved_model"), imgsz)
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        tfl = converter.convert()
        path.write_bytes(tfl)
        return path


def load_stablehlo(path: str):
    """Inference-side loader for a .stablehlo artifact: returns
    fn(img_uint8) -> (B, 4+nc, A) plus metadata (the AutoBackend analog
    for our interchange format)."""
    from jax import export as jexport

    data = Path(path).read_bytes()
    exported = jexport.deserialize(data)
    meta = {}
    mp = Path(str(path) + ".yaml")
    if mp.exists():
        meta = yaml.safe_load(mp.read_text())

    def fn(img: np.ndarray):
        return exported.call(jnp.asarray(img, jnp.uint8))

    return fn, meta
