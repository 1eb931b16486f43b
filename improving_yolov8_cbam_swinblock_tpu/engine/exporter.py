"""Exporter: StableHLO / TF SavedModel / TFLite / frozen-pb with a real
option surface.

TPU-native analog of the reference 16-format Exporter
(reference engine/exporter.py:222-1580). The portable interchange from
JAX is StableHLO (via jax.export) — the role ONNX plays for torch; the
TF chain (SavedModel -> TFLite) mirrors the reference's
onnx->saved_model->tflite path using jax2tf instead.

Options (reference export_formats table, engine/exporter.py:112-146):
  batch=N     fixed batch size baked into the artifact
  dynamic     symbolic batch dimension (stablehlo/saved_model only) —
              jax.export symbolic shapes / jax2tf polymorphic_shapes
  half        bf16 compute + bf16 weights in the artifact (the TPU
              analog of the reference's fp16 half)
  int8        post-training quantization via ops/quant.py calibration
              (reference int8 TFLite calibration, exporter.py:~900);
              calibrates on `data` when given, synthetic frames otherwise
  nms=True    embeds decode+NMS so the artifact returns final detections
              (B, max_det, 6) — the reference's end2end NMS export
keras=True raises (no keras artifact on the TPU chain); the
torch-ecosystem-only knobs (simplify/opset/optimize/workspace/dnn) are
accepted for CLI compatibility and warn when changed from defaults.

Every artifact ships with a sidecar metadata yaml (stride, imgsz, names,
and the option set) like the reference (exporter.py metadata contract);
without nms the output layout is the same (B, 4+nc, A) the reference
exports, so downstream consumers are identical.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

# per-format supported options (reference export_formats arguments column)
_FORMAT_OPTS = {
    "stablehlo": {"batch", "dynamic", "half", "int8", "nms"},
    "saved_model": {"batch", "dynamic", "half", "int8", "nms"},
    "tflite": {"batch", "half", "int8", "nms"},
    "pb": {"batch", "half", "int8", "nms"},
}
_ALIASES = {"hlo": "stablehlo", "tf": "saved_model"}


class Exporter:
    def __init__(self, model, variables, args, callbacks=None):
        self.model = model
        self.variables = variables
        self.args = args
        from ..utils.callbacks import default_callbacks

        self.callbacks = callbacks if callbacks is not None else default_callbacks()

    # -- option resolution ---------------------------------------------
    def _resolve_options(self, fmt: str) -> dict:
        a = self.args
        opts = {
            "batch": int(getattr(a, "batch", 1) or 1),
            "dynamic": bool(getattr(a, "dynamic", False)),
            "half": bool(getattr(a, "half", False)),
            "int8": bool(getattr(a, "int8", False)),
            "nms": bool(getattr(a, "nms", False)),
        }
        from ..utils import LOGGER

        if getattr(a, "keras", False):
            raise ValueError("keras=True is not supported by the TPU exporter; use format=saved_model")
        # torch-ecosystem-only knobs (ONNX/TorchScript/TensorRT/OpenCV-DNN,
        # reference default.yaml:54,82-87): accepted for CLI compatibility,
        # warned about when changed from their defaults — the TPU artifact
        # chain (stablehlo/saved_model/tflite/pb) has no use for them
        for k, dflt in (("simplify", True), ("opset", None), ("optimize", False),
                        ("workspace", None), ("dnn", False)):
            if getattr(a, k, dflt) != dflt:
                LOGGER.warning(f"export arg {k}={getattr(a, k)!r} applies to torch-ecosystem backends only; ignored")
        allowed = _FORMAT_OPTS[fmt]
        for k in ("dynamic",):
            if opts[k] and k not in allowed:
                raise ValueError(f"{k}=True is not supported for format={fmt!r}")
        if opts["half"] and opts["int8"]:
            # reference exporter.py:304-306 resolves this pair the same way
            LOGGER.warning("half=True and int8=True are mutually exclusive, setting half=False")
            opts["half"] = False
        if opts["nms"] and getattr(self.model, "task", "detect") not in ("detect",):
            raise ValueError("nms=True export requires a detect-task model (reference exporter.py:330)")
        return opts

    # -- forward construction ------------------------------------------
    def _export_model_and_vars(self, opts: dict):
        """Model + variables after applying half / int8 transforms."""
        model, variables = self.model, self.variables
        if opts["half"] and model.dtype != jnp.bfloat16:
            model = type(model)(model.yaml, nc=model.nc, dtype=jnp.bfloat16)
            model.names = self.model.names
            variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                variables,
            )
        if opts["int8"]:
            from ..ops.quant import quantize_model

            variables = quantize_model(model, variables, self._calib_batches())
        return model, variables

    def _calib_batches(self):
        """Calibration frames for int8 PTQ: real val images when `data` is
        given (reference requires data for int8, exporter.py:353),
        synthetic frames otherwise (no-egress environments)."""
        imgsz = int(self.args.imgsz)
        data = getattr(self.args, "data", None)
        from ..utils import LOGGER

        if data:
            try:
                from ..data.dataset import DataLoader, YOLODataset, check_det_dataset

                info = check_det_dataset(str(data))
                ds = YOLODataset(info.get("val") or info["train"], imgsz=imgsz, max_gt=8)
                loader = DataLoader(ds, 8, train=False, workers=2)
                batches, n = [], 0
                for b in loader:
                    batches.append(np.asarray(b["img"], np.uint8))
                    n += batches[-1].shape[0]
                    if n >= 32:
                        break
                if batches:
                    return batches
            except Exception as e:
                LOGGER.warning(f"int8 calibration on data={data!r} failed ({e}); using synthetic frames")
        else:
            LOGGER.warning("int8=True without data=; calibrating on synthetic frames")
        rng = np.random.default_rng(0)
        return [rng.integers(0, 255, (8, imgsz, imgsz, 3), dtype=np.uint8) for _ in range(2)]

    def _forward_fn(self, opts: dict = None):
        opts = opts or {"half": False, "int8": False, "nms": False}
        model, variables = self._export_model_and_vars(opts)
        max_det = int(getattr(self.args, "max_det", 300) or 300)
        embed_nms = opts["nms"]

        def forward(img):
            x = img.astype(model.dtype) / 255.0
            pred, _ = model.apply(variables, x, train=False)
            if embed_nms:
                from ..ops.nms import e2e_postprocess

                return e2e_postprocess(pred.astype(jnp.float32), max_det, model.nc)
            return pred.astype(jnp.float32)

        return forward

    def _metadata(self, imgsz, opts=None):
        opts = opts or {}
        md = {
            "description": "improving_yolov8_cbam_swinblock_tpu export",
            "stride": int(max(self.model.strides)),
            "task": getattr(self.model, "task", "detect"),
            "batch": -1 if opts.get("dynamic") else int(opts.get("batch", 1)),
            "imgsz": [imgsz, imgsz],
            "names": {int(k): str(v) for k, v in self.model.names.items()},
            "nc": int(self.model.nc),
            "half": bool(opts.get("half", False)),
            "int8": bool(opts.get("int8", False)),
            "nms": bool(opts.get("nms", False)),
            "layout": (
                "NHWC uint8 in, (B, max_det, 6) out (xyxy pixels, conf, cls)"
                if opts.get("nms")
                else "NHWC uint8 in, (B, 4+nc, A) out (xywh pixels + cls sigmoid)"
            ),
        }
        if opts.get("nms"):
            md["max_det"] = int(getattr(self.args, "max_det", 300) or 300)
        return md

    def __call__(self):
        from ..utils.callbacks import run_callbacks

        run_callbacks(self.callbacks, "on_export_start", self)
        fmt = str(self.args.format).lower()
        fmt = _ALIASES.get(fmt, fmt)
        if fmt not in _FORMAT_OPTS:
            raise ValueError(f"unsupported export format {fmt!r}; use {' | '.join(_FORMAT_OPTS)}")
        opts = self._resolve_options(fmt)
        imgsz = int(self.args.imgsz)
        t0 = time.time()
        out_dir = Path(getattr(self.args, "project", None) or ".")
        tag = "".join(
            s for s, on in (("_int8", opts["int8"]), ("_half", opts["half"]), ("_nms", opts["nms"])) if on
        )
        stem = f"model_{imgsz}{tag}"
        if fmt == "stablehlo":
            path = self.export_stablehlo(out_dir / f"{stem}.stablehlo", imgsz, opts)
        elif fmt == "saved_model":
            path = self.export_saved_model(out_dir / f"{stem}_saved_model", imgsz, opts)
        elif fmt == "pb":
            path = self.export_pb(out_dir / f"{stem}.pb", imgsz, opts)
        else:
            path = self.export_tflite(out_dir / f"{stem}.tflite", imgsz, opts)
        meta_path = Path(str(path) + ".yaml") if not Path(path).is_dir() else Path(path) / "metadata.yaml"
        meta_path.write_text(yaml.safe_dump(self._metadata(imgsz, opts)))
        print(f"export {fmt} done in {time.time() - t0:.1f}s -> {path}")
        self.path = str(path)
        run_callbacks(self.callbacks, "on_export_end", self)
        return str(path)

    # ------------------------------------------------------------------
    def export_stablehlo(self, path: Path, imgsz: int, opts: dict = None) -> Path:
        """Serialize the jitted forward as portable StableHLO bytes.
        dynamic=True exports a symbolic batch dimension (jax.export
        symbolic shapes) so one artifact serves any batch size."""
        from jax import export as jexport

        opts = opts or {"batch": 1, "dynamic": False, "half": False, "int8": False, "nms": False}
        fn = jax.jit(self._forward_fn(opts))
        if opts["dynamic"]:
            (b,) = jexport.symbolic_shape("b")
            spec = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.uint8)
        else:
            spec = jax.ShapeDtypeStruct((opts["batch"], imgsz, imgsz, 3), jnp.uint8)
        exported = jexport.export(fn)(spec)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(exported.serialize())
        return path

    # ------------------------------------------------------------------
    def export_saved_model(self, path: Path, imgsz: int, opts: dict = None) -> Path:
        import tensorflow as tf
        from jax.experimental import jax2tf

        opts = opts or {"batch": 1, "dynamic": False, "half": False, "int8": False, "nms": False}
        fn = self._forward_fn(opts)
        if opts["dynamic"]:
            conv = jax2tf.convert(fn, with_gradient=False, polymorphic_shapes=["(b, _, _, _)"])
            sig = tf.TensorSpec((None, imgsz, imgsz, 3), tf.uint8, name="images")
        else:
            conv = jax2tf.convert(fn, with_gradient=False)
            sig = tf.TensorSpec((opts["batch"], imgsz, imgsz, 3), tf.uint8, name="images")
        tf_fn = tf.function(conv, input_signature=[sig], autograph=False)
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, str(path))
        return path

    # ------------------------------------------------------------------
    def export_pb(self, path: Path, imgsz: int, opts: dict = None) -> Path:
        """Frozen TF GraphDef (.pb) — the reference's pb format
        (exporter.py:131 export_pb, via convert_variables_to_constants_v2).
        Input tensor 'images:0', output 'Identity:0'."""
        import tensorflow as tf
        from jax.experimental import jax2tf
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2,
        )

        opts = opts or {"batch": 1, "dynamic": False, "half": False, "int8": False, "nms": False}
        conv = jax2tf.convert(self._forward_fn(opts), with_gradient=False)
        sig = tf.TensorSpec((opts["batch"], imgsz, imgsz, 3), tf.uint8, name="images")
        tf_fn = tf.function(conv, input_signature=[sig], autograph=False)
        frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
        path.parent.mkdir(parents=True, exist_ok=True)
        tf.io.write_graph(frozen.graph.as_graph_def(), str(path.parent), path.name, as_text=False)
        return path

    # ------------------------------------------------------------------
    def export_tflite(self, path: Path, imgsz: int, opts: dict = None) -> Path:
        import tensorflow as tf

        opts = opts or {"batch": 1, "dynamic": False, "half": False, "int8": False, "nms": False}
        # int8 tflite uses the CONVERTER's PTQ (reference exporter.py:~900
        # calibrates inside the TFLite converter too) — the TPU quant
        # collection emits int8 pads the tflite legalizer rejects
        sm_opts = {**opts, "int8": False}
        sm_path = self.export_saved_model(path.parent / (path.stem + "_saved_model"), imgsz, sm_opts)
        converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        if opts["int8"]:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]

            def _rep():
                for batch in self._calib_batches():
                    for i in range(0, batch.shape[0], opts["batch"]):
                        chunk = batch[i : i + opts["batch"]]
                        if chunk.shape[0] == opts["batch"]:
                            yield [chunk]

            converter.representative_dataset = _rep
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


def export_formats():
    """Supported-format table (reference engine/exporter.py:112
    export_formats): column dict with Format / Argument / Suffix /
    CPU / GPU / Arguments — the TPU build's five artifact formats plus
    the live checkpoint."""
    rows = [
        ["StableHLO", "stablehlo", ".stablehlo", True, True, sorted(_FORMAT_OPTS["stablehlo"])],
        ["TF SavedModel", "saved_model", "_saved_model", True, True, sorted(_FORMAT_OPTS["saved_model"])],
        ["TF Lite", "tflite", ".tflite", True, False, sorted(_FORMAT_OPTS["tflite"])],
        ["TF GraphDef", "pb", ".pb", True, True, sorted(_FORMAT_OPTS["pb"])],
        ["Checkpoint", "ckpt", ".ckpt", True, True, []],
    ]
    return {
        "Format": [r[0] for r in rows],
        "Argument": [r[1] for r in rows],
        "Suffix": [r[2] for r in rows],
        "CPU": [r[3] for r in rows],
        "GPU": [r[4] for r in rows],
        "Arguments": [r[5] for r in rows],
    }
