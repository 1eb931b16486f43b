"""YOLO model facade: train / val / predict / export entry point.

API-compatible core of the reference Model/YOLO classes
(engine/model.py:29-1157, models/yolo/model.py:21): construct from a
model YAML or a saved checkpoint, then `.train(data=...)`,
`.val(data=...)`, `.predict(source)`, `.export(...)`. State (params,
EMA, batch stats) lives in `self.variables` pytrees instead of torch
modules.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..cfg import get_cfg
from ..nn.tasks import DetectionModel
from .predictor import DetectionPredictor
from .results import Results


class YOLO:
    def __init__(self, model: str = "yolov8n.yaml", task: Optional[str] = None, verbose: bool = False):
        self.overrides: Dict[str, Any] = {}
        self.ckpt_path = None
        if isinstance(model, (list, tuple)):
            # weight-ensemble loading (reference attempt_load_weights,
            # nn/tasks.py:1254): YOLO(["a.ckpt", "b.ckpt"]) NMS-ensembles
            self._load_ensemble([str(m) for m in model])
        elif isinstance(model, dict):  # in-memory model dict (reference Model
            # accepts cfg dicts through DetectionModel)
            self._new(dict(model), verbose=verbose)
        else:
            model = str(model)
            if model.endswith(".ckpt") or model.endswith(".msgpack"):
                self._load(model)
            else:
                self._new(model, verbose=verbose)
        # task comes from the head row of the graph (reference
        # guess_model_task); an explicit arg only confirms it
        self.task = self.model.task if task is None else task
        self.predictor: Optional[DetectionPredictor] = None
        self.trainer = None
        from ..utils.callbacks import default_callbacks

        self.callbacks = default_callbacks()

    # ------------------------------------------------------------------
    def _new(self, cfg: str, verbose: bool = False):
        self.model = DetectionModel(cfg, verbose=verbose)
        self.model_cfg = cfg
        self.variables = None  # lazily initialized

    def _load(self, path: str):
        payload = serialization.msgpack_restore(Path(path).read_bytes())
        self.model = DetectionModel(payload["model_yaml"], nc=int(payload["nc"]))
        self.model_cfg = payload["model_yaml"].get("yaml_file", "checkpoint")
        names = payload.get("names") or {}
        self.model.names = {int(k): v for k, v in names.items()} if names else self.model.names
        # deploy weights are the EMA (reference trainer.py:531-564 contract)
        self.variables = {
            "params": jax.tree.map(jnp.asarray, payload["ema_params"]),
            "batch_stats": jax.tree.map(jnp.asarray, payload["ema_stats"]),
        }
        if payload.get("fused"):  # BN-folded checkpoint (see save())
            self.variables["fused"] = jax.tree.map(jnp.asarray, payload["fused"])
        self.ckpt_path = path
        self.overrides = {k: v for k, v in (payload.get("args") or {}).items() if k in ("imgsz",)}

    def _load_ensemble(self, paths: List[str]):
        from ..nn.tasks import EnsembleModel

        members = [YOLO(p) for p in paths]
        self.model = EnsembleModel([m.model for m in members])
        self.model_cfg = "ensemble"
        self.variables = {"members": tuple(m.variables for m in members)}
        self.ckpt_path = paths[0]

    # ------------------------------------------------------------------
    @property
    def names(self):
        return self.model.names

    def _ensure_variables(self, imgsz: int = 640):
        if self.variables is None:
            self.variables = self.model.init(jax.random.PRNGKey(0), imgsz=imgsz)

    # ------------------------------------------------------------------
    def train(self, data: str, **kwargs) -> Dict[str, float]:
        from ..nn.tasks import EnsembleModel
        from .trainer import DetectionTrainer

        if isinstance(self.model, EnsembleModel):
            raise NotImplementedError("Ensemble is not supported for training (reference tasks.py:1303)")

        # ckpt-loaded models carry the graph as a yaml dict, not a file name
        model_cfg = self.model.yaml if self.ckpt_path else self.model_cfg
        overrides = {**self.overrides, **kwargs, "data": str(data), "model": model_cfg}
        trainer = DetectionTrainer(overrides=overrides)
        if self.ckpt_path and self.variables is not None:
            # warm start from the loaded deploy (EMA) weights — the
            # reference's dominant fine-tune workflow (Model._load +
            # attempt_load_one_weight, engine/model.py:265, nn/tasks.py:1303)
            trainer.pretrained_variables = {
                "params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats", {}),
            }
        self.trainer = trainer
        for ev, fns in self.callbacks.items():  # user hooks ride the bus
            trainer.callbacks[ev].extend(fns)
        metrics = trainer.train()
        # adopt the best-fitness checkpoint's EMA weights like the reference
        # (Model.train reloads trainer.best, engine/model.py:780-798); fall
        # back to the final EMA state when no val ran / best never saved
        self.model = trainer.model
        best = trainer.wdir / "best.ckpt"
        if best.exists():
            payload = serialization.msgpack_restore(best.read_bytes())
            self.variables = {
                "params": jax.tree.map(jnp.asarray, payload["ema_params"]),
                "batch_stats": jax.tree.map(jnp.asarray, payload.get("ema_stats") or {}),
            }
        else:
            self.variables = {
                "params": trainer.state.ema_params,
                "batch_stats": trainer.state.ema_stats,
            }
        return metrics

    def _round_imgsz(self, args):
        """Round args.imgsz up to the model's max stride (reference
        check_imgsz at every engine entry, checks.py:117); classify
        models resize freely."""
        if getattr(self.model, "task", "detect") != "classify" and getattr(self.model, "strides", None) is not None:
            from ..utils.checks import check_imgsz

            args.imgsz = check_imgsz(args.imgsz, stride=int(max(self.model.strides)))
        return args

    def val(self, data: Optional[str] = None, **kwargs) -> Dict[str, float]:
        from ..data.build import build_dataloader, build_yolo_dataset
        from ..data.dataset import check_det_dataset
        from .validator import TASK_VALIDATORS, DetectionValidator

        args = self._round_imgsz(get_cfg(overrides={**self.overrides, **kwargs}))
        info = check_det_dataset(data or args.data)
        split = args.split if info.get(args.split) else "val"
        task = self.model.task
        kpt_shape = dict(self.model.specs[-1].kwargs).get("kpt_shape") if task == "pose" else None
        ds = build_yolo_dataset(args, info[split], info, mode="val", kpt_shape=kpt_shape)
        # rect val: one median-aspect stride-multiple letterbox shape for
        # the split (XLA static-shape reading of reference rect batching,
        # build.py rect=mode=='val'); detect-only, like the trainer
        rect_shape = (
            ds.rect_shape(stride=int(max(self.model.strides)))
            if getattr(args, "rect", False) and task == "detect"
            else None
        )
        loader = build_dataloader(
            ds, args.batch, train=False, workers=args.workers, task=task, rect_shape=rect_shape,
        )
        self._ensure_variables(args.imgsz)
        validator = TASK_VALIDATORS.get(task, DetectionValidator)(self.model, loader, args)
        validator.callbacks = self.callbacks  # fire on_val_* user hooks
        variables = self.variables
        # device="all": shard the eval batch over every chip (DP inference —
        # the sharded-trainer counterpart; reference DDP val is rank-0-only,
        # here all chips contribute). Indivisible batches fall back to the
        # default single-device placement.
        if str(getattr(args, "device", "") or "") in ("all", "mesh") and jax.device_count() > 1 \
                and int(args.batch) % jax.device_count() == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import batch_sharding, make_mesh

            mesh = make_mesh(n_data=jax.device_count(), n_model=1)
            validator.batch_sharding = batch_sharding(mesh)
            variables = jax.device_put(variables, NamedSharding(mesh, P()))
        out = validator(variables)
        # reference results_dict aliases ("metrics/mAP50(B)", …) alongside
        # the plain keys (reference utils/metrics.py:835 DetMetrics.keys)
        sfx = {"segment": "M", "pose": "P"}.get(task, "B")
        for k in ("precision", "recall", "mAP50", "mAP50-95"):
            if k in out:
                out[f"metrics/{k}({sfx})"] = out[k]
        # reference-idiom attribute API: metrics.box.map50 etc.
        # (reference DetMetrics/SegmentMetrics/PoseMetrics, metrics.py:835+)
        from ..utils.metrics import ValMetrics

        out = ValMetrics(out)
        if task == "segment" and hasattr(validator, "mask_m"):
            out.box = validator.box_m.box
            out.seg = validator.mask_m.box
        elif task == "pose" and hasattr(validator, "pose_m"):
            out.box = validator.box_m.box
            out.pose = validator.pose_m.box
        elif getattr(validator, "metrics", None) is not None and getattr(validator.metrics, "box", None) is not None:
            out.box = validator.metrics.box
        return out

    def set_classes(self, names):
        """Open-vocabulary class swap for World models (reference
        YOLOWorld.set_classes, models/yolo/model.py): encodes the prompts
        (utils/text_model.py) and resets the class axis."""
        self.model.set_classes(list(names))
        self.predictor = None  # jit cache was traced with the old text feats

    def predict(self, source=None, stream: bool = False, **kwargs):
        """Batched inference; stream=True returns a generator of Results
        (webcam/RTSP/video frame-by-frame, reference Model.predict stream).
        save/save_txt/save_crop mirror the reference's output options."""
        if source is None:
            # reference Model.predict defaults to the packaged sample images
            # (engine/model.py:518-521, warns and uses ASSETS)
            from .. import ASSETS
            from ..utils import LOGGER

            source = str(ASSETS)
            LOGGER.info(f"WARNING: 'source' is missing. Using default 'source={source}'.")
        args = self._round_imgsz(get_cfg(overrides={**self.overrides, **kwargs}))
        if getattr(args, "embed", None):
            # embed=[i,...]: return pooled feature vectors from those layers
            # instead of Results (reference Model.predict embed arg)
            layers = args.embed if isinstance(args.embed, (list, tuple)) else [args.embed]
            return self.embed(source, layers=tuple(int(i) for i in layers), imgsz=args.imgsz)
        self._ensure_variables(args.imgsz)
        # BN-fold for inference by default, like the reference's
        # attempt_load_one_weight -> model.fuse() (+4% measured on v5e)
        if not self.is_fused:
            self.fuse()
        if self.predictor is None:
            self.predictor = DetectionPredictor(self.model, args, callbacks=self.callbacks)
        else:
            self.predictor.args = args
        if stream:
            return self.predictor.stream(self.variables, source, imgsz=args.imgsz)
        results = self.predictor(self.variables, source, imgsz=args.imgsz)
        if kwargs.get("save") or kwargs.get("save_txt") or kwargs.get("save_crop"):
            self._save_results(results, args, kwargs)
        if getattr(args, "show", False):
            self._show_results(results)
        return results

    def _save_results(self, results, args, kwargs) -> None:
        """save/save_txt/save_crop outputs under runs/ (reference
        BasePredictor save paths): images get annotated jpgs; video frames
        (path tagged `video.ext#i`) are muxed into an annotated video, with
        per-frame jpgs only when save_frames=True (reference default.yaml:70)."""
        import cv2

        out = Path(args.project or "runs/detect") / (args.name or "predict")
        out.mkdir(parents=True, exist_ok=True)
        writers: Dict[str, Any] = {}
        for i, r in enumerate(results):
            pstr = str(r.path)
            vid = pstr.split("#")[0] if "#" in pstr else None
            is_frame = vid is not None and Path(vid).suffix.lower() in DetectionPredictor.VID_EXTS
            stem = Path(pstr).stem or f"img{i}"
            if kwargs.get("save"):
                if is_frame:
                    w = writers.get(vid)
                    if w is None:
                        h0, w0 = r.orig_img.shape[:2]
                        w = cv2.VideoWriter(
                            str(out / f"{Path(vid).stem}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (w0, h0),
                        )
                        writers[vid] = w
                    w.write(r.plot())
                    if getattr(args, "save_frames", False):
                        fd = out / f"{Path(vid).stem}_frames"
                        fd.mkdir(exist_ok=True)
                        r.save(str(fd / f"{Path(vid).stem}_{pstr.split('#', 1)[1]}.jpg"))
                else:
                    r.save(str(out / f"{stem}.jpg"))
            if kwargs.get("save_txt"):
                r.save_txt(str(out / "labels" / f"{stem}.txt"), save_conf=bool(kwargs.get("save_conf")))
            if kwargs.get("save_crop"):
                r.save_crop(str(out / "crops"), file_name=stem)
        for w in writers.values():
            w.release()

    def _show_results(self, results) -> None:
        """show=True: display annotated frames when a GUI is available;
        headless environments warn once (reference BasePredictor.show)."""
        import os

        from ..utils import LOGGER

        if not os.environ.get("DISPLAY") and os.name != "nt":
            LOGGER.warning("show=True requires a GUI environment; skipping display")
            return
        import cv2

        for r in results:
            cv2.imshow("improving_yolov8_cbam_swinblock_tpu", r.plot())
            cv2.waitKey(1)

    def __call__(self, source, **kwargs) -> List[Results]:
        return self.predict(source, **kwargs)

    def embed(self, source, layers=(-1,), imgsz: int = 640):
        """Pooled feature embeddings for an image / batch (reference
        Model.embed): returns (B, sum C) numpy."""
        import cv2

        from ..data.augment import letterbox

        self._ensure_variables(imgsz)
        imgs = source if isinstance(source, (list, tuple)) else [source]
        batch = []
        for im in imgs:
            if isinstance(im, (str, Path)):
                im = cv2.imread(str(im))
            lb = letterbox(np.asarray(im), (imgsz, imgsz))
            batch.append(lb[0] if isinstance(lb, tuple) else lb)
        x = jnp.asarray(np.stack(batch), self.model.dtype) / 255.0
        return np.asarray(self.model.embed(self.variables, x, layers))

    def track(self, source, tracker: Optional[str] = None, persist: bool = False, **kwargs) -> List[Results]:
        """Detect + associate across frames (reference Model.track,
        engine/model.py:552 + trackers/track.py). Source: video path,
        directory of frames, or list of ndarrays. Tracker resolution:
        explicit arg > overrides > default.yaml `tracker` (botsort.yaml,
        reference default.yaml:126)."""
        import cv2

        from ..trackers import build_tracker

        if tracker is None:
            tracker = self.overrides.get("tracker") or getattr(
                get_cfg(), "tracker", "botsort.yaml"
            )
        if not persist or not hasattr(self, "_tracker") or self._tracker is None:
            # tracker built from its cfg YAML (packaged bytetrack/botsort or
            # a user file — reference trackers/track.py:35 on_predict_start)
            self._tracker = build_tracker(tracker)
        trk = self._tracker
        # video file -> frames
        frames = None
        if isinstance(source, (str, Path)) and Path(source).suffix.lower() in {".mp4", ".avi", ".mov", ".mkv"}:
            cap = cv2.VideoCapture(str(source))
            frames = []
            while True:
                ok, f = cap.read()
                if not ok:
                    break
                frames.append(f)
            cap.release()
        results = self.predict(frames if frames is not None else source, **kwargs)
        for r in results:
            det = r.boxes.data
            if len(det):
                tracks = trk.update(det[:, :4], det[:, 4], det[:, 5])
            else:
                tracks = trk.update(np.zeros((0, 4), np.float32), np.zeros(0, np.float32), np.zeros(0, np.float32))
            if len(tracks):
                # [x1,y1,x2,y2,conf,cls] + track id column appended
                r.boxes.data = np.concatenate(
                    [tracks[:, :4], tracks[:, 5:6], tracks[:, 6:7]], axis=1
                ).astype(np.float32)
                r.track_ids = tracks[:, 4].astype(int)
            else:
                r.track_ids = np.zeros((0,), int)
        return results

    def tune(self, data: str, iterations: int = 10, use_ray: bool = False, **kwargs) -> Dict:
        """Hyperparameter search (reference Model.tune, engine/model.py:800):
        mutation evolution by default, Ray Tune + ASHA with use_ray=True
        (reference utils/tuner.py run_ray_tune; needs the optional ray)."""
        if use_ray:
            from ..utils.ray_tune import run_ray_tune

            return run_ray_tune(self, data=str(data), max_samples=iterations, **kwargs)
        from .tuner import Tuner

        overrides = {**self.overrides, **kwargs, "data": str(data), "model": self.model_cfg}
        return Tuner(overrides)(iterations=iterations)

    def benchmark(self, **kwargs):
        from ..utils.benchmarks import benchmark

        return benchmark(self, **kwargs)

    # ------------------------------------------------------------------
    def export(self, **kwargs):
        from .exporter import Exporter

        args = get_cfg(overrides={**self.overrides, **kwargs})
        self._ensure_variables(args.imgsz)
        return Exporter(self.model, self.variables, args)()

    # ------------------------------------------------------------------
    def fuse(self):
        """Fold every Conv+BN pair into the kernels for inference
        (reference BaseModel.fuse / fuse_conv_and_bn, tasks.py:210-251);
        returns self for chaining. Measured +4% bf16 throughput on v5e."""
        from ..utils.fuse import fuse_variables

        self._ensure_variables()
        if "members" in self.variables:  # ensemble: fold each member
            self.variables = {
                "members": tuple(
                    v if "fused" in v else fuse_variables(v) for v in self.variables["members"]
                )
            }
        elif "fused" not in self.variables:
            self.variables = fuse_variables(self.variables)
        return self

    @property
    def is_fused(self) -> bool:
        """Reference BaseModel.is_fused analog."""
        if self.variables is None:
            return False
        if "members" in self.variables:
            return all("fused" in v for v in self.variables["members"])
        return "fused" in self.variables

    def save(self, path: str = "model.ckpt"):
        """Serialize deploy weights + graph config (loadable with
        YOLO(path) — reference Model.save)."""
        self._ensure_variables()
        if "members" in self.variables:
            raise NotImplementedError("save an ensemble member, not the ensemble")
        asnp = lambda t: jax.tree.map(np.asarray, t)  # noqa: E731
        payload = {
            "model_yaml": self.model.yaml,
            "nc": self.model.nc,
            "names": {str(k): str(v) for k, v in self.model.names.items()},
            "ema_params": asnp(self.variables["params"]),
            "ema_stats": asnp(self.variables.get("batch_stats", {})),
            # folded kernels need their biases or reload re-applies BN on
            # them — carry the collection through the checkpoint
            "fused": asnp(self.variables.get("fused", {})),
            "args": {},
        }
        Path(path).write_bytes(serialization.msgpack_serialize(jax.tree.map(lambda x: x, payload)))
        return path

    def info(self) -> Dict[str, Any]:
        v = self.variables if self.variables is not None else self.model.shape_init()
        return {
            "params": self.model.param_count(v),
            "strides": self.model.strides,
            "nc": self.model.nc,
            "task": self.task,
            "fused": self.is_fused,
        }

    # -- callback management (reference Model.add/clear/reset_callbacks,
    # engine/model.py:952-1028): hooks ride into trainer/validator/predictor
    def add_callback(self, event: str, func) -> None:
        from ..utils.callbacks import EVENTS

        if event not in EVENTS:
            raise ValueError(f"unknown callback event {event!r} (see utils.callbacks.EVENTS)")
        self.callbacks[event].append(func)
        if self.predictor is not None:
            self.predictor.callbacks[event].append(func)

    def clear_callback(self, event: str) -> None:
        self.callbacks[event] = []
        if self.predictor is not None:
            self.predictor.callbacks[event] = []

    def reset_callbacks(self) -> None:
        from ..utils.callbacks import default_callbacks

        self.callbacks = default_callbacks()
        self.predictor = None  # rebuilt with the fresh bus on next predict

    def load(self, weights: str) -> "YOLO":
        """Overlay checkpoint weights onto the CURRENT architecture,
        keeping fresh init for shape-mismatched leaves (reference
        Model.load -> intersect_dicts transfer, engine/model.py:357).

        Also accepts an `.npz` produced by tools/export_ref_state.py
        (a reference torch checkpoint flattened to {name: array}) so
        migrating users load ported weights in one line:
        ``YOLO("yolov8s-cbam-swin.yaml").load("ref.npz")``."""
        if str(weights).endswith(".npz"):
            from ..utils.torch_import import import_torch_state

            self._ensure_variables()
            state = dict(np.load(str(weights)))
            self.variables, _report = import_torch_state(self.variables, state, strict=False)
            self.predictor = None
            return self
        payload = serialization.msgpack_restore(Path(str(weights)).read_bytes())
        src = {"params": payload["ema_params"], "batch_stats": payload.get("ema_stats") or {}}
        self._ensure_variables()

        def overlay(dst, s):
            if not isinstance(dst, dict):
                return dst
            out = {}
            for k, v in dst.items():
                sv = s.get(k) if isinstance(s, dict) else None
                if isinstance(v, dict):
                    out[k] = overlay(v, sv if isinstance(sv, dict) else {})
                elif sv is not None and not isinstance(sv, dict) and tuple(np.shape(sv)) == tuple(np.shape(v)):
                    out[k] = jnp.asarray(sv, dtype=v.dtype)
                else:
                    out[k] = v
            return out

        self.variables = {k: overlay(v, src.get(k, {})) for k, v in self.variables.items()}
        self.predictor = None
        return self

    def reset_weights(self) -> "YOLO":
        """Re-initialize every parameter (reference Model.reset_weights,
        engine/model.py:331); the next call re-inits lazily."""
        self.variables = None
        self.predictor = None
        return self

    @property
    def device(self) -> str:
        """Placement of the model's compute (reference Model.device)."""
        return str(jax.devices()[0])


class RTDETR(YOLO):
    """RT-DETR facade (reference models/rtdetr/model.py:RTDETR): the same
    engine with the RTDETRDecoder head — Hungarian-matched training, NMS-free
    inference. `RTDETR("rtdetr-l.yaml")` accepts only detect-task graphs."""

    def __init__(self, model: str = "rtdetr-l.yaml", verbose: bool = False):
        super().__init__(model, task="detect", verbose=verbose)
        if not getattr(self.model, "is_rtdetr", False):
            raise ValueError("RTDETR only supports RTDETRDecoder-headed graphs (rtdetr-*.yaml)")


class YOLOWorld(YOLO):
    """Open-vocabulary YOLO-World facade (reference models/yolo/model.py:93
    YOLOWorld): a WorldDetect-headed graph whose classes are set at runtime
    via text prompts (`set_classes`)."""

    def __init__(self, model: str = "yolov8s-worldv2.yaml", verbose: bool = False):
        super().__init__(model, task="detect", verbose=verbose)
        if not getattr(self.model, "is_world", False):
            raise ValueError("YOLOWorld only supports WorldDetect-headed graphs (yolov8*-world*.yaml)")


def _build_visuals(cls_ids, bboxes, src_shape, imgsz: int, scale: float = 1 / 8):
    """Visual-prompt masks from xyxy boxes on the ORIGINAL image (reference
    LoadVisualPrompt.get_visuals, data/augment.py:2143-2232 +
    YOLOEVPDetectPredictor.pre_transform, yoloe/predict.py:54-132): boxes are
    mapped through the letterbox transform, rasterized at P3 resolution
    (imgsz*scale), and OR-reduced per unique class -> (1, Q, Hm, Wm) float32
    plus the sorted unique class ids."""
    b = np.asarray(bboxes, np.float32).reshape(-1, 4).copy()
    cats = np.asarray(cls_ids).reshape(-1).astype(np.int64)
    if len(b) != len(cats):
        raise ValueError(f"{len(b)} bboxes for {len(cats)} cls entries")
    gain = min(imgsz / src_shape[0], imgsz / src_shape[1])
    b *= gain
    b[:, 0::2] += round((imgsz - src_shape[1] * gain) / 2 - 0.1)
    b[:, 1::2] += round((imgsz - src_shape[0] * gain) / 2 - 0.1)
    hm = wm = int(imgsz * scale)
    b = b * scale
    r = np.arange(wm)[None, None, :]
    c = np.arange(hm)[None, :, None]
    masks = (
        (r >= b[:, 0, None, None]) & (r < b[:, 2, None, None])
        & (c >= b[:, 1, None, None]) & (c < b[:, 3, None, None])
    )  # (N, Hm, Wm)
    uniq, inv = np.unique(cats, return_inverse=True)
    vis = np.zeros((len(uniq), hm, wm), np.float32)
    for i, m in zip(inv, masks):
        vis[i] = np.logical_or(vis[i], m)
    return vis[None], uniq


class YOLOE(YOLO):
    """Prompt-driven YOLOE facade (reference models/yolo/model.py:144 YOLOE):
    text prompts (`set_classes`/`get_text_pe`/`set_vocab`), or visual prompts
    — boxes on a reference image — encoded by SAVPE into class embeddings
    (`predict(visual_prompts=...)`, `get_visual_pe`)."""

    def __init__(self, model: str = "yoloe-v8s-seg.yaml", task: Optional[str] = None, verbose: bool = False):
        super().__init__(model, task=task, verbose=verbose)
        if not getattr(self.model, "is_yoloe", False):
            raise ValueError("YOLOE only supports YOLOEDetect/YOLOESegment-headed graphs (yoloe-*.yaml)")

    def get_text_pe(self, texts):
        """Text prompt embeddings (reference YOLOE.get_text_pe -> the model's
        text encoder + reprta happens in-head here): (1, Q, 512) float32."""
        from ..utils.text_model import encode_texts

        return encode_texts(list(texts))[None]

    def get_vocab(self, names):
        """Vocabulary embeddings for class names (reference YOLOE.get_vocab)."""
        return self.get_text_pe(names)

    def set_vocab(self, vocab, names):
        """Set vocabulary + class names (reference YOLOE.set_vocab): here the
        vocab IS the per-class embedding table."""
        self.set_classes(list(names), embeddings=vocab)

    def set_classes(self, names, embeddings=None):
        """Class swap by text (embeddings=None) or by explicit embeddings,
        e.g. SAVPE visual-prompt output (reference YOLOE.set_classes)."""
        self.model.set_classes(list(names), embeddings=embeddings)
        self.predictor = None  # traced with the old prompt embeddings

    def _image_for_pe(self, source, imgsz: int):
        import cv2

        from ..data.augment import letterbox

        if isinstance(source, (str, Path)):
            im = cv2.imread(str(source))
            if im is None:
                raise FileNotFoundError(source)
        else:
            im = np.asarray(source)
        lb, _, _ = letterbox(im, (imgsz, imgsz))
        return im.shape[:2], lb

    def get_visual_pe(self, source, visual_prompts, imgsz: int = 640):
        """SAVPE embeddings for box prompts on one image (reference
        YOLOEVPDetectPredictor.get_vpe, yoloe/predict.py:148): returns
        ((1, Q, 512) embeddings, sorted unique class ids)."""
        src_shape, lb = self._image_for_pe(source, imgsz)
        vis, uniq = _build_visuals(visual_prompts["cls"], visual_prompts["bboxes"], src_shape, imgsz)
        self._ensure_variables(imgsz)
        x = jnp.asarray(lb[..., ::-1].copy(), self.model.dtype)[None] / 255.0
        pe = self.model.get_visual_pe(self.variables, x, vis)
        return np.asarray(pe, np.float32), uniq

    def predict(self, source=None, stream: bool = False, visual_prompts: Optional[Dict] = None,
                refer_image=None, **kwargs):
        """Predict with optional visual prompts (reference YOLOE.predict,
        models/yolo/model.py:279): when `visual_prompts` ({"bboxes", "cls"})
        is given, SAVPE encodes the prompts on `refer_image` (default: the
        source itself) into class embeddings, the class table is swapped, and
        a standard predict runs. Two passes instead of the reference's fused
        per-batch vpe forward — same math, jit-cache-friendly."""
        if visual_prompts:
            if not {"bboxes", "cls"} <= set(visual_prompts):
                raise ValueError("visual_prompts must contain 'bboxes' and 'cls'")
            imgsz = int(kwargs.get("imgsz", self.overrides.get("imgsz", 640)) or 640)
            ref = refer_image if refer_image is not None else source
            pe, uniq = self.get_visual_pe(ref, visual_prompts, imgsz=imgsz)
            names = [f"object{int(i)}" for i in uniq]
            self.set_classes(names, embeddings=pe)
        return super().predict(source, stream=stream, **kwargs)
