"""Benchmark mode: export-format sweep with latency (+ optional accuracy).

Reference utils/benchmarks.py:51 benchmark() exports to every format and
measures mAP + latency; the TPU analog sweeps the stack's formats
(jax-native, stablehlo, saved_model, tflite — engine/exporter.py)
through the uniform Backend facade (nn/autobackend.py) so every number
is measured through the same forward contract.
"""

from __future__ import annotations

import tempfile
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _eval_backend_map(be, loader, nc: int, names, conf: float = 0.001,
                      iou: float = 0.7, max_det: int = 300) -> Dict[str, float]:
    """mAP of a Backend over a val loader — the accuracy half of the
    reference's benchmark rows (utils/benchmarks.py:51 measures
    metrics/mAP50-95 per exported format). Protocol matches the
    standalone validator: NMS at conf 0.001 / iou 0.7 multi-label,
    match_predictions over the 10 IoU thresholds (engine/validator.py)."""
    import jax.numpy as jnp

    from ..ops.boxes import xywh2xyxy
    from ..ops.nms import non_max_suppression
    from .metrics import DetMetrics, box_iou_np, match_predictions

    metrics = DetMetrics(names)
    for batch in loader:
        pred = be(batch["img"])  # (B, 4+nc, A) — the uniform export layout
        dets = np.asarray(
            non_max_suppression(
                jnp.asarray(pred), conf_thres=conf, iou_thres=iou,
                max_det=max_det, multi_label=nc > 1, nc=nc,
            )
        )
        fh, fw = batch["img"].shape[1:3]
        frame = np.array([fw, fh, fw, fh], np.float32)
        for i in range(dets.shape[0]):
            det = dets[i]
            det = det[det[:, 4] > 0]
            gm = batch["mask"][i] > 0
            gcls = batch["cls"][i][gm].astype(int)
            gxyxy = np.asarray(xywh2xyxy(jnp.asarray(batch["bboxes"][i][gm] * frame)))
            if len(det) == 0:
                if len(gcls):
                    metrics.update(np.zeros((0, 10), bool), np.zeros(0), np.zeros(0), gcls)
                continue
            iou_m = box_iou_np(gxyxy, det[:, :4])
            tp = match_predictions(det[:, 5].astype(int), gcls, iou_m)
            metrics.update(tp, det[:, 4], det[:, 5].astype(int), gcls)
    return metrics.compute()


def _time_backend(be, img: np.ndarray, iters: int) -> Dict[str, float]:
    be(img)  # compile / allocate
    be(img)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = be(img)
    np.asarray(out).sum()
    dt = time.perf_counter() - t0
    return {"ms/batch": round(dt / iters * 1000, 2), "img/s": round(img.shape[0] * iters / dt, 1)}


def benchmark(
    model,
    imgsz: int = 640,
    batch: int = 1,
    iters: int = 20,
    formats: Optional[List[str]] = None,
    out_dir: Optional[str] = None,
    data: Optional[str] = None,
    max_det: int = 300,
    **_,
) -> List[Dict]:
    """Sweep inference formats for a YOLO facade instance.

    formats: subset of {"jax", "stablehlo", "saved_model", "pb", "tflite"};
    defaults to ALL of them — like the reference benchmark, which sweeps
    every export format so format drift shows up in the product surface
    (reference utils/benchmarks.py:51), each row carrying latency and
    (with data=) accuracy through that format's Backend.
    data: optional dataset yaml — when given (detect task), every row
    also reports mAP50/mAP50-95 measured through that format's backend,
    matching the reference benchmark's accuracy column.
    """
    from ..nn.autobackend import Backend
    from ..engine.exporter import Exporter

    formats = formats or ["jax", "stablehlo", "saved_model", "pb", "tflite"]
    model._ensure_variables(imgsz)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, imgsz, imgsz, 3), dtype=np.uint8)

    loader = None
    if data is not None and model.model.task == "detect":
        from ..data.dataset import DataLoader, YOLODataset, check_det_dataset

        info = check_det_dataset(data)
        split = "val" if info.get("val") else "train"
        ds = YOLODataset(info[split], imgsz=imgsz, max_gt=32, nc=model.model.nc)
        loader = DataLoader(ds, batch, train=False, workers=1, task="detect")

    rows: List[Dict] = []
    tmp = Path(out_dir) if out_dir else Path(tempfile.mkdtemp(prefix="bench_"))
    for fmt in formats:
        try:
            if fmt == "jax":
                net = model.model
                net._backend_variables = model.variables
                be = Backend(net, imgsz=imgsz)
            else:
                from types import SimpleNamespace

                # bake the benchmark batch into the artifact — exported
                # formats have static batch dims (Exporter batch= option)
                args = SimpleNamespace(format=fmt, imgsz=imgsz, project=str(tmp), batch=batch)
                path = Exporter(model.model, model.variables, args)()
                be = Backend(path)
            row = {"format": fmt, "imgsz": imgsz, "batch": batch, "status": "ok"}
            row.update(_time_backend(be, img, iters))
            if loader is not None:
                acc = _eval_backend_map(be, loader, model.model.nc, model.names, max_det=max_det)
                row["mAP50"] = round(float(acc["mAP50"]), 4)
                row["mAP50-95"] = round(float(acc["mAP50-95"]), 4)
        except Exception as e:  # noqa: BLE001 — sweep reports per-format failures
            row = {"format": fmt, "imgsz": imgsz, "batch": batch, "status": f"error: {e}"[:120]}
        rows.append(row)
    return rows


class ProfileModels:
    """Profile a list of model YAMLs on the current device: params, GFLOPs
    (XLA cost analysis), and sigma-clipped latency (reference
    utils/benchmarks.py:351 ProfileModels, TensorRT/ONNX replaced by the
    jitted bf16 TPU forward)."""

    def __init__(self, paths: List[str], num_timed_runs: int = 30, num_warmup_runs: int = 3,
                 imgsz: int = 640, batch: int = 1):
        self.paths = list(paths)
        self.num_timed_runs = num_timed_runs
        self.num_warmup_runs = num_warmup_runs
        self.imgsz = imgsz
        self.batch = batch

    @staticmethod
    def iterative_sigma_clipping(data: np.ndarray, sigma: float = 2.0, max_iters: int = 3) -> np.ndarray:
        """Drop outlier timings (reference benchmarks.py sigma clipping)."""
        data = np.asarray(data, np.float64)
        for _ in range(max_iters):
            mu, sd = data.mean(), data.std()
            clipped = data[(data > mu - sigma * sd) & (data < mu + sigma * sd)]
            if len(clipped) == len(data) or len(clipped) == 0:
                break
            data = clipped
        return data

    def _profile_one(self, path: str) -> Dict:
        import jax
        import jax.numpy as jnp

        from ..nn.tasks import DetectionModel
        from .model_utils import model_info

        model = DetectionModel(path, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), imgsz=self.imgsz)
        info = model_info(model, variables, imgsz=self.imgsz, verbose=False)

        # chain CHUNK forwards through a carry: a single unchained dispatch
        # measures the ~30 ms axon-tunnel RTT, not compute (CLAUDE.md
        # microbenchmark rule), so each timed sample amortizes it
        CHUNK = 5

        @jax.jit
        def fwd_chain(v, img):
            def body(i, acc):
                x = (img.astype(jnp.bfloat16) + acc * 0) / 255.0
                out = model.apply(v, x, train=False)[0]
                o = out["one2one"][0] if isinstance(out, dict) else out
                return o.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, CHUNK, body, jnp.zeros((), jnp.float32))

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 255, (self.batch, self.imgsz, self.imgsz, 3), dtype=np.uint8))
        for _ in range(max(self.num_warmup_runs, 1)):
            float(fwd_chain(variables, img))
        times = []
        for _ in range(max(self.num_timed_runs // CHUNK, 3)):
            t0 = time.perf_counter()
            float(fwd_chain(variables, img))
            times.append((time.perf_counter() - t0) * 1000 / CHUNK)
        t = self.iterative_sigma_clipping(np.asarray(times))
        return {
            "model": str(path), "imgsz": self.imgsz,
            "params_M": round(info["parameters"] / 1e6, 2), "GFLOPs": info.get("GFLOPs"),
            "ms_mean": round(float(t.mean()), 2), "ms_std": round(float(t.std()), 2),
        }

    def profile(self) -> List[Dict]:
        rows = [self._profile_one(p) for p in self.paths]
        self.print_table(rows)
        return rows

    @staticmethod
    def print_table(rows: List[Dict]) -> None:
        hdr = f"{'Model':<28}{'size':>6}{'params(M)':>11}{'GFLOPs':>9}{'ms/b':>9}{'±':>7}"
        print(hdr)
        print("-" * len(hdr))
        for r in rows:
            print(f"{r['model']:<28}{r['imgsz']:>6}{r['params_M']:>11}{str(r['GFLOPs']):>9}"
                  f"{r['ms_mean']:>9}{r['ms_std']:>7}")


class RF100Benchmark:
    """Multi-dataset (Roboflow-100 style) benchmark sweep.

    Reference utils/benchmarks.py:204 RF100Benchmark downloads the RF100
    collection via the roboflow SDK, normalizes each data.yaml, vals the
    model per dataset, and scrapes mAP50 for the 'all' row out of the val
    console log. This analog keeps the same four-verb surface
    (set_key / parse_dataset / fix_yaml / evaluate) but works against
    locally present datasets when there is no egress, and never chdirs
    (the reference's os.chdir("rf-100") mutates global process state).
    """

    def __init__(self, base_dir: str = "rf-100"):
        self.base_dir = Path(base_dir)
        self.ds_names: List[str] = []
        self.ds_cfg_list: List[Path] = []
        self.rf = None
        self.val_metrics = ["class", "images", "targets", "precision", "recall", "map50", "map95"]

    def set_key(self, api_key: str) -> None:
        """Attach a Roboflow client when the SDK is available; otherwise the
        key is recorded and parse_dataset serves pre-downloaded datasets only
        (reference benchmarks.py:231 requires the roboflow package)."""
        try:
            from roboflow import Roboflow  # not in this image; optional

            self.rf = Roboflow(api_key=api_key)
        except ImportError:
            self.api_key = api_key

    def parse_dataset(self, ds_link_txt: str = "datasets_links.txt"):
        """Resolve each `https://app.roboflow.com/<ws>/<proj>/<version>` line
        to a local `<base_dir>/<proj>-<version>/data.yaml`, downloading via
        the SDK only when set_key found one (benchmarks.py:248-280)."""
        import re

        self.base_dir.mkdir(parents=True, exist_ok=True)
        self.ds_names, self.ds_cfg_list = [], []
        for line in Path(ds_link_txt).read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                _, _, workspace, project, version = re.split("/+", line)
            except ValueError:
                continue
            self.ds_names.append(project)
            ds_dir = self.base_dir / f"{project}-{version}"
            if not ds_dir.exists() and self.rf is not None:
                self.rf.workspace(workspace).project(project).version(version).download(
                    "yolov8", location=str(ds_dir)
                )
            self.ds_cfg_list.append(ds_dir / "data.yaml")
        return self.ds_names, self.ds_cfg_list

    @staticmethod
    def fix_yaml(path) -> None:
        """Normalize split paths to the RF export layout (benchmarks.py:285)."""
        import yaml

        data = yaml.safe_load(Path(path).read_text(encoding="utf-8"))
        data["train"] = "train/images"
        data["val"] = "valid/images"
        Path(path).write_text(yaml.safe_dump(data, sort_keys=False), encoding="utf-8")

    def evaluate(self, yaml_path, val_log_file, eval_log_file, list_ind: int) -> float:
        """Scrape the 'all'-row mAP50 from a validator console log and append
        `<dataset>: <map50>` to the eval log (benchmarks.py:290-349). Works on
        this framework's printed metrics table (engine/validator.py
        print_results), whose columns match the reference's:
        Class Images Instances P R mAP50 mAP50-95."""
        import yaml

        skip_symbols = ["🚀", "⚠️", "💡", "❌"]
        class_names = yaml.safe_load(Path(yaml_path).read_text(encoding="utf-8"))["names"]
        if isinstance(class_names, dict):
            class_names = list(class_names.values())
        eval_lines = []
        for line in Path(val_log_file).read_text(encoding="utf-8").splitlines():
            if any(sym in line for sym in skip_symbols):
                continue
            entries = line.split()
            if len(entries) < 7 or entries[0] not in {*class_names, "all"}:
                continue
            if entries[0] == "all" and ("(AP)" in entries or "(AR)" in entries):
                continue
            try:
                row = dict(zip(self.val_metrics, entries[:3] + [float(v) for v in entries[3:7]]))
            except ValueError:
                continue
            eval_lines.append(row)
        map_val = 0.0
        for row in eval_lines:
            if row["class"] == "all":
                map_val = row["map50"]
        if not map_val and eval_lines:
            map_val = eval_lines[0]["map50"]
        name = self.ds_names[list_ind] if list_ind < len(self.ds_names) else Path(yaml_path).parent.name
        with open(eval_log_file, "a", encoding="utf-8") as fh:
            fh.write(f"{name}: {map_val}\n")
        return float(map_val)
