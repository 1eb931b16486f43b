"""improving_yolov8_cbam_swinblock_tpu — a TPU-native (JAX/XLA/Pallas)
re-design of the CBAM+SwinBlock-augmented YOLOv8/YOLO11 detection stack.

Capability target: mazouziwissem/improving_yolov8_CBAM_SwinBlock
(an Ultralytics 8.3.108 fork). Not a port — the compute path is
functional JAX compiled by XLA for the MXU, parallelism is
mesh/shard_map over ICI, and hot ops get Pallas kernels.
"""

__version__ = "0.1.0"

__all__ = [
    "ASSETS", "YOLO", "YOLOWorld", "YOLOE", "RTDETR", "FastSAM", "NAS", "SAM",
    "checks", "download", "settings", "__version__",
]

# sample images for docs/tests (reference ultralytics.ASSETS; the reference
# ships bus.jpg/zidane.jpg photos — these are synthetic stand-ins generated
# locally, same filenames, since this build has no network egress)
from pathlib import Path as _Path

ASSETS = _Path(__file__).parent / "assets"


def __getattr__(name):
    # Lazy import keeps `import improving_yolov8_cbam_swinblock_tpu.ops`
    # cheap (no engine / data deps pulled in).
    if name == "YOLO":
        from .engine.model import YOLO

        return YOLO
    if name in ("YOLOWorld", "YOLOE"):
        from .engine import model as _m

        return getattr(_m, name)
    if name == "RTDETR":
        from .engine.model import RTDETR

        return RTDETR
    if name == "checks":
        # reference alias: `ultralytics.checks` is checks.check_yolo
        from .utils import check_yolo

        return check_yolo
    if name == "settings":
        from .utils.settings import SETTINGS

        return SETTINGS
    if name == "FastSAM":
        from .models.fastsam import FastSAM

        return FastSAM
    if name == "NAS":
        from .models.nas import NAS

        return NAS
    if name == "SAM":
        from .models.sam import SAM

        return SAM
    if name == "download":
        from .utils.downloads import download

        return download
    raise AttributeError(name)
