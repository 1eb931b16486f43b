"""improving_yolov8_cbam_swinblock_tpu — a TPU-native (JAX/XLA/Pallas)
re-design of the CBAM+SwinBlock-augmented YOLOv8/YOLO11 detection stack.

Capability target: mazouziwissem/improving_yolov8_CBAM_SwinBlock
(an Ultralytics 8.3.108 fork). Not a port — the compute path is
functional JAX compiled by XLA for the MXU, parallelism is
mesh/shard_map over ICI, and hot ops get Pallas kernels.
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "__version__"]


def __getattr__(name):
    # Lazy import keeps `import improving_yolov8_cbam_swinblock_tpu.ops`
    # cheap (no engine / data deps pulled in).
    if name == "YOLO":
        from .engine.model import YOLO

        return YOLO
    raise AttributeError(name)
