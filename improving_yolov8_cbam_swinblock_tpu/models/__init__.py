"""Model-family facades (reference ultralytics/models/__init__.py):
YOLO / RTDETR / FastSAM / NAS / SAM; World and YOLOE ride the YOLO facade
via their graph heads (set_classes for prompts)."""

from ..engine.model import RTDETR, YOLO
from .fastsam import FastSAM
from .nas import NAS
from .sam import SAM

__all__ = ["YOLO", "RTDETR", "FastSAM", "NAS", "SAM"]
