"""ctypes bindings for the native pre/postprocess library
(native/postprocess.cpp). Auto-builds with make on first use.

This is the framework's C++ hot path for host-side work the device
doesn't do: image letterbox and detection decode+NMS — the same
contract the reference's C++ deployment examples implement
(reference examples/YOLOv8-CPP-Inference/inference.cpp).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
LIB_PATH = NATIVE_DIR / "libyolopost.so"

_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not LIB_PATH.exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(LIB_PATH))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.letterbox_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.decode_nms.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, f32p,
    ]
    lib.decode_nms.restype = ctypes.c_int
    lib.rescale_boxes.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def letterbox_native(img: np.ndarray, size: int) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """uint8 HWC -> (size, size, 3) uint8, returns (out, gain, (padw, padh))."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((size, size, 3), np.uint8)
    gain = ctypes.c_float()
    padw = ctypes.c_int()
    padh = ctypes.c_int()
    lib.letterbox_u8(img, img.shape[0], img.shape[1], out, size, ctypes.byref(gain), ctypes.byref(padw), ctypes.byref(padh))
    return out, float(gain.value), (int(padw.value), int(padh.value))


def decode_nms_native(
    pred: np.ndarray,  # (4+nc, A) float32
    nc: int,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    multi_label: bool = False,
) -> np.ndarray:
    """(4+nc, A) -> (n, 6) [x1, y1, x2, y2, score, cls]."""
    lib = _load()
    pred = np.ascontiguousarray(pred, dtype=np.float32)
    out = np.zeros((max_det, 6), np.float32)
    n = lib.decode_nms(pred, nc, pred.shape[-1], conf_thres, iou_thres, max_det, int(multi_label), out)
    return out[:n]


def rescale_native(boxes: np.ndarray, gain: float, padw: int, padh: int, orig_hw: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    lib.rescale_boxes(boxes, boxes.shape[0], gain, padw, padh, orig_hw[0], orig_hw[1])
    return boxes
