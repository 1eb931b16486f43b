"""Streaming inference sources (reference data/loaders.py:52-659).

LoadStreams: daemon reader threads per source (webcam index / rtsp / http
/ video file in stream mode) with a latest-frame buffer, so inference
never blocks on capture. LoadImagesAndVideos: lazy frame iterator over
files/dirs (the predictor's non-stream path materializes eagerly; this
generator form backs predict(stream=True) without holding a video in
RAM — round-1 weakness #5).
"""

from __future__ import annotations

import threading
import time
from pathlib import Path
from typing import List

import numpy as np

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}
VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}


def is_stream_source(source) -> bool:
    if isinstance(source, int):
        return True
    s = str(source)
    return s.isnumeric() or s.lower().startswith(("rtsp://", "rtmp://", "http://", "https://", "tcp://"))


class LoadStreams:
    """Threaded multi-stream reader (reference loaders.py:52 LoadStreams).

    Each source gets a daemon thread that keeps only the newest frame
    (buffer=False) or a small FIFO (buffer=True). Iteration yields
    (frames list, paths list); a stopped stream yields its last frame
    until all streams are dead, then raises StopIteration.
    """

    def __init__(self, sources, vid_stride: int = 1, buffer: bool = False):
        import cv2

        self.sources = sources if isinstance(sources, (list, tuple)) else [sources]
        self.vid_stride = vid_stride
        self.buffer = buffer
        self.caps, self.frames, self.threads, self.running = [], [], [], True
        self._lock = threading.Lock()
        for i, s in enumerate(self.sources):
            src = int(s) if str(s).isnumeric() else str(s)
            cap = cv2.VideoCapture(src)
            if not cap.isOpened():
                raise ConnectionError(f"failed to open stream {s!r}")
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"failed to read from stream {s!r}")
            self.caps.append(cap)
            self.frames.append([frame])
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            self.threads.append(t)
            t.start()

    def _reader(self, i: int):
        n = 0
        cap = self.caps[i]
        while self.running and cap.isOpened():
            n += 1
            cap.grab()
            if n % self.vid_stride == 0:
                ok, frame = cap.retrieve()
                if not ok:
                    break
                with self._lock:
                    if self.buffer:
                        self.frames[i].append(frame)
                        del self.frames[i][:-30]  # bound the FIFO
                    else:
                        self.frames[i][:] = [frame]
            time.sleep(0.0)
        self.running = False

    def __iter__(self):
        return self

    def __next__(self):
        if not self.running and all(len(f) == 0 for f in self.frames):
            raise StopIteration
        out: List[np.ndarray] = []
        with self._lock:
            for i, buf in enumerate(self.frames):
                if self.buffer and len(buf) > 1:
                    out.append(buf.pop(0))
                elif buf:
                    out.append(buf[-1].copy())
                else:
                    raise StopIteration
        if not self.running:
            raise StopIteration
        return out, [str(s) for s in self.sources]

    def close(self):
        self.running = False
        for t in self.threads:
            t.join(timeout=1.0)
        for cap in self.caps:
            cap.release()

    def __len__(self):
        return len(self.sources)


class LoadScreenshots:
    """Screen-capture source for `predict(source="screen ...")`
    (reference loaders.py:214 LoadScreenshots, mss-backed).

    Source grammar matches the reference: "screen", "screen 1",
    "screen 100 200 640 480" (left top width height on screen 0), or
    "screen 1 100 200 640 480". Yields ([bgr_frame], [tag]) forever —
    the consumer decides when to stop. `mss` is an optional dependency
    (not in this image); a preinstantiated grabber can be injected for
    tests via the `sct` argument.
    """

    def __init__(self, source: str, sct=None):
        params = str(source).split()[1:]  # drop the "screen" verb
        self.screen, left, top, width, height = 0, None, None, None, None
        if len(params) == 1:
            self.screen = int(params[0])
        elif len(params) == 4:
            left, top, width, height = (int(x) for x in params)
        elif len(params) == 5:
            self.screen, left, top, width, height = (int(x) for x in params)
        elif params:
            raise ValueError(f"screen source takes 0, 1, 4 or 5 params, got {source!r}")
        if sct is None:
            try:
                import mss  # optional; not baked into this image
            except ImportError as e:
                raise ImportError(
                    "screen capture needs the 'mss' package (pip install mss)"
                ) from e
            sct = mss.mss()
        self.sct = sct
        self.frame = 0
        monitor = self.sct.monitors[self.screen]
        self.top = monitor["top"] if top is None else (monitor["top"] + top)
        self.left = monitor["left"] if left is None else (monitor["left"] + left)
        self.width = width or monitor["width"]
        self.height = height or monitor["height"]
        self.monitor = {"left": self.left, "top": self.top, "width": self.width, "height": self.height}

    def __iter__(self):
        return self

    def __next__(self):
        im0 = np.asarray(self.sct.grab(self.monitor))[:, :, :3]  # BGRA -> BGR
        self.frame += 1
        tag = f"screen{self.screen}#{self.frame}"
        return [np.ascontiguousarray(im0)], [tag]

    def close(self):
        pass


class LoadImagesAndVideos:
    """Lazy file iterator: images yield once, videos frame-by-frame
    (reference loaders.py:285). Yields (bgr_frame, path_tag)."""

    def __init__(self, source, vid_stride: int = 1):
        self.vid_stride = vid_stride
        p = Path(str(source))
        if p.is_dir():
            self.files = sorted(
                f for f in p.iterdir() if f.suffix.lower() in IMG_EXTS | VID_EXTS
            )
        else:
            self.files = [p]

    def __iter__(self):
        import cv2

        for f in self.files:
            if f.suffix.lower() in VID_EXTS:
                cap = cv2.VideoCapture(str(f))
                i = 0
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    if i % self.vid_stride == 0:
                        yield frame, f"{f}#{i}"
                    i += 1
                cap.release()
            else:
                img = cv2.imread(str(f))
                if img is None:
                    raise FileNotFoundError(f"cannot read {f}")
                yield img, str(f)


def autocast_list(source) -> list:
    """Normalize a list of mixed sources (PIL / ndarray / path) to BGR
    numpy frames (reference loaders.py:600 autocast_list)."""
    import numpy as np

    out = []
    for im in source:
        if hasattr(im, "mode"):  # PIL
            arr = np.asarray(im.convert("RGB"))[..., ::-1]
        elif isinstance(im, np.ndarray):
            arr = im
        elif isinstance(im, (str, bytes)) or hasattr(im, "__fspath__"):
            from ..utils.patches import imread

            arr = imread(str(im))
        else:
            raise TypeError(f"unsupported inference source element: {type(im)}")
        out.append(np.ascontiguousarray(arr))
    return out


class LoadPilAndNumpy:
    """In-memory PIL/ndarray source (reference loaders.py:452): one
    iteration yielding (frame, tag) pairs like LoadImagesAndVideos."""

    def __init__(self, im0):
        if not isinstance(im0, (list, tuple)):
            im0 = [im0]
        self.im0 = autocast_list(im0)
        self.paths = [getattr(im, "filename", "") or f"image{i}.jpg" for i, im in enumerate(im0)]
        self.mode = "image"
        self.bs = len(self.im0)

    def __len__(self):
        return len(self.im0)

    def __iter__(self):
        for img, p in zip(self.im0, self.paths):
            yield img, p


class LoadTensor:
    """Pre-batched (B, 3, H, W) or (B, H, W, 3) array source (reference
    loaders.py:517): yields each frame as HWC BGR uint8."""

    def __init__(self, im0):
        import numpy as np

        arr = np.asarray(im0)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # BCHW -> BHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:  # reference warns + rescales float [0,1]
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        self.im0 = arr
        self.mode = "image"
        self.bs = len(arr)

    def __len__(self):
        return len(self.im0)

    def __iter__(self):
        for i, img in enumerate(self.im0):
            yield img, f"tensor{i}.jpg"
