"""Dataset / dataloader / inference-source builders.

Equivalent of reference data/build.py:106-258: `build_yolo_dataset` +
`build_dataloader` are the single construction path the trainer and the
facade's val() share, `check_source` sniffs a predict source into the
reference's SourceTypes flags, and `load_inference_source` returns the
matching frame iterator. The reference returns torch DataLoaders with
DistributedSampler; here the loader is the fixed-shape thread-prefetch
DataLoader with explicit (shard_index, num_shards) DP sharding.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Optional

from .dataset import DataLoader, YOLODataset

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}
VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v"}

# augmentation keys forwarded from the config into the loader's host/device
# pipelines (reference v8_transforms hyp surface, data/augment.py:2375)
HYP_KEYS = (
    "mosaic", "mosaic9", "mosaic3", "mixup", "copy_paste", "copy_paste_mode", "degrees",
    "translate", "scale", "shear", "perspective", "hsv_h", "hsv_s", "hsv_v", "flipud",
    "fliplr", "pixel_augment", "mask_ratio", "overlap_mask",
)


def build_yolo_dataset(cfg, img_path, data: Dict, mode: str = "train",
                       kpt_shape=None) -> YOLODataset:
    """Construct the YOLO dataset for one split (reference
    build_yolo_dataset, data/build.py:106): train mode honors
    `fraction`, val/test always read the full split."""
    return YOLODataset(
        img_path,
        imgsz=cfg.imgsz,
        max_gt=cfg.max_gt,
        nc=1 if getattr(cfg, "single_cls", False) else int(data["nc"]),
        single_cls=getattr(cfg, "single_cls", False),
        kpt_shape=kpt_shape,
        fraction=float(getattr(cfg, "fraction", 1.0) or 1.0) if mode == "train" else 1.0,
        cache=getattr(cfg, "cache", False) or False,
    )


def build_dataloader(dataset: YOLODataset, batch: int, workers: int = 8, train: bool = True,
                     hyp: Optional[Dict] = None, seed: int = 0, task: str = "detect",
                     device_augment: bool = False, shard_index: int = 0, num_shards: int = 1,
                     rect_shape=None) -> DataLoader:
    """Construct the fixed-shape prefetch loader (reference
    build_dataloader, data/build.py:149 — InfiniteDataLoader +
    DistributedSampler become the deterministic per-(seed,epoch) shard
    slicing of data/dataset.py DataLoader)."""
    return DataLoader(
        dataset, batch, train=train, hyp=hyp, seed=seed, workers=workers, task=task,
        device_augment=device_augment, shard_index=shard_index, num_shards=num_shards,
        rect_shape=rect_shape,
    )


@dataclass
class SourceTypes:
    """Predict-source flags (reference data/build.py:182 SourceTypes)."""

    stream: bool = False
    screenshot: bool = False
    from_img: bool = False
    tensor: bool = False


def check_source(source):
    """Sniff a predict source (reference check_source, data/build.py:196):
    returns (source, SourceTypes). Webcam indices ('0'/0) and rtsp/http
    URLs are streams; 'screen...' is a screenshot grab; arrays / PIL /
    tensors are in-memory."""
    st = SourceTypes()
    if isinstance(source, (str, Path)) or isinstance(source, int):
        s = str(source)
        if s.split()[:1] == ["screen"]:
            st.screenshot = True
        else:
            from .loaders import is_stream_source

            if is_stream_source(source):
                st.stream = True
    elif hasattr(source, "convert") and hasattr(source, "size"):  # PIL
        st.from_img = True
    elif hasattr(source, "__array__"):
        import numpy as np

        st.from_img = isinstance(source, np.ndarray)
        st.tensor = not st.from_img
    elif isinstance(source, (list, tuple)):
        st.from_img = True
    else:
        raise TypeError(f"unsupported predict source type: {type(source)}")
    return source, st


def load_inference_source(source, vid_stride: int = 1, stream_buffer: bool = False):
    """Iterator of (frames, paths) batches for a streaming source
    (reference load_inference_source, data/build.py:230): dispatches the
    sniffed type to the matching loader. In-memory sources are the
    batched predict path, not a stream — resolve them there."""
    from .loaders import LoadImagesAndVideos, LoadScreenshots, LoadStreams

    source, st = check_source(source)
    if st.screenshot:
        return LoadScreenshots(source)
    if st.stream:
        # stream_buffer=True keeps a FIFO of frames, False serves only the
        # newest (reference default.yaml:60 + LoadStreams buffer arg)
        return LoadStreams(source, vid_stride=vid_stride, buffer=stream_buffer)
    if st.from_img or st.tensor:
        raise TypeError("in-memory sources are served by the batched predict path, not a stream loader")
    return LoadImagesAndVideos(source, vid_stride=vid_stride)


def seed_worker(worker_id: int) -> None:
    """Deterministic per-worker RNG reseed (reference data/build.py:99).
    This framework's thread-pool loader derives per-(seed, epoch, idx)
    RNGs instead (data/dataset.py), so this reseeds the global numpy/
    random state for user-supplied worker code."""
    import random

    import numpy as np

    seed = int(np.random.get_state()[1][0]) + worker_id
    np.random.seed(seed % (2**32))
    random.seed(seed)
