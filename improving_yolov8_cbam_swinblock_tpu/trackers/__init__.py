from pathlib import Path

import yaml

from .bot_sort import BOTSORT  # noqa: F401
from .byte_tracker import BYTETracker  # noqa: F401

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def build_tracker(tracker="bytetrack", frame_rate: int = 30):
    """Construct a tracker from a cfg YAML (reference trackers/track.py:35
    on_predict_start: check_yaml -> IterableSimpleNamespace -> TRACKER_MAP).

    `tracker` is a packaged name ("bytetrack", "botsort.yaml") resolved
    against cfg/trackers/, or a path to a user YAML with the same key
    schema. Unknown `tracker_type` raises ValueError like the reference.
    """
    name = str(tracker)
    p = Path(name if name.endswith((".yaml", ".yml")) else name + ".yaml")
    if not p.exists():
        p = Path(__file__).resolve().parent.parent / "cfg" / "trackers" / p.name
    if not p.exists():
        raise FileNotFoundError(f"tracker config not found: {tracker}")
    cfg = yaml.safe_load(p.read_text()) or {}
    ttype = cfg.get("tracker_type", "bytetrack")
    if ttype not in TRACKER_MAP:
        raise ValueError(
            f"Only 'bytetrack' and 'botsort' are supported, got tracker_type={ttype!r} "
            "(reference trackers/track.py:44)"
        )
    kw = {k: cfg[k] for k in (
        "track_high_thresh", "track_low_thresh", "new_track_thresh", "track_buffer", "match_thresh"
    ) if k in cfg}
    if "fuse_score" in cfg:
        kw["fuse_score_flag"] = bool(cfg["fuse_score"])
    if ttype == "botsort":
        for k in ("gmc_method", "proximity_thresh", "appearance_thresh", "with_reid"):
            if k in cfg:
                kw[k] = cfg[k]
    return TRACKER_MAP[ttype](frame_rate=frame_rate, **kw)
