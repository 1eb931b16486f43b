"""Synthetic YOLO-format dataset generator for tests (no-egress stand-in
for coco8: images/ + labels/ txt files + data.yaml)."""

from pathlib import Path

import cv2
import numpy as np
import yaml


def make_valparity_dataset(root: Path, nc: int, n: int = 16, imgsz: int = 160, seed: int = 11):
    """Deterministic val-only dataset for the end-to-end reference-val
    parity golden (tests/test_val_parity_golden.py): square images exactly
    `imgsz` px (letterbox = identity on both sides), PNG (lossless), so the
    reference validator and this framework's validator consume bit-identical
    pixels. Regenerated identically by the fixture generator and the test."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    colors = [(255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64), (255, 64, 255)]
    img_dir = root / "images" / "val"
    lbl_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        # structured background: low-freq blobs upsampled, so the conv
        # stack sees non-trivial features rather than flat noise
        low = rng.integers(0, 120, (8, 8, 3), dtype=np.uint8)
        img = cv2.resize(low, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
        n_obj = int(rng.integers(1, 6))
        lines = []
        for _ in range(n_obj):
            cls = int(rng.integers(0, nc))
            # large boxes: random-init predictions must land real TP matches
            # at varying IoU so the matching/AP stages compose non-trivially
            w = float(rng.uniform(0.25, 0.7))
            h = float(rng.uniform(0.25, 0.7))
            cx = float(rng.uniform(w / 2, 1 - w / 2))
            cy = float(rng.uniform(h / 2, 1 - h / 2))
            x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
            x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
            cv2.rectangle(img, (x1, y1), (x2, y2), colors[cls % len(colors)], -1)
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(str(img_dir / f"val_{i:04d}.png"), img)
        (lbl_dir / f"val_{i:04d}.txt").write_text("\n".join(lines) + "\n")
    data = {
        "path": str(root),
        "train": "images/val",  # val-only fixture; train points at the same split
        "val": "images/val",
        "nc": nc,
        "names": {i: f"class{i}" for i in range(nc)},
    }
    yaml_path = root / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(data))
    return yaml_path


def make_synth_dataset(root: Path, n_train=16, n_val=8, imgsz=160, nc=3, seed=0):
    rng = np.random.default_rng(seed)
    root = Path(root)
    colors = [(255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64), (255, 64, 255)]
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = root / "images" / split
        lbl_dir = root / "labels" / split
        img_dir.mkdir(parents=True, exist_ok=True)
        lbl_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 60, (imgsz, imgsz, 3), dtype=np.uint8)
            n_obj = int(rng.integers(1, 5))
            lines = []
            for _ in range(n_obj):
                cls = int(rng.integers(0, nc))
                w = float(rng.uniform(0.15, 0.45))
                h = float(rng.uniform(0.15, 0.45))
                cx = float(rng.uniform(w / 2, 1 - w / 2))
                cy = float(rng.uniform(h / 2, 1 - h / 2))
                x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
                x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
                cv2.rectangle(img, (x1, y1), (x2, y2), colors[cls % len(colors)], -1)
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
            cv2.imwrite(str(img_dir / f"{split}_{i:04d}.jpg"), img)
            (lbl_dir / f"{split}_{i:04d}.txt").write_text("\n".join(lines) + "\n")
    data = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "nc": nc,
        "names": {i: f"class{i}" for i in range(nc)},
    }
    yaml_path = root / "data.yaml"
    yaml_path.write_text(yaml.safe_dump(data))
    return yaml_path
