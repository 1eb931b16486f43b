"""Emit cfg/datasets/*.yaml from the reference's dataset registry.

The reference ships ~30 dataset descriptor YAMLs (class-name tables,
split paths, keypoint metadata) that users address by bare name
(`data="coco8.yaml"`, reference data/utils.py:297 check_det_dataset →
checks.check_file search of cfg/datasets). The *names tables are config
data that must match the reference spec* (same argument as the model
graph YAMLs — disclosed in README); everything else (headers, download
scripts) is dropped: this framework has no egress, datasets must exist
locally at `path:`.

Run from repo root:  python tools/gen_dataset_yamls.py
"""

from __future__ import annotations

from pathlib import Path

import yaml

REF = Path("/root/reference/ultralytics/cfg/datasets")
OUT = Path(__file__).resolve().parent.parent / "improving_yolov8_cbam_swinblock_tpu/cfg/datasets"

# keys that are dataset *data* (vs reference-repo download machinery)
KEEP = ("path", "train", "val", "test", "kpt_shape", "flip_idx", "names", "nc")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for src in sorted(REF.glob("*.yaml")):
        d = yaml.safe_load(src.read_text())
        out = {k: d[k] for k in KEEP if k in d and d[k] is not None}
        if isinstance(out.get("names"), dict):
            out["nc"] = len(out["names"])
        header = (
            f"# Dataset descriptor `{src.name}` — split paths + class-name table\n"
            f"# (config data matching the reference spec, cfg/datasets/{src.name}).\n"
            f"# No auto-download in this framework: place the dataset at `path:`.\n"
        )
        body = yaml.safe_dump(out, sort_keys=False, allow_unicode=True, width=100)
        (OUT / src.name).write_text(header + body)
        print(f"wrote {OUT / src.name}")


if __name__ == "__main__":
    main()
