"""RF100Benchmark analog (reference utils/benchmarks.py:204-349)."""

from pathlib import Path

import yaml

from improving_yolov8_cbam_swinblock_tpu.utils.benchmarks import RF100Benchmark


def _fake_rf_dataset(root: Path, proj: str, version: str):
    d = root / "rf-100" / f"{proj}-{version}"
    d.mkdir(parents=True)
    (d / "data.yaml").write_text(yaml.safe_dump({
        "train": f"../{proj}/train", "val": f"../{proj}/val",
        "nc": 2, "names": ["cat", "dog"],
    }))
    return d


def test_parse_dataset_and_fix_yaml(tmp_path):
    links = tmp_path / "datasets_links.txt"
    links.write_text(
        "https://app.roboflow.com/ws1/aerial-cows/3\n"
        "\n"
        "https://app.roboflow.com/ws2/xray-guns/1\n"
        "not-a-url\n"
    )
    for proj, ver in [("aerial-cows", "3"), ("xray-guns", "1")]:
        _fake_rf_dataset(tmp_path, proj, ver)

    b = RF100Benchmark(base_dir=str(tmp_path / "rf-100"))
    names, cfgs = b.parse_dataset(str(links))
    assert names == ["aerial-cows", "xray-guns"]
    assert all(c.exists() for c in cfgs)

    b.fix_yaml(cfgs[0])
    fixed = yaml.safe_load(cfgs[0].read_text())
    assert fixed["train"] == "train/images" and fixed["val"] == "valid/images"


def test_evaluate_scrapes_all_row_map50(tmp_path):
    ds = _fake_rf_dataset(tmp_path, "aerial-cows", "3")
    log = tmp_path / "val.log"
    # the framework's own table format (engine/validator.py print_results)
    log.write_text(
        "                 Class     Images  Instances      Box(P          R      mAP50  mAP50-95)\n"
        "                   all         40        120      0.812      0.704      0.776      0.512\n"
        "                   cat         40         70      0.900      0.800      0.850      0.600\n"
        "                   dog         40         50      0.724      0.608      0.702      0.424\n"
        "yolo val done ✅\n"
    )
    b = RF100Benchmark(base_dir=str(tmp_path / "rf-100"))
    b.ds_names = ["aerial-cows"]
    eval_log = tmp_path / "eval.log"
    out = b.evaluate(ds / "data.yaml", log, eval_log, 0)
    assert out == 0.776
    assert eval_log.read_text().strip() == "aerial-cows: 0.776"


def test_evaluate_on_real_val_log(tmp_path, tiny_dataset):
    """End-to-end: capture a real validator run's console table into a file
    (the reference pipes `yolo val` output), then scrape it."""
    import logging

    from improving_yolov8_cbam_swinblock_tpu import YOLO
    from improving_yolov8_cbam_swinblock_tpu.utils import LOGGER

    data_yaml = tiny_dataset
    log = tmp_path / "val.log"
    fh = logging.FileHandler(log)
    LOGGER.addHandler(fh)
    try:
        YOLO("yolov8n.yaml").val(data=str(data_yaml), imgsz=64, batch=4, workers=0)
    finally:
        LOGGER.removeHandler(fh)
        fh.close()

    b = RF100Benchmark()
    eval_log = tmp_path / "eval.log"
    out = b.evaluate(data_yaml, log, eval_log, 0)  # random init => mAP 0.0 is fine
    assert out >= 0.0
    assert eval_log.read_text().strip().endswith(f": {out}")
