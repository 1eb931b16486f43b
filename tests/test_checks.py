"""utils/checks module (reference utils/checks.py): imgsz stride
rounding wired into the engine, version parsing, suffix/file checks."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.utils.checks import (
    check_file,
    check_imgsz,
    check_is_path_safe,
    check_python,
    check_suffix,
    check_version,
    check_yaml,
    is_ascii,
    parse_version,
)


def test_parse_and_check_version():
    assert parse_version("2.0.1+cpu") == (2, 0, 1)
    assert check_version("8.3.108", ">=8.0,<9.0")
    assert not check_version("1.9.0", ">=2.0")
    assert check_version("2.1", "==2.1.0") and check_version("2.1.3", "~=2.1")
    with pytest.raises(ModuleNotFoundError):
        check_version("1.0", ">=2.0", hard=True)
    assert check_python("3.8")


def test_check_imgsz_rounding():
    assert check_imgsz(640) == 640
    assert check_imgsz(100) == 128
    assert check_imgsz([640, 480]) == [640, 480]
    assert check_imgsz(1, floor=64) == 64
    assert check_imgsz(320, min_dim=2) == [320, 320]
    with pytest.raises(ValueError):
        check_imgsz([1, 2, 3])


def test_suffix_yaml_file(tmp_path):
    check_suffix("model.ckpt", ".ckpt")
    with pytest.raises(ValueError):
        check_suffix("model.pt", ".ckpt")
    assert is_ascii("abc") and not is_ascii("日本語")
    p = tmp_path / "x.yaml"
    p.write_text("a: 1")
    assert check_yaml(str(p)) == str(p)
    # scale-suffixed names resolve to the unified yaml (compiler semantics)
    assert check_file("yolov8n.yaml").endswith("yolov8.yaml")
    with pytest.raises(FileNotFoundError):
        check_file("definitely_missing_xyz.yaml")
    assert check_is_path_safe(tmp_path, p)
    assert not check_is_path_safe(tmp_path, tmp_path / ".." / "escape")


def test_predict_rounds_odd_imgsz():
    """imgsz=100 used to crash in the concat at P4 (shapes 8 vs 7);
    the facade now rounds to the stride multiple like the reference."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    img = (np.random.default_rng(0).random((60, 90, 3)) * 255).astype(np.uint8)
    r = YOLO("yolov8n.yaml").predict(img, imgsz=100)
    assert len(r) == 1


def test_patches_imread_imwrite_unicode(tmp_path):
    """Unicode-safe image IO (reference utils/patches.py:15-58): paths
    with non-ASCII characters round-trip through numpy buffers."""
    import numpy as np

    from improving_yolov8_cbam_swinblock_tpu.utils.patches import imread, imwrite

    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    p = tmp_path / "图像_тест.png"
    assert imwrite(str(p), img)
    back = imread(str(p))
    assert back is not None and np.array_equal(back, img)  # png is lossless
    assert imread(str(tmp_path / "missing_ø.png")) is None


def test_hub_model_error():
    """load_model raises HUBModelError offline and on HTTP failure
    (reference errors.py + session.load_model)."""
    import pytest

    from improving_yolov8_cbam_swinblock_tpu.hub import HUBTrainingSession
    from improving_yolov8_cbam_swinblock_tpu.utils.errors import HUBModelError

    s = HUBTrainingSession("some_model_id", save_dir="runs")
    with pytest.raises(HUBModelError):
        s.load_model()
