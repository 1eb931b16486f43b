"""utils/files.py + utils/checks.py parity tails (reference files.py:23-200,
checks.py:60-778): WorkingDirectory, spaces_in_path, file_* stats,
parse/check_requirements, env probes, and the bf16 check_amp analog."""

import os
from pathlib import Path

import numpy as np
import pytest


def test_working_directory(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.files import WorkingDirectory

    before = Path.cwd()
    with WorkingDirectory(tmp_path):
        assert Path.cwd() == tmp_path
    assert Path.cwd() == before


def test_spaces_in_path_file(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.files import spaces_in_path

    src = tmp_path / "with space.txt"
    src.write_text("hello")
    with spaces_in_path(src) as p:
        assert " " not in str(p)
        Path(p).write_text("modified")
    assert src.read_text() == "modified"
    # space-free path passes through unchanged
    plain = tmp_path / "plain.txt"
    plain.write_text("x")
    with spaces_in_path(plain) as p:
        assert p == plain


def test_file_stats(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.files import file_age, file_date, file_size

    f = tmp_path / "f.bin"
    f.write_bytes(b"\0" * (1 << 20))
    assert file_age(f) == 0
    assert len(file_date(f).split("-")) == 3
    assert file_size(f) == pytest.approx(1.0, rel=1e-3)
    assert file_size(tmp_path) == pytest.approx(1.0, rel=1e-3)
    assert file_size(tmp_path / "missing") == 0.0


def test_parse_and_check_requirements(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.checks import (
        check_requirements,
        parse_requirements,
    )

    req = tmp_path / "requirements.txt"
    req.write_text("# comment\nnumpy>=1.20\nscipy  # inline\n\nfakepkg==9.9\n")
    parsed = parse_requirements(req)
    assert [r.name for r in parsed] == ["numpy", "scipy", "fakepkg"]
    assert parsed[0].specifier == ">=1.20"
    assert check_requirements(["numpy>=1.0"])
    assert not check_requirements(["surely_not_installed_pkg>=1.0"])
    assert check_requirements(["numpy>=1.0"], exclude=("numpy",))
    # package metadata mode
    deps = parse_requirements(package="jax")
    assert any(r.name.startswith("numpy") for r in deps)


def test_env_probes():
    from improving_yolov8_cbam_swinblock_tpu.utils.checks import (
        accelerator_count,
        check_font,
        check_latest_pypi_version,
        check_pip_update_available,
        check_torchvision,
        check_yolov5u_filename,
        collect_system_info,
        cuda_device_count,
        cuda_is_available,
        git_describe,
        is_rockchip,
        is_sudo_available,
    )

    assert cuda_device_count() >= 0
    assert cuda_is_available() == (cuda_device_count() > 0)
    assert accelerator_count() >= 1
    assert check_latest_pypi_version() == ""
    assert check_pip_update_available() is False
    assert check_torchvision() is None
    assert isinstance(is_rockchip(), bool)
    assert isinstance(is_sudo_available(), bool)
    assert isinstance(git_describe(), str)
    f = check_font()
    assert f is None or Path(f).exists()
    assert check_yolov5u_filename("yolov5n.pt", verbose=False) == "yolov5nu.pt"
    assert check_yolov5u_filename("yolov8n.pt", verbose=False) == "yolov8n.pt"
    info = collect_system_info()
    assert "OS" in info and "Accelerators" in info


def test_check_model_file_from_stem():
    from improving_yolov8_cbam_swinblock_tpu.utils.checks import check_model_file_from_stem

    assert check_model_file_from_stem("yolov8n") == "yolov8n.yaml"
    assert check_model_file_from_stem("model.ckpt") == "model.ckpt"
    assert check_model_file_from_stem("not_a_model_stem_xyz") == "not_a_model_stem_xyz"


def test_check_amp_bf16_sanity():
    from improving_yolov8_cbam_swinblock_tpu.utils.checks import check_amp

    assert check_amp(imgsz=64) is True


def test_update_models(tmp_path, monkeypatch):
    import jax

    from improving_yolov8_cbam_swinblock_tpu import YOLO
    from improving_yolov8_cbam_swinblock_tpu.utils.files import update_models

    m = YOLO("yolov8n.yaml")
    m._ensure_variables(64)
    m.save(str(tmp_path / "tiny.ckpt"))
    update_models(("tiny.ckpt",), source_dir=tmp_path)
    out = tmp_path / "updated_models" / "tiny.ckpt"
    assert out.exists()
    YOLO(str(out))  # round-trips
