"""utils/downloads.py: local-source download, zip round trips, url checks
(reference ultralytics/utils/downloads.py — exercised offline via local
paths and file:// URLs; the http path fails cleanly with no egress)."""

import zipfile
from pathlib import Path

import pytest

from improving_yolov8_cbam_swinblock_tpu.utils.downloads import (
    download,
    is_url,
    safe_download,
    unzip_file,
    zip_directory,
)


def test_is_url():
    assert is_url("https://example.com/f.zip")
    assert is_url("file:///tmp/x.zip")
    assert not is_url("/plain/local/path")
    assert not is_url("not a url")


def test_zip_unzip_roundtrip_topdir(tmp_path):
    src = tmp_path / "pack"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta")
    (src / ".DS_Store").write_text("junk")
    z = zip_directory(src)
    assert z == src.with_suffix(".zip") and z.exists()
    names = zipfile.ZipFile(z).namelist()
    assert all(".DS_Store" not in n for n in names)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    dest = unzip_file(z, path=out_dir)
    assert dest == out_dir / "pack"
    assert (dest / "a.txt").read_text() == "alpha"
    assert (dest / "sub" / "b.txt").read_text() == "beta"
    # existing non-empty dest short-circuits unless exist_ok
    assert unzip_file(z, path=out_dir) == dest


def test_unzip_loose_files_contained(tmp_path):
    z = tmp_path / "loose.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("x.txt", "1")
        zf.writestr("y.txt", "2")
    dest = unzip_file(z)
    assert dest == tmp_path / "loose"
    assert sorted(p.name for p in dest.iterdir()) == ["x.txt", "y.txt"]


def test_safe_download_local_copy_and_file_url(tmp_path):
    src = tmp_path / "w.bin"
    src.write_bytes(b"\x00" * 64)
    d1 = tmp_path / "d1"
    out = safe_download(str(src), dir=d1)
    assert out == d1 / "w.bin" and out.read_bytes() == src.read_bytes()
    d2 = tmp_path / "d2"
    out2 = safe_download(src.as_uri(), dir=d2)
    assert out2 == d2 / "w.bin" and out2.exists()


def test_download_many_with_unzip_and_delete(tmp_path):
    src = tmp_path / "pack"
    src.mkdir()
    (src / "f.txt").write_text("data")
    z = zip_directory(src)
    plain = tmp_path / "p.bin"
    plain.write_bytes(b"abc1234")
    dl = tmp_path / "dl"
    outs = download([str(z), str(plain)], dir=dl, delete=True, threads=2)
    assert len(outs) == 2
    assert (dl / "pack" / "f.txt").read_text() == "data"
    assert (dl / "p.bin").exists()
    assert not (dl / "pack.zip").exists()  # delete=True removed the archive


def test_http_download_fails_cleanly(tmp_path):
    with pytest.raises(ConnectionError):
        safe_download("https://0.0.0.0:1/nothing.zip", dir=tmp_path, retry=1)


def test_top_level_export():
    import improving_yolov8_cbam_swinblock_tpu as pkg

    assert pkg.download is download
    assert "download" in pkg.__all__
