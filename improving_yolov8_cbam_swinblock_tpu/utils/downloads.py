"""Download / archive utilities (reference ultralytics/utils/downloads.py).

Stdlib-only (urllib + zipfile): `download()` fetches one or many URLs
(optionally in threads), `safe_download` retries and unzips, and the
zip helpers mirror the reference's exclude/top-level-dir behavior
(reference downloads.py:93-190). Local paths and file:// URLs are
serviced by copy, so the API is fully usable in no-egress environments.
"""

from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, List, Optional, Union

__all__ = ["is_url", "zip_directory", "unzip_file", "safe_download", "download", "check_disk_space"]


def is_url(url, check: bool = False) -> bool:
    """True if `url` parses as a URL; with check=True, also open it
    (reference downloads.py:42-67)."""
    try:
        url = str(url)
        r = urllib.parse.urlparse(url)
        ok = bool(r.scheme and r.netloc) or r.scheme == "file"
        if ok and check:
            with urllib.request.urlopen(url) as resp:  # noqa: S310
                return resp.getcode() == 200
        return ok
    except Exception:
        return False


def zip_directory(directory, compress: bool = True, exclude=(".DS_Store", "__MACOSX"), progress: bool = True) -> Path:
    """Zip `directory`'s contents into `<directory>.zip`, skipping paths
    containing any `exclude` token (reference downloads.py:93-126)."""
    import zipfile

    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"Directory '{directory}' does not exist.")
    files = [f for f in directory.rglob("*") if f.is_file() and all(x not in f.parts for x in exclude)]
    zip_file = directory.with_suffix(".zip")
    mode = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(zip_file, "w", mode) as zf:
        for f in files:
            zf.write(f, f.relative_to(directory.parent))
    return zip_file


def unzip_file(file, path=None, exclude=(".DS_Store", "__MACOSX"), exist_ok: bool = False, progress: bool = True) -> Path:
    """Unzip `file` into `path` (default: the zip's directory). Archives
    without a single top-level directory are extracted into a directory
    named after the zip to avoid spilling files (reference
    downloads.py:129-189). Returns the extraction directory."""
    import zipfile

    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as zf:
        names = [n for n in zf.namelist() if all(x not in n for x in exclude)]
        top = {n.split("/", 1)[0] for n in names}
        if len(top) == 1 and (names[0].endswith("/") or "/" in names[0]):
            extract, dest = path, path / next(iter(top))
        else:  # loose files: contain them in a dir named after the zip
            extract = dest = path / file.stem
        if dest.is_dir() and any(dest.iterdir()) and not exist_ok:
            return dest
        extract.mkdir(parents=True, exist_ok=True)
        for n in names:
            if not (extract / n).resolve().is_relative_to(extract.resolve()):  # zip-slip guard
                continue
            zf.extract(n, extract)
    return dest


def check_disk_space(url: str = "", path=Path.cwd(), sf: float = 1.5, hard: bool = True) -> bool:
    """Require `sf` × the remote Content-Length of free disk at `path`
    (reference downloads.py:192-228). Unknown sizes pass."""
    try:
        with urllib.request.urlopen(str(url)) as resp:  # noqa: S310
            size = int(resp.headers.get("Content-Length", 0))
    except Exception:
        return True
    free = shutil.disk_usage(path).free
    if free > size * sf:
        return True
    msg = f"Insufficient free disk space {free / 2**30:.1f} GB < {size * sf / 2**30:.1f} GB required for {url}"
    if hard:
        raise MemoryError(msg)
    return False


def safe_download(
    url,
    file=None,
    dir=None,
    unzip: bool = True,
    delete: bool = False,
    retry: int = 3,
    min_bytes: float = 1.0,
    exist_ok: bool = False,
    progress: bool = True,
) -> Path:
    """Fetch one URL (or copy a local path / file:// URL) to `dir/file`,
    retrying `retry` times, then optionally unzip and delete the archive
    (reference downloads.py:268-369)."""
    url = str(url).strip()
    src = Path(urllib.request.url2pathname(urllib.parse.urlparse(url).path)) if url.startswith("file://") else Path(url)
    name = Path(urllib.parse.urlparse(url).path).name or "download"
    f = Path(dir or ".") / (file or name) if (dir or not file) else Path(file)
    f.parent.mkdir(parents=True, exist_ok=True)
    if not f.exists():
        if src.is_file():  # local source: plain copy
            shutil.copy2(src, f)
        else:
            err = None
            for attempt in range(retry + 1):
                try:
                    urllib.request.urlretrieve(url, f)  # noqa: S310
                    if f.exists() and f.stat().st_size > min_bytes:
                        break
                    f.unlink(missing_ok=True)
                except Exception as e:  # no egress here -> clear failure after retries
                    err = e
            else:
                raise ConnectionError(f"Download failure for {url} after {retry} retries") from err
    if unzip and f.exists() and f.suffix in {".zip", ".tar", ".gz"}:
        if f.suffix == ".zip":
            out = unzip_file(f, path=dir or f.parent, exist_ok=exist_ok)
        else:
            import tarfile

            out = Path(dir or f.parent)
            with tarfile.open(f) as tf:
                tf.extractall(out)  # noqa: S202
        if delete:
            f.unlink(missing_ok=True)
        return out
    return f


def download(url: Union[str, Iterable], dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             curl: bool = False, threads: int = 1, retry: int = 3, exist_ok: bool = False) -> Optional[List[Path]]:
    """Download one URL or many (threads>1 fans out a pool), unzipping
    archives in place (reference downloads.py:453-501). `curl` is
    accepted for signature parity; the stdlib opener is always used."""
    dir = Path(dir)
    dir.mkdir(parents=True, exist_ok=True)
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            return list(pool.map(lambda u: safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry, exist_ok=exist_ok), urls))
    return [safe_download(u, dir=dir, unzip=unzip, delete=delete, retry=retry, exist_ok=exist_ok) for u in urls]
