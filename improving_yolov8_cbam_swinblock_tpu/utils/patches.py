"""Robust imaging IO wrappers (reference utils/patches.py).

cv2.imread/imwrite fail silently on non-ASCII paths on some platforms
(they route through the C runtime's narrow-char fopen); the reference
patches them to go through numpy buffers instead (patches.py:15-58).
Same approach here — these are the canonical image IO entry points for
the data pipeline and predictor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def imread(filename: str, flags: Optional[int] = None) -> Optional[np.ndarray]:
    """Unicode-safe cv2.imread (reference patches.py:15): decode from a
    numpy byte buffer so the path never hits the narrow-char fopen.
    Returns None on unreadable/undecodable files like cv2.imread."""
    import cv2

    try:
        buf = np.fromfile(str(filename), np.uint8)
    except OSError:
        return None
    if buf.size == 0:
        return None
    return cv2.imdecode(buf, cv2.IMREAD_COLOR if flags is None else flags)


def imwrite(filename: str, img: np.ndarray, params=None) -> bool:
    """Unicode-safe cv2.imwrite (reference patches.py:33): encode to a
    buffer, then write via numpy tofile. Returns success like cv2."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(filename).suffix or ".jpg", img, params or [])
        if not ok:
            return False
        buf.tofile(str(filename))
        return True
    except (OSError, cv2.error):
        return False


def imshow(winname: str, mat: np.ndarray) -> None:
    """cv2.imshow with a unicode-safe window name (reference
    patches.py:59 encodes the title)."""
    import cv2

    cv2.imshow(winname.encode("unicode_escape").decode(), mat)
