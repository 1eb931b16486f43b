"""Framework exception types (reference utils/errors.py)."""

from __future__ import annotations


class HUBModelError(Exception):
    """Raised when a model cannot be found or retrieved from the HUB
    (reference errors.py HUBModelError — the emoji decoration is dropped;
    this environment logs plain text)."""

    def __init__(self, message: str = "Model not found. Please check model URL and try again."):
        super().__init__(message)
