"""Offline text encoder for open-vocabulary models (World / YOLOE).

The reference wraps CLIP / MobileCLIP (reference nn/text_model.py:1-269,
WorldModel.set_classes tasks.py:715-740) and downloads ViT-B/32 weights.
This environment has zero egress, so the default encoder is a
DETERMINISTIC HASH-PROJECTION stand-in with the same interface and output
contract (L2-normalized (n, 512) float32): each prompt hashes to a seed
that draws a fixed Gaussian vector. It gives the architecture a stable,
reproducible text space (distinct prompts -> near-orthogonal embeddings)
but NO semantic structure — open-vocabulary transfer needs real CLIP
weights, pluggable via `npz_path` ({prompt: vector} archive exported from
the reference's encoder on a machine with access).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence

import numpy as np

EMBED_DIM = 512


def encode_texts(texts: Sequence[str], dim: int = EMBED_DIM, npz_path: Optional[str] = None) -> np.ndarray:
    """Encode prompts to L2-normalized embeddings (n, dim).

    With `npz_path`, vectors come from a CLIP-exported archive (exact
    reference semantics); otherwise the deterministic hash projection.
    """
    if npz_path:
        arc = np.load(npz_path)
        out = np.stack([arc[t] for t in texts]).astype(np.float32)
    else:
        vecs = []
        for t in texts:
            seed = int.from_bytes(hashlib.sha256(str(t).encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            vecs.append(rng.standard_normal(dim).astype(np.float32))
        out = np.stack(vecs)
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
