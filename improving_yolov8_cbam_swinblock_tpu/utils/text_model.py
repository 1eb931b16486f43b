"""Offline text encoders for open-vocabulary models (World / YOLOE).

The reference wraps CLIP / MobileCLIP (reference nn/text_model.py:1-269,
WorldModel.set_classes tasks.py:715-740) and downloads ViT-B/32 weights.
This environment has zero egress, so three tiers are provided, all with
the same output contract (L2-normalized float32 (n, dim)):

1. **Real CLIP text tower** (`CLIPTextTower` + `encode_texts(npz_path=...)`
   where the npz is a weight archive from `tools/export_clip_npz.py`):
   the full causal pre-LN transformer (token+pos embed, MHSA, quickGELU
   MLP, final LN, EOT pooling, text projection) with the CLIP BPE
   tokenizer — numeric parity vs `transformers` CLIP is tested. Load
   real ViT-B/32 text weights through the converter for true
   open-vocabulary behavior.
2. **Per-prompt vector archive** (npz of {prompt: vector}) exported from
   the reference's encoder for a fixed vocabulary.
3. **Deterministic hash projection** (default, no weights): each prompt
   hashes to a seed drawing a fixed Gaussian vector — a stable,
   reproducible text space (distinct prompts -> near-orthogonal) with no
   semantic structure.
"""

from __future__ import annotations

import hashlib
import io
import json
from typing import Dict, Optional, Sequence

import numpy as np

EMBED_DIM = 512


# ---------------------------------------------------------------------------
# CLIP text transformer (pure-jax; params are a flat dict loaded from npz)
# ---------------------------------------------------------------------------


def _quick_gelu(x):
    import jax

    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextTower:
    """CLIP text encoder forward over an imported weight dict.

    Weight keys (all float32 numpy, torch layout; see
    tools/export_clip_npz.py): token_embedding (V,D),
    position_embedding (P,D), L{i}.ln1.{w,b}, L{i}.attn.{q,k,v,out}.{w,b}
    (torch Linear (out,in) weights), L{i}.ln2.{w,b}, L{i}.mlp.fc1/fc2.{w,b},
    ln_final.{w,b}, text_projection (proj,D). Matches both HF
    `CLIPTextModelWithProjection` and OpenAI `clip` state dicts
    (reference nn/text_model.py:126-150 encode path).
    """

    def __init__(self, params: Dict[str, np.ndarray], eot_id: int):
        self.p = {k: np.asarray(v, np.float32) for k, v in params.items()}
        self.eot_id = int(eot_id)
        self.layers = 0
        while f"L{self.layers}.ln1.w" in self.p:
            self.layers += 1
        self.width = self.p["token_embedding"].shape[1]
        # heads: stored alongside weights (scalar array)
        self.heads = int(self.p["num_heads"]) if "num_heads" in self.p else max(1, self.width // 64)

    def __call__(self, token_ids: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        p = self.p
        ids = jnp.asarray(token_ids, jnp.int32)
        B, T = ids.shape
        x = jnp.asarray(p["token_embedding"])[ids] + jnp.asarray(p["position_embedding"])[:T]

        def ln(x, w, b):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) / jnp.sqrt(var + 1e-5) * p[w] + p[b]

        causal = jnp.tril(jnp.ones((T, T), bool))
        hd = self.width // self.heads
        for i in range(self.layers):
            h = ln(x, f"L{i}.ln1.w", f"L{i}.ln1.b")
            q = h @ p[f"L{i}.attn.q.w"].T + p[f"L{i}.attn.q.b"]
            k = h @ p[f"L{i}.attn.k.w"].T + p[f"L{i}.attn.k.b"]
            v = h @ p[f"L{i}.attn.v.w"].T + p[f"L{i}.attn.v.b"]
            q = q.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
            a = (q @ k.transpose(0, 1, 3, 2)) * (hd**-0.5)
            a = jnp.where(causal, a, -jnp.inf)
            a = jnp.exp(a - a.max(-1, keepdims=True))
            a = a / a.sum(-1, keepdims=True)
            o = (a @ v).transpose(0, 2, 1, 3).reshape(B, T, self.width)
            x = x + (o @ p[f"L{i}.attn.out.w"].T + p[f"L{i}.attn.out.b"])
            h = ln(x, f"L{i}.ln2.w", f"L{i}.ln2.b")
            h = _quick_gelu(h @ p[f"L{i}.mlp.fc1.w"].T + p[f"L{i}.mlp.fc1.b"])
            x = x + (h @ p[f"L{i}.mlp.fc2.w"].T + p[f"L{i}.mlp.fc2.b"])
        x = ln(x, "ln_final.w", "ln_final.b")
        # pool at the first EOT position (CLIP argmax-EOT contract)
        eot_pos = jnp.argmax((ids == self.eot_id).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(B), eot_pos]
        return np.asarray(pooled @ jnp.asarray(p["text_projection"]).T, np.float32)


def _tower_from_archive(arc) -> "tuple":
    """Build (tower, tokenizer) from a weight npz (tools/export_clip_npz.py)."""
    import tempfile

    from .clip_bpe import CLIPBPETokenizer

    params = {k: arc[k] for k in arc.files if k not in ("vocab_json", "merges_txt", "eot_id")}
    vocab = str(arc["vocab_json"])
    merges = str(arc["merges_txt"])
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as vf:
        vf.write(vocab)
        vpath = vf.name
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as mf:
        mf.write(merges)
        mpath = mf.name
    tok = CLIPBPETokenizer(vpath, mpath, context_length=int(params["position_embedding"].shape[0]))
    tower = CLIPTextTower(params, eot_id=int(arc["eot_id"]))
    return tower, tok


def encode_texts(texts: Sequence[str], dim: int = EMBED_DIM, npz_path: Optional[str] = None) -> np.ndarray:
    """Encode prompts to L2-normalized embeddings (n, dim).

    With `npz_path`: a CLIP weight archive (contains 'token_embedding')
    runs the real tokenizer+tower; a per-prompt vector archive looks
    prompts up directly. Without: the `clip_npz` persistent setting if
    set, else the deterministic hash projection.
    """
    if not npz_path:
        from .settings import SETTINGS

        npz_path = str(SETTINGS.get("clip_npz") or "") or None
    if npz_path:
        arc = np.load(npz_path)
        if "token_embedding" in arc.files:
            tower, tok = _tower_from_archive(arc)
            out = tower(tok(list(texts)))
        else:
            out = np.stack([arc[t] for t in texts]).astype(np.float32)
    else:
        vecs = []
        for t in texts:
            seed = int.from_bytes(hashlib.sha256(str(t).encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            vecs.append(rng.standard_normal(dim).astype(np.float32))
        out = np.stack(vecs)
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def hf_state_to_params(state: Dict[str, "np.ndarray"], num_heads: int) -> Dict[str, np.ndarray]:
    """Map a HF `CLIPTextModelWithProjection` state dict (numpy values)
    to the CLIPTextTower layout."""
    g = lambda k: np.asarray(state[k], np.float32)
    p: Dict[str, np.ndarray] = {
        "token_embedding": g("text_model.embeddings.token_embedding.weight"),
        "position_embedding": g("text_model.embeddings.position_embedding.weight"),
        "ln_final.w": g("text_model.final_layer_norm.weight"),
        "ln_final.b": g("text_model.final_layer_norm.bias"),
        "text_projection": g("text_projection.weight"),
        "num_heads": np.asarray(num_heads),
    }
    i = 0
    while f"text_model.encoder.layers.{i}.layer_norm1.weight" in state:
        pre = f"text_model.encoder.layers.{i}"
        p[f"L{i}.ln1.w"] = g(f"{pre}.layer_norm1.weight")
        p[f"L{i}.ln1.b"] = g(f"{pre}.layer_norm1.bias")
        p[f"L{i}.ln2.w"] = g(f"{pre}.layer_norm2.weight")
        p[f"L{i}.ln2.b"] = g(f"{pre}.layer_norm2.bias")
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj")):
            p[f"L{i}.attn.{ours}.w"] = g(f"{pre}.self_attn.{theirs}.weight")
            p[f"L{i}.attn.{ours}.b"] = g(f"{pre}.self_attn.{theirs}.bias")
        p[f"L{i}.mlp.fc1.w"] = g(f"{pre}.mlp.fc1.weight")
        p[f"L{i}.mlp.fc1.b"] = g(f"{pre}.mlp.fc1.bias")
        p[f"L{i}.mlp.fc2.w"] = g(f"{pre}.mlp.fc2.weight")
        p[f"L{i}.mlp.fc2.b"] = g(f"{pre}.mlp.fc2.bias")
        i += 1
    return p
