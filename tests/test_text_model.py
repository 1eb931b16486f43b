"""CLIP text encoder parity vs transformers (reference nn/text_model.py
uses OpenAI CLIP; HF CLIP is the same architecture + tokenizer):
tokenizer BPE parity on a synthetic vocab, tower numeric parity through
the weight-import path, and the npz archive round trip."""

import json

import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def tiny_vocab(tmp_path_factory):
    """HF-format vocab.json/merges.txt over the byte alphabet + a few merges."""
    import transformers.models.clip.tokenization_clip as tc

    d = tmp_path_factory.mktemp("clipvocab")
    b2u = tc.bytes_to_unicode()
    vocab = {}
    i = 0
    for ch in b2u.values():
        vocab[ch] = i
        i += 1
    for ch in b2u.values():
        vocab[ch + "</w>"] = i
        i += 1
    merges = ["h e", "he l", "hel l", "hell o</w>", "l o", "lo w</w>", "t h", "th e</w>"]
    for m in merges:
        vocab["".join(m.split())] = i
        i += 1
    vocab["<|startoftext|>"] = i
    vocab["<|endoftext|>"] = i + 1
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n" + "\n".join(merges) + "\n")
    return d


PROMPTS = ["hello low world!", "the  THE the...", "a photo of a hellhound", "low-budget hello"]


def test_bpe_parity_vs_hf(tiny_vocab):
    from transformers import CLIPTokenizer

    from improving_yolov8_cbam_swinblock_tpu.utils.clip_bpe import CLIPBPETokenizer

    hf = CLIPTokenizer(str(tiny_vocab / "vocab.json"), str(tiny_vocab / "merges.txt"))
    ours = CLIPBPETokenizer(str(tiny_vocab / "vocab.json"), str(tiny_vocab / "merges.txt"))
    for p in PROMPTS:
        assert ours.encode(p) == hf(p, add_special_tokens=False).input_ids, p
    # fixed-grid contract: sot + ids + eot, zero pad
    grid = ours(PROMPTS[:2])
    assert grid.shape == (2, 77)
    assert grid[0, 0] == ours.sot and ours.eot in grid[0]


@pytest.fixture(scope="module")
def tiny_hf_clip(tiny_vocab):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    with open(tiny_vocab / "vocab.json") as f:
        vocab = json.load(f)
    cfg = CLIPTextConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=77,
        projection_dim=24,
        eos_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|startoftext|>"],
    )
    torch.manual_seed(0)
    return CLIPTextModelWithProjection(cfg).eval()


def test_tower_parity_vs_hf(tiny_vocab, tiny_hf_clip):
    from improving_yolov8_cbam_swinblock_tpu.utils.clip_bpe import CLIPBPETokenizer
    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import (
        CLIPTextTower,
        hf_state_to_params,
    )

    tok = CLIPBPETokenizer(str(tiny_vocab / "vocab.json"), str(tiny_vocab / "merges.txt"))
    ids = tok(PROMPTS)
    state = {k: v.numpy() for k, v in tiny_hf_clip.state_dict().items()}
    params = hf_state_to_params(state, num_heads=4)
    tower = CLIPTextTower(params, eot_id=tok.eot)
    ours = tower(ids)
    with torch.no_grad():
        ref = tiny_hf_clip(torch.from_numpy(ids.astype(np.int64))).text_embeds.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_encode_texts_tower_archive(tiny_vocab, tiny_hf_clip, tmp_path):
    """Full npz round trip: exporter layout -> encode_texts dispatch."""
    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import (
        encode_texts,
        hf_state_to_params,
    )

    state = {k: v.numpy() for k, v in tiny_hf_clip.state_dict().items()}
    params = hf_state_to_params(state, num_heads=4)
    with open(tiny_vocab / "vocab.json") as f:
        vocab = json.load(f)
    arc = tmp_path / "clip_text.npz"
    np.savez(
        arc,
        **params,
        vocab_json=(tiny_vocab / "vocab.json").read_text(),
        merges_txt=(tiny_vocab / "merges.txt").read_text(),
        eot_id=np.asarray(vocab["<|endoftext|>"]),
    )
    out = encode_texts(PROMPTS, npz_path=str(arc))
    assert out.shape == (len(PROMPTS), 24)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # matches the HF projected+normalized embedding
    from improving_yolov8_cbam_swinblock_tpu.utils.clip_bpe import CLIPBPETokenizer

    tok = CLIPBPETokenizer(str(tiny_vocab / "vocab.json"), str(tiny_vocab / "merges.txt"))
    with torch.no_grad():
        ref = tiny_hf_clip(torch.from_numpy(tok(PROMPTS).astype(np.int64))).text_embeds.numpy()
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_settings_clip_npz_hook(tiny_vocab, tiny_hf_clip, tmp_path):
    """`clip_npz` persistent setting routes set_classes-style encode_texts
    calls through the real tower with no per-call plumbing."""
    from improving_yolov8_cbam_swinblock_tpu.utils.settings import SETTINGS
    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import (
        encode_texts,
        hf_state_to_params,
    )

    state = {k: v.numpy() for k, v in tiny_hf_clip.state_dict().items()}
    params = hf_state_to_params(state, num_heads=4)
    with open(tiny_vocab / "vocab.json") as f:
        vocab = json.load(f)
    arc = tmp_path / "clip_text.npz"
    np.savez(
        arc,
        **params,
        vocab_json=(tiny_vocab / "vocab.json").read_text(),
        merges_txt=(tiny_vocab / "merges.txt").read_text(),
        eot_id=np.asarray(vocab["<|endoftext|>"]),
    )
    old = SETTINGS.get("clip_npz", "")
    try:
        SETTINGS["clip_npz"] = str(arc)
        out = encode_texts(["hello", "low"])
        assert out.shape == (2, 24)  # tower projection dim, not hash 512
        np.testing.assert_allclose(out, encode_texts(["hello", "low"], npz_path=str(arc)))
    finally:
        SETTINGS["clip_npz"] = old


def test_hash_fallback_contract():
    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import encode_texts

    a = encode_texts(["person", "car"])
    b = encode_texts(["person", "car"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 512)
    assert abs(float(a[0] @ a[1])) < 0.2  # near-orthogonal
