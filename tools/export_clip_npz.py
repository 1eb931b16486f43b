"""Export a HF CLIP text tower to the framework's npz weight archive.

Run on a machine with the weights available (this environment has no
egress; reference nn/text_model.py downloads ViT-B/32 at first use):

    python tools/export_clip_npz.py openai/clip-vit-base-patch32 clip_text.npz

Then: `encode_texts(texts, npz_path='clip_text.npz')` (or World/YOLOE
set_classes via the same hook) runs the real tokenizer + text tower.
"""

import json
import sys

import numpy as np


def export(model_id: str, out_path: str) -> None:
    from transformers import CLIPTextModelWithProjection, CLIPTokenizer

    from improving_yolov8_cbam_swinblock_tpu.utils.text_model import hf_state_to_params

    model = CLIPTextModelWithProjection.from_pretrained(model_id)
    tok = CLIPTokenizer.from_pretrained(model_id)
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params = hf_state_to_params(state, num_heads=model.config.num_attention_heads)
    vocab_json = json.dumps(tok.get_vocab())
    merges_txt = "\n".join(" ".join(m) for m in sorted(tok.bpe_ranks, key=tok.bpe_ranks.get))
    np.savez(
        out_path,
        **params,
        vocab_json=vocab_json,
        merges_txt=merges_txt,
        eot_id=np.asarray(tok.eos_token_id),
    )
    print(f"wrote {out_path}: {len(params)} weight arrays, vocab {len(tok.get_vocab())}")


if __name__ == "__main__":
    export(sys.argv[1], sys.argv[2])
