"""Torch checkpoint importer: reference state_dict -> flax variables.

Maps the reference's module naming (model.{i}.<...>, reference
nn/tasks.py parse_model attachment) onto this package's flax paths, with
layout transforms at the boundary:

  * conv weights OIHW -> HWIO;
  * linear weights (out, in) -> (in, out);
  * BatchNorm weight/bias/running_mean/running_var ->
    scale/bias + batch_stats mean/var;
  * nn.MultiheadAttention packed in_proj_weight/bias -> the SwinBlock
    Dense in_proj (same [q;k;v] packing, transposed).

The reference DFL conv (fixed arange, non-learnable) has no counterpart
here (functional decode) and is skipped, as are num_batches_tracked.

Accepts a {name: np.ndarray} dict — use tools/export_ref_state.py to
produce one from a real .pt without importing torch here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _torch_name(path: Tuple[str, ...], collection: str) -> Tuple[str, str]:
    """(flax path) -> (torch param name, transform tag)."""
    parts = []
    for comp in path:
        if comp == "dw":  # DWConv wrapper level — torch DWConv IS a Conv
            continue
        if comp == "c3":  # C3k wraps C3; torch C3k subclasses C3 directly
            continue
        parts.append(comp)

    leaf = parts[-1]
    mods = parts[:-1]

    toks: list[str] = []
    for m in mods:
        if m.startswith("model_"):
            toks.append("model." + ".".join(m.split("_")[1:]))  # model_2 / model_2_1
        elif m.startswith(("cv2_", "cv3_", "cv4_")):  # Detect/task-head per-level stacks
            bits = m.split("_")
            toks.append(".".join([bits[0]] + bits[1:]))
        elif m.startswith("m_") or m.startswith("ffn_"):
            # multi-underscore names (v9 RepNCSP 'm_0_cv1' etc.): split once,
            # remaining underscores become torch dots
            bits = m.split("_")
            toks.append(".".join(bits))
        elif m.startswith("mlp_fc"):  # Swin MLP: fc1 -> mlp.0, fc2 -> mlp.2
            toks.append("mlp.0" if m.endswith("1") else "mlp.2")
        elif m == "in_proj":
            toks.append("in_proj")  # handled specially below
        elif m == "fc1":
            toks.append("shared_MLP.0")
        elif m == "fc2":
            toks.append("shared_MLP.2")
        else:
            toks.append(m)
    base = ".".join(toks)

    if collection == "batch_stats":
        stat = {"mean": "running_mean", "var": "running_var"}[leaf]
        return f"{base}.{stat}", "none"

    if toks and toks[-1] == "in_proj":
        # torch MultiheadAttention packs qkv at the attention level
        prefix = ".".join(toks[:-1])
        name = f"{prefix}.in_proj_weight" if leaf == "kernel" else f"{prefix}.in_proj_bias"
        return name, "linear_t" if leaf == "kernel" else "none"

    if leaf == "kernel":
        return f"{base}.weight", "conv_oihw"  # 2-D kernels transpose (Dense)
    if leaf == "scale":
        return f"{base}.weight", "none"
    if leaf == "bias":
        return f"{base}.bias", "none"
    raise KeyError(f"unmapped flax leaf {path} ({collection})")


def _transform(arr: np.ndarray, tag: str, target_shape) -> np.ndarray:
    if tag == "conv_oihw" and arr.ndim == 4:
        out = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    elif tag in ("linear_t", "conv_oihw") and arr.ndim == 2:
        out = arr.T
    else:
        out = arr
    if tuple(out.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch after {tag}: {out.shape} vs {target_shape}")
    return out


def import_torch_state(variables, state: Dict[str, np.ndarray], strict: bool = True):
    """Fill a flax variables pytree from a torch state_dict-style mapping.

    Returns (new_variables, report dict)."""
    import jax

    used = set()
    missing = []

    def fill(collection):
        def leaf_fn(path, leaf):
            p = tuple(c.key if hasattr(c, "key") else str(c) for c in path)
            name, tag = _torch_name(p, collection)
            # Dense kernels need linear transform; detect by ndim==2
            if name in state:
                used.add(name)
                t = "linear_t" if (tag == "conv_oihw" and state[name].ndim == 2) else tag
                return np.asarray(_transform(state[name], t, leaf.shape), dtype=np.float32)
            missing.append(name)
            return np.asarray(leaf)

        return jax.tree_util.tree_map_with_path(leaf_fn, variables[collection])

    new_vars = {"params": fill("params"), "batch_stats": fill("batch_stats")}
    ignorable = {k for k in state if k.endswith("num_batches_tracked") or ".dfl." in k}
    unused = sorted(set(state) - used - ignorable)
    report = {"missing": missing, "unused": unused, "n_loaded": len(used)}
    if strict and missing:
        raise KeyError(f"missing torch params for: {missing[:10]} (+{max(0, len(missing)-10)} more)")
    return new_vars, report
