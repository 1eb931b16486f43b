"""Inference-time Conv+BN folding.

Equivalent of reference BaseModel.fuse / fuse_conv_and_bn
(reference nn/tasks.py:210-251, utils/torch_utils.py:467-490), done the
JAX way: a PURE TRANSFORM over the variables pytree. Every Conv block's
kernel is rescaled by gamma/sqrt(var+eps) and a folded bias is written
into a `fused` variables collection; nn.modules.Conv sees the collection
at inference and skips its BatchNorm entirely (same pattern as the int8
`quant` collection). Model code never mutates — the transformed
variables are just another pytree to apply.

Why it matters on TPU: the whole-model bs128 inference profile is
elementwise/BN-bound (CLAUDE.md perf ledger) — the BN multiply-add runs
on the VPU after every MXU conv; folding removes it from the graph
instead of hoping the compiler fuses runtime-parameter affine ops.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

_EPS = 1e-3  # reference BN eps (torch_utils.py:468)


def _fold(kernel, gamma, beta, mean, var, eps=_EPS):
    """W' = W * g / sqrt(v + eps) (out-channel last in HWIO);
    b' = beta - g * mean / sqrt(v + eps)."""
    inv = gamma / jnp.sqrt(var + eps)
    return kernel * inv, beta - mean * inv


def fuse_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every {conv, bn} sibling pair in the params tree; returns new
    variables with folded kernels + a `fused` collection of biases.
    BatchNorm params/stats stay in the tree (unused once Conv sees the
    fused collection) so the structure keeps matching the module."""
    def walk(p_node, s_node, f_parent: Dict[str, Any]):
        if not isinstance(p_node, dict):
            return
        if "conv" in p_node and "bn" in p_node and isinstance(p_node["conv"], dict) \
                and "kernel" in p_node["conv"] and s_node and "bn" in s_node:
            k = p_node["conv"]["kernel"]
            g = p_node["bn"]["scale"]
            b = p_node["bn"]["bias"]
            m = s_node["bn"]["mean"]
            v = s_node["bn"]["var"]
            k2, bias = _fold(jnp.asarray(k, jnp.float32), g, b, m, v)
            p_node["conv"] = dict(p_node["conv"], kernel=k2.astype(jnp.asarray(k).dtype))
            f_parent["bias"] = bias
        for key, child in list(p_node.items()):
            if isinstance(child, dict):
                sub = {}
                walk(child, (s_node or {}).get(key, {}) if isinstance(s_node, dict) else {}, sub)
                if sub:
                    f_parent[key] = sub

    # deep-copy the dict structure so kernels can be rewritten in place
    def deep(d):
        return {k: deep(v) if isinstance(v, dict) else v for k, v in d.items()}

    params = deep(dict(variables["params"]))
    stats_d = deep(dict(variables.get("batch_stats", {}) or {}))
    walk(params, stats_d, fused_root := {})
    out = dict(variables)
    out["params"] = params
    if fused_root:
        out["fused"] = fused_root
    return out
