"""Post-training int8 quantization (PTQ) for the conv backbone.

TPU v5e doubles its MXU rate for int8 x int8 -> int32, so the conv-bound
inference graph gains from running every ungrouped Conv in int8. Scheme
(standard symmetric PTQ, cf. the reference's INT8 TFLite/TensorRT export
calibration, reference engine/exporter.py export_engine/export_tflite):

  * weights: per-output-channel symmetric scales, absmax / 127;
  * activations: per-tensor symmetric scale from a calibration sweep
    that records each Conv input's absmax (Conv writes a 'calib'
    variable when apply() runs with mutable=["calib"]);
  * BatchNorm/SiLU stay float (elementwise, bandwidth-bound).

Usage:
    calib = calibrate(model, variables, images)        # a few batches
    qvars = build_quant_variables(variables, calib)    # adds "quant"
    model.net.apply(qvars, x, train=False)             # int8 conv path
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp


def calibrate(model, variables: Dict, batches: Iterable) -> Dict:
    """Run calibration batches; return the 'calib' collection of per-Conv
    input absmax values. `batches`: iterable of uint8 (B, H, W, 3)."""
    calib: Dict = {}

    @jax.jit
    def step(calib_in, img):
        x = img.astype(model.dtype) / 255.0
        v = dict(variables)
        if calib_in:
            v["calib"] = calib_in
        _, mut = model.net.apply(v, x, train=False, mutable=["calib"])
        return mut["calib"]

    for img in batches:
        calib = step(calib, jnp.asarray(img))
    return jax.tree.map(lambda t: jnp.asarray(t), calib)


def build_quant_variables(variables: Dict, calib: Dict) -> Dict:
    """Build the 'quant' collection mirroring the module tree: for every
    calibrated Conv scope, int8 weights + per-channel w scales + the
    activation scale. Grouped convs are skipped by Conv at apply time."""

    # SwinBlock GEMM-input amax keys -> the param scope holding the kernel
    swin_map = {
        "qkv": ("attn", "in_proj"),
        "out": ("attn", "out_proj"),
        "fc1": ("mlp_fc1",),
        "fc2": ("mlp_fc2",),
    }

    def walk(calib_node: Dict, params_node: Dict) -> Dict:
        out = {}
        for key, val in calib_node.items():
            if key.endswith("_amax") and key[:-5] in swin_map:
                # SwinBlock int8 GEMMs (swin_kernel.fused_swin_block_int8):
                # per-output-channel weight scales, per-tensor act scale
                name = key[:-5]
                node = params_node
                for part in swin_map[name]:
                    node = node.get(part, {})
                kernel = node.get("kernel")
                if kernel is None:
                    continue
                w = jnp.asarray(kernel, jnp.float32)  # (in, out)
                w_scale = jnp.clip(jnp.abs(w).max(axis=0), 1e-12, None) / 127.0
                out[f"{name}_w_int8"] = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
                out[f"{name}_w_scale"] = w_scale
                out[f"{name}_x_scale"] = jnp.clip(jnp.asarray(val, jnp.float32), 1e-12, None) / 127.0
            elif key in ("xin_amax", "yout_amax"):
                # SwinBlock int8-staged HBM I/O scales (swin_kernel
                # fused_swin_block_int8 in8/out8): per-tensor, from the
                # block's input/output absmax
                out_key = "x_in_scale" if key == "xin_amax" else "y_out_scale"
                out[out_key] = jnp.clip(jnp.asarray(val, jnp.float32), 1e-12, None) / 127.0
            elif key == "x_amax":
                kernel = params_node.get("conv", {}).get("kernel")
                if kernel is None:
                    continue
                w = jnp.asarray(kernel, jnp.float32)
                w_scale = jnp.clip(jnp.abs(w).max(axis=(0, 1, 2)), 1e-12, None) / 127.0
                w_int8 = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
                out["x_scale"] = jnp.clip(jnp.asarray(val, jnp.float32), 1e-12, None) / 127.0
                out["w_scale"] = w_scale
                out["w_int8"] = w_int8
            elif isinstance(val, dict):
                sub = walk(val, params_node.get(key, {}))
                if sub:
                    out[key] = sub
        return out

    quant = walk(calib, variables["params"])
    return {**variables, "quant": quant}


def quantize_model(model, variables: Dict, batches: Iterable) -> Dict:
    """Calibrate + build: returns variables with the 'quant' collection."""
    return build_quant_variables(variables, calibrate(model, variables, batches))
