"""Fused SwinBlock Pallas kernel parity vs the pure-jnp reference path.

On CPU the kernel runs in interpreter mode (slow but exact semantics);
on TPU it is the compiled production path."""

import numpy as np
import pytest


def _params(c, rng):
    def r(*shape):
        return rng.normal(0, 0.05, shape).astype(np.float32)

    return {
        "ln1_scale": np.ones(c, np.float32) + r(c) * 0.1,
        "ln1_bias": r(c),
        "wqkv": r(c, 3 * c),
        "bqkv": r(3 * c),
        "wout": r(c, c),
        "bout": r(c),
        "ln2_scale": np.ones(c, np.float32) + r(c) * 0.1,
        "ln2_bias": r(c),
        "w1": r(c, 4 * c),
        "b1": r(4 * c),
        "w2": r(4 * c, c),
        "b2": r(c),
    }


@pytest.mark.parametrize("shape,heads", [((2, 14, 21, 128), 2), ((1, 7, 14, 256), 4)])
def test_fused_swin_matches_reference(shape, heads):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
        fused_swin_block,
        swin_block_reference,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in _params(shape[-1], rng).items()}

    ref = np.asarray(swin_block_reference(x, p, num_heads=heads, window_size=7))
    if jax.default_backend() == "tpu":
        out = np.asarray(fused_swin_block(x, p, num_heads=heads, window_size=7))
        tol = 2e-2  # MXU matmuls use bf16 multiply passes on both paths
    else:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(fused_swin_block(x, p, num_heads=heads, window_size=7))
        tol = 2e-4
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


@pytest.mark.parametrize("shape,heads", [((2, 14, 21, 128), 2), ((1, 7, 14, 256), 4)])
def test_fused_swin_backward_matches_reference(shape, heads):
    """custom_vjp backward band kernel vs jax.grad of the jnp reference."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
        fused_swin_block_ad,
        swin_block_reference,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in _params(shape[-1], rng).items()}
    cot = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))

    def loss_ref(x, p):
        return (swin_block_reference(x, p, num_heads=heads, window_size=7) * cot).sum()

    def loss_fused(x, p):
        return (fused_swin_block_ad(x, p, heads, 7) * cot).sum()

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    if jax.default_backend() == "tpu":
        gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        tol = 5e-2
    else:
        with pltpu.force_tpu_interpret_mode():
            gx, gp = jax.grad(loss_fused, argnums=(0, 1))(x, p)
        tol = 1e-3
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=tol, atol=tol)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), rtol=tol,
            atol=tol * max(1.0, float(np.abs(np.asarray(gp_ref[k])).max())), err_msg=k,
        )


@pytest.mark.parametrize("shape,heads", [((2, 14, 21, 128), 2)])
def test_fused_swin_int8_close_to_reference(shape, heads):
    """int8-GEMM kernel: quantization drift stays small vs the fp path."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
        fused_swin_block_int8,
        swin_block_reference,
        swin_gemm_absmax,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in _params(shape[-1], rng).items()}

    am = swin_gemm_absmax(x, p, num_heads=heads, window_size=7)
    wmap = {"qkv": "wqkv", "out": "wout", "fc1": "w1", "fc2": "w2"}
    q = {}
    for key, wname in wmap.items():
        w = np.asarray(p[wname], np.float32)
        ws_ = np.clip(np.abs(w).max(0), 1e-12, None) / 127.0
        q[f"{key}_w_int8"] = jnp.asarray(np.clip(np.round(w / ws_), -127, 127).astype(np.int8))
        q[f"{key}_w_scale"] = jnp.asarray(ws_)
        q[f"{key}_x_scale"] = jnp.asarray(float(am[key]) / 127.0)

    ref = np.asarray(swin_block_reference(x, p, num_heads=heads, window_size=7))
    if jax.default_backend() == "tpu":
        out = np.asarray(fused_swin_block_int8(x, p, q, num_heads=heads, window_size=7))
    else:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(fused_swin_block_int8(x, p, q, num_heads=heads, window_size=7))
    # int8 drift bound: relative error on the residual-stream scale
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.05
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 0.25


@pytest.mark.parametrize("shape,heads", [((2, 14, 21, 128), 2)])
def test_fused_swin_int8_staged_io_close(shape, heads):
    """int8-staged HBM I/O (in8/out8): the extra input/output quantization
    adds only small drift over the plain int8-GEMM kernel (r5 perf work —
    halves the kernel's DMA slab)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from improving_yolov8_cbam_swinblock_tpu.ops.pallas.swin_kernel import (
        fused_swin_block_int8,
        swin_block_reference,
        swin_gemm_absmax,
    )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    p = {k: jnp.asarray(v) for k, v in _params(shape[-1], rng).items()}

    am = swin_gemm_absmax(x, p, num_heads=heads, window_size=7)
    wmap = {"qkv": "wqkv", "out": "wout", "fc1": "w1", "fc2": "w2"}
    q = {}
    for key, wname in wmap.items():
        w = np.asarray(p[wname], np.float32)
        ws_ = np.clip(np.abs(w).max(0), 1e-12, None) / 127.0
        q[f"{key}_w_int8"] = jnp.asarray(np.clip(np.round(w / ws_), -127, 127).astype(np.int8))
        q[f"{key}_w_scale"] = jnp.asarray(ws_)
        q[f"{key}_x_scale"] = jnp.asarray(float(am[key]) / 127.0)

    ref = np.asarray(swin_block_reference(x, p, num_heads=heads, window_size=7))
    yref = swin_block_reference(x, p, num_heads=heads, window_size=7)
    q["x_in_scale"] = jnp.asarray(float(np.abs(np.asarray(x)).max()) / 127.0)
    q["y_out_scale"] = jnp.asarray(float(np.abs(np.asarray(yref)).max()) / 127.0)
    xq = jnp.clip(jnp.round(x / q["x_in_scale"]), -127, 127).astype(jnp.int8)

    def run():
        y8 = fused_swin_block_int8(xq, p, q, num_heads=heads, window_size=7, in8=True, out8=True)
        assert y8.dtype == jnp.int8
        return np.asarray(y8.astype(jnp.float32) * q["y_out_scale"])

    if jax.default_backend() == "tpu":
        out = run()
    else:
        with pltpu.force_tpu_interpret_mode():
            out = run()
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.06
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 0.30


def test_swin_calibration_records_and_builds_quant():
    """Model-level: calibrate() records SwinBlock GEMM amaxes and
    build_quant_variables creates the kernel's quant entries."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.ops.quant import build_quant_variables, calibrate

    m = DetectionModel("yolov8n-cbam-swin.yaml")
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    imgs = [np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)]
    calib = calibrate(m, v, imgs)

    def find_swin(node, path=()):
        hits = []
        for k, val in node.items():
            if k.endswith("_amax") and k[:-5] in ("qkv", "out", "fc1", "fc2"):
                hits.append(path + (k,))
            elif isinstance(val, dict):
                hits.extend(find_swin(val, path + (k,)))
        return hits

    swin_keys = find_swin(calib)
    assert len(swin_keys) >= 4  # at least one SwinBlock x 4 GEMMs
    qv = build_quant_variables(v, calib)

    def find_q(node):
        hits = []
        for k, val in node.items():
            if k == "qkv_w_int8":
                hits.append(val)
            elif isinstance(val, dict):
                hits.extend(find_q(val))
        return hits

    wqs = find_q(qv["quant"])
    assert wqs and all(np.asarray(w).dtype == np.int8 for w in wqs)

    # int8-staged I/O scales land next to the GEMM entries (r5)
    def find_io(node):
        hits = []
        for k, val in node.items():
            if k in ("x_in_scale", "y_out_scale"):
                hits.append(k)
            elif isinstance(val, dict):
                hits.extend(find_io(val))
        return hits

    io_keys = find_io(qv["quant"])
    assert io_keys.count("x_in_scale") >= 1 and io_keys.count("y_out_scale") >= 1
