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
