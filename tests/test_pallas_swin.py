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
