"""Fused Pallas TAL kernel vs the XLA assigner (interpret mode, CPU).

The kernel (ops/pallas/tal_kernel.py) must reproduce the XLA path of
utils/tal.py:task_aligned_assign exactly: same candidate gating, CIoU,
first-index tie-breaking in the top-k extraction, conflict resolution,
and target-score normalization (reference semantics:
/root/reference/ultralytics/utils/tal.py:14-326).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.ops.anchors import make_anchors
from improving_yolov8_cbam_swinblock_tpu.ops.pallas.tal_kernel import (
    tal_assign_fused,
    tal_kernel_supported,
)
from improving_yolov8_cbam_swinblock_tpu.utils.tal import task_aligned_assign


def _mk(b=3, g=12, nc=1, imgsz=128, seed=0, dup=True):
    shapes = [(imgsz // s, imgsz // s) for s in (8, 16, 32)]
    anc, st = make_anchors(shapes, (8, 16, 32), 0.5)
    a = anc.shape[0]
    rng = np.random.default_rng(seed)
    scores = rng.random((b, a, nc)).astype(np.float32)
    cxy = rng.uniform(10, imgsz - 10, (b, a, 2))
    wh = rng.uniform(4, imgsz / 2, (b, a, 2))
    pboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    glab = rng.integers(0, nc, (b, g, 1)).astype(np.int32)
    gcxy = rng.uniform(12, imgsz - 12, (b, g, 2))
    gwh = rng.uniform(8, imgsz / 2, (b, g, 2))
    gbox = np.concatenate([gcxy - gwh / 2, gcxy + gwh / 2], -1).astype(np.float32)
    gmask = (rng.random((b, g, 1)) < 0.7).astype(np.float32)
    # edge cases: an empty image and a duplicated GT box (tie-break stress)
    gbox[0, :] = 0
    gmask[0, :] = 0
    if dup and b > 1 and g > 3:
        gbox[1, 3] = gbox[1, 2]
        glab[1, 3] = glab[1, 2]
    gbox = gbox * gmask
    return (
        jnp.asarray(scores),
        jnp.asarray(pboxes),
        anc * st,
        jnp.asarray(glab),
        jnp.asarray(gbox),
        jnp.asarray(gmask),
    )


@pytest.mark.parametrize("nc,g,seed", [(1, 12, 0), (80, 8, 1), (3, 16, 2)])
def test_kernel_matches_xla(nc, g, seed):
    args = _mk(nc=nc, g=g, seed=seed)
    ref = task_aligned_assign(*args, topk=10, num_classes=nc, use_kernel=False)
    got = tal_assign_fused(*args, topk=10, num_classes=nc, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.fg_mask), np.asarray(got.fg_mask))
    np.testing.assert_array_equal(np.asarray(ref.target_gt_idx), np.asarray(got.target_gt_idx))
    np.testing.assert_array_equal(np.asarray(ref.target_labels), np.asarray(got.target_labels))
    np.testing.assert_allclose(
        np.asarray(ref.target_bboxes), np.asarray(got.target_bboxes), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref.target_scores), np.asarray(got.target_scores), rtol=1e-4, atol=1e-6
    )


def test_gate():
    assert tal_kernel_supported(8400, 32, 1, 0.5, 6.0)
    assert tal_kernel_supported(8400, 32, 80, 0.5, 6.0)
    assert not tal_kernel_supported(8400, 32, 1, 0.5, 4.0)  # non-default beta
    assert not tal_kernel_supported(256, 32, 1, 0.5, 6.0)  # tiny A: XLA path
    assert not tal_kernel_supported(8400, 300, 80, 0.5, 6.0)  # VMEM blowout
